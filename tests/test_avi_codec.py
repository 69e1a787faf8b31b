"""Pure-stdlib AVI/BI_RGB codec (functions/avi.py) + the decode_video and
frame_sample real paths.

Round-trips cover encode_rgb24 → decode_rgb24/decode_stats (BGR/bottom-up/
stride plumbing is where DIB bugs live); malformed containers must fail
inside the documented ValueError boundary and compressed streams inside
NotImplementedError, so one bad payload never kills a mapInPandas task with
an unclassified error.
"""

from __future__ import annotations

import struct

import pytest

from etl_housing_spark.functions import avi


def _frame(w, h, salt=0):
    return bytes((salt + i * 7) % 256 for i in range(3 * w * h))


def test_roundtrip_multi_frame():
    w, h = 5, 3  # odd width exercises the 4-byte row stride padding
    frames = [_frame(w, h), _frame(w, h, salt=11)]
    data = avi.encode_rgb24(w, h, frames)
    W, H, us, out = avi.decode_rgb24(data)
    assert (W, H, us) == (w, h, 40_000)
    assert out == frames


def test_stride_padding_not_counted():
    # width 1: stride pads 3 -> 4 bytes/row; pad bytes must not leak into
    # frames or stats
    data = avi.encode_rgb24(1, 2, [bytes([10, 20, 30, 40, 50, 60])])
    _, _, _, frames = avi.decode_rgb24(data)
    assert frames == [bytes([10, 20, 30, 40, 50, 60])]
    *_, luma = avi.decode_stats(data)
    assert luma == (10 + 20 + 30 + 40 + 50 + 60) / 6 / 255.0


def test_decode_stats_exact():
    w, h = 2, 2
    f0 = bytes([0] * 6 + [255] * 6)
    data = avi.encode_rgb24(w, h, [f0], us_per_frame=20_000)
    width, height, nf, dur, luma = avi.decode_stats(data)
    assert (width, height, nf) == (2, 2, 1)
    assert dur == 20_000 / 1_000_000
    assert luma == (255 * 6) / 12 / 255.0


def test_wrong_frame_size_raises():
    with pytest.raises(ValueError):
        avi.encode_rgb24(4, 4, [b"\x00" * 5])


def test_not_riff_and_not_avi_raise_valueerror():
    with pytest.raises(ValueError):
        avi.decode_rgb24(b"\x89PNG not video")
    with pytest.raises(ValueError):
        avi.decode_rgb24(b"RIFF" + struct.pack("<I", 4) + b"WAVE")


def test_compressed_chunk_is_notimplemented():
    data = avi.encode_rgb24(3, 3, [_frame(3, 3)])
    with pytest.raises(NotImplementedError):
        avi.decode_rgb24(data.replace(b"00db", b"00dc", 1))


def test_truncated_container_is_valueerror():
    data = avi.encode_rgb24(3, 3, [_frame(3, 3)])
    with pytest.raises(ValueError):
        avi.decode_rgb24(data[:-8])


def test_decode_video_stage_real_path(spark):
    """The production Arrow-batched stage returns the codec's exact numbers
    for real AVI payloads and the deterministic stub for others."""
    from etl_housing_spark.operators.multimodal import decode_video

    w, h = 4, 2
    frames = [_frame(w, h), _frame(w, h, salt=5)]
    rows = [(1, avi.encode_rgb24(w, h, frames)), (2, b"not video at all")]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r["media_id"]: r for r in decode_video(df).collect()}
    real = out[1]
    assert (real["width"], real["height"], real["n_frames"]) == (w, h, 2)
    assert real["duration_s"] == 2 * 40_000 / 1_000_000
    total = sum(sum(f) for f in frames)
    assert real["mean_luma"] == total / (3 * w * h * 2) / 255.0
    assert out[2]["n_frames"] >= 1  # stub branch, deterministic


def test_frame_sample_real_demux(spark):
    """frame_sample must return the ACTUAL decoded frame bytes for AVI
    payloads (top-down RGB), at the sampled indices only."""
    from pyspark.sql import functions as F

    from etl_housing_spark.operators.multimodal import frame_sample

    w, h = 3, 2
    frames = [_frame(w, h, salt=s) for s in (0, 1, 2, 3)]
    payload = avi.encode_rgb24(w, h, frames)
    df = spark.createDataFrame([(7, payload)], "media_id bigint, payload binary").select(
        "media_id",
        "payload",
        F.struct(
            F.lit("video/avi").alias("format"),
            F.lit(w).alias("width"),
            F.lit(h).alias("height"),
            F.lit(len(frames)).alias("n_frames"),
        ).alias("meta"),
    )
    got = {r["frame_idx"]: bytes(r["frame_payload"]) for r in frame_sample(df, every_n=2).collect()}
    assert set(got) == {0, 2}
    assert got[0] == frames[0] and got[2] == frames[2]


def test_decode_audio_routes_avi_to_stub_not_wave_error(spark):
    """RIFF is shared by WAV and AVI: an AVI payload through decode_AUDIO
    must take the stub branch (strict=False), not die inside the wave
    parser — the is_wav/is_avi fourcc checks are the dispatch contract."""
    from etl_housing_spark.operators.multimodal import decode_audio

    payload = avi.encode_rgb24(3, 2, [_frame(3, 2)])
    df = spark.createDataFrame([(1, payload)], "media_id bigint, payload binary")
    row = decode_audio(df).collect()[0]
    assert row["sample_rate"] == 8000  # deterministic stub branch


def test_decode_video_malformed_avi_takes_stub_unless_strict(spark):
    from pyspark.errors.exceptions.base import PySparkException

    from etl_housing_spark.operators.multimodal import decode_video

    truncated = avi.encode_rgb24(3, 2, [_frame(3, 2)])[:-8]
    df = spark.createDataFrame([(1, truncated)], "media_id bigint, payload binary")
    row = decode_video(df).collect()[0]  # stub, not a dead task
    assert row["n_frames"] >= 1
    with pytest.raises(PySparkException):
        decode_video(df, strict=True).collect()


def _riff_avi(body: bytes) -> bytes:
    body = b"AVI " + body
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_undersized_avih_is_valueerror_not_struct_error():
    """A crafted avih chunk shorter than its 56-byte layout must raise the
    documented ValueError — struct.error would escape decode_video's
    isolation; in a longer file the old code would silently unpack bytes of
    the FOLLOWING chunk (misparse)."""
    short_avih = b"avih" + struct.pack("<I", 8) + b"\x00" * 8
    with pytest.raises(ValueError):
        avi.decode_rgb24(_riff_avi(short_avih))


def test_undersized_avih_followed_by_data_does_not_misparse():
    # avih declares 8 bytes; 56+ bytes of other chunks follow — the old
    # unpack_from would read into them and fabricate dimensions.
    short_avih = b"avih" + struct.pack("<I", 8) + b"\x00" * 8
    junk = b"JUNK" + struct.pack("<I", 64) + b"\x07" * 64
    with pytest.raises(ValueError):
        avi.decode_rgb24(_riff_avi(short_avih + junk))


def test_undersized_strf_is_valueerror():
    data = avi.encode_rgb24(3, 2, [_frame(3, 2)])
    # shrink the strf declared length below the 40-byte BITMAPINFOHEADER
    i = data.index(b"strf")
    crafted = data[: i + 4] + struct.pack("<I", 16) + data[i + 8 :]
    with pytest.raises(ValueError):
        avi.decode_rgb24(crafted)


def test_decode_video_undersized_avih_takes_stub_unless_strict(spark):
    from etl_housing_spark.operators.multimodal import decode_video

    short_avih = b"avih" + struct.pack("<I", 8) + b"\x00" * 8
    df = spark.createDataFrame(
        [(1, _riff_avi(short_avih))], "media_id bigint, payload binary"
    )
    row = decode_video(df).collect()[0]  # stub, not a dead task
    assert row["n_frames"] >= 1


def test_frame_sample_inflated_metadata_drops_rows_unless_strict(spark):
    """meta.n_frames exceeding the real frame count must not kill the task
    in non-strict mode (the decode_audio/decode_video isolation contract):
    out-of-range indices are dropped; strict=True still fails loudly."""
    from pyspark.errors.exceptions.base import PySparkException
    from pyspark.sql import functions as F

    from etl_housing_spark.operators.multimodal import frame_sample

    w, h = 3, 2
    frames = [_frame(w, h, salt=s) for s in (0, 1)]
    payload = avi.encode_rgb24(w, h, frames)
    df = spark.createDataFrame([(7, payload)], "media_id bigint, payload binary").select(
        "media_id",
        "payload",
        F.struct(
            F.lit("video/avi").alias("format"),
            F.lit(w).alias("width"),
            F.lit(h).alias("height"),
            F.lit(6).alias("n_frames"),  # container holds only 2
        ).alias("meta"),
    )
    got = {r["frame_idx"]: bytes(r["frame_payload"]) for r in frame_sample(df, every_n=1).collect()}
    assert set(got) == {0, 1}  # indices 2..5 dropped, task alive
    assert got[0] == frames[0] and got[1] == frames[1]
    with pytest.raises(PySparkException):
        frame_sample(df, every_n=1, strict=True).collect()


def test_frame_sample_malformed_avi_skipped_unless_strict(spark):
    from pyspark.errors.exceptions.base import PySparkException
    from pyspark.sql import functions as F

    from etl_housing_spark.operators.multimodal import frame_sample

    truncated = avi.encode_rgb24(3, 2, [_frame(3, 2)])[:-8]
    df = spark.createDataFrame([(1, truncated)], "media_id bigint, payload binary").select(
        "media_id",
        "payload",
        F.struct(
            F.lit("video/avi").alias("format"),
            F.lit(3).alias("width"),
            F.lit(2).alias("height"),
            F.lit(1).alias("n_frames"),
        ).alias("meta"),
    )
    assert frame_sample(df, every_n=1).collect() == []  # isolated, task alive
    with pytest.raises(PySparkException):
        frame_sample(df, every_n=1, strict=True).collect()
