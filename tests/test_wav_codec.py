"""Pure-stdlib WAV codec (functions/wav.py) + the decode_audio stage.

Round-trips cover encode_pcm16 → decode_pcm16/decode_stats; malformed
payloads (truncated data chunk, zero sample rate, non-RIFF, non-PCM-16)
must fail inside the documented ValueError/NotImplementedError boundary so
a single bad payload never kills a whole mapInPandas task with an
unclassified struct.error/ZeroDivisionError.
"""

from __future__ import annotations

import io
import math
import struct
import wave

import pytest

from etl_housing_spark.functions import wav


def test_roundtrip_mono():
    samples = [0, 1000, -1000, 32767, -32768, 5]
    data = wav.encode_pcm16(44100, samples)
    ch, rate, n_frames, out = wav.decode_pcm16(data)
    assert (ch, rate, n_frames) == (1, 44100, len(samples))
    assert out == samples


def test_roundtrip_prepacked_bytes():
    frames = struct.pack("<4h", 1, -2, 3, -4)
    data = wav.encode_pcm16(8000, frames)
    assert wav.decode_pcm16(data)[3] == [1, -2, 3, -4]


def test_decode_stats_exact():
    samples = [3, -4]  # sum v^2 = 25, rms = sqrt(25/2)/32768
    data = wav.encode_pcm16(8000, samples)
    ch, rate, n, dur, rms = wav.decode_stats(data)
    assert (ch, rate, n) == (1, 8000, 2)
    assert dur == 2 / 8000
    assert rms == math.sqrt(25 / 2) / 32768.0


def test_stereo_decode():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(struct.pack("<6h", 1, 2, 3, 4, 5, 6))
    ch, rate, n_frames, samples = wav.decode_pcm16(buf.getvalue())
    assert (ch, rate, n_frames) == (2, 16000, 3)
    assert samples == [1, 2, 3, 4, 5, 6]  # interleaved


def test_not_riff_raises_valueerror():
    with pytest.raises(ValueError):
        wav.decode_pcm16(b"\x89PNG not audio")


def test_truncated_data_chunk_is_valueerror_not_struct_error():
    data = bytearray(wav.encode_pcm16(8000, [1, 2, 3, 4]))
    # wave writes the fact-correct header; chop the data chunk short and
    # patch the RIFF size so the container still parses but frames run out.
    truncated = bytes(data[:-4])
    # stdlib wave may reject the short chunk itself (wave.Error/EOFError at
    # open); if it tolerates it, our explicit truncation guard must fire —
    # never a bare struct.error.
    with pytest.raises((ValueError, EOFError, wave.Error, NotImplementedError)):
        wav.decode_pcm16(truncated)


def test_zero_sample_rate_is_valueerror_not_zerodivision():
    # Hand-build a minimal RIFF/WAVE with fmt.sample_rate = 0 — stdlib wave
    # refuses to WRITE it but will read it.
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    frames = struct.pack("<2h", 7, -7)
    payload = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    data = b"RIFF" + struct.pack("<I", len(payload)) + payload
    with pytest.raises(ValueError):
        wav.decode_stats(data)


def test_24bit_is_notimplemented():
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(3)
        w.setframerate(8000)
        w.writeframes(b"\x00\x00\x01" * 2)
    with pytest.raises(NotImplementedError):
        wav.decode_pcm16(buf.getvalue())


def test_decode_audio_stage_real_path(spark):
    """The production Arrow-batched decode stage returns the codec's exact
    numbers for real WAV payloads and the deterministic stub for others."""
    from etl_housing_spark.operators.multimodal import decode_audio

    samples = [100, -200, 300]
    rows = [
        (1, wav.encode_pcm16(8000, samples)),
        (2, b"not audio at all"),
    ]
    df = spark.createDataFrame(rows, "media_id bigint, payload binary")
    out = {r["media_id"]: r for r in decode_audio(df).collect()}
    real = out[1]
    assert (real["n_channels"], real["sample_rate"], real["n_samples"]) == (1, 8000, 3)
    assert real["duration_s"] == 3 / 8000
    sumsq = sum(v * v for v in samples)
    assert real["rms"] == math.sqrt(sumsq / 3) / 32768.0
    assert out[2]["sample_rate"] == 8000  # stub branch, deterministic


def test_decode_audio_strict_raises_on_synthetic(spark):
    from pyspark.errors.exceptions.base import PySparkException

    from etl_housing_spark.operators.multimodal import decode_audio

    df = spark.createDataFrame([(1, b"synthetic")], "media_id bigint, payload binary")
    with pytest.raises(PySparkException, match="NotImplementedError"):
        decode_audio(df, strict=True).collect()


def test_truncated_chunk_header_is_valueerror_not_eoferror():
    """A RIFF/WAVE prefix whose fmt chunk header is cut short makes stdlib
    chunk.py raise a BARE EOFError — which would escape decode_audio's
    (ValueError, NotImplementedError) isolation and kill the whole task.
    decode_pcm16 must reclassify it as the documented ValueError."""
    payload = b"RIFF\xff\xff\x00\x00WAVEfmt \x10\x00\x00\x00"
    with pytest.raises(ValueError):
        wav.decode_pcm16(payload)


def test_decode_audio_truncated_chunk_header_takes_stub(spark):
    """End-to-end: the EOFError-shaped payload through the production stage
    must land in the deterministic stub (strict=False), not a dead task."""
    from etl_housing_spark.operators.multimodal import decode_audio

    payload = b"RIFF\xff\xff\x00\x00WAVEfmt \x10\x00\x00\x00"
    df = spark.createDataFrame([(1, payload)], "media_id bigint, payload binary")
    row = decode_audio(df).collect()[0]
    assert row["sample_rate"] == 8000  # stub branch, not EOFError
