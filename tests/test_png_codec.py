"""Pure-stdlib PNG codec (functions/png.py) — the codec-free fixture that
lets the multimodal real-decode branch run in this container.

Round-trips cover the encoder's filter-0 output; hand-built IDAT streams
cover every scanline filter type (Sub/Up/Average/Paeth), since the encoder
never emits them but externally-produced PNGs do.
"""

from __future__ import annotations

import struct
import zlib

import pytest

from etl_housing_spark.functions import png


def test_roundtrip_gradient():
    pixels = bytes(range(0, 250, 10)) * 4  # 25 px/row * 4 rows
    data = png.encode_gray(25, 4, pixels)
    w, h, ch, out = png.decode(data)
    assert (w, h, ch) == (25, 4, 1)
    assert out == pixels


def test_gray_stats_exact():
    pixels = bytes([0, 255, 128, 64])
    data = png.encode_gray(2, 2, pixels)
    w, h, mean = png.decode_gray_stats(data)
    assert (w, h) == (2, 2)
    assert mean == (0 + 255 + 128 + 64) / 4 / 255.0


def _png_from_filtered(width, height, ch, raw_scanlines, color_type):
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(raw_scanlines))
        + png._chunk(b"IEND", b"")
    )


def test_sub_filter():
    # row [10, 20, 30] as Sub deltas: 10, +10, +10
    data = _png_from_filtered(3, 1, 1, bytes([1, 10, 10, 10]), 0)
    assert png.decode(data)[3] == bytes([10, 20, 30])


def test_up_filter():
    # row0 = [5, 6]; row1 = row0 + [1, 2] via Up
    data = _png_from_filtered(2, 2, 1, bytes([0, 5, 6, 2, 1, 2]), 0)
    assert png.decode(data)[3] == bytes([5, 6, 6, 8])


def test_average_filter():
    # row0 = [10, 20]; row1 Average: x0 = 4 + (0+10)//2 = 9; x1 = 3 + (9+20)//2 = 17
    data = _png_from_filtered(2, 2, 1, bytes([0, 10, 20, 3, 4, 3]), 0)
    assert png.decode(data)[3] == bytes([10, 20, 9, 17])


def test_paeth_filter():
    # row0 = [10, 20]; row1 Paeth: x0 pred=up(10) -> 12; x1 pred(left=12,up=20,ul=10)
    # p=22, closest is up(20) -> 25
    data = _png_from_filtered(2, 2, 1, bytes([0, 10, 20, 4, 2, 5]), 0)
    assert png.decode(data)[3] == bytes([10, 20, 12, 25])


def test_rgb_decode():
    # one row, two RGB pixels, filter 0
    samples = bytes([255, 0, 0, 0, 255, 0])
    data = _png_from_filtered(2, 1, 3, b"\x00" + samples, 2)
    w, h, ch, out = png.decode(data)
    assert (w, h, ch) == (2, 1, 3)
    assert out == samples


def test_unsupported_flavors_are_declared():
    ihdr = struct.pack(">IIBBBBB", 2, 1, 4, 0, 0, 0, 0)  # 4-bit depth
    bad = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="8-bit"):
        png.decode(bad)
    with pytest.raises(ValueError, match="not a PNG"):
        png.decode(b"GIF89a")


def test_rgb_luma_stays_pillow_boundary():
    samples = bytes([1, 2, 3, 4, 5, 6])
    data = _png_from_filtered(2, 1, 3, b"\x00" + samples, 2)
    with pytest.raises(NotImplementedError, match="greyscale"):
        png.decode_gray_stats(data)


def test_matches_pillow_when_available():
    try:
        from PIL import Image
    except ImportError:
        pytest.skip("Pillow absent — cross-check runs where it is installed")
    import io

    pixels = bytes(range(100))
    buf = io.BytesIO()
    Image.frombytes("L", (10, 10), pixels).save(buf, format="PNG")
    w, h, mean = png.decode_gray_stats(buf.getvalue())
    assert (w, h) == (10, 10)
    assert mean == sum(pixels) / 100 / 255.0


def test_malformed_payloads_raise_the_documented_valueerror():
    # truncated chunk header → struct.error internally, must surface as
    # ValueError (the wav EOFError / avi struct.error lesson on codec #3)
    with pytest.raises(ValueError, match="truncated"):
        png.decode(b"\x89PNG\r\n\x1a\n" + b"\x00\x00")
    # undersized IHDR body (declared length bigger than the bytes present)
    with pytest.raises(ValueError, match="IHDR"):
        png.decode(b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + b"\x01" * 5)
    with pytest.raises(ValueError, match="IHDR"):
        png.decode(b"\x89PNG\r\n\x1a\n" + png._chunk(b"IHDR", b"\x01" * 5))
    # garbage IDAT → zlib.error internally, must surface as ValueError
    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0)
    corrupt = (
        b"\x89PNG\r\n\x1a\n"
        + png._chunk(b"IHDR", ihdr)
        + png._chunk(b"IDAT", b"\xde\xad\xbe\xef")
        + png._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT"):
        png.decode(corrupt)


def test_encode_samples_roundtrips_all_channel_counts():
    for ch in (1, 3, 4):
        samples = bytes((i * 7 + ch) % 256 for i in range(5 * 4 * ch))
        data = png.encode_samples(5, 4, ch, samples)
        w, h, rch, out = png.decode(data)
        assert (w, h, rch) == (5, 4, ch) and out == samples
    with pytest.raises(NotImplementedError):
        png.encode_samples(2, 2, 2, bytes(8))


def test_encode_rejects_zero_dimensions():
    """decode() rejects zero-dimension PNGs, so encode must refuse to emit
    them — round-trip symmetry (ADVICE r10)."""
    import pytest

    from etl_housing_spark.functions import png

    for w, h in [(0, 4), (4, 0), (0, 0)]:
        with pytest.raises(ValueError, match="dimensions"):
            png._encode(w, h, 1, b"")
