"""Minimal pure-stdlib PNG codec (zlib + struct).

The multimodal decode stage (operators/multimodal.py) routes real PNG/JPEG
payloads to Pillow when it is importable; this container ships no Pillow, so
the real-codec branch previously never executed anywhere. This module
implements just enough of the public PNG specification (RFC 2083) to close
that gap without native libraries: 8-bit greyscale / RGB / RGBA,
non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth).
It is a correctness fixture, not a performance path — real deployments wire
Pillow/libjpeg on the workers and this module is never consulted
(``operators.multimodal._decode_real`` tries PIL first).

Encoding (test fixtures) writes filter-0 scanlines; decoding handles any
filter so externally-produced baseline PNGs parse too.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


_COLOR_TYPE = {1: 0, 3: 2, 4: 6}  # channels -> PNG color type


def _encode(width: int, height: int, channels: int, samples: bytes) -> bytes:
    """The one encoder body: 8-bit, non-interlaced, filter 0 on every
    scanline — parametrized by channel count so grey/RGB/RGBA share it."""
    if channels not in _COLOR_TYPE:
        raise NotImplementedError(f"unsupported channel count {channels}")
    if width < 1 or height < 1:
        # decode() rejects zero-dimension images; refusing to emit them
        # keeps the encode->decode round-trip symmetric
        raise ValueError(f"invalid dimensions {width}x{height}")
    if len(samples) != channels * width * height:
        raise ValueError(
            f"need {channels * width * height} bytes, got {len(samples)}"
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0
    )
    stride = channels * width
    raw = b"".join(
        b"\x00" + samples[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def encode_gray(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit greyscale, non-interlaced, filter 0 on every scanline."""
    return _encode(width, height, 1, pixels)


def encode_rgb(width: int, height: int, pixels: bytes) -> bytes:
    """8-bit RGB (color type 2), non-interlaced, filter 0 on every
    scanline — ``pixels`` is row-major interleaved RGB triplets."""
    return _encode(width, height, 3, pixels)


def encode_samples(width: int, height: int, channels: int, samples: bytes) -> bytes:
    """Encode interleaved 8-bit samples at the given channel count — the
    inverse of :func:`decode` for every flavor it reads (1 = grey,
    3 = RGB, 4 = RGBA), so decode→transform→encode round-trips any
    supported payload."""
    return _encode(width, height, channels, samples)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG → (width, height, channels, interleaved 8-bit samples).

    Supports 8-bit depth, color types 0 (grey) / 2 (RGB) / 6 (RGBA),
    non-interlaced. Anything else raises NotImplementedError — that subset
    is the declared fixture boundary, not a silent wrong answer.
    """
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG byte stream")
    pos, width = 8, 0
    height = depth = ctype = interlace = 0
    idat = bytearray()
    try:
        while pos < len(data):
            (length,) = struct.unpack_from(">I", data, pos)
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            pos += 12 + length
            if tag == b"IHDR":
                if len(body) < 13:
                    raise ValueError("PNG IHDR chunk is undersized")
                width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                    ">IIBBBBB", body[:13]
                )
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
    except struct.error as e:
        # truncated chunk header: surface the documented ValueError so the
        # mapInPandas stages' per-payload isolation catches it (the wav.py
        # EOFError / avi.py struct.error lesson, applied to the third codec)
        raise ValueError(f"truncated PNG chunk stream: {e}") from e
    if depth != 8 or ctype not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"pure-python PNG fixture decodes 8-bit grey/RGB/RGBA non-interlaced "
            f"only (got depth={depth} color_type={ctype} interlace={interlace}) "
            f"— install Pillow for full coverage"
        )
    if width == 0 or height == 0:
        # a zero-dimension image is consistent with an empty IDAT and would
        # pass the scanline-length check, then crash consumers downstream
        # (mean of 0 samples, 0-size numpy gather) outside their documented
        # ValueError isolation — reject it at the codec boundary
        raise ValueError(f"PNG declares zero dimension ({width}x{height})")
    ch = _CHANNELS[ctype]
    stride = width * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG scanline payload has the wrong length")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, ch, bytes(out)


def decode_gray_stats(data: bytes) -> tuple[int, int, float]:
    """(width, height, mean sample value in [0, 1]) for a greyscale PNG —
    the exact quantity operators.multimodal's decode stage reports. For
    grey input this matches PIL's ``convert('L')`` identity conversion
    bit-for-bit; color inputs raise (PIL's ITU-R 601-2 luma rounding is
    not replicated here — that stays the Pillow path)."""
    width, height, ch, samples = decode(data)
    if ch != 1:
        raise NotImplementedError(
            "mean-luma without Pillow is defined for greyscale PNGs only"
        )
    return width, height, (sum(samples) / len(samples)) / 255.0
