"""Minimal no-media-library AVI (RIFF) codec for uncompressed BI_RGB video —
the video twin of functions/wav.py (audio) and functions/png.py (images).
Container parsing is pure stdlib ``struct``; the per-pixel row repack is
numpy-vectorized (numpy is a core project dependency, not a media library
— the Pillow/PyAV boundary is unchanged).

An AVI container with 24-bit uncompressed DIB frames is pure ``struct``
arithmetic — RIFF chunk walking plus BITMAPINFOHEADER row unpacking — so,
like PCM WAV, the video decode path is REAL end to end in codec-free
containers: container demux, frame extraction, and pixel access all work
without ffmpeg/PyAV. Anything compressed (MJPEG '00dc' chunks, biCompression
!= BI_RGB, e.g. H.264/VP9) raises ``NotImplementedError`` — the declared
boundary where a real deployment wires PyAV/ffmpeg on the workers.

Encoding (test fixtures) writes 24-bit BGR bottom-up DIB frames in a
spec-complete RIFF: hdrl (avih + strl{strh,strf}) then movi with one '00db'
chunk per frame. Decoding handles any conforming single-video-stream
BI_RGB AVI and normalizes frames to tightly-packed top-down RGB.

Reference parity: the reference repo has no video surface at all
(SURVEY.md §2.13 extension); this exists for the multimodal column family
a training-data pipeline needs.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"
_AVI_FOURCC = b"AVI "
_BI_RGB = 0


def is_avi(data: bytes) -> bool:
    """True when the payload is a RIFF/AVI container — the dispatch
    predicate the multimodal decode stages use (RIFF alone is ambiguous:
    WAV audio shares the magic, functions/wav.py)."""
    return data[:4] == RIFF_MAGIC and data[8:12] == _AVI_FOURCC


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def _stride(width: int) -> int:
    return ((3 * width + 3) // 4) * 4  # DIB rows pad to 4-byte boundaries


def encode_rgb24(
    width: int, height: int, frames: list[bytes], us_per_frame: int = 40_000
) -> bytes:
    """Uncompressed 24-bit AVI from top-down tightly-packed RGB frames
    (len == 3*width*height each). 25 fps by default."""
    stride = _stride(width)
    dib_frames = []
    for f in frames:
        if len(f) != 3 * width * height:
            raise ValueError(
                f"frame holds {len(f)} bytes, expected {3 * width * height}"
            )
        # vectorized row flip (DIB stores bottom-up) + RGB->BGR swap +
        # stride padding — byte-identical to the per-pixel loop it
        # replaced, ~10x faster on the fingerprint hot path
        arr = np.frombuffer(f, dtype=np.uint8).reshape(height, width, 3)
        bgr = arr[::-1, :, ::-1].reshape(height, 3 * width)
        if stride > 3 * width:
            padded = np.zeros((height, stride), dtype=np.uint8)
            padded[:, : 3 * width] = bgr
            dib_frames.append(padded.tobytes())
        else:
            dib_frames.append(np.ascontiguousarray(bgr).tobytes())

    frame_bytes = stride * height
    avih = struct.pack(
        "<14I",
        us_per_frame, frame_bytes * 25, 0, 0,  # µs/frame, max bps, pad, flags
        # flags=0: no AVIF_HASINDEX (0x10) — we write no idx1 chunk, and
        # advertising an index that does not exist breaks index-trusting
        # demuxers (ffmpeg/PyAV, the documented production boundary)
        len(frames), 0, 1, frame_bytes,  # total frames, initial, streams, sug buffer
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIIi4H",
            0, 0, 0, 0,  # flags, prio+lang, initial frames
            1, 1_000_000 // us_per_frame,  # scale, rate (fps)
            0, len(frames), frame_bytes, 0, frame_bytes,  # start, length, sug, quality, sample size
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24, _BI_RGB, frame_bytes, 0, 0, 0, 0,
    )
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00db", f) for f in dib_frames))
    body = _AVI_FOURCC + hdrl + movi
    return RIFF_MAGIC + struct.pack("<I", len(body)) + body


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) for chunks in [start, end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + ln > end:
            raise ValueError("truncated AVI: chunk overruns container")
        yield fourcc, payload, ln
        pos = payload + ln + (ln % 2)  # chunks are word-aligned


def decode_rgb24(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode an uncompressed BI_RGB AVI → (width, height, us_per_frame,
    frames as top-down tightly-packed RGB bytes). Compressed streams raise
    NotImplementedError (the declared PyAV/ffmpeg boundary); malformed
    containers raise ValueError."""
    if data[:4] != RIFF_MAGIC:
        raise ValueError("not a RIFF byte stream")
    if data[8:12] != _AVI_FOURCC:
        raise ValueError("RIFF container is not AVI")
    (riff_len,) = struct.unpack_from("<I", data, 4)
    end = min(len(data), 8 + riff_len)

    width = height = None
    us_per_frame = 40_000
    bit_count = compression = None
    raw_frames: list[bytes] = []

    def walk_list(start: int, stop: int) -> None:
        nonlocal width, height, us_per_frame, bit_count, compression
        for fourcc, p, ln in _walk(data, start, stop):
            if fourcc == b"LIST":
                walk_list(p + 4, p + ln)
            elif fourcc == b"avih":
                if ln < 56:
                    # An undersized avih would either raise struct.error or —
                    # worse, in a longer file — silently read bytes of the
                    # following chunk. 14 little-endian u32s = 56 bytes.
                    raise ValueError(
                        f"malformed AVI: avih chunk is {ln} bytes (< 56)"
                    )
                vals = struct.unpack_from("<14I", data, p)
                us_per_frame = vals[0] or us_per_frame
                width, height = vals[8], vals[9]
            elif fourcc == b"strf":
                if ln < 40:
                    raise ValueError(
                        f"malformed AVI: strf chunk is {ln} bytes (< 40)"
                    )
                (_, bw, bh, _, bc, comp) = struct.unpack_from("<IiiHHI", data, p)
                bit_count, compression = bc, comp
            elif fourcc == b"00db":
                raw_frames.append(data[p : p + ln])
            elif fourcc == b"00dc":
                raise NotImplementedError(
                    "compressed AVI stream ('00dc' chunks) — wire PyAV/ffmpeg "
                    "for MJPEG/H.264; stdlib decodes BI_RGB only"
                )

    walk_list(12, end)
    if width is None or height is None or width <= 0 or height <= 0:
        raise ValueError("AVI missing/invalid avih dimensions")
    if compression not in (None, _BI_RGB):
        raise NotImplementedError(
            f"AVI biCompression={compression} — stdlib decodes BI_RGB (0) only"
        )
    if bit_count not in (None, 24):
        raise NotImplementedError(
            f"{bit_count}-bit DIB frames — stdlib fixture decodes 24-bit only"
        )
    stride = _stride(width)
    frames = []
    for raw in raw_frames:
        if len(raw) < stride * height:
            raise ValueError(
                f"truncated DIB frame: {len(raw)} bytes < {stride * height}"
            )
        # vectorized bottom-up -> top-down flip + BGR->RGB swap (strip the
        # stride padding on the way) — byte-identical to the per-pixel
        # loop it replaced; this was the dominant per-clip cost of the
        # video fingerprint pass (r13 sf30 root-cause)
        arr = np.frombuffer(raw, dtype=np.uint8, count=stride * height)
        rows_ = arr.reshape(height, stride)[::-1, : 3 * width]
        frames.append(
            np.ascontiguousarray(rows_.reshape(height, width, 3)[:, :, ::-1]).tobytes()
        )
    return width, height, us_per_frame, frames


def decode_stats(data: bytes) -> tuple[int, int, int, float, float]:
    """(width, height, n_frames, duration_s, mean_luma) for a BI_RGB AVI —
    the quantities the decode_video stage reports. mean_luma is the average
    over every RGB channel byte of every frame, normalized by 255, computed
    as exact-int Σbytes / n_bytes / 255.0 — the operand order the SQL
    oracle mirrors (for grayscale fixtures Σbytes = 3·Σv and n_bytes =
    3·w·h·n, so the quotient equals Σv/(w·h·n) exactly as a rational and
    therefore bit-identically as a double)."""
    width, height, us_per_frame, frames = decode_rgb24(data)
    n_frames = len(frames)
    duration_s = n_frames * us_per_frame / 1_000_000
    n_bytes = 3 * width * height * n_frames
    sum_bytes = sum(sum(f) for f in frames)  # exact int
    mean_luma = sum_bytes / n_bytes / 255.0 if n_bytes else 0.0
    return width, height, n_frames, duration_s, mean_luma
