"""Minimal pure-stdlib WAV (RIFF/PCM) codec — the audio twin of
functions/png.py.

The multimodal decode stage (operators/multimodal.py) routes real audio
payloads here: the stdlib ``wave`` module is a complete RIFF/WAVE-PCM
container parser, so unlike images no third-party codec is needed at all —
16-bit PCM decode is real end to end in this container. Anything that is
not integer PCM (float32 WAV, compressed codecs like MP3/FLAC/OGG) raises
``NotImplementedError`` — that is the declared boundary where a real
deployment wires librosa/soundfile on the workers.

Encoding (test fixtures) writes mono 16-bit little-endian PCM; decoding
handles any channel count the ``wave`` module accepts.
"""

from __future__ import annotations

import io
import math
import struct
import wave

RIFF_MAGIC = b"RIFF"
_WAVE_FOURCC = b"WAVE"


def is_wav(data: bytes) -> bool:
    """True when the payload is a RIFF/WAVE container — the dispatch
    predicate the multimodal decode stages use. RIFF alone is not enough:
    AVI video shares the RIFF magic (functions/avi.py)."""
    return data[:4] == RIFF_MAGIC and data[8:12] == _WAVE_FOURCC


def encode_pcm16(sample_rate: int, samples: list[int] | bytes) -> bytes:
    """Mono 16-bit PCM WAV from a list of int16 samples (or pre-packed
    little-endian bytes)."""
    if isinstance(samples, (list, tuple)):
        frames = struct.pack(f"<{len(samples)}h", *samples)
    else:
        frames = bytes(samples)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(frames)
    return buf.getvalue()


def decode_pcm16(data: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a PCM WAV → (n_channels, sample_rate, n_frames, interleaved
    int16 samples). 16-bit integer PCM only — float/compressed payloads
    raise NotImplementedError (the honestly-declared codec boundary)."""
    if data[:4] != RIFF_MAGIC:
        raise ValueError("not a RIFF/WAV byte stream")
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            sample_rate = w.getframerate()
            n_frames = w.getnframes()
            frames = w.readframes(n_frames)
    except wave.Error as e:  # compressed / non-PCM RIFF payloads
        raise NotImplementedError(
            f"stdlib wave decodes uncompressed PCM only ({e}) — wire "
            "librosa/soundfile for compressed audio"
        ) from None
    except EOFError:
        # chunk.py raises bare EOFError on a truncated chunk header (e.g. a
        # RIFF/WAVE prefix whose fmt chunk is cut short). That must stay a
        # per-payload ValueError, not escape and kill the mapInPandas task.
        raise ValueError(
            "truncated WAV: chunk header ends before its declared length"
        ) from None
    except RuntimeError:
        # chunk.py's skip()/seek() raises bare RuntimeError when a chunk's
        # declared size sends the read position outside the stream (found
        # by the hypothesis fuzz in tests/test_codec_props.py) — the same
        # per-payload boundary as EOFError above.
        raise ValueError(
            "malformed WAV: chunk size points outside the byte stream"
        ) from None
    if sampwidth != 2:
        raise NotImplementedError(
            f"pure-stdlib WAV fixture decodes 16-bit PCM only (got "
            f"{8 * sampwidth}-bit) — wire soundfile for other depths"
        )
    n = n_frames * n_channels
    if len(frames) < 2 * n:
        # A header promising more frames than the data chunk holds is a
        # malformed payload, not a codec gap — fail the one payload with the
        # documented ValueError instead of letting struct.error escape and
        # kill the whole mapInPandas task.
        raise ValueError(
            f"truncated WAV: header declares {n} samples "
            f"({2 * n} bytes) but data chunk holds {len(frames)} bytes"
        )
    samples = list(struct.unpack(f"<{n}h", frames[: 2 * n]))
    return n_channels, sample_rate, n_frames, samples


def decode_stats(data: bytes) -> tuple[int, int, int, float, float]:
    """(n_channels, sample_rate, n_samples, duration_s, rms) for a PCM WAV —
    the exact quantities operators.multimodal's audio decode stage reports.
    RMS is over all interleaved samples, normalized by int16 full scale
    (32768), computed as sqrt(Σv² / n) / 32768 with the integer Σv² exact —
    the same operand order the SQL oracle uses, so the value hash-matches."""
    n_channels, sample_rate, n_frames, samples = decode_pcm16(data)
    if sample_rate <= 0:
        # A crafted header can carry rate 0; keep the failure inside the
        # documented ValueError boundary rather than ZeroDivisionError.
        raise ValueError(f"invalid WAV sample rate {sample_rate}")
    n = len(samples)
    duration_s = n_frames / sample_rate
    sumsq = sum(v * v for v in samples)  # exact int (≲ 2^53 for any fixture)
    rms = math.sqrt(sumsq / n) / 32768.0 if n else 0.0
    return n_channels, sample_rate, n, duration_s, rms
