"""Property-based codec-boundary tests (hypothesis, pure Python — no Spark).

The multimodal isolation contract (operators/multimodal.py) rests on one
invariant: every codec entry point raises ONLY the documented
ValueError / NotImplementedError on arbitrary malformed bytes — never
struct.error, zlib.error, EOFError, ZeroDivisionError or IndexError, which
would escape the mapInPandas per-payload handlers and kill the whole task.
These properties fuzz that boundary directly, plus the round-trip laws the
real paths must satisfy (encode->decode identity, resize-to-same-dims
identity, floor-mapping spot values).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_housing_spark.functions import avi, png, wav

_ALLOWED = (ValueError, NotImplementedError)


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_png_decode_raises_only_documented_errors(junk):
    try:
        png.decode(b"\x89PNG\r\n\x1a\n" + junk)
    except _ALLOWED:
        pass


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_png_gray_stats_raises_only_documented_errors(junk):
    try:
        png.decode_gray_stats(b"\x89PNG\r\n\x1a\n" + junk)
    except _ALLOWED:
        pass


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_wav_decode_raises_only_documented_errors(junk):
    payload = b"RIFF" + junk[:4].ljust(4, b"\x00") + b"WAVE" + junk
    try:
        wav.decode_stats(payload)
    except _ALLOWED:
        pass


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_avi_decode_raises_only_documented_errors(junk):
    payload = b"RIFF" + junk[:4].ljust(4, b"\x00") + b"AVI " + junk
    try:
        avi.decode_stats(payload)
    except _ALLOWED:
        pass


@settings(max_examples=50, deadline=None)
@given(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_png_gray_roundtrip_identity(w, h, seed):
    pixels = bytes((seed + i * 2654435761) % 256 for i in range(w * h))
    rw, rh, ch, out = png.decode(png.encode_gray(w, h, pixels))
    assert (rw, rh, ch) == (w, h, 1) and out == pixels
