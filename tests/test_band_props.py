"""Property tests for the integer band-key constructions.

The composite band keys (audio/video energy buckets, length buckets) carry
a zero-recall-loss claim: any pair passing the exact verification gate must
sit in equal-or-adjacent buckets, because the minimal bucket span exceeds
the gate ratio. The proofs live in the query docstrings; these tests pin
them against every reachable integer hypothesis can find.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _eb(e: int) -> int:
    """Python mirror of the Spark/oracle exponent+3-bit-mantissa bucket:
    eb = 8*max(bitlen(e)-1, 3) + 3 bits after the leading bit."""
    blen = max(e.bit_length() - 1, 3)
    return blen * 8 + ((e >> (blen - 3)) % 8)


def _lb(n: int) -> int:
    """Python mirror of q_length_buckets' exponent+2-bit-mantissa bucket."""
    blen = n.bit_length() - 1
    return blen * 4 + ((n >> max(n.bit_length() - 3, 0)) % 4)


@settings(max_examples=2000)
@given(
    st.integers(min_value=8, max_value=1 << 50),
    st.integers(min_value=8, max_value=1 << 50),
)
def test_energy_gate_subsumes_bucket_adjacency(ea: int, eb_: int):
    """If 20*|ea-eb| <= max(ea, eb) (the 5% verification gate), the two
    energies differ by AT MOST one bucket — so probing {eb-1, eb, eb+1}
    provably loses no qualifying pair. (min e=8: fixture energies are sums
    of squared/byte terms well above the mantissa floor.)"""
    if 20 * abs(ea - eb_) <= max(ea, eb_):
        assert abs(_eb(ea) - _eb(eb_)) <= 1


@settings(max_examples=2000)
@given(st.integers(min_value=8, max_value=1 << 40))
def test_energy_bucket_is_monotone_and_bounded_span(e: int):
    """On the documented domain e >= 8 (fixture energies are thousands and
    up; below 8 the bit-length clamp makes the mantissa wrap, which is why
    the domain floor matters): buckets are monotone in e, and any two
    same-bucket energies are within a 9/8 factor — the bound the
    gate-subsumes-adjacency proof divides against (9/8 > ... > 16/15, all
    above the 1.05 gate)."""
    assert _eb(e + 1) >= _eb(e)
    # same-bucket span: walk to the bucket's smallest member and check 9/8
    blen = max(e.bit_length() - 1, 3)
    m = (e >> (blen - 3)) % 8
    lo = (8 + m) << (blen - 3)
    assert _eb(lo) == _eb(e)
    assert 8 * e <= 9 * lo  # max/min ratio within a bucket <= 9/8


@settings(max_examples=2000)
@given(st.integers(min_value=1, max_value=1 << 40))
def test_length_bucket_monotone(n: int):
    assert _lb(n + 1) >= _lb(n)
