"""Vector expressions over ``array<float>`` embedding columns (SURVEY §2.13).

Dot products and norms are ``zip_with``/``aggregate`` lambdas — JVM-side,
per-row, no shuffle. For cross-engine exactness the reductions accumulate in
DECIMAL(38,18): decimal addition is associative, so Spark's fold and
DuckDB's SUM reach the identical exact value regardless of order, and the
final cast to DOUBLE rounds identically.
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

# precision 28 (not 38): Spark widens p by 1 per addition and caps at 38 by
# *reducing scale* — which would round each step. At (28,18) the addition
# result keeps scale 18 exactly and the cast back is lossless for |x| < 1e10.
_ACC = "decimal(28,18)"


def _dec_sum(arr: Column) -> Column:
    """Order-exact array fold — or, under ``EHS_FAST_SUMS=1`` (the same
    production switch plans/_util.fast_sums documents for dsum/davg), a
    plain sequential double fold: same plan shape, no per-element
    BigDecimal, not bit-reproducible against the DuckDB oracle. Read per
    CALL at plan-construction time, exactly like dsum; duplicated rather
    than imported because functions/ must not import plans/ (layering).
    This is the switch that erases the decimal tax from the vector
    family's hot paths (k-means assignment, SemDeDup cosine, ADC scan).

    ARGMIN/THRESHOLD CONSUMERS (ADVICE r13): for plain sums the fast
    fold differs from the exact fold only by round-off — but k-means
    assignment, SemDeDup keep/drop, and ADC top-k all pass these sums
    through a DISCRETE decision (argmin, threshold, limit), and a
    round-off-level distance delta can flip which cluster/candidate wins
    when two are near-tied. Fast-mode output for those consumers can
    therefore differ DISCRETELY from exact mode (a different — still
    valid-quality — assignment or top-k member), not just in trailing
    digits. Exact mode remains the verification default; conftest fails
    fast if the switch leaks into a verification session."""
    if os.environ.get("EHS_FAST_SUMS", "") == "1":
        return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)
    return F.aggregate(
        arr, F.lit(0).cast(_ACC), lambda acc, x: (acc + x.cast(_ACC)).cast(_ACC)
    ).cast("double")


def dot(a: Column, b: Column) -> Column:
    """Exact-accumulated dot product of two float-array columns."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _dec_sum(prods)


def dot_seq(a: Column, b: Column) -> Column:
    """Sequential-double dot product — the fast scoring path (~2× the
    decimal fold, measured at sf0.1).

    Still cross-engine checkable: Spark's ``aggregate`` folds the array
    left-to-right in double, and DuckDB's ``list_dot_product`` over
    ``DOUBLE[]`` accumulates in the same sequential order — verified
    bitwise-identical on the full embeddings table
    (tests/test_text_functions.py). Unlike a distributed SUM, the fold
    order here is *data-defined* (array element order), not
    partitioning-defined, so determinism survives any cluster layout; the
    6dp round in consuming queries adds ~9 orders of magnitude of slack on
    top of the bitwise agreement.
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(_dec_sum(sq))


def sqdist(a: Column, b: Column) -> Column:
    """Exact-accumulated squared L2 distance of two array columns.

    Each per-dim (x−y)² is one double product cast to DECIMAL(28,18);
    decimal addition is associative, so the in-row fold here equals a
    grouped decimal SUM over exploded dims bit-for-bit — which is exactly
    how the k-means oracle mirrors it (q_kmeans_portable)."""
    diffs = F.zip_with(
        a,
        b,
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    return _dec_sum(diffs)


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dec_sum_static(terms: list[Column]) -> Column:
    """Statically unrolled ``_dec_sum`` over a known list of double terms:
    left-associated additions with the same running (28,18) casts as the
    fold (decimal addition is exact, so the value is identical), but a
    plain expression tree Catalyst whole-stage-codegens — the HOF fold is
    interpreted per row. Honors EHS_FAST_SUMS like ``_dec_sum`` (plain
    left-associated double sum, bitwise the fast fold's order)."""
    if os.environ.get("EHS_FAST_SUMS", "") == "1":
        acc = terms[0]
        for t in terms[1:]:
            acc = acc + t
        return acc
    acc = (F.lit(0).cast(_ACC) + terms[0].cast(_ACC)).cast(_ACC)
    for t in terms[1:]:
        acc = (acc + t.cast(_ACC)).cast(_ACC)
    return acc.cast("double")


def sqdist_static(a: Column, b: Column, dim: int) -> Column:
    """``sqdist`` as a STATICALLY UNROLLED expression tree for a known
    ``dim`` — value-identical (left-associated additions with the same
    running (28,18) casts as the fold; decimal addition is exact, so
    association cannot change the value) but whole-stage-codegen'd where
    the ``aggregate``/``zip_with`` higher-order form is INTERPRETED
    per-row (Catalyst does not codegen HOF lambdas; measured r15: the
    sf10 ADC/LUT scoring jobs spend most of their wall in ArrayAggregate
    interpretation). Use on scan-side scoring with fixed dimensionality;
    keep ``sqdist`` for dynamic dims. Honors EHS_FAST_SUMS identically
    (plain left-associated double sum — the same order the fast fold
    takes, so the two forms agree bitwise in BOTH modes)."""
    terms = [
        (a.getItem(i).cast("double") - b.getItem(i).cast("double"))
        * (a.getItem(i).cast("double") - b.getItem(i).cast("double"))
        for i in range(dim)
    ]
    return dec_sum_static(terms)
