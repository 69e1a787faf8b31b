"""Listing-cleaning expressions (SURVEY.md §2.8, reference trulia_scrape.py:156-180).

The reference's ``clean_apartment_df`` is ~12 eager whole-column pandas
passes; here each step is a ``Column`` expression and the composed pipeline
(``clean_listings``) collapses into a single WholeStageCodegen pass over the
data — Catalyst's CollapseProject does what the reference could not.

Cast semantics (SURVEY §7.6 hard part #1): pandas ``astype`` fails fast on
dirty input. Under ANSI mode (the Spark 4 default) ``cast`` throws too, so
``clean_listings`` has fail-fast parity natively; ``validate_casts`` restores
it for non-ANSI sessions or explicit ``try_cast`` paths as a post-condition
count assert.
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def strip_literals(col: Column | str, literals: list[str]) -> Column:
    """Remove literal substrings in order, then trim (F1/F2;
    trulia_scrape.py:160,164-167 chained str.replace + strip)."""
    out = _c(col)
    for lit in literals:
        out = F.replace(out, F.lit(lit), F.lit(""))
    return F.trim(out)


def clean_sqft(col: Column | str) -> Column:
    """'525 sqft' / '1,050 sqft' → '525' / '1050' (trulia_scrape.py:160)."""
    return strip_literals(col, ["sqft", ","])


def range_midpoint(col: Column | str) -> Column:
    """'600-800' → 700.0; plain '650' → 650.0 (F5/P6; trulia_scrape.py:162-163
    masked ``np.mean(x.split('-'))``). General fold form so >2-element ranges
    would also average correctly."""
    c = _c(col)
    parts = F.transform(F.split(c, "-"), lambda x: x.cast("int"))
    mean = F.aggregate(parts, F.lit(0), lambda a, x: a + x) / F.size(parts)
    return F.when(c.contains("-"), mean).otherwise(c.cast("double"))


def clean_price(col: Column | str) -> Column:
    """'$1,050+' → '1050', 'Contact' → '' (trulia_scrape.py:164-165)."""
    return strip_literals(col, ["Contact", "$", ",", "+"])


def clean_bath(col: Column | str) -> Column:
    """'1.5ba' → '1.5' (trulia_scrape.py:166)."""
    return strip_literals(col, ["ba"])


def clean_bed(col: Column | str) -> Column:
    """'1bd' → '1', 'Studio' → '0', NULL → '0' (trulia_scrape.py:167-168)."""
    lowered = strip_literals(F.lower(_c(col)), ["bd"])
    destudio = F.when(lowered == "studio", F.lit("0")).otherwise(lowered)
    return F.coalesce(destudio, F.lit("0"))


def split_city_state_zip(col: Column | str) -> tuple[Column, Column, Column]:
    """'Austin, TX 78758' → ('Austin', 'TX', '78758') (F6;
    trulia_scrape.py:136 rsplit(maxsplit=2))."""
    c = _c(col)
    pat = r"^(.*), (\S+) (\S+)$"
    return (
        F.regexp_extract(c, pat, 1),
        F.regexp_extract(c, pat, 2),
        F.regexp_extract(c, pat, 3),
    )


def blank_to_null(col: Column | str) -> Column:
    """Whole-value ' ' → '' → NULL (F9; trulia_scrape.py:170-171 df.replace)."""
    c = _c(col)
    deblank = F.when(c == " ", F.lit("")).otherwise(c)
    return F.nullif(deblank, F.lit(""))


def not_contains(col: Column | str, needle: str) -> Column:
    """Negated contains with pandas na=False semantics (P4;
    trulia_scrape.py:169): NULL input → row kept."""
    return ~F.coalesce(_c(col).contains(needle), F.lit(False))


LISTING_CASTS = {  # trulia_scrape.py:178-179 convert_df_columns
    "sqft": "int",
    "price": "int",
    "bath": "float",
    "bed": "float",
    "zipcode": "int",
}


def clean_listings(df: DataFrame) -> DataFrame:
    """The full reference pipeline (trulia_scrape.py:156-180), one lazy plan.

    Step order is semantic (SURVEY §3.1): sqft cleanup precedes the range
    midpoint; the price-range row filter precedes blank→NULL.
    """
    # :160-161 order is semantic: strip 'sqft'/commas FIRST, then drop rows
    # that are empty AFTER stripping (' sqft' → '' → dropped). pandas keeps
    # NaN through `!= ''` (NaN != '' is True), hence the coalesce(True).
    df = df.withColumn("sqft", clean_sqft("sqft"))
    df = df.filter(F.coalesce(F.col("sqft") != "", F.lit(True)))
    df = df.withColumn("sqft", range_midpoint("sqft"))  # :162-163 masked update
    df = df.filter(not_contains("price", "-"))  # :169 drop price-range rows
    df = df.withColumn("price", clean_price("price"))
    df = df.withColumn("bath", clean_bath("bath"))
    df = df.withColumn("bed", clean_bed("bed"))
    for c in ("name", "address", "unit", "city", "state", "description", "details", "url"):
        if c in df.columns:
            df = df.withColumn(c, blank_to_null(c))  # :170-171
    for c, t in LISTING_CASTS.items():
        df = df.withColumn(c, F.col(c).cast(t))  # :178-179
    if "date" in df.columns:
        df = df.withColumn("date", F.col("date").cast("date"))
    return df


def validate_casts(df: DataFrame, raw: DataFrame, cols: dict[str, str], key: str) -> None:
    """Fail-fast cast parity: raise if any non-null input became NULL.

    One count() over an anti-join of nullified keys — a single pass, still
    fully distributed; the 100 TB-safe version of pandas astype's exception.
    """
    bad = (
        raw.select(key, *cols)
        .join(df.select(key, *[F.col(c).alias(f"__{c}") for c in cols]), key)
        .where(
            functools.reduce(
                Column.__or__,
                [F.col(c).isNotNull() & F.col(f"__{c}").isNull() for c in cols],
            )
        )
    )
    n = bad.count()
    if n:
        raise ValueError(f"cast produced NULL for {n} non-null input rows")
