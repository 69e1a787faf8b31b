"""Cleaning-operator queries (SURVEY.md §2.8/§2.2, milestone 1).

The reference cleans scraped listing strings; the testdata has no dirty
strings, so each query *synthesizes* them deterministically from testdata
columns with a SQL snippet that parses identically in Spark SQL and DuckDB
(shared via ``F.expr``), then applies the engine's cleaning library
(functions.cleaning — pure Catalyst expressions). The oracle applies the
equivalent ANSI SQL to the identically-generated strings, so the value-hash
checks the *cleaning semantics*, not the generator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import cleaning as cl
from .registry import query

# ---------------------------------------------------------------------------
# Shared generator snippets (valid in BOTH Spark SQL and DuckDB).
# Integer division is spelled CAST(FLOOR(x/1000) AS BIGINT) because `div`
# (Spark) and `//` (DuckDB) don't share syntax.
# ---------------------------------------------------------------------------

_BASE = "CAST(FLOOR(p_retailprice) AS BIGINT)"
_GROUPED = (
    f"CASE WHEN {_BASE} >= 1000 THEN CAST(CAST(FLOOR({_BASE} / 1000) AS BIGINT) AS STRING)"
    f" || ',' || lpad(CAST({_BASE} % 1000 AS STRING), 3, '0')"
    f" ELSE CAST({_BASE} AS STRING) END"
)
# '$850', ' $1,050', '$925+', 'Contact' — every price dirt pattern of
# housing.db rows / trulia_scrape.py:164-165
PRICE_GEN = (
    "CASE WHEN p_partkey % 7 = 0 THEN 'Contact' "
    f"ELSE CASE WHEN p_partkey % 5 = 0 THEN ' ' ELSE '' END || '$' || {_GROUPED} "
    "|| CASE WHEN p_partkey % 3 = 0 THEN '+' ELSE '' END END"
)

_V = "CAST(p_size * 37 % 2000 + 300 AS BIGINT)"
_V2 = f"CAST({_V} + 200 AS BIGINT)"
# '', '525 sqft', '1,234 sqft', '600-800 sqft' — trulia_scrape.py:160-163
SQFT_GEN = (
    "CASE p_partkey % 4 "
    "WHEN 0 THEN '' "
    f"WHEN 1 THEN CAST({_V} AS STRING) || ' sqft' "
    f"WHEN 2 THEN CAST(CAST(FLOOR(({_V} + 1000) / 1000) AS BIGINT) AS STRING) || ',' "
    f"|| lpad(CAST(({_V} + 1000) % 1000 AS STRING), 3, '0') || ' sqft' "
    f"ELSE CAST({_V} AS STRING) || '-' || CAST({_V2} AS STRING) || ' sqft' END"
)

# 'Studio', NULL, '1bd'..'4bd' — trulia_scrape.py:167-168
BED_GEN = (
    "CASE WHEN p_partkey % 6 = 0 THEN 'Studio' "
    "WHEN p_partkey % 6 = 1 THEN CAST(NULL AS STRING) "
    "ELSE CAST(p_size % 4 + 1 AS STRING) || 'bd' END"
)

RANGE_GEN = f"CAST({_V} AS STRING) || '-' || CAST({_V2} AS STRING)"

CSZ_GEN = (
    "'City' || CAST(c_custkey % 50 AS STRING) || ', ' || "
    "CASE WHEN c_custkey % 2 = 0 THEN 'TX' ELSE 'MA' END || ' ' || "
    "CAST(78700 + c_custkey % 100 AS STRING)"
)

BLANKY_GEN = "CASE doc_id % 7 WHEN 0 THEN ' ' WHEN 1 THEN '' ELSE lang END"


@query(
    "q_clean_price",
    oracle=f"""
    WITH gen AS (SELECT p_partkey, {PRICE_GEN} AS price_str FROM part)
    SELECT p_partkey, price_str,
           CAST(NULLIF(trim(replace(replace(replace(replace(price_str,
                'Contact',''), '$',''), ',',''), '+','')), '') AS INTEGER) AS price
    FROM gen
    """,
    description="price-string cleaning '$1,050+'/'Contact' → INT "
    "(F1/F2/F11; trulia_scrape.py:164-165,178)",
)
def q_clean_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.expr(PRICE_GEN).alias("price_str")
    )
    return gen.select(
        "p_partkey",
        "price_str",
        F.nullif(cl.clean_price("price_str"), F.lit("")).cast("int").alias("price"),
    )


@query(
    "q_clean_sqft",
    oracle=f"""
    WITH gen AS (SELECT p_partkey, {SQFT_GEN} AS sqft_str FROM part),
    cleaned AS (
      SELECT p_partkey, trim(replace(replace(sqft_str, 'sqft',''), ',','')) AS s
      FROM gen)
    SELECT p_partkey,
           CAST(CASE WHEN contains(s, '-')
                THEN (CAST(string_split(s,'-')[1] AS INTEGER)
                      + CAST(string_split(s,'-')[2] AS INTEGER)) / 2
                ELSE CAST(s AS DOUBLE) END AS INTEGER) AS sqft
    FROM cleaned WHERE s <> ''
    """,
    description="sqft cleaning: strip 'sqft'/commas, drop empties, range→midpoint, cast "
    "(F1/F5/P3/P6/F11; trulia_scrape.py:160-163,178)",
)
def q_clean_sqft(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.expr(SQFT_GEN).alias("sqft_str")
    )
    cleaned = gen.select("p_partkey", cl.clean_sqft("sqft_str").alias("s"))
    return (
        cleaned.filter(F.col("s") != "")  # reference drops empty-sqft rows (:161)
        .select("p_partkey", cl.range_midpoint("s").cast("int").alias("sqft"))
    )


@query(
    "q_clean_bed",
    oracle=f"""
    WITH gen AS (SELECT p_partkey, {BED_GEN} AS bed_str FROM part),
    lowered AS (SELECT p_partkey, trim(replace(lower(bed_str), 'bd','')) AS b FROM gen)
    SELECT p_partkey,
           CAST(COALESCE(CASE WHEN b = 'studio' THEN '0' ELSE b END, '0') AS DOUBLE) AS bed
    FROM lowered
    """,
    description="bed cleaning: '2bd'→2.0, 'Studio'→0.0, NULL→0.0 "
    "(F3/F7/F8/F11; trulia_scrape.py:167-168,179)",
)
def q_clean_bed(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.expr(BED_GEN).alias("bed_str")
    )
    return gen.select("p_partkey", cl.clean_bed("bed_str").cast("double").alias("bed"))


@query(
    "q_array_mean",
    oracle=f"""
    WITH gen AS (SELECT p_partkey, {RANGE_GEN} AS r FROM part)
    SELECT p_partkey,
           (CAST(string_split(r,'-')[1] AS INTEGER)
            + CAST(string_split(r,'-')[2] AS INTEGER)) / 2 AS midpoint
    FROM gen
    """,
    description="split + numeric midpoint '600-800'→700.0 (A1/F5; trulia_scrape.py:163 "
    "np.mean(x.split('-')) — Spark side uses the general aggregate/transform fold)",
)
def q_array_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = load_table(spark, sf_dir, "part").select("p_partkey", F.expr(RANGE_GEN).alias("r"))
    parts = F.transform(F.split(F.col("r"), "-"), lambda x: x.cast("int"))
    mid = F.aggregate(parts, F.lit(0), lambda a, x: a + x) / F.size(parts)
    return gen.select("p_partkey", mid.alias("midpoint"))


@query(
    "q_split_citystatezip",
    oracle=rf"""
    WITH gen AS (SELECT c_custkey, {CSZ_GEN} AS csz FROM customer)
    SELECT c_custkey,
           regexp_extract(csz, '^(.*), (\S+) (\S+)$', 1) AS city,
           regexp_extract(csz, '^(.*), (\S+) (\S+)$', 2) AS state,
           CAST(regexp_extract(csz, '^(.*), (\S+) (\S+)$', 3) AS INTEGER) AS zipcode
    FROM gen
    """,
    description="'Austin, TX 78758' → city/state/zip (F6; trulia_scrape.py:136 rsplit)",
)
def q_split_citystatezip(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.expr(CSZ_GEN).alias("csz")
    )
    city, state, zipc = cl.split_city_state_zip("csz")
    return gen.select(
        "c_custkey",
        city.alias("city"),
        state.alias("state"),
        zipc.cast("int").alias("zipcode"),
    )


@query(
    "q_blank_to_null",
    oracle=f"""
    WITH gen AS (SELECT doc_id, {BLANKY_GEN} AS raw FROM documents)
    SELECT doc_id, NULLIF(CASE WHEN raw = ' ' THEN '' ELSE raw END, '') AS val
    FROM gen
    """,
    description="whole-value ' '→''→NULL chain (F9; trulia_scrape.py:170-171)",
)
def q_blank_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(BLANKY_GEN).alias("raw")
    )
    return gen.select("doc_id", cl.blank_to_null("raw").alias("val"))


@query(
    "q_dropna",
    oracle=f"""
    WITH gen AS (SELECT doc_id, {BLANKY_GEN} AS raw FROM documents),
    nulled AS (SELECT doc_id, NULLIF(CASE WHEN raw = ' ' THEN '' ELSE raw END, '') AS val
               FROM gen)
    SELECT doc_id, val FROM nulled WHERE val IS NOT NULL
    """,
    description="dropna over nullified column (F10; trulia_scrape.py:172)",
)
def q_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    gen = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(BLANKY_GEN).alias("raw")
    )
    return gen.select("doc_id", cl.blank_to_null("raw").alias("val")).na.drop(subset=["val"])


@query(
    "q_cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderkey AS STRING) AS BIGINT) AS key_rt,
           CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS STRING) AS DOUBLE) AS price_rt
    FROM orders
    """,
    description="string⇄numeric cast round-trip (F11; trulia_scrape.py:178-179 astype — "
    "fail-fast parity enforced by functions.cleaning.validate_casts)",
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_rt"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").cast("double").alias("price_rt"),
    )


@query(
    "q_array_join",
    oracle="""
    SELECT doc_id, array_to_string((string_split(text, ' '))[1:5], ' ,') AS details
    FROM documents
    """,
    description="array → ' ,'-delimited string (F12; trulia_scrape.py:143 ' ,'.join(details))",
)
def q_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_join(F.slice(F.split("text", " "), 1, 5), " ,").alias("details"),
    )


@query(
    "q_explode_details",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS detail
    FROM documents WHERE doc_id < 50
    """,
    description="explode the details list (§2.12; mirrors the flattened list of "
    "trulia_scrape.py:143 re-expanded)",
)
def q_explode_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.explode(F.split("text", " ")).alias("detail"))
    )


# ---------------------------------------------------------------------------
# Keyword one-hot + order-sensitive strip (R1 + F15,
# trulia_csv_to_nlp.ipynb:473-494 cells 13,15): flag computed on the text as
# stripped so far, then the keyword removed before the next — sequence
# frozen, exactly like the reference's loop.
# ---------------------------------------------------------------------------

KEYWORDS = ["spark", "window", "join", "stream", "vector"]


def _keyword_oracle() -> str:
    ctes = ["s0 AS (SELECT doc_id, lower(text) AS t FROM documents)"]
    for i, kw in enumerate(KEYWORDS, start=1):
        carried = "".join(f", {k}_flag" for k in KEYWORDS[: i - 1])
        ctes.append(
            f"s{i} AS (SELECT doc_id{carried}, "
            f"CASE WHEN contains(t, '{kw}') THEN 1 ELSE 0 END AS {kw}_flag, "
            f"replace(t, '{kw}', '') AS t FROM s{i - 1})"
        )
    flags = ", ".join(f"{k}_flag" for k in KEYWORDS)
    return f"WITH {', '.join(ctes)} SELECT doc_id, {flags}, t AS stripped FROM s{len(KEYWORDS)}"


@query(
    "q_keyword_flags",
    oracle=_keyword_oracle(),
    description="order-sensitive keyword one-hot + strip-after-flag (R1/F15/P7; "
    "trulia_csv_to_nlp.ipynb:473-494)",
)
def q_keyword_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("t")
    )
    for kw in KEYWORDS:
        df = df.withColumn(
            f"{kw}_flag", F.when(F.col("t").contains(kw), 1).otherwise(0)
        ).withColumn("t", F.replace(F.col("t"), F.lit(kw), F.lit("")))
    return df.select("doc_id", *[f"{k}_flag" for k in KEYWORDS], F.col("t").alias("stripped"))


@query(
    "q_dedup_exact",
    oracle="""
    SELECT lang, source, doc_id AS keep_id FROM (
      SELECT lang, source, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
      FROM documents) t
    WHERE rn = 1
    """,
    description="exact dedup keep-first (D1/§2.13; 0-ToDo.md:54 apt_id dedup TODO) — "
    "row_number over the dup key, deterministic keeper",
    tags=("dedup", "bench"),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    return (
        load_table(spark, sf_dir, "documents")
        .select("lang", "source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") == 1)
        .select("lang", "source", F.col("doc_id").alias("keep_id"))
    )


@query(
    "q_scrape_pipeline",
    oracle=None,  # HTML parse stage is not SQL-expressible — rows-only ⊘;
    # field-level extraction is golden-tested in tests/test_html_extract.py
    description="the reference's entire production pipeline (trulia_scrape.py main(), "
    "SURVEY §3.1) as one distributed flow: page snapshots (synthesized here from the "
    "part table) → mapInPandas HTML extract → clean_listings → typed rows",
    tags=("cleaning",),
)
def q_scrape_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.cleaning import clean_listings
    from ..sources.html_extract import SNAPSHOT_SCHEMA, extract_listings

    part = load_table(spark, sf_dir, "part").limit(100)
    page = F.concat(
        F.lit('<html><body><span data-testid="home-details-summary-headline">'),
        F.col("p_name"),
        F.lit('</span><span data-testid="home-details-summary-city-state">1 Main St</span>'
              '<span data-testid="home-details-summary-city-state">Austin, TX 78758</span>'
              '<div data-testid="home-description-text-description-text">d</div>'
              '<table data-testid="floor-plan-group"><tr>'
              '<td class="FloorPlanTable__FloorPlanSMCell-sc-1ghu3y7-8">x</td>'
              '<td class="FloorPlanTable__FloorPlanSMCell-sc-1ghu3y7-8">$'),
        F.format_number(F.col("p_retailprice").cast("int"), 0),
        F.lit('</td>'
              '<td class="FloorPlanTable__FloorPlanFloorSpaceCell-sc-1ghu3y7-5">'),
        (F.col("p_size") * 100).cast("string"),
        F.lit(' sqft</td>'
              '<td class="FloorPlanTable__FloorPlanFeaturesCell-sc-1ghu3y7-4">1bd</td>'
              '<td class="FloorPlanTable__FloorPlanFeaturesCell-sc-1ghu3y7-4">1ba</td>'
              '</tr></table></body></html>'),
    )
    snaps = part.select(
        F.concat(F.lit("mem://part/"), F.col("p_partkey")).alias("url"),
        page.alias("html"),
        F.lit("2020-05-01").alias("fetch_date"),
    )
    _ = SNAPSHOT_SCHEMA  # snaps matches the crawler-landing contract (url, html, fetch_date)
    return clean_listings(extract_listings(snaps)).orderBy("url")
