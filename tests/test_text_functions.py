"""Text-function laws: BPE-ish counting vs whitespace counting, rolling
fingerprint order-sensitivity (the property md5 fingerprints lack)."""

from __future__ import annotations

from etl_housing_spark.functions.text import (
    bpe_token_count,
    fingerprint,
    rolling_fingerprint,
)


def test_bpe_counts_punctuation_as_tokens(spark):
    df = spark.createDataFrame(
        [
            (1, "hello world"),  # 2 ws tokens, 2 bpe tokens
            (2, "hello, world!"),  # 2 ws tokens, 4 bpe tokens (, and ! split off)
            (3, "a-b"),  # 1 ws token, 3 bpe tokens
        ],
        "id long, text string",
    )
    got = {r.id: r.n for r in df.select("id", bpe_token_count("text").alias("n")).collect()}
    assert got == {1: 2, 2: 4, 3: 3}


def test_rolling_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "gamma beta alpha"),  # same tokens, different order
            (3, "alpha beta gamma"),  # identical to 1
        ],
        "id long, text string",
    )
    rfp = {r.id: r.rfp for r in df.select("id", rolling_fingerprint("text").alias("rfp")).collect()}
    assert rfp[1] == rfp[3]
    assert rfp[1] != rfp[2]
    # md5 fingerprint is order-sensitive too (hashes the whole string), but
    # the rolling form is streamable per token — both must be deterministic
    fp = {r.id: r.fp for r in df.select("id", fingerprint("text").alias("fp")).collect()}
    assert fp[1] == fp[3]
