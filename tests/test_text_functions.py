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


def test_dot_seq_bitwise_matches_duckdb(spark):
    """The q_similarity_topk scoring contract: Spark's sequential-double
    aggregate() fold and DuckDB's list_dot_product over DOUBLE[] must agree
    BITWISE on every vector — not within tolerance. If this ever breaks
    (a DuckDB accumulation-order change), the oracle must revert to the
    decimal-exact fold (functions.vectors.dot)."""
    import struct

    import duckdb

    from pyspark.sql import functions as F

    from etl_housing_spark.catalog import load_table
    from etl_housing_spark.functions.vectors import dot_seq

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("__q"))
    got = {
        r.vec_id: r.dot
        for r in emb.crossJoin(F.broadcast(q))
        .select("vec_id", dot_seq(F.col("embedding"), F.col("__q")).alias("dot"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM '/root/testdata/sf0.01/embeddings.parquet'"
    )
    want = dict(
        con.execute(
            """
            WITH q AS (SELECT embedding AS qq FROM embeddings WHERE vec_id = 0)
            SELECT vec_id,
                   list_dot_product(CAST(embedding AS DOUBLE[]), CAST(q.qq AS DOUBLE[]))
            FROM embeddings, q
            """
        ).fetchall()
    )
    assert got.keys() == want.keys()
    bad = [k for k in got if struct.pack("<d", got[k]) != struct.pack("<d", want[k])]
    assert not bad, f"bitwise dot mismatch for vec_ids {bad[:5]}"


def test_sqdist_fold_matches_grouped_decimal_sum(spark):
    """The q_kmeans_portable distance contract: the in-row DECIMAL(28,18)
    fold (functions.vectors.sqdist) must equal a grouped decimal SUM over
    the exploded per-dim products BITWISE — associativity of decimal
    addition is what lets the Spark fold and the DuckDB grouped-SUM oracle
    meet at the identical double."""
    from pyspark.sql import functions as F

    from etl_housing_spark.catalog import load_table
    from etl_housing_spark.functions.vectors import sqdist

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("v").alias("q"))
    folded = {
        r.vec_id: r.d
        for r in emb.crossJoin(F.broadcast(q))
        .select("vec_id", sqdist(F.col("v"), F.col("q")).alias("d"))
        .collect()
    }
    grouped = {
        r.vec_id: r.d
        for r in emb.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.posexplode(F.zip_with("v", "q", lambda x, y: (x - y) * (x - y))).alias(
                "dim", "sq"
            ),
        )
        .groupBy("vec_id")
        .agg(F.sum(F.col("sq").cast("decimal(28,18)")).cast("double").alias("d"))
        .collect()
    }
    assert folded == grouped  # bitwise, no tolerance


def test_bpe_merges_match_reference_trainer(spark):
    """q_bpe_merges_portable must agree with a straightforward in-memory
    canonical BPE trainer (greedy left-to-right merges, count-desc/pair-asc
    argmax) on the real corpus — the conformance check the cross-engine
    hash cannot provide (both engines could share a flaw)."""
    from collections import Counter

    from etl_housing_spark.catalog import load_table
    from etl_housing_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("text").collect()
    freq = Counter(w for r in docs for w in r["text"].split(" ") if w)

    seqs = {w: list(w) for w in freq}
    expected = []
    for _ in range(3):
        pairs = Counter()
        for w, syms in seqs.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += freq[w]
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((a, b, cnt))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out

    got = [
        (r["a"], r["b"], r["cnt"])
        for r in all_queries()["q_bpe_merges_portable"].fn(spark, sf).orderBy("rnd").collect()
    ]
    assert got == expected


def test_wordpiece_merges_match_reference_trainer(spark):
    """q_wordpiece_merges_portable must agree with an in-memory reference
    trainer scoring with the ENGINE'S OBJECTIVE — the IEEE-double composite
    cnt/(cnt_a*cnt_b), two correctly-rounded ops that Python, Spark and
    DuckDB all evaluate bit-identically — proving the greedy rewrite and
    argmax conform (the cross-engine hash alone could not catch a flaw
    shared by both engines). Note the objective is the double-EVALUATED
    score, not the exact rational: once cnt_a*cnt_b exceeds 2^53 the
    composite can collapse near-ties (then broken (a,b) asc) or reorder
    them relative to exact arithmetic — the same behavior float-scoring
    production trainers exhibit. The secondary Fraction assertion below
    documents that on THIS corpus the two orderings coincide."""
    from collections import Counter
    from fractions import Fraction

    from etl_housing_spark.catalog import load_table
    from etl_housing_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("text").collect()
    freq = Counter(w for r in docs for w in r["text"].split(" ") if w)

    seqs = {w: list(w) for w in freq}
    expected = []
    for _ in range(3):
        uni = Counter()
        pairs = Counter()
        for w, syms in seqs.items():
            for x in syms:
                uni[x] += freq[w]
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += freq[w]
        (a, b), cnt = min(
            pairs.items(),
            key=lambda kv: (-(kv[1] / (uni[kv[0][0]] * uni[kv[0][1]])), kv[0]),
        )
        # on this corpus the exact-rational ordering must coincide with the
        # IEEE ordering (documents that the 2^53 caveat is not in play)
        (ra, rb), _ = min(
            pairs.items(),
            key=lambda kv: (-Fraction(kv[1], uni[kv[0][0]] * uni[kv[0][1]]), kv[0]),
        )
        assert (ra, rb) == (a, b), "double argmax diverged from exact rational"
        expected.append((a, b, cnt, uni[a], uni[b]))
        for w, syms in seqs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = out

    got = [
        (r["a"], r["b"], r["cnt"], r["cnt_a"], r["cnt_b"])
        for r in all_queries()["q_wordpiece_merges_portable"]
        .fn(spark, sf)
        .orderBy("rnd")
        .collect()
    ]
    assert got == expected
