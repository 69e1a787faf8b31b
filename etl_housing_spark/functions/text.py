"""Text-analysis expressions for the training-data pipeline surface
(SURVEY.md §2.13: language-ID, quality scoring, token counting, document
fingerprinting). All built-in Catalyst functions — array lambdas (filter/
transform/aggregate) run JVM-side, no Python in the data path.

The reference itself planned this layer: "Can use count vectorizer here…
Use lemmetizer" (trulia_csv_to_nlp.ipynb:461-462, cell 12).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny n-gram-heuristic stopword lists per language; the testdata vocabulary
# is synthetic English-ish, so 'en' dominates — the *mechanism* (per-language
# marker-token ratio) is what scales to a real lexicon
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the BPE-ish regex variant is
    ``regexp_count(c, r'\\w+|[^\\w\\s]')`` — same shape, heavier regex)."""
    return F.size(tokens(col))


# alnum runs + individual punctuation marks — the BPE-pretokenizer shape
# (explicit char classes, identical semantics in Java and DuckDB regex)
BPE_ISH_PATTERN = "[a-z0-9]+|[^a-z0-9 ]"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: alnum runs and each punctuation char counted as
    boundaries, the way a byte-level BPE pre-tokenizer splits."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def rolling_fingerprint(col: Column | str, base: int = 31, mod: int = 2**31 - 1) -> Column:
    """Polynomial rolling hash over the token stream of normalized text:
    h = (h*base + crc32(token)) % mod — one array fold, JVM-side, no UDF.
    Order-sensitive (unlike the md5 ``fingerprint``), so token permutations
    get distinct fingerprints."""
    toks = tokens(normalized(col))
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * base + F.crc32(F.encode(x, "utf-8")), F.lit(mod)),
    )


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    vocab = STOPWORDS[lang]
    return F.size(F.filter(tokens(col), lambda x: x.isin(vocab)))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    return stopword_count(col, lang) / token_count(col)


def predicted_lang(col: Column | str, threshold: float = 0.04) -> Column:
    """N-gram-heuristic language ID: marker-token ratio vs threshold."""
    return F.when(stopword_ratio(col) >= threshold, F.lit("en")).otherwise(F.lit("unk"))


def avg_token_len(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.replace(c, F.lit(" "), F.lit(""))) / token_count(c)


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic: stopword density + length saturation.

    Mirrors the standard pretraining-data filters (length / punctuation /
    stopword ratios); weights are illustrative, the plumbing is the point.
    """
    length_sat = F.least(token_count(col) / F.lit(100.0), F.lit(1.0))
    return stopword_ratio(col) * 0.4 + length_sat * 0.6


def normalized(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(c), "[^a-z0-9 ]", "")


def fingerprint(col: Column | str) -> Column:
    """Content fingerprint: md5 over normalized text — the deterministic
    cross-run document id the reference never built (0-ToDo.md:54)."""
    return F.md5(normalized(col))


def max_adjacent_pair_count(w: Column | str) -> Column:
    """Highest multiplicity of any adjacent token pair (bigram) of the token
    ARRAY ``w`` — computed IN-ROW as the longest run of the sorted bigram
    array, which equals the max per-bigram COUNT(*) of the explode→groupBy
    form exactly (integer, order-free). Replaces a corpus-wide
    (doc, bigram) shuffle + two aggregate exchanges with a per-row
    sort + fold (r16, guide §2.4 remove shuffles outright); the fold is an
    interpreted HOF, which measured FASTER than codegen unrolls for
    comparable per-row folds (see operators/clustering.kmeans_assign).

    Caller must guard ``size(w) >= 2`` (e.g. ``F.when(F.size(w) >= 2,
    max_adjacent_pair_count(w)).otherwise(0)``): ``sequence(0, -1)`` counts
    DOWN in Spark, so shorter arrays would fabricate pairs.
    """
    c = F.col(w) if isinstance(w, str) else w
    bg = F.array_sort(
        F.transform(
            F.sequence(F.lit(0), F.size(c) - 2),
            lambda i: F.concat_ws(" ", F.get(c, i), F.get(c, i + 1)),
        )
    )
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc: Column, x: Column) -> Column:
        newrun = (
            F.when(acc["prev"].isNotNull() & (x == acc["prev"]), acc["run"] + 1)
            .otherwise(F.lit(1))
            .cast("long")
        )
        return F.struct(
            x.alias("prev"),
            newrun.alias("run"),
            F.greatest(acc["best"], newrun).alias("best"),
        )

    return F.aggregate(bg, acc0, step, lambda acc: acc["best"])
