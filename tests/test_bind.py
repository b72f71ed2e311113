"""functions/bind.let: the let-binding rewrites of the token-array
higher-order expressions must be VALUE-IDENTICAL to the inline
forms they replaced (the inline forms re-evaluate the tokenizer per
lambda element — O(|doc|²) per document — which is why they left;
these tests pin that only the duplicate evaluation went away)."""

from pyspark.sql import functions as F

from siridb_server_spark.functions.bind import let
from siridb_server_spark.operators import classify as CL
from siridb_server_spark.operators import dedup as D
from siridb_server_spark.operators import text as TX

ROWS = [(1, "the quick brown fox jumps over the lazy dog"),
        (2, "a b"), (3, "x"), (4, ""), (5, None),
        (6, "  Mixed CASE   words\twith\ttabs 'apostrophes' 123  "),
        (7, "repeat repeat repeat repeat repeat")]
SCHEMA = "doc_id long, text string"


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def test_let_binds_value_once(spark):
    df = spark.range(3)
    out = df.select(
        let(F.col("id") * 2,
            lambda v: v + v).alias("x")).collect()
    assert [r["x"] for r in out] == [0, 4, 8]


def test_ngrams_match_inline_reference(spark):
    def inline_ngrams(ws, n):
        size = F.size(ws)
        return F.when(size >= n, F.transform(
            F.sequence(F.lit(1), size - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j)
                                         for j in range(n)]))
        ).otherwise(F.array().cast("array<string>"))

    df = _df(spark)
    ws = TX.words(F.lower(F.trim(F.col("text"))))
    for n in (1, 2, 3):
        new = df.select("doc_id", TX._ngrams(ws, n).alias("g")) \
            .collect()
        old = df.select("doc_id", inline_ngrams(ws, n).alias("g")) \
            .collect()
        assert new == old


def test_shingles_match_inline_reference(spark):
    def inline_shingles(text_col, n):
        w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        idx = F.sequence(
            F.lit(1), F.greatest(F.size(w) - n + 1, F.lit(1)))
        return F.array_distinct(F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(w, i, n))))

    df = _df(spark)
    for n in (2, 3):
        new = df.select("doc_id", D.shingles("text", n).alias("s")) \
            .collect()
        old = df.select("doc_id",
                        inline_shingles("text", n).alias("s")) \
            .collect()
        assert new == old


def test_rolling_fingerprints_match_inline_reference(spark):
    def inline_rolling(text, window):
        w = TX.words(F.lower(text))
        n = F.size(w)
        idx = F.sequence(F.lit(1),
                         F.greatest(n - window + 1, F.lit(1)))
        return F.transform(idx, lambda i: F.md5(
            F.concat_ws(" ", F.slice(w, i, window))))

    df = _df(spark)
    new = df.select(
        TX.rolling_fingerprints(F.col("text"), 4).alias("r")) \
        .collect()
    old = df.select(inline_rolling(F.col("text"), 4).alias("r")) \
        .collect()
    assert new == old


def test_char_tokens_match_inline_reference(spark):
    df = _df(spark)
    new = sorted(map(tuple, CL._tokens(
        df, "text", "doc_id", features="chars",
        ngram_n=3).collect()))
    t = F.lower(F.trim(F.col("text")))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(t), F.lit(1))),
        lambda p: t.substr(p, F.lit(3)))
    toks = F.filter(grams, lambda g: F.length(g) == 3)
    old = sorted(map(tuple, (
        df.where(F.length(F.trim(F.col("text"))) > 0)
        .select("doc_id", F.explode(toks).alias("term"))).collect()))
    assert new == old
