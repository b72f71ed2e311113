"""As-of join: union + last-value-carry-forward window semantics."""

from pyspark.sql import functions as F

from siridb_server_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, 1.0), (1, 20, 2.0), (1, 5, 0.5), (2, 15, 3.0)],
        "k long, ts long, v double")
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 20, 200.0), (3, 1, 999.0)],
        "k long, ts long, r double")
    return left, right


def test_asof_backward_left_semantics(spark):
    left, right = _frames(spark)
    out = {(r["k"], r["ts"]): (r["r"], r["ts_right"])
           for r in asof_join(left, right, on="ts", by="k",
                              right_cols=["r"]).collect()}
    assert out[(1, 5)] == (None, None)      # nothing at-or-before 5
    assert out[(1, 10)] == (100.0, 8)       # 8 <= 10 carried forward
    assert out[(1, 20)] == (200.0, 20)      # equal ts matches (>=)
    assert out[(2, 15)] == (None, None)     # key with no right rows
    assert len(out) == 4                    # right-only key 3 absent


def test_asof_tolerance_inclusive_bound(spark):
    left, right = _frames(spark)
    rows = asof_join(left, right, on="ts", by="k", right_cols=["r"],
                     tolerance=2).collect()
    got = {(r["k"], r["ts"]): r["r"] for r in rows}
    assert got[(1, 10)] == 100.0            # 8 >= 10-2 inclusive
    assert got[(1, 20)] == 200.0
    tight = {(r["k"], r["ts"]): r["r"]
             for r in asof_join(left, right, on="ts", by="k",
                                right_cols=["r"],
                                tolerance=1).collect()}
    assert tight[(1, 10)] is None           # 8 < 10-1 → dropped


def test_asof_preserves_left_columns_and_count(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by="k", right_cols=["r"])
    assert out.count() == left.count()
    assert set(out.columns) == {"k", "ts", "v", "r", "ts_right"}
    # deterministic under repartitioning (window sort, not input order)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, asof_join(left.repartition(5), right,
                                    on="ts", by="k",
                                    right_cols=["r"]).collect()))
    assert a == b


def test_unigram_logprob(spark):
    from siridb_server_spark.operators.text import unigram_logprob
    import math

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a b"), (2, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["xent_micro"])
           for r in unigram_logprob(df).collect()}
    # corpus: a=3, b=2, total=5; contract is the quantized-term
    # micro-nat mean: q(t) = floor(t*1e6 + 0.5), then half-up mean
    pa, pb = 3 / 5, 2 / 5

    def q(t):
        return math.floor(t * 1e6 + 0.5)

    def qmean(terms):
        s, n = sum(q(t) for t in terms), len(terms)
        return (2 * s + n) // (2 * n)

    x0 = qmean([-math.log(pa), -math.log(pa), -math.log(pb)])
    x1 = qmean([-math.log(pa), -math.log(pb)])
    assert out[0] == (3, x0)
    assert out[1] == (2, x1)
    assert 2 not in out                     # empty text filtered
