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
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    # corpus: a=3, b=2, total=5. Hashed contract = the exact-integer
    # sufficient statistics; the ln-seeded xent is pytest-verified
    # with tolerance (ARCHITECTURE.md contract policy)
    pa, pb = 3 / 5, 2 / 5
    r0, r1 = out[0], out[1]
    assert (r0["n_tokens"], r0["n_types"]) == (3, 2)
    assert (r0["sum_nw"], r0["max_nw"]) == (3 + 3 + 2, 3)
    assert (r1["n_tokens"], r1["n_types"]) == (2, 2)
    assert (r1["sum_nw"], r1["max_nw"]) == (3 + 2, 3)
    x0 = -(2 * math.log(pa) + math.log(pb)) / 3
    x1 = -(math.log(pa) + math.log(pb)) / 2
    assert abs(r0["xent"] - x0) < 1e-12
    assert abs(r1["xent"] - x1) < 1e-12
    assert 2 not in out                     # empty text filtered
