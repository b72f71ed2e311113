"""Retrieval evaluation (operators/text.py retrieval_metrics):
hand-computable fixtures, the integer rational contracts, and the
metrics applied to the real bm25 ranking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from siridb_server_spark.localdf import arrow_df
from siridb_server_spark.operators import text as TX


def _docs(spark):
    return arrow_df(spark, [
        (1, "spark joins data with spark shuffles", "s"),
        (2, "the data model holds data rows", "s"),
        (3, "spark spark spark everywhere", "s"),
        (4, "nothing relevant here at all", "s"),
        (5, None, "s"),
    ], "doc_id long, text string, source string")


def test_tf_runs_and_qrels_hand_checked(spark):
    docs = _docs(spark)
    run = {(r["query"], r["doc_id"]): r["rank"] for r in
           TX.tf_rank_runs(docs, ["spark", "data"], k=10).collect()}
    # spark: doc3 tf=3, doc1 tf=2 → ranks 1, 2
    assert run[("spark", 3)] == 1 and run[("spark", 1)] == 2
    # data: doc2 tf=2, doc1 tf=1 → ranks 1, 2
    assert run[("data", 2)] == 1 and run[("data", 1)] == 2
    qr = {(r["query"], r["doc_id"]) for r in
          TX.containment_qrels(docs, ["spark", "data"]).collect()}
    assert qr == {("spark", 1), ("spark", 3),
                  ("data", 1), ("data", 2)}


def test_metrics_exact_integers(spark):
    docs = _docs(spark)
    run = TX.tf_rank_runs(docs, ["spark", "data", "zzz"], k=10)
    qrels = TX.containment_qrels(docs, ["spark", "data", "zzz"])
    got = {r["query"]: (r["n_rel"], r["hits_at_k"], r["rr_x2520"])
           for r in TX.retrieval_metrics(run, qrels).collect()}
    # perfect retrieval on this fixture: first rank 1 → 2520
    assert got["spark"] == (2, 2, 2520)
    assert got["data"] == (2, 2, 2520)
    assert "zzz" not in got          # no relevant docs → no row
    # truncation at k: rank > k doesn't count
    run3 = run.withColumn("rank", F.col("rank") + 3)
    got3 = {r["query"]: (r["hits_at_k"], r["rr_x2520"]) for r in
            TX.retrieval_metrics(run3, qrels, k=4).collect()}
    assert got3["spark"] == (1, 630)     # only old rank 1 → rank 4
    with pytest.raises(ValueError, match="k <= 10"):
        TX.retrieval_metrics(run, qrels, k=20)


def test_metrics_on_real_bm25_ranking(spark):
    from siridb_server_spark.sources.testdata import load
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    terms = ["hash", "join"]
    top = TX.bm25_topk(docs, terms, k=10)
    # bm25_topk returns one combined query's (doc_id, score_micro);
    # derive the run's rank column deterministically
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    run = top.select(F.lit("hash join").alias("query"), "doc_id",
                     F.row_number().over(w).alias("rank"))
    qrels = (docs.select("doc_id",
                         F.lower(F.col("text")).alias("t"))
             .where(F.col("t").contains("hash")
                    | F.col("t").contains("join"))
             .select(F.lit("hash join").alias("query"), "doc_id"))
    m = TX.retrieval_metrics(run, qrels).first()
    assert m["n_rel"] > 0
    assert 0 < m["hits_at_k"] <= 10
    assert m["rr_x2520"] in (0, 252, 280, 315, 360, 420, 504, 630,
                             840, 1260, 2520)
    # MRR/recall replay as rationals
    assert m["hits_at_k"] / 10 <= 1.0


def test_vocab_drift_detects_injected_shift(spark):
    old = arrow_df(spark, [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta common words"),
    ], "doc_id long, text string")
    new = arrow_df(spark, [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta common words newterm newterm newterm"),
    ], "doc_id long, text string")
    rows = TX.vocab_drift(old, new, k=3).collect()
    # the injected term tops the drift list
    assert rows[0]["term"] == "newterm"
    assert rows[0]["c_old"] == 0 and rows[0]["c_new"] == 3
    t_old, t_new = rows[0]["t_old"], rows[0]["t_new"]
    assert (t_old, t_new) == (8, 11)
    assert rows[0]["dev"] == abs(0 * t_new - 3 * t_old)
    # identical snapshots drift nowhere: every dev is 0
    same = TX.vocab_drift(old, old, k=5).collect()
    assert all(r["dev"] == 0 for r in same)
    # TV distance replays as an exact rational of the integers
    full = TX.vocab_drift(old, new, k=1000).collect()
    tv = sum(r["dev"] for r in full) / (2 * t_old * t_new)
    assert 0 < tv < 1


def test_tf_rank_runs_with_qrels_matches_two_operator_shape(spark):
    """The fused one-tokenize variant (r14) must be row-identical
    to tf_rank_runs + containment_qrels called separately — the
    qrels-from-tf equivalence (tf row exists iff whole-word
    containment, same split regex) exercised with null text, docs
    with no hits, and a term absent from the corpus."""
    docs = _docs(spark)
    terms = ["spark", "data", "zzz"]
    run_f, qr_f = TX.tf_rank_runs_with_qrels(docs, terms, k=10)
    run_s = TX.tf_rank_runs(docs, terms, k=10)
    qr_s = TX.containment_qrels(docs, terms)
    for a, b in ((run_f, run_s), (qr_f, qr_s)):
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0
    m_f = {tuple(r) for r in
           TX.retrieval_metrics(run_f, qr_f, k=10).collect()}
    m_s = {tuple(r) for r in
           TX.retrieval_metrics(run_s, qr_s, k=10).collect()}
    assert m_f == m_s
