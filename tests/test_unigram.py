"""Unigram-LM tokenizer (operators/unigram.py): exact-integer
Viterbi properties, hard-EM determinism, total coverage, and the
corpus tiling invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from siridb_server_spark.localdf import arrow_df
from siridb_server_spark.operators import unigram as U
from siridb_server_spark.operators.unigram import _viterbi


def test_viterbi_exact_integer_selection():
    # counts chosen so the whole-word piece wins over char splits
    counts = {"a": 5, "b": 5, "ab": 3, "abb": 4}
    total = 17
    # 'abb' as one piece: 4/17 ; 'ab'+'b': 15/289 ; chars: 125/4913
    assert _viterbi("abb", counts, total, 8) == ("abb",)
    # remove the word piece: 'ab'+'b' (15/289) beats 'a'+'b'+'b'
    del counts["abb"]
    assert _viterbi("abb", counts, 13, 8) == ("ab", "b")


def test_viterbi_tie_prefers_fewer_then_lex():
    # 'ab'·'cd' and 'abc'·'d' tie in k and product -> lex smaller
    counts = {"ab": 2, "cd": 3, "abc": 2, "d": 3,
              "a": 1, "b": 1, "c": 1}
    assert _viterbi("abcd", counts, 13, 8) == ("ab", "cd")
    # fewer pieces beat more at equal product·T^(L-k)? higher k
    # divides by T more — strictly worse, so 1 piece always wins
    counts2 = {"xy": 4, "x": 2, "y": 2}
    assert _viterbi("xy", counts2, 8, 8) == ("xy",)


def test_train_deterministic_and_covering(spark):
    docs = arrow_df(spark, [
        (1, "resegment resegmenting segments segmentation"),
        (2, "the segment of the resegmented corpus"),
        (3, "zq9' zq9' unseen"),
    ], "doc_id long, text string")
    v1 = U.unigram_train(docs, vocab_size=50, seed_size=500,
                         n_iters=3)
    v2 = U.unigram_train(docs.repartition(3), vocab_size=50,
                         seed_size=500, n_iters=3)
    assert [tuple(r) for r in v1.collect()] \
        == [tuple(r) for r in v2.collect()]
    # full alphabet floor -> any word-pattern text encodes
    probe = arrow_df(spark, [(9, "xxq''77zzz never seen before")],
                     "doc_id long, text string")
    enc = U.unigram_encode(probe, v1).first()
    assert enc["n_tokens"] > 0
    assert "".join(enc["tokens"]) \
        == "xxq''77zzz" + "never" + "seen" + "before"


def test_encode_tiling_on_corpus(spark):
    from siridb_server_spark.sources.testdata import load
    docs = load(spark, "/root/testdata/sf0.001", "documents")
    v = U.unigram_train(docs.where("doc_id % 10 = 0"),
                        vocab_size=200, seed_size=2000, n_iters=2)
    enc = U.unigram_encode(docs, v)
    bad = (enc.select(
        "doc_id",
        F.aggregate("tokens", F.lit(0).cast("long"),
                    lambda a, t: a + F.length(t)).alias("tc"))
        .join(docs.select(
            "doc_id",
            F.length(F.regexp_replace(
                F.lower(F.coalesce("text", F.lit(""))),
                "[^a-z0-9']", "")).cast("long").alias("wc")),
            "doc_id")
        .where("tc <> wc"))
    assert bad.count() == 0


def test_frequent_words_become_single_pieces(spark):
    docs = arrow_df(spark, [
        (1, "common common common common rare"),
        (2, "common things stay common here"),
    ], "doc_id long, text string")
    v = U.unigram_train(docs, vocab_size=30, seed_size=300,
                        n_iters=3)
    enc = {r["doc_id"]: r["tokens"] for r in
           U.unigram_encode(docs, v).collect()}
    assert enc[1].count("common") == 4
