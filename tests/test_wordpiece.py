"""WordPiece tokenizer (operators/wordpiece.py): likelihood-scored
merge selection (vs BPE's raw counts), greedy longest-match
encoding, UNK semantics, and the tiling invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from siridb_server_spark.localdf import arrow_df
from siridb_server_spark.operators import wordpiece as WP


def test_train_pieces_scores_not_raw_counts():
    # "ab" appears 10× but a,b are everywhere (score 10/(30·30));
    # "xq" appears only 4× but x,q appear nowhere else (score
    # 4/(4·4)) — WordPiece must merge (x, ##q) first, where BPE
    # would take (a, ##b)
    wc = [("ab", 10), ("ba", 10), ("aab", 10), ("xq", 4)]
    pieces = WP._train_pieces(wc, ["a", "b", "x", "q"],
                              num_merges=1, min_count=2)
    assert pieces[-1] == "xq"


def test_train_tie_breaks_lexicographic():
    # two pairs with identical counts and identical single counts
    wc = [("ab", 3), ("cd", 3)]
    pieces = WP._train_pieces(wc, ["a", "b", "c", "d"],
                              num_merges=1, min_count=2)
    assert pieces[-1] == "ab"


def test_encode_word_longest_match_and_unk():
    vocab = {"un", "##able", "##a", "##b", "##l", "##e", "u", "n"}
    assert WP.encode_word("unable", vocab) == ("un", "##able")
    # missing continuation coverage → UNK for the whole word
    assert WP.encode_word("unz", vocab) == (WP.UNK,)


def test_merge_word_strips_continuation_prefix():
    assert WP._merge_word(("u", "##n", "##a"), ("u", "##n")) == \
        ("un", "##a")
    assert WP._merge_word(("u", "##n", "##a"), ("##n", "##a")) == \
        ("u", "##na")


def test_encode_corpus_no_unk_and_tiling(spark):
    docs = arrow_df(spark, [
        (1, "alpha beta alpha"),
        (2, "beta gamma"),
        (3, None),
        (4, "  "),
    ], "doc_id long, text string")
    v = WP.wordpiece_train(docs, num_merges=10, min_count=2)
    enc = WP.wordpiece_encode(docs, v)
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert all(r["n_unk"] == 0 for r in rows.values())
    chars = F.aggregate(
        "tokens", F.lit(0).cast("long"),
        lambda a, t: a + F.length(t)
        - F.when(t.startswith("##"), 2).otherwise(0))
    tiled = {r["doc_id"]: r["tc"] for r in
             enc.select("doc_id", chars.alias("tc")).collect()}
    assert tiled == {1: 14, 2: 9, 3: 0, 4: 0}


def test_encode_unseen_alphabet_is_unk(spark):
    train = arrow_df(spark, [(1, "aa ab ba")],
                     "doc_id long, text string")
    v = WP.wordpiece_train(train, num_merges=4, min_count=1)
    new = arrow_df(spark, [(9, "ab zz")],
                   "doc_id long, text string")
    got = WP.wordpiece_encode(new, v).first()
    assert got["n_unk"] == 1
    assert WP.UNK in got["tokens"]


def test_vocab_orders_alphabet_then_learned(spark):
    docs = arrow_df(spark, [(1, "aba aba ab")],
                    "doc_id long, text string")
    v = [r["piece"] for r in
         WP.wordpiece_train(docs, num_merges=2, min_count=1)
         .orderBy("rank").collect()]
    assert v[:4] == ["a", "b", "##a", "##b"]
    assert all(len(p) > 1 or p.startswith("##") is False
               for p in v[4:])  # learned pieces follow
