"""BPE tokenizer training/encoding tests.

The trainer is verified against an INDEPENDENT in-memory
implementation of the public merge-learning algorithm (written here,
not shared with the operator), so a bug in the Spark-side word
counting, the tie-breaks, or the merge application fails loudly.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

import siridb_server_spark.operators.bpe as B

DOCS = [
    (1, "The lower the better when lowering lowers."),
    (2, "New, newer, NEWEST: lower and lowest!"),
    (3, "Wider and wider widths widen the widest cases"),
    (4, "low lows lowest lower low low"),
    (5, "the the the and and a 42 42's"),
    (6, None),
    (7, ""),
]


def _reference_merges(docs, num_merges, min_count):
    wc = Counter()
    for _, t in docs:
        wc.update(re.findall(r"[a-z0-9']+", (t or "").lower()))
    vocab = {tuple(w) + ("</w>",): c for w, c in wc.items()}
    out = []
    for rank in range(num_merges):
        pairs = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), cnt = min(pairs.items(),
                                 key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_count:
            break
        out.append((rank, left, right, cnt))
        nxt = {}
        for sym, c in vocab.items():
            merged, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == \
                        (left, right):
                    merged.append(left + right)
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            key = tuple(merged)
            nxt[key] = nxt.get(key, 0) + c
        vocab = nxt
    return out


def test_bpe_train_matches_independent_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in B.bpe_train(df, num_merges=8, vocab_cap=1000,
                                min_count=2).collect()]
    assert got == _reference_merges(DOCS, 8, 2)
    assert got[0] == (0, "l", "o", 11)  # fixture anchor


def test_bpe_encode_roundtrip_and_counts(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    merges = B.bpe_train(df, num_merges=8, vocab_cap=1000,
                         min_count=2)
    enc = {r["doc_id"]: r for r in B.bpe_encode(df, merges).collect()}
    # concatenating tokens reconstructs the normalized words exactly
    for did, text in DOCS:
        toks = enc[did]["tokens"]
        assert enc[did]["n_tokens"] == len(toks)
        joined = "".join(toks).replace(B.EOW, " ").strip()
        norm = " ".join(re.findall(r"[a-z0-9']+",
                                   (text or "").lower()))
        assert joined == norm, did
    # learned merges actually bind: 'low' is one token
    assert "low" in enc[4]["tokens"]
    assert "the</w>" in enc[1]["tokens"]


def test_bpe_encode_fewer_tokens_than_chars(spark):
    """More merges -> never more tokens; encode with the empty
    table = pure character split."""
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    chars = {r["doc_id"]: r["n_tokens"]
             for r in B.bpe_encode(df, []).collect()}
    merges = B.bpe_train(df, num_merges=8, vocab_cap=1000,
                         min_count=2)
    merged = {r["doc_id"]: r["n_tokens"]
              for r in B.bpe_encode(df, merges).collect()}
    for did in chars:
        assert merged[did] <= chars[did]
    assert merged[4] < chars[4]


def test_bpe_vocab_cap_keeps_head(spark):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    top = B.word_frequencies(df, vocab_cap=3).collect()
    assert [r["word"] for r in top] == ["the", "and", "low"]
    assert len(top) == 3


def test_bpe_on_documents_corpus(spark):
    """Corpus-scale smoke on the real documents table: training
    completes with one shuffle, encoding is row-local, counts are
    positive and reproducible."""
    docs = (spark.read
            .parquet("/root/testdata/sf0.001/documents.parquet"))
    merges = B.bpe_train(docs, num_merges=12, vocab_cap=5000,
                         min_count=2)
    rows = merges.collect()
    assert len(rows) == 12
    assert all(r["pair_count"] >= 2 for r in rows)
    enc = B.bpe_encode(docs, merges)
    agg = enc.agg(F.count("*").alias("n"),
                  F.sum("n_tokens").alias("toks")).collect()[0]
    assert agg["n"] == docs.count()
    assert agg["toks"] > 0
    # determinism across runs
    rows2 = B.bpe_train(docs, num_merges=12, vocab_cap=5000,
                        min_count=2).collect()
    assert rows == rows2
