"""Byte-pair-encoding tokenizer training and application.

Classic word-frequency BPE (the public Sennrich et al. 2016
algorithm): learn the top-K symbol merges from a corpus, then
tokenize documents with the learned merge table. This is the last
piece of the tokenizer story for a training-data pipeline — the
repo already counts whitespace and BPE-ish regex tokens
(text.py::token_count / bpe_token_count); this module learns a REAL
merge table and applies it.

Scale shape (the part that matters at 100 TB):

- ``bpe_train`` makes exactly ONE corpus-scale pass: tokenize +
  ``groupBy(word).count()`` (map-side partial aggregation collapses
  the Zipf head before the shuffle, so the exchange carries at most
  |vocab| rows per partition). Everything after that operates on
  the word-FREQUENCY table, which is vocabulary-sized, not
  corpus-sized — the standard trick that makes BPE training
  tractable at any corpus size.
- The frequency table is capped at the ``vocab_cap`` most frequent
  words (deterministic order) and the merge loop runs driver-side
  over those rows — bounded like the k-means centroid loop in
  similarity.py, NOT a corpus collect. The dropped long tail
  contributes negligible pair mass (each tail word adds < min_count
  to any pair).
- ``bpe_encode`` broadcasts the learned merge list (tiny) inside an
  Arrow-batched mapInPandas: row-local, embarrassingly parallel,
  no shuffle, with a per-batch word->tokens memo so the Zipf head
  is encoded once per batch rather than once per occurrence.

Determinism: merge ties break on (count desc, left asc, right asc);
greedy left-to-right replacement within a word — so the learned
table and every encoding are exact, reproducible constants, which
is what the correctness oracle pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: end-of-word marker symbol (kept distinct from any character)
EOW = "</w>"

#: the word alphabet shared by training and encoding (and mirrored
#: in the DuckDB oracle): lowercased runs of letters/digits/'
WORD_PATTERN = r"[a-z0-9']+"

MERGES_SCHEMA = T.StructType([
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("left", T.StringType(), False),
    T.StructField("right", T.StringType(), False),
    T.StructField("pair_count", T.LongType(), False),
])


def _word_symbols(word: str) -> tuple:
    return tuple(word) + (EOW,)


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    """Greedy left-to-right non-overlapping merge of one pair."""
    a, b = pair
    out = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _train_merges(word_counts, num_merges: int, min_count: int):
    """Driver-side merge loop over a (word, count) list. Returns
    [(rank, left, right, pair_count)]."""
    vocab = {}
    for word, cnt in word_counts:
        sym = _word_symbols(word)
        vocab[sym] = vocab.get(sym, 0) + int(cnt)
    merges = []
    for rank in range(num_merges):
        pairs = {}
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        # deterministic: max count, ties to the lexicographically
        # smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        if cnt < min_count:
            break
        merges.append((rank, left, right, cnt))
        vocab = {_merge_word(sym, (left, right)): c
                 for sym, c in vocab.items()}
    return merges


def word_frequencies(df: DataFrame, text_col: str = "text",
                     vocab_cap: int = 50000) -> DataFrame:
    """The single corpus-scale pass: word -> count, capped at the
    vocab_cap most frequent words (count desc, word asc — exact and
    deterministic)."""
    return (df
            .select(F.explode(F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(WORD_PATTERN), 0))
                .alias("word"))
            .where(F.col("word") != "")
            .groupBy("word").agg(F.count("*").alias("count"))
            .orderBy(F.col("count").desc(), F.col("word"))
            .limit(vocab_cap))


def bpe_train(df: DataFrame, text_col: str = "text",
              num_merges: int = 50, vocab_cap: int = 50000,
              min_count: int = 2) -> DataFrame:
    """Learn a BPE merge table. One corpus shuffle (word counts);
    the merge loop itself is driver-side over the capped,
    vocabulary-sized frequency table. Returns (rank, left, right,
    pair_count)."""
    wc = [(r["word"], r["count"]) for r in
          word_frequencies(df, text_col, vocab_cap).collect()]
    merges = _train_merges(wc, num_merges, min_count)
    from ..localdf import arrow_df
    return arrow_df(df.sparkSession, merges, MERGES_SCHEMA)


def encode_word(word: str, ranks: dict) -> tuple:
    """Tokenize one word with a {(left, right): rank} table: always
    apply the lowest-rank mergeable pair first (the standard BPE
    encode order, matching how training would have segmented it)."""
    sym = _word_symbols(word)
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        sym = _merge_word(sym, best_pair)
    return sym


def bpe_encode(df: DataFrame, merges, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Tokenize documents with a learned merge table (list of
    (rank, left, right[, count]) tuples or the bpe_train DataFrame).
    Arrow-batched row-local map — no shuffle; the merge table rides
    the task closure (it is num_merges rows). Returns (id_col,
    n_tokens, tokens array<string>)."""
    if isinstance(merges, DataFrame):
        merges = [(r["rank"], r["left"], r["right"])
                  for r in merges.collect()]
    ranks = {(m[1], m[2]): m[0] for m in merges}

    schema = T.StructType([
        df.schema[id_col],
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ])
    src = df.select(id_col, F.col(text_col).alias("text"))

    def run(batches):
        import pandas as pd
        import re

        word_re = re.compile(r"[a-z0-9']+")
        for pdf in batches:
            ids, counts, toks = [], [], []
            memo = {}
            for did, text in zip(pdf[id_col], pdf["text"]):
                out = []
                for w in word_re.findall((text or "").lower()):
                    got = memo.get(w)
                    if got is None:
                        got = encode_word(w, ranks)
                        memo[w] = got
                    out.extend(got)
                ids.append(did)
                counts.append(len(out))
                toks.append(out)
            yield pd.DataFrame({id_col: ids, "n_tokens": counts,
                                "tokens": toks})

    return src.mapInPandas(run, schema=schema)
