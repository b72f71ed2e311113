"""Unigram-LM tokenizer (SentencePiece-style, Kudo 2018) trained
with hard-EM and an EXACT integer Viterbi — fully deterministic on
any machine, no floating point anywhere in training or encoding.

Shape mirrors operators/bpe.py (the other real-world subword
trainer): ONE corpus-scale shuffle (the capped word-frequency
table), then a driver-side loop over the vocabulary-sized table —
bounded like the BPE merge loop and the k-means centroid loop. The
likelihood comparison Π c_i / T^k between segmentations is done
without logs: both sides are scaled by T^(L−k) (L = word length,
k = piece count), turning every score into an exact integer
Π c_i · T^(L−k). Ties break toward FEWER pieces, then the
lexicographically smaller piece sequence, so the segmentation —
and therefore the learned vocabulary — is a pure function of the
corpus.

Coverage is total by construction: the full single-character
alphabet of the word pattern ([a-z0-9']) is always in the
vocabulary with a floor count, so every word has at least the
character segmentation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import word_frequencies

_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789'"

VOCAB_SCHEMA = T.StructType([
    T.StructField("rank", T.IntegerType(), False),
    T.StructField("piece", T.StringType(), False),
    T.StructField("count", T.LongType(), False),
])


def _viterbi(word: str, counts: dict, total: int,
             max_len: int) -> tuple:
    """Best segmentation of ``word`` under piece counts: maximizes
    Π c_i / total^k, compared exactly as the integer
    Π c_i · total^(L−k). Returns a tuple of pieces. Assumes every
    single character is in ``counts`` (total coverage)."""
    L = len(word)
    # best[i] = (neg_score, n_pieces, pieces) for word[:i]; kept
    # MINIMAL, so ties prefer fewer pieces then the lexicographically
    # smaller piece tuple (piece-boundary-aware: every segmentation
    # of the same prefix flattens to the same characters, so the
    # tuple comparison is the only meaningful order)
    best = [None] * (L + 1)
    best[0] = (-1, 0, ())
    for i in range(1, L + 1):
        cand = None
        for ln in range(1, min(max_len, i) + 1):
            prev = best[i - ln]
            if prev is None:
                continue
            c = counts.get(word[i - ln:i])
            if c is None:
                continue
            # extend by one piece of length ln: multiply by
            # c · total^(ln−1) to keep the T-exponent at i−k
            score = prev[0] * c * total ** (ln - 1)
            key = (score, prev[1] + 1,
                   prev[2] + (word[i - ln:i],))
            if cand is None or key < cand:
                cand = key
        if cand is not None:
            best[i] = cand
    return best[L][2]


def unigram_train(df: DataFrame, text_col: str = "text",
                  vocab_size: int = 400, max_piece_len: int = 8,
                  seed_size: int = 4000, n_iters: int = 3,
                  vocab_cap: int = 50000) -> DataFrame:
    """Learn a unigram-LM vocabulary. One corpus shuffle
    (word_frequencies, capped); seeding, hard-EM, and pruning run
    driver-side over the capped table. Returns (rank, piece, count)
    — rank orders by (count desc, piece asc), deterministic."""
    wc = [(r["word"], r["count"]) for r in
          word_frequencies(df, text_col, vocab_cap).collect()]
    # --- seed: substring counts weighted by word frequency
    seed: dict = {}
    for w, c in wc:
        L = len(w)
        for i in range(L):
            for ln in range(1, min(max_piece_len, L - i) + 1):
                p = w[i:i + ln]
                seed[p] = seed.get(p, 0) + c
    pieces = sorted(seed.items(),
                    key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    counts = dict(pieces)
    for ch in _ALPHABET:                 # total coverage floor
        counts.setdefault(ch, 1)
    # --- hard-EM: Viterbi-segment, recount, prune
    for it in range(n_iters):
        total = sum(counts.values())
        new: dict = {}
        memo: dict = {}
        for w, c in wc:
            segs = memo.get(w)
            if segs is None:
                segs = _viterbi(w, counts, total, max_piece_len)
                memo[w] = segs
            for p in segs:
                new[p] = new.get(p, 0) + c
        keep = sorted(new.items(), key=lambda kv: (-kv[1], kv[0]))
        if it == n_iters - 1:
            keep = keep[:vocab_size]
        counts = dict(keep)
        for ch in _ALPHABET:
            counts.setdefault(ch, 1)
    vocab = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    rows = [(rank, p, int(c)) for rank, (p, c) in enumerate(vocab)]
    from ..localdf import arrow_df
    return arrow_df(df.sparkSession, rows, VOCAB_SCHEMA)


def unigram_encode(df: DataFrame, vocab,
                   text_col: str = "text",
                   id_col: str = "doc_id",
                   max_piece_len: int = 8) -> DataFrame:
    """Tokenize documents with a learned vocabulary (the
    unigram_train DataFrame or a list of (rank, piece, count)).
    Arrow-batched row-local map, vocabulary rides the task closure
    (≤ vocab_size rows), per-word memoization inside each batch —
    no shuffle. Returns (id_col, n_tokens, tokens array<string>)."""
    if isinstance(vocab, DataFrame):
        vocab = [(r["rank"], r["piece"], r["count"])
                 for r in vocab.collect()]
    counts = {p: int(c) for _, p, c in vocab}
    for ch in _ALPHABET:
        counts.setdefault(ch, 1)
    total = sum(counts.values())

    schema = T.StructType([
        df.schema[id_col],
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ])
    src = df.select(id_col, F.col(text_col).alias("text"))

    def run(batches):
        import re

        import pandas as pd

        word_re = re.compile(r"[a-z0-9']+")
        for pdf in batches:
            ids, ns, toks = [], [], []
            memo: dict = {}
            for did, text in zip(pdf[id_col], pdf["text"]):
                out = []
                for w in word_re.findall((text or "").lower()):
                    got = memo.get(w)
                    if got is None:
                        got = _viterbi(w, counts, total,
                                       max_piece_len)
                        memo[w] = got
                    out.extend(got)
                ids.append(did)
                ns.append(len(out))
                toks.append(out)
            yield pd.DataFrame({id_col: ids, "n_tokens": ns,
                                "tokens": toks})

    return src.mapInPandas(run, schema=schema)
