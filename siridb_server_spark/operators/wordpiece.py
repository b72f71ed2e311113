"""WordPiece tokenizer training and application — the third
tokenizer family next to BPE (operators/bpe.py) and the unigram LM
(operators/unigram.py), completing the trio a training-data
pipeline actually chooses between.

Training is the public likelihood-ratio variant (Schuster &
Nakajima 2012 as popularized by BERT's reference implementation):
like BPE it repeatedly merges the best adjacent symbol pair, but
scored by count(pair)/(count(left)·count(right)) — the pair whose
merge most improves a unigram likelihood — rather than raw count.
Scores compare as EXACT cross-multiplied integers (Python
arbitrary-precision on the driver; no floats, no overflow at any
corpus size), ties to the lexicographically smallest pair, so the
learned vocabulary is a pure function of the corpus.

Scale shape, same as BPE:

- ONE corpus-scale pass builds the capped word-frequency table
  (``bpe.word_frequencies`` — map-side combine, the shuffle carries
  ≤ |vocab| rows) plus one alphabet pass whose result is
  alphabet-sized; the merge loop is driver-side over those rows.
- Encoding is greedy longest-match-first against the final
  vocabulary (the standard WordPiece encoder — no merge ranks
  needed at serving time), Arrow-batched and row-local with a
  per-batch word memo; the vocabulary rides the task closure.

Continuation pieces carry the ``##`` prefix. The alphabet is seeded
from the FULL corpus (both ``c`` and ``##c`` forms), so encoding
the training corpus never emits [UNK] — which is what makes the
corpus-wide tiling invariant (Σ piece chars = Σ word chars) a safe
cross-engine contract (text_wordpiece_tiling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import WORD_PATTERN, word_frequencies

UNK = "[UNK]"
VOCAB_SCHEMA = "piece string, rank int"


def _wp_symbols(word: str) -> tuple:
    return (word[0],) + tuple("##" + c for c in word[1:])


def _strip_cont(sym: str) -> str:
    return sym[2:] if sym.startswith("##") else sym


def _merge_word(sym: tuple, pair: tuple) -> tuple:
    a, b = pair
    out = []
    i, n = 0, len(sym)
    while i < n:
        if i + 1 < n and sym[i] == a and sym[i + 1] == b:
            out.append(a + _strip_cont(b))
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _train_pieces(word_counts, alphabet, num_merges: int,
                  min_count: int):
    """Driver-side WordPiece merge loop over a (word, count) list.
    Returns the ordered piece list: alphabet first (word-initial
    then continuation forms, each lexicographic), then merged
    pieces in learn order."""
    vocab = {}
    for word, cnt in word_counts:
        if not word:
            continue
        sym = _wp_symbols(word)
        vocab[sym] = vocab.get(sym, 0) + int(cnt)
    pieces = sorted(a for a in alphabet) + \
        sorted("##" + a for a in alphabet)
    for _ in range(num_merges):
        pairs, singles = {}, {}
        for sym, cnt in vocab.items():
            for s in sym:
                singles[s] = singles.get(s, 0) + cnt
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        # score = c_pair / (c_left·c_right), compared exactly by
        # cross-multiplication; ties to the smallest pair
        best, best_key = None, None
        for p, c in pairs.items():
            if c < min_count:
                continue
            den = singles[p[0]] * singles[p[1]]
            if best is None:
                best, best_key = p, (c, den)
                continue
            bc, bden = best_key
            if c * bden > bc * den or \
                    (c * bden == bc * den and p < best):
                best, best_key = p, (c, den)
        if best is None:
            break
        pieces.append(best[0] + _strip_cont(best[1]))
        vocab = {_merge_word(sym, best): c
                 for sym, c in vocab.items()}
    return pieces


def _corpus_alphabet(df: DataFrame, text_col: str) -> list:
    """Distinct word characters of the corpus — one pass whose
    result is alphabet-sized (the shuffle carries ≤ |alphabet| rows
    per partition thanks to partial aggregation)."""
    chars = (df.select(F.explode(F.split(F.regexp_replace(
        F.lower(F.col(text_col)), "[^a-z0-9']", ""), ""))
        .alias("c"))
        .where(F.col("c") != "")
        .distinct())
    return [r["c"] for r in chars.collect()]


def wordpiece_train(df: DataFrame, text_col: str = "text",
                    num_merges: int = 50, vocab_cap: int = 50000,
                    min_count: int = 2) -> DataFrame:
    """Learn a WordPiece vocabulary. Two bounded corpus passes
    (capped word frequencies + alphabet), then the driver-side
    likelihood-scored merge loop. Returns (piece, rank) with rank
    the vocabulary order (alphabet first, then learn order)."""
    wc = [(r["word"], r["count"]) for r in
          word_frequencies(df, text_col, vocab_cap).collect()]
    alphabet = _corpus_alphabet(df, text_col)
    pieces = _train_pieces(wc, alphabet, num_merges, min_count)
    from ..localdf import arrow_df
    return arrow_df(df.sparkSession,
                    [(p, i) for i, p in enumerate(pieces)],
                    VOCAB_SCHEMA)


def encode_word(word: str, vocab: set) -> tuple:
    """Greedy longest-match-first WordPiece encoding of one word;
    ([UNK],) when some position cannot be covered."""
    out, i, n = [], 0, len(word)
    while i < n:
        j = n
        while j > i:
            piece = word[i:j] if i == 0 else "##" + word[i:j]
            if piece in vocab:
                out.append(piece)
                break
            j -= 1
        else:
            return (UNK,)
        i = j
    return tuple(out)


def wordpiece_encode(df: DataFrame, vocab,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Tokenize documents with a learned vocabulary (the
    wordpiece_train DataFrame or an iterable of pieces).
    Arrow-batched row-local map, no shuffle. Returns (id_col,
    n_tokens, n_unk, tokens array<string>)."""
    if isinstance(vocab, DataFrame):
        vocab = [r["piece"] for r in vocab.collect()]
    vset = set(vocab)

    schema = T.StructType([
        df.schema[id_col],
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("n_unk", T.LongType(), False),
        T.StructField("tokens", T.ArrayType(T.StringType()), False),
    ])
    src = df.select(id_col, F.col(text_col).alias("text"))

    def run(batches):
        import re

        import pandas as pd

        word_re = re.compile(WORD_PATTERN)
        for pdf in batches:
            ids, counts, unks, toks = [], [], [], []
            memo = {}
            for did, text in zip(pdf[id_col], pdf["text"]):
                out = []
                for w in word_re.findall((text or "").lower()):
                    got = memo.get(w)
                    if got is None:
                        got = encode_word(w, vset)
                        memo[w] = got
                    out.extend(got)
                ids.append(did)
                counts.append(len(out))
                unks.append(sum(1 for t in out if t == UNK))
                toks.append(out)
            yield pd.DataFrame({id_col: ids, "n_tokens": counts,
                                "n_unk": unks, "tokens": toks})

    return src.mapInPandas(run, schema=schema)
