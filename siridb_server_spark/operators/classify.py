"""Multinomial Naive Bayes document classification — the classic
trainable quality/domain filter of large-corpus curation pipelines
(a linear classifier over token counts, the shape used to select
"high-quality" web documents for LM training sets).

Spark-first: training is ONE groupBy over (label, term) — integer
sufficient statistics with map-side partial combine, the shuffle
carries ≤ |labels|·|vocab| rows however large the corpus is. The
model is a plain DataFrame; persist it as parquet and serve it with
a join (AQE broadcasts it whenever the vocabulary fits).

Two serving paths, same split as the int8 ANN family
(similarity.scalar_quantize):

- ``nb_score_float``: the standard Laplace-smoothed log-likelihood
  (F.log doubles) — the user-facing score, accuracy pytest-verified.
- ``nb_score_int``: a quantized-log scorer with NO transcendentals:
  fixlog2(n) ≈ 2¹⁶·log₂ n — exponent plus a 16-bit linear mantissa
  read off the binary string, exact integer arithmetic that Spark
  (F.bin/F.conv) and DuckDB (bin/<<///) evaluate identically — so
  classifications are deterministic and the WHOLE confusion matrix
  is pinnable by a cross-engine value hash. The ≤0.0861-bit log
  error costs a little accuracy vs the float path (measured in
  tests/test_classify.py); the trade is the same one int8
  embeddings make: exactness for the reproducibility contract,
  floats where precision matters.

Tokenization is the repo-wide proven contract: whitespace tokens of
the lowered, trimmed text (operators/text.py words()).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import words


def _tokens(df: DataFrame, text_col: str, *keep,
            features: str = "words", ngram_n: int = 3):
    """Feature stream per document: ``words`` = the repo-wide
    whitespace tokenizer contract; ``chars`` = overlapping
    character n-grams of the lowered/trimmed text (whitespace kept
    inside grams — word boundaries are a real langid signal). The
    char path is what makes NB a usable language identifier on
    short documents and related languages: test-time words unseen
    in training carry zero signal for the word model (it collapses
    to the prior), while their character patterns still match.
    Both are pure Catalyst array expressions; the SQL mirror for
    chars is list_transform(range(...)) + substr + a
    length-filter (short tail grams dropped)."""
    t = F.lower(F.trim(F.col(text_col)))
    if features == "words":
        toks = F.filter(words(t), lambda x: x != "")
    elif features == "chars":
        from ..functions.bind import let

        n = int(ngram_n)
        # let-bind the lowered text: substr-ing the lower(trim(..))
        # EXPRESSION inside the lambda re-lowers the whole document
        # once per character position — O(|doc|²) per doc
        grams = let(t, lambda tv: F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(tv), F.lit(1))),
            lambda p: tv.substr(p, F.lit(n))))
        toks = F.filter(grams, lambda g: F.length(g) == n)
    else:
        raise ValueError(f"unknown features {features!r}")
    return (df.where(F.length(F.trim(F.col(text_col))) > 0)
            .select(*keep, F.explode(toks).alias("term")))


@dataclass
class NBModel:
    """counts: (label, term, cnt); labels: (label, n_docs,
    n_tokens); n_labels / total_docs / vocab: driver scalars
    (single-row aggregates — bounded at any corpus size)."""
    counts: DataFrame
    labels: DataFrame
    vocab: int
    total_docs: int
    #: featurizer the model was trained with — scoring reuses it,
    #: so train/serve tokenization can never diverge
    features: str = "words"
    ngram_n: int = 3


def nb_train(df: DataFrame, label_col: str = "source",
             text_col: str = "text", features: str = "words",
             ngram_n: int = 3) -> NBModel:
    """Fit the model: per-(label, term) token counts, per-label
    token/document totals, and the vocabulary size. All integers —
    the sufficient statistics ARE the model, and they hash
    cross-engine (text_nb_model entry). ``features="chars"``
    trains on character ``ngram_n``-grams instead of whitespace
    words (see :func:`_tokens` for why that is the right langid
    featurizer); the scorers read the choice off the model."""
    toks = _tokens(df, text_col, F.col(label_col).alias("label"),
                   features=features, ngram_n=ngram_n)
    counts = (toks.groupBy("label", "term")
              .agg(F.count(F.lit(1)).alias("cnt")))
    tok_totals = (toks.groupBy("label")
                  .agg(F.count(F.lit(1)).alias("n_tokens")))
    doc_totals = (df.where(F.length(F.trim(F.col(text_col))) > 0)
                  .groupBy(F.col(label_col).alias("label"))
                  .agg(F.count(F.lit(1)).alias("n_docs")))
    labels = tok_totals.join(doc_totals, "label")
    agg = counts.agg(
        F.count_distinct("term").alias("v")).first()
    total_docs = labels.agg(F.sum("n_docs").alias("d")) \
        .first()["d"]
    return NBModel(counts=counts, labels=labels,
                   vocab=int(agg["v"] or 0),
                   total_docs=int(total_docs or 0),
                   features=features, ngram_n=int(ngram_n))


#: fixed-point log fractional bits (2^16 units per bit)
FIXLOG_B = 16


def fixlog2(col):
    """≈ 2¹⁶·log₂ n for n ≥ 1 as EXACT integer arithmetic — the
    classic exponent + linear-mantissa approximation: with
    e = floor(log₂ n) (binary-string length − 1),

        fixlog2(n) = e·2¹⁶ + (n·2¹⁶ div 2ᵉ) − 2¹⁶

    i.e. the mantissa n/2ᵉ − 1 stands in for log₂(n/2ᵉ). Every op is
    int64 (n ≤ 2³¹ keeps n·2¹⁶ in range; bin/shiftleft/div exist in
    both Spark and DuckDB with identical semantics), so the value is
    bit-identical across engines. |error| ≤ 0.0861 bit (the max gap
    between log₂(1+f) and f), one-sided — ~6× tighter than a
    half-bit floor, enough for argmax scoring to track the float
    path on separable data while staying hashable.

    Implementation reads both terms off the binary STRING: e is its
    length − 1, and the mantissa is the next 16 bits (right-padded —
    for e<16 identical to the shift, for e>16 the truncation IS the
    floor), converted back with conv(·,2,10). DuckDB mirrors with
    plain integer `<<`/`//` arithmetic — same integers, different
    spelling (both exact)."""
    n = col.cast("long")
    b = F.bin(n)
    e = (F.length(b) - F.lit(1)).cast("long")
    mant = F.conv(F.rpad(F.substring(b, 2, FIXLOG_B),
                         FIXLOG_B, "0"), 2, 10).cast("long")
    return e * F.lit(1 << FIXLOG_B) + mant


def _doc_label_scores(model: NBModel, df: DataFrame,
                      id_col: str, text_col: str) -> DataFrame:
    """(doc_id, label, tf, cnt, n_tokens, n_docs) — the joined
    per-document-term-label frame both scorers aggregate. tokens ×
    |labels| rows (labels are few and bounded), then a hash join
    against the counts table on (label, term).

    Documents with ZERO feature tokens (chars path: text shorter
    than ``ngram_n``) still get scored — a synthetic tf=0 row per
    label makes their likelihood sum empty, so they score the
    class prior alone, exactly like the word path scores a doc of
    all-unseen words. Without this the gate would silently emit no
    keep/drop bit for short docs (an inner join downstream would
    drop them; a 'missing = pass' reading would let them through
    ungated)."""
    tf = (_tokens(df, text_col, F.col(id_col).alias("doc_id"),
                  features=model.features, ngram_n=model.ngram_n)
          .groupBy("doc_id", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    base = (df.where(F.length(F.trim(F.col(text_col))) > 0)
            .select(F.col(id_col).alias("doc_id")))
    tokenless = (base.join(tf.select("doc_id"), "doc_id",
                           "left_anti")
                 .withColumn("term",
                             F.lit(None).cast("string"))
                 .withColumn("tf", F.lit(0).cast("long")))
    tf = tf.unionByName(tokenless)
    # precompute the log terms ON THE MODEL TABLES — they depend
    # only on (label, term) / label, but inlining them in the
    # scorers' aggregates re-evaluated the fixlog2/ln string-op
    # chains per joined (doc, term, label) row (tokens × labels
    # evaluations of bin/conv/rpad). Same functions of the same
    # integers ⇒ identical scores. Missing terms: cnt→0, so
    # fixlog2(0+1) = 0 and ln(0+1) = 0.0 are the coalesce literals.
    counts = model.counts.withColumn(
        "_lc_i", fixlog2(F.col("cnt") + F.lit(1))).withColumn(
        "_lc_f", F.log((F.col("cnt") + F.lit(1)).cast("double")))
    labels = model.labels.withColumn(
        "_lt_i", fixlog2(F.col("n_tokens") + F.lit(model.vocab))
    ).withColumn(
        "_lt_f", F.log((F.col("n_tokens")
                        + F.lit(model.vocab)).cast("double"))
    ).withColumn("_lp_i", fixlog2(F.col("n_docs")))
    tl = tf.crossJoin(F.broadcast(labels))
    return (tl.join(counts, ["label", "term"], "left")
            .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
            .withColumn("_lc_i", F.coalesce(F.col("_lc_i"),
                                            F.lit(0).cast("long")))
            .withColumn("_lc_f", F.coalesce(F.col("_lc_f"),
                                            F.lit(0.0))))


def nb_score_int(model: NBModel, df: DataFrame,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Quantized-log NB scores: per (doc, label),
    Σ_t tf·(fixlog2(cnt+1) − fixlog2(n_tokens+V)) + fixlog2(n_docs)
    — the Laplace-smoothed likelihood with the exact fixed-point
    log₂ in place of ln (a constant 1/ln 2 rescale of every score,
    which argmax ignores). Pure integers end to end. Output:
    (doc_id, label, iscore long)."""
    j = _doc_label_scores(model, df, id_col, text_col)
    term = F.col("tf") * (F.col("_lc_i") - F.col("_lt_i"))
    return (j.groupBy("doc_id", "label")
            .agg((F.sum(term) + F.first(F.col("_lp_i")))
                 .alias("iscore")))


def nb_predict_int(model: NBModel, df: DataFrame,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """argmax of the integer scores, ties to the first label in
    lexical order — fully deterministic. Output: (doc_id, pred)."""
    from pyspark.sql import Window

    scores = nb_score_int(model, df, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("iscore").desc(), F.col("label"))
    return (scores.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", F.col("label").alias("pred")))


def nb_score_float(model: NBModel, df: DataFrame,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Full-precision NB log-likelihoods (the user-facing path):
    Σ_t tf·ln((cnt+1)/(n_tokens+V)) + ln(n_docs/total_docs).
    Output: (doc_id, label, score double)."""
    j = _doc_label_scores(model, df, id_col, text_col)
    term = F.col("tf") * (F.col("_lc_f") - F.col("_lt_f"))
    prior = (F.log(F.col("n_docs").cast("double"))
             - F.lit(float(__import__("math").log(
                 max(model.total_docs, 1)))))
    return (j.groupBy("doc_id", "label")
            .agg((F.sum(term) + F.first(prior)).alias("score")))


def nb_predict_float(model: NBModel, df: DataFrame,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """argmax of the float scores (ties to first label)."""
    from pyspark.sql import Window

    scores = nb_score_float(model, df, id_col, text_col)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("label"))
    return (scores.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("doc_id", F.col("label").alias("pred")))


def nb_confusion(df: DataFrame, pred: DataFrame,
                 label_col: str = "source",
                 id_col: str = "doc_id") -> DataFrame:
    """Confusion matrix (label, pred, n) of a prediction frame
    against the true labels."""
    truth = df.select(F.col(id_col).alias("doc_id"),
                      F.col(label_col).alias("label"))
    return (truth.join(pred, "doc_id")
            .groupBy("label", "pred")
            .agg(F.count(F.lit(1)).alias("n")))
