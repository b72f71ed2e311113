"""Naive Bayes classifier (operators/classify.py): sufficient
statistics, the exact fixed-point log2, both scoring paths, and
their agreement on separable data."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from siridb_server_spark.localdf import arrow_df
from siridb_server_spark.operators import classify as CL


def _docs(spark):
    # two cleanly separable vocabularies + shared filler
    rows = []
    for i in range(30):
        rows.append((i, "sport", "goal match team goal score the a"))
    for i in range(30, 60):
        rows.append((i, "tech", "compiler kernel stack code bug the a"))
    rows.append((60, "tech", None))      # null text: excluded
    rows.append((61, "sport", "   "))    # blank text: excluded
    return arrow_df(spark, rows, "doc_id long, label string, text string")


def test_fixlog2_exact_and_error_bound(spark):
    vals = [1, 2, 3, 5, 7, 127, 128, 129, 1000, 65537, 2**31 - 1]
    df = arrow_df(spark, [(v,) for v in vals], "n long")
    got = {r["n"]: r["fl"] for r in
           df.select("n", CL.fixlog2(F.col("n")).alias("fl"))
           .collect()}
    for v in vals:
        e = v.bit_length() - 1
        expect = e * 65536 + ((v << 16) // (1 << e)) - 65536
        assert got[v] == expect, v
        # one-sided bound: underestimates log2 by at most ~0.0861
        # bit (chord-vs-curve gap) plus the 2^-16 truncation
        err = got[v] / 65536 - math.log2(v)
        assert -0.0862 <= err <= 0.0, (v, err)


def test_nb_train_sufficient_stats(spark):
    m = CL.nb_train(_docs(spark), label_col="label")
    counts = {(r["label"], r["term"]): r["cnt"]
              for r in m.counts.collect()}
    assert counts[("sport", "goal")] == 60     # 2 per doc × 30
    assert counts[("tech", "kernel")] == 30
    assert ("sport", "kernel") not in counts
    labels = {r["label"]: r for r in m.labels.collect()}
    assert labels["sport"]["n_docs"] == 30     # excluded blank doc
    assert labels["sport"]["n_tokens"] == 30 * 7
    assert m.total_docs == 60
    # vocab: 6 sport + 6 tech distinct - 2 shared... goal repeats:
    # sport {goal match team score the a}=6, tech {compiler kernel
    # stack code bug the a}=7, shared {the a}
    assert m.vocab == 11


def test_nb_both_paths_perfect_and_agree_on_separable(spark):
    docs = _docs(spark)
    m = CL.nb_train(docs, label_col="label")
    pi = CL.nb_predict_int(m, docs)
    pf = CL.nb_predict_float(m, docs)
    ci = CL.nb_confusion(docs, pi, label_col="label").collect()
    cf = CL.nb_confusion(docs, pf, label_col="label").collect()
    for c in (ci, cf):
        assert sum(r["n"] for r in c) == 60
        assert all(r["label"] == r["pred"] for r in c)
    joined = pi.join(pf.withColumnRenamed("pred", "predf"),
                     "doc_id")
    assert joined.where("pred <> predf").count() == 0


def test_nb_predict_unseen_terms_fall_back_to_prior(spark):
    docs = _docs(spark)
    m = CL.nb_train(docs, label_col="label")
    new = arrow_df(spark, [(100, "zzz qqq")],
                   "doc_id long, text string")
    # all-unseen doc: every class scores tf·(fix(1)−fix(den)) +
    # prior; equal priors here, so the smaller denominator (fewer
    # training tokens — sport ties tech at 240) → deterministic
    # lexical tie-break
    got = CL.nb_predict_int(m, new).collect()
    assert len(got) == 1 and got[0]["pred"] in ("sport", "tech")


def test_nb_float_scores_match_python_oracle(spark):
    docs = _docs(spark)
    m = CL.nb_train(docs, label_col="label")
    one = arrow_df(spark, [(7, "goal kernel the")],
                   "doc_id long, text string")
    got = {r["label"]: r["score"] for r in
           CL.nb_score_float(m, one).collect()}
    counts = {(r["label"], r["term"]): r["cnt"]
              for r in m.counts.collect()}
    labels = {r["label"]: r for r in m.labels.collect()}
    for lab in ("sport", "tech"):
        den = labels[lab]["n_tokens"] + m.vocab
        expect = sum(
            math.log((counts.get((lab, t), 0) + 1) / den)
            for t in ("goal", "kernel", "the"))
        expect += math.log(labels[lab]["n_docs"] / m.total_docs)
        assert abs(got[lab] - expect) < 1e-9, lab


def test_nb_lang_gate_composition(spark):
    # separable data: the gate keeps every correctly-labeled doc
    # and drops a deliberately mislabeled one
    rows = [(i, "sport", "goal match team score") for i in range(20)]
    rows += [(100 + i, "tech", "compiler kernel bug code")
             for i in range(20)]
    rows.append((999, "sport", "compiler kernel bug code"))  # mislabeled
    docs = arrow_df(spark, rows, "doc_id long, lang string, text string")
    m = CL.nb_train(docs, label_col="lang")
    pred = CL.nb_predict_int(m, docs)
    truth = docs.select("doc_id", F.col("lang").alias("label"))
    gate = {r["doc_id"]: r["keep"] for r in
            truth.join(pred, "doc_id")
            .select("doc_id", (F.col("label") == F.col("pred"))
                    .alias("keep")).collect()}
    assert gate[999] is False
    assert all(gate[i] for i in range(20))
    assert all(gate[100 + i] for i in range(20))


def test_char_ngram_features_beat_words_on_unseen_vocab(spark):
    """The langid case the char path exists for: test docs whose
    WORDS never appeared in training. The word model collapses to
    the prior (predicts one label for everything, ~50% accuracy);
    the char-3-gram model still reads the languages' character
    patterns and classifies every held-out doc correctly."""
    def lang_a(i):          # 'zz'-flavored pseudo-language
        return f"zzar{i} bozz{i} zzil{i}ka"

    def lang_b(i):          # 'qq'-flavored pseudo-language
        return f"qqor{i} tuqq{i} qqol{i}mo"

    train = [(i, "A", lang_a(i)) for i in range(20)]
    train += [(100 + i, "B", lang_b(i)) for i in range(20)]
    test = [(1000 + i, "A", lang_a(500 + i)) for i in range(10)]
    test += [(2000 + i, "B", lang_b(500 + i)) for i in range(10)]
    tr = arrow_df(spark, train,
                  "doc_id long, lang string, text string")
    te = arrow_df(spark, test,
                  "doc_id long, lang string, text string")

    def accuracy(model):
        pred = CL.nb_predict_int(model, te)
        truth = te.select("doc_id", F.col("lang").alias("label"))
        hits = (truth.join(pred, "doc_id")
                .where(F.col("label") == F.col("pred")).count())
        return hits / 20

    acc_w = accuracy(CL.nb_train(tr, label_col="lang"))
    acc_c = accuracy(CL.nb_train(tr, label_col="lang",
                                 features="chars", ngram_n=3))
    # words: every test term unseen -> prior tie-break -> one label
    assert acc_w <= 0.5
    assert acc_c == 1.0


def test_char_ngram_tokens_definition(spark):
    """The char featurizer yields exactly the overlapping n-grams
    of lower(trim(text)) with short tails dropped — the definition
    the DuckDB oracle mirrors with list_transform + substr."""
    df = arrow_df(spark, [(1, "x", "  AbC d ")],
                  "doc_id long, lang string, text string")
    toks = sorted(
        r["term"] for r in CL._tokens(
            df, "text", F.col("doc_id"),
            features="chars", ngram_n=3).collect())
    assert toks == sorted(["abc", "bc ", "c d"])


def test_char_ngram_short_docs_still_get_gated(spark):
    """A doc shorter than ngram_n has zero char-gram tokens but
    must still receive a prediction (the class prior), so the
    language gate emits a keep/drop bit for EVERY non-empty doc —
    no silent gap between 'kept' and 'rejected'."""
    rows = [(i, "A", f"zzar{i} bozz{i}") for i in range(6)]
    rows += [(100 + i, "B", f"qqor{i} tuqq{i}") for i in range(4)]
    rows.append((999, "A", "hi"))        # len 2 < ngram_n 3
    docs = arrow_df(spark, rows,
                    "doc_id long, lang string, text string")
    m = CL.nb_train(docs, label_col="lang",
                    features="chars", ngram_n=3)
    pred = {r["doc_id"]: r["pred"] for r in
            CL.nb_predict_int(m, docs).collect()}
    assert 999 in pred
    # prior argmax: A has 7 docs, B has 4 -> prior picks A
    assert pred[999] == "A"
    assert len(pred) == 11
