"""Unit tests for the training-data-pipeline operators (dedup,
similarity, text analysis, multimodal plumbing)."""

import math

import pytest
from pyspark.sql import functions as F

from siridb_server_spark.operators import curation as CU
from siridb_server_spark.operators import dedup as D
from siridb_server_spark.operators import multimodal as MM
from siridb_server_spark.operators import similarity as SIM
from siridb_server_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (2, "the quick brown fox jumps over a lazy dog"),  # near dup
        (3, "completely different content entirely unrelated words"),
        (4, "el gato la casa de la madre que los ninos"),
        (5, "dog lazy the over jumps fox brown quick the"),  # shuffled
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    res = {r["keep_id"]: r["n_copies"]
           for r in D.exact_duplicates(docs).collect()}
    assert res[0] == 2  # docs 0,1 identical
    assert res[2] == 1


def test_ngram_jaccard(docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(docs, 0.7).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 5) in pairs  # same word set, shuffled order
    assert (0, 3) not in pairs
    assert pairs[(0, 2)] == pytest.approx(8 / 9, abs=1e-5)  # adds 'a'


def test_ngram_jaccard_max_df_caps_hot_tokens(spark):
    # 'stop' appears in every doc (df=4 > max_df=3) and is the ONLY
    # link between docs 0/1 and 2/3 — with the cutoff the candidate
    # join must not even generate those cross pairs, and Jaccard is
    # computed over the surviving vocabulary (sizes post-cutoff).
    rows = [(0, "stop alpha beta"), (1, "stop alpha beta"),
            (2, "stop gamma delta"), (3, "stop gamma epsilon")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in D.ngram_jaccard_pairs(
               docs, threshold=0.4, max_df=3).collect()}
    # {alpha,beta} vs {alpha,beta} → 1.0; {gamma,delta} vs
    # {gamma,epsilon} → 1/3 < 0.4; nothing crosses the stopword
    assert got == {(0, 1): 1.0}
    # without the cutoff the stopword links everything: (0,2) etc.
    # appear as candidates (below threshold) and (2,3) passes 0.4
    # via {stop,gamma}/{stop,gamma,delta,epsilon}=0.5
    raw = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in D.ngram_jaccard_pairs(
               docs, threshold=0.4, max_df=None).collect()}
    assert (2, 3) in raw


def test_shingle_jaccard_max_df_matches_uncut_when_loose(docs):
    loose = sorted(tuple(r) for r in D.shingle_jaccard_pairs(
        docs, threshold=0.5, max_df=10_000).collect())
    exact = sorted(tuple(r) for r in D.shingle_jaccard_pairs(
        docs, threshold=0.5).collect())
    assert loose == exact


def test_cross_source_accepts_lsh_pair_source(spark):
    rows = [(0, "a", "x y z w q r s t"), (1, "b", "x y z w q r s t"),
            (2, "a", "totally different words here now ok fine yes")]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, text string")
    lsh = D.minhash_lsh_pairs(docs, threshold=0.5)
    got = {(r["source_a"], r["source_b"]): r["n_pairs"]
           for r in D.cross_source_dup_rates(docs, pairs=lsh).collect()}
    assert got == {("a", "b"): 1}


def test_minhash_lsh_rejects_non_divisible_bands(docs):
    with pytest.raises(ValueError, match="multiple of bands"):
        D.minhash_lsh_pairs(docs, num_hashes=16, bands=3)


def test_ngram_contamination(docs, spark):
    # eval set = doc 0's exact text; train docs sharing 3-grams with
    # it are contaminated, unrelated docs are not
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    train = docs.where("doc_id > 0")
    got = {r["doc_id"]: r["overlap"]
           for r in D.ngram_contamination(train, ev, n=3).collect()}
    assert got[1] == 7          # identical text: all 7 3-grams shared
    assert got[2] == 4          # near dup: changed word kills 3 of 7
    assert 3 not in got and 4 not in got
    # min_overlap raises the bar
    strict = {r["doc_id"] for r in D.ngram_contamination(
        train, ev, n=3, min_overlap=6).collect()}
    assert strict == {1}


def test_ngram_novelty_counts_and_broadcast_parity(spark):
    """Planted novelty: an exact copy of a reference doc scores 0
    novel shingles, an all-new doc scores all of them, a partial
    rewrite scores exactly the shingles its changed word created;
    the non-broadcast (corpus-scale-reference) path returns the
    identical frame."""
    ref = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "some other reference material entirely")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),
         (11, "completely unseen words in every single gram"),
         (12, "the quick brown cat jumps over the lazy dog")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_ngrams"], r["n_novel"]) for r in
           D.ngram_novelty(new, ref, n=3).collect()}
    # 9 words -> 7 distinct 3-grams each
    assert got[10] == (7, 0)       # verbatim copy: nothing novel
    assert got[11] == (5, 5)       # 7 words -> 5 grams, all new
    # one changed word (fox->cat) touches grams at offsets 1,2,3
    assert got[12] == (7, 3)
    flat = sorted(tuple(r) for r in D.ngram_novelty(
        new, ref, n=3, broadcast_reference=False).collect())
    assert flat == sorted((k, *v) for k, v in got.items())


def test_dim_truncation_recall_planted(spark):
    """Planted geometry: vectors whose FIRST two coordinates are
    identical across the corpus (dim-2 ranking ties everywhere →
    falls to the id tie-break) while the tail coordinates separate
    them — dim-2 recall is the id-order overlap, full-prefix dims
    recover the exact set; a dim equal to the full width is
    excluded from the output and out-of-range dims raise."""
    import pytest as _pt

    from siridb_server_spark.operators import similarity as SIM

    # corpus: 8 vectors, dims 0-1 constant, dims 2-3 distinguish;
    # ids 100.. so the id tie-break order is deterministic
    rows = [(100 + i, [1.0, 1.0, float(i), float(i) / 2])
            for i in range(8)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    q = [1.0, 1.0, 7.0, 3.5]     # = vector 107's direction
    out = {r["dim"]: (r["k"], r["hits"]) for r in
           SIM.dim_truncation_recall(emb, q, dims=(2, 3, 4), k=3)
           .collect()}
    assert set(out) == {2, 3}    # dim 4 == full width: excluded
    # dim 2: all cosines tie at 1.0 -> top-3 by id = 100,101,102;
    # full top-3 by cosine = highest-i vectors -> overlap is empty
    assert out[2] == (3, 0)
    # dim 3 already ranks by the separating coordinate: full recall
    assert out[3] == (3, 3)
    with _pt.raises(ValueError, match="dims must be within"):
        SIM.dim_truncation_recall(emb, q, dims=(0, 2), k=3)
    with _pt.raises(ValueError, match="dims must be within"):
        SIM.dim_truncation_recall(emb, q, dims=(5,), k=3)


def test_minhash_lsh(docs):
    pairs = {(r["id_a"], r["id_b"])
             for r in D.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs  # identical docs always collide
    assert all(a < b for a, b in pairs)


def test_simhash_pairs(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert sigs[0] == sigs[1] == sigs[5]  # same word set → same simhash
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_pairs(docs, max_hamming=6).collect()}
    assert pairs[(0, 1)] == 0
    assert (0, 3) not in pairs


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "hello world, it's 42 degrees!"), (1, ""), (2, "  one  ")],
        "doc_id long, text string")
    rows = {r["doc_id"]: (r["ws"], r["bpe"]) for r in df.select(
        "doc_id",
        TX.token_count(F.col("text")).alias("ws"),
        TX.bpe_token_count(F.col("text")).alias("bpe")).collect()}
    assert rows[0][0] == 5
    # hello world , it ' s 42 degrees !  → 9 BPE-ish tokens
    assert rows[0][1] == 9
    assert rows[1] == (0, 0)
    assert rows[2][0] == 1


def test_lang_id(spark):
    df = spark.createDataFrame(
        [(0, "the cat and the dog of the house"),
         (1, "el gato de la casa que los"),
         (2, "der hund und die katze ist das"),
         (3, "le chat et la maison les est"),
         (4, "xyzzy plugh")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["lang"] for r in df.select(
        "doc_id", TX.lang_id(F.col("text")).alias("lang")).collect()}
    assert rows[0] == "en"
    assert rows[1] == "es"
    assert rows[2] == "de"
    assert rows[3] == "fr"
    assert rows[4] == "und"


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(0, "the code is 99% done!")], "doc_id long, text string")
    r = TX.quality_features(df).collect()[0]
    assert r["n_chars"] == 21
    assert r["n_tokens"] == 5
    assert r["n_punct"] == 2  # % and !
    assert r["n_digits" if "n_digits" in r.__fields__ else "digit_ratio"]
    assert r["n_stopwords"] == 2  # the, is


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "c b a"), (2, "a b d")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["fp"] for r in df.select(
        "doc_id", TX.fingerprint(F.col("text")).alias("fp")).collect()}
    assert rows[0] == rows[1]
    assert rows[0] != rows[2]


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.9, 0.1, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [-1.0, 0.0, 0.0], 1),
        (4, [0.707, 0.707, 0.0], 1),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def test_cosine_expr(emb):
    r = emb.where(F.col("vec_id") == 4).select(
        SIM.cosine(F.col("embedding"),
                   F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0)))
        .alias("c")).collect()[0]["c"]
    assert r == pytest.approx(0.707, abs=1e-3)


def test_brute_force_topk(emb):
    got = SIM.brute_force_topk(emb, [1.0, 0.0, 0.0], k=3).collect()
    assert [r["vec_id"] for r in got] == [0, 1, 4]
    assert got[0]["cos"] == pytest.approx(1.0)


def test_ivf_topk(emb):
    got = SIM.ivf_topk(emb, [1.0, 0.0, 0.0], k=2, nprobe=1)
    ids = [r["vec_id"] for r in got.collect()]
    assert ids == [0, 1]  # label-0 cell is nearest; 3 excluded


def test_lsh_topk(emb):
    got = SIM.lsh_topk(emb, [1.0, 0.0, 0.0], k=5, n_planes=2)
    ids = [r["vec_id"] for r in got.collect()]
    assert 0 in ids  # query's own bucket must contain the exact match


def test_cosine_pairs_blocked(emb):
    pairs = {(r["id_a"], r["id_b"]): r["cos"]
             for r in SIM.cosine_pairs_blocked(emb, 0.9).collect()}
    assert (0, 1) in pairs
    assert (3, 4) not in pairs  # opposite-ish, below threshold
    assert all(c >= 0.9 for c in pairs.values())


def test_multimodal_meta(spark):
    docs = spark.createDataFrame(
        [(7, "hello")], "doc_id long, text string")
    media = MM.documents_as_media(docs)
    r = MM.decode_image_meta(media).collect()[0]
    assert r["media_id"] == 7
    assert r["n_bytes"] == 5
    assert r["width"] == 5 * 7 % 640 + 1
    assert r["height"] == 5 * 13 % 480 + 1


def test_multimodal_frames(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 30)], "doc_id long, text string")
    media = MM.documents_as_media(docs)
    rows = MM.frame_sample(media, every_n=10).collect()
    # 30 bytes → n_frames = 30 % 97 + 1 = 31 → frames 0,10,20,30
    assert [r["frame_idx"] for r in rows] == [0, 10, 20, 30]


def test_rolling_fingerprints(spark):
    df = spark.createDataFrame(
        [(0, " ".join(str(i) for i in range(12)))],
        "doc_id long, text string")
    r = df.select(TX.rolling_fingerprints(
        F.col("text"), 8).alias("fps")).collect()[0]["fps"]
    assert len(r) == 5  # 12 words → 5 windows of 8
    assert len(set(r)) == 5


def test_connected_components(spark):
    # two chains + a singleton edge: {1,2,3,4}, {10,11}, {20,21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)],
        "id_a long, id_b long")
    comp = {r["node"]: r["comp"]
            for r in D.connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                    20: 20, 21: 20}


def test_resolve_duplicates(docs):
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.7)
    res = {r["doc_id"]: (r["keep_id"], r["is_kept"])
           for r in D.resolve_duplicates(docs, pairs).collect()}
    # 0,1,2,5 form one near-dup cluster kept by doc 0
    assert res[0] == (0, True)
    assert res[1] == (0, False)
    assert res[5] == (0, False)
    assert res[3] == (3, True)  # singleton keeps itself
    assert res[4] == (4, True)


def test_resolve_duplicates_by_string_ids(spark):
    # ADVICE r4: the -F.col(doc_id) tiebreak raised AnalysisException
    # for non-numeric ids; the two-stage winner agg must support any
    # orderable id type and break score ties toward the smaller id.
    docs = spark.createDataFrame(
        [("a", 5), ("b", 9), ("c", 9), ("d", 1)],
        "doc_id string, score int")
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string")
    res = {r["doc_id"]: (r["keep_id"], r["is_kept"])
           for r in D.resolve_duplicates_by(
               docs, pairs, "score").collect()}
    # cluster {a,b,c}: max score 9 held by b and c → tie to "b"
    assert res["a"] == ("b", False)
    assert res["b"] == ("b", True)
    assert res["c"] == ("b", False)
    assert res["d"] == ("d", True)


def test_resolve_duplicates_by_all_null_scores(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, None)], "doc_id long, score double")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    res = {r["doc_id"]: r["keep_id"]
           for r in D.resolve_duplicates_by(
               docs, pairs, "score").collect()}
    assert res == {1: 1, 2: 1}


def test_streaming_minhash_rejects_non_divisible_bands(docs):
    from siridb_server_spark.streaming import stateful as ST
    with pytest.raises(ValueError, match="multiple of bands"):
        ST.streaming_minhash_dedup(docs, num_hashes=16, bands=5)


def test_topk_per_group(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), float(i)) for i in range(10)],
        "doc_id long, source string, score double")
    got = {(r["source"], r["doc_id"]) for r in TX.topk_per_group(
        df, "source", [F.col("score").desc(), F.col("doc_id")],
        k=2).collect()}
    assert got == {("s0", 8), ("s0", 6), ("s1", 9), ("s1", 7)}


def test_knn_join_matches_per_query_bruteforce(emb, spark):
    queries = emb.where("vec_id < 2") \
        .selectExpr("vec_id AS qid", "embedding")
    corpus = emb.where("vec_id >= 2")
    got = SIM.knn_join(corpus, queries, k=3).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["qid"], []).append(
            (r["rank"], r["vec_id"], r["cos"]))
    for qid in by_q:
        by_q[qid].sort()
    # every query's ranking equals the single-vector brute force
    for qrow in queries.collect():
        expect = [
            (i + 1, r["vec_id"], r["cos"]) for i, r in enumerate(
                SIM.brute_force_topk(corpus, qrow["embedding"],
                                     k=3).collect())]
        assert by_q[qrow["qid"]] == expect
    # invariant under corpus repartitioning (local cut determinism)
    again = SIM.knn_join(corpus.repartition(7), queries, k=3).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))


def test_kmeans_ivf(spark):
    rows = [(i, [float(i % 3 == 0), float(i % 3 == 1),
                 float(i % 3 == 2)], 0) for i in range(30)]
    emb3 = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    cents = SIM.kmeans_fit(emb3, k=3, iters=4)
    # converges to the three one-hot corners
    assert sorted(tuple(round(x) for x in c) for c in cents) == [
        (0, 0, 1), (0, 1, 0), (1, 0, 0)]
    got = SIM.ivf_topk_trained(
        emb3, [1.0, 0.0, 0.0], cents, k=3, nprobe=1).collect()
    assert all(r["vec_id"] % 3 == 0 for r in got)
    assert got[0]["cos"] == pytest.approx(1.0)


def test_arrow_scorer_matches_expression_and_nulls_zero_vectors(spark):
    rows = [(1, [1.0, 0.0]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    got = SIM.brute_force_topk(df, [1.0, 0.0], k=3).collect()
    # zero-norm vector scores NULL (try_divide parity) and sorts LAST
    assert [r["vec_id"] for r in got] == [1, 3, 2]
    assert got[2]["cos"] is None
    a = SIM.brute_force_topk(df, [1.0, 0.0], k=3, arrow=True).collect()
    b = SIM.brute_force_topk(df, [1.0, 0.0], k=3,
                             arrow=False).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_ivf_index_build_once_search_many(emb):
    idx = SIM.IVFIndex.from_labels(emb.where(F.col("vec_id") != 0))
    try:
        got = idx.search([1.0, 0.0, 0.0], k=2, nprobe=1)
        # parity with the per-call operator on the same probe count
        ref = SIM.ivf_topk(emb.where(F.col("vec_id") != 0),
                           [1.0, 0.0, 0.0], k=2, nprobe=1)
        assert ([tuple(r) for r in got.collect()]
                == [tuple(r) for r in ref.collect()])
        # the second search scans the CACHED cell-partitioned frame —
        # no re-read of the corpus, no centroid recompute
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        # trained variant: returns k rows from the persisted cells
        idx2 = SIM.IVFIndex.train(emb, k=2, iters=2)
        try:
            assert idx2.search([1.0, 0.0, 0.0], k=3,
                               nprobe=2).count() == 3
        finally:
            idx2.unpersist()
    finally:
        idx.unpersist()


def test_ivf_index_save_load_prunes_partitions(emb, spark, tmp_path):
    """A saved index lays cells out as parquet partitionBy(cell); a
    search on the loaded index shows PartitionFilters on the scan —
    probing IS directory pruning at scale."""
    idx = SIM.IVFIndex.from_labels(emb.where(F.col("vec_id") != 0))
    want = [tuple(r) for r in
            idx.search([1.0, 0.0, 0.0], k=2, nprobe=1).collect()]
    idx.save(str(tmp_path / "ivf"))
    idx.unpersist()
    idx2 = SIM.IVFIndex.load(spark, str(tmp_path / "ivf"))
    got_df = idx2.search([1.0, 0.0, 0.0], k=2, nprobe=1)
    assert [tuple(r) for r in got_df.collect()] == want
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    import re
    assert re.search(r"PartitionFilters: \[[^]]*cell", plan), plan


def test_text_cleaning_and_pii_mask(spark):
    rows = [
        (1, "<p>Hello &amp; <b>world</b></p>\n\n  spaced   out "),
        (2, "mail me: bob.smith+x@corp.example.org or"
            " call +1 (555) 123-4567"),
        (3, "server at 10.0.42.7 answered"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["c"] for r in df.select(
        "doc_id", TX.clean_text(F.col("text")).alias("c")).collect()}
    assert got[1] == "Hello & world spaced out"
    masked = {r["doc_id"]: r["m"] for r in df.select(
        "doc_id", TX.mask_pii(F.col("text")).alias("m")).collect()}
    assert masked[2] == "mail me: <EMAIL> or call <PHONE>"
    assert masked[3] == "server at <IP> answered"


def test_lsh_hot_bucket_cap(spark):
    """max_bucket drops pathological band buckets (boilerplate
    floods) so one key can't emit B²/2 candidate pairs in one task;
    near-dups below the cap still pair."""
    rows = [(i, "exact same boilerplate text everywhere")
            for i in range(20)]
    rows += [(100, "a genuinely unique document about gardens"),
             (101, "a genuinely unique document about gardens")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = D.minhash_lsh_pairs(df, threshold=0.5, max_bucket=5)
    pairs = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # the 20-doc flood bucket (190 pairs/band) is dropped...
    assert not any(a < 20 and b < 20 for a, b in pairs)
    # ...while the small near-dup pair still pairs through its bands
    assert (100, 101) in pairs
    uncapped = {(r["id_a"], r["id_b"]) for r in
                D.minhash_lsh_pairs(df, threshold=0.5).collect()}
    assert any(a < 20 and b < 20 for a, b in uncapped)
    # simhash: same cap semantics
    s_capped = {(r["id_a"], r["id_b"]) for r in D.simhash_pairs(
        df, max_hamming=3, max_bucket=5).collect()}
    assert not any(a < 20 and b < 20 for a, b in s_capped)
    assert (100, 101) in s_capped


def test_repetition_features(spark):
    rows = [
        (1, "a a a b"),                 # heavy word repetition
        (2, "x\nx\ny words here now"),  # duplicate lines
        (3, ""),                        # empty → all zeros
        (4, "one"),                     # single word, no n-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in TX.repetition_features(df).collect()}
    # doc 1: 4 words, 2 distinct → dup_word 0.5; bigrams
    # [a a, a a, a b] → top 2/3; trigrams [a a a, a a b] → no dup
    assert got[1]["n_words"] == 4
    assert got[1]["dup_word_frac"] == 0.5
    assert got[1]["top_bigram_frac"] == round(2 / 3, 6)
    assert got[1]["dup_trigram_frac"] == 0.0
    # doc 2: 3 lines, 2 distinct → 1/3
    assert got[2]["dup_line_frac"] == round(1 / 3, 6)
    assert got[3] == {"doc_id": 3, "n_words": 0, "dup_word_frac": 0.0,
                      "dup_line_frac": 0.0, "top_bigram_frac": 0.0,
                      "dup_trigram_frac": 0.0}
    assert got[4]["top_bigram_frac"] == 0.0


def test_sample_by_source(spark):
    """Deterministic temperature sampling: rates follow the
    count^alpha formula and the per-doc keep decision replays
    exactly from the md5 uniform (no F.rand nondeterminism)."""
    import hashlib
    import math as _m

    rows = [(i, f"w{i}", "big" if i < 90 else "small")
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, text string,"
                               " source string")
    out = CU.sample_by_source(df, alpha=0.5, target_frac=0.5)
    # keep_rate_ppm ships as an exact integer ppm since r7: pow is
    # quantized to a scaled long at birth and the rate is pure
    # integer math (num·1e6 half-up div den); the keep predicate
    # uses the SAME quantized rate — replay it all in python
    got = {(r["doc_id"]): r["keep_rate_ppm"]
           for r in out.collect()}

    def ppm(num, den):
        return (2 * num * 1000000 + den) // (2 * den)

    pw = {"big": _m.floor(_m.sqrt(90) * 1e6 + 0.5),
          "small": _m.floor(_m.sqrt(10) * 1e6 + 0.5)}
    w_tot_q = pw["big"] + pw["small"]
    rate = {s: min(1000000,
                   ppm(pw[s] * 100 * 500000,
                       w_tot_q * n * 1000000))
            for s, n in (("big", 90), ("small", 10))}
    # alpha<1 flattens: the small source keeps a larger fraction
    assert rate["small"] > rate["big"]

    def u01(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:8], 16) / 4294967296.0

    expect = {i: rate["big" if i < 90 else "small"]
              for i in range(100)
              if u01(i) * 1e6 < rate["big" if i < 90 else "small"]}
    assert got == expect


def test_pack_sequences(spark):
    rows = [(1, "a b c", "s"),        # 3 tokens, start 0
            (2, "d e f g", "s"),      # 4 tokens, start 3
            (3, "h i", "s"),          # start 7 → seq 1, offset 2
            (4, "x " * 6, "t")]       # other group starts fresh
    df = spark.createDataFrame(rows, "doc_id long, text string,"
                               " source string")
    out = {r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_tokens"])
           for r in CU.pack_sequences(df, budget=5).collect()}
    assert out[1] == (0, 0, 3)
    assert out[2] == (0, 3, 4)   # spans the seq-0/1 boundary
    assert out[3] == (1, 2, 2)
    assert out[4] == (0, 0, 6)


def test_duplicate_spans(spark):
    """Span-level keep-first: a span is kept only at its globally
    earliest (doc_id, position); fully-duplicated docs collapse to
    empty cleaned_text."""
    rows = [(0, "a b c d e f"),     # spans: "a b c", "d e f" — both first
            (1, "a b c x y z"),     # "a b c" dup → dropped; "x y z" kept
            (2, "d e f"),           # entirely duplicated → empty
            (3, "")]                # empty text → filtered out
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_spans"], r["n_kept"], r["cleaned_text"])
           for r in D.duplicate_spans(df, k=3).collect()}
    assert out[0] == (2, 2, "a b c d e f")
    assert out[1] == (2, 1, "x y z")
    assert out[2] == (1, 0, "")
    assert 3 not in out


def test_duplicate_spans_keep_first_within_doc(spark):
    """A span repeated WITHIN one doc keeps only its first position."""
    df = spark.createDataFrame([(7, "p q r p q r")],
                               "doc_id long, text string")
    out = D.duplicate_spans(df, k=3).collect()[0]
    assert (out["n_spans"], out["n_kept"]) == (2, 1)
    assert out["cleaned_text"] == "p q r"


def test_assign_splits(spark):
    """Hash-ladder split: deterministic, replayable from md5, and
    every row lands in exactly one of the three splits."""
    import hashlib

    df = spark.createDataFrame([(i, "t") for i in range(200)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["split"]
           for r in CU.assign_splits(df, fracs=(0.8, 0.1)).collect()}

    def u01(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        return int(h[:8], 16) / 4294967296.0

    for i in range(200):
        u = u01(i)
        want = ("train" if u < 0.8
                else "validation" if u < 0.9 else "test")
        assert got[i] == want
    assert set(got.values()) == {"train", "validation", "test"}
    # stable across runs (no rand dependence on partitioning)
    again = {r["doc_id"]: r["split"]
             for r in CU.assign_splits(df.repartition(7),
                                       fracs=(0.8, 0.1)).collect()}
    assert again == got


def test_top_ngrams(spark):
    df = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b x"), (2, "z")],
        "doc_id long, text string")
    rows = TX.top_ngrams(df, n=2, k=3).collect()
    got = [(r["ngram"], r["n_occurrences"]) for r in rows]
    # bigrams: "a b" x3 ("a b a b c" twice? no: a-b, b-a, a-b, b-c => 2) + doc1 a-b => 3
    assert got[0] == ("a b", 3)
    assert ("b a", 1) in got or ("b c", 1) in got
    assert len(got) == 3
    # doc 2 has no bigrams; deterministic tie-break is lexicographic
    assert got[1][1] >= got[2][1]


def test_length_histogram_buckets_and_empty_text(spark):
    from siridb_server_spark.operators.text import length_histogram

    docs = spark.createDataFrame(
        [(1, "one two three", "en"), (2, " ".join(["w"] * 17), "en"),
         (3, "", "de"), (4, "je suis", "fr")],
        "doc_id long, text string, lang string")
    rows = {(r["lang"], r["bucket"]): (r["n_docs"], r["avg_chars"])
            for r in length_histogram(docs, width=16).collect()}
    assert rows[("en", 0)] == (1, 13.0)   # 3 tokens → bucket 0
    assert rows[("en", 16)] == (1, 33.0)  # 17 tokens → bucket 16
    assert rows[("de", 0)][0] == 1        # empty text counts 0 tokens
    assert rows[("fr", 0)][0] == 1


def test_tfidf_surfaces_source_specific_terms(spark):
    from siridb_server_spark.operators.text import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "alpha alpha shared", "s1"), (2, "beta shared", "s2")],
        "doc_id long, text string, source string")
    out = tfidf_top_terms(docs, k=1).collect()
    best = {r["source"]: (r["term"], r["tf"]) for r in out}
    # 'shared' appears in every source → idf 0; unique terms win
    assert best["s1"] == ("alpha", 2)
    assert best["s2"] == ("beta", 1)


def test_dup_clusters_transitive_closure(spark):
    from siridb_server_spark.operators.dedup import resolve_duplicates

    emb = spark.createDataFrame(
        [(i,) for i in range(5)], "vec_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 4)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["keep_id"], r["is_kept"])
           for r in resolve_duplicates(emb, pairs,
                                       id_col="vec_id").collect()}
    # 1-2-4 collapse transitively to min id 1; 0 and 3 are singletons
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[4] == (1, False)
    assert out[0] == (0, True) and out[3] == (3, True)


def test_connected_components_releases_round_checkpoints(spark):
    """The distributed CC loop localCheckpoints one state frame per
    round; superseded rounds must be FREED through the JVM
    persistent-RDD map (df.rdd.unpersist was a silent no-op — the
    old 'release' left one session-lifetime cached RDD per round).
    After consuming the result, at most ONE checkpoint (the final
    state, which the returned frame reads) may remain."""
    from siridb_server_spark.operators.dedup import (
        connected_components)

    def n_persistent():
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    # chain 0-1-2-...-9 forces several hash-to-min rounds
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "id_a long, id_b long")
    base = n_persistent()
    out = connected_components(pairs, driver_edge_cap=0)
    comps = {r["node"]: r["comp"] for r in out.collect()}
    assert set(comps.values()) == {0} and len(comps) == 10
    assert n_persistent() - base <= 1


def test_corpus_sink_releases_batch_checkpoints(spark, tmp_path):
    """A streaming ingest micro-batch checkpoints its hits/accepted
    frames; the sink must free them before returning (a long
    stream otherwise grows the block manager monotonically — the
    rdd.unpersist variant never freed anything)."""
    import siridb_server_spark.streaming.corpus as SC

    def persistent_ids():
        return {int(k) for k in spark.sparkContext._jsc
                .getPersistentRDDs().keySet()}

    sink = SC.make_dedup_ingest_sink(
        str(tmp_path / "idx"), str(tmp_path / "acc"),
        rejected_path=str(tmp_path / "rej"))
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "unique text two")],
        "doc_id long, text string")
    b1 = spark.createDataFrame(
        [(3, "alpha beta gamma delta"), (4, "brand new text")],
        "doc_id long, text string")
    base = persistent_ids()
    sink(b0, 0)
    sink(b1, 1)  # probes the index -> hits frame exists
    # ID-SET containment, not a count: the ContextCleaner may
    # concurrently collect a PRIOR test's stale blocks (count could
    # shrink and mask a +1 leak); any id registered by this sink's
    # checkpoints that survives is a leak regardless of the count
    assert persistent_ids() <= base


def test_semdedup_keeps_least_prototypical(spark):
    """SemDeDup keep-low policy: within a duplicate group the
    survivor is the member with the LOWEST cosine to the cluster
    centroid (the least prototypical copy), not the min id."""
    # one cluster ('a'): 1 and 2 are near-identical along +x (edge),
    # 3 points along +y (no edge to 1/2). The +y outlier pulls the
    # centroid off-axis, so within group {1,2} the keeper is the one
    # LESS aligned with it: vec 2 (pure +x, no +y component at all).
    # A min-id policy would keep 1 — the test separates the two.
    rows = [(1, [0.98, 0.199], "a"),
            (2, [1.0, 0.0], "a"),
            (3, [0.0, 1.0], "a")]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label string")

    from pyspark.sql import functions as F

    from siridb_server_spark.functions.stable import scaled_term
    from siridb_server_spark.operators import dedup as D
    from siridb_server_spark.operators import similarity as SIM

    # replicate the entry's composition on the fixture
    x = (emb.select("vec_id", "label",
                    F.posexplode("embedding").alias("pos", "v0"))
         .select("label", "pos",
                 F.col("v0").cast("double").alias("v")))
    s = (x.groupBy("label", "pos")
         .agg(F.sum(F.col("v").cast("decimal(38,18)"))
              .cast("double").alias("sv")))
    sarr = (s.groupBy("label")
            .agg(F.array_sort(F.collect_list(
                F.struct("pos", "sv"))).alias("ps"))
            .select("label",
                    F.transform("ps", lambda r: r["sv"])
                    .alias("svec")))
    vd = F.transform(F.col("embedding"), lambda c: c.cast("double"))
    fold = (lambda arr: F.aggregate(
        arr, F.lit(0.0), lambda acc, y: acc + y))
    dot = fold(F.zip_with(vd, F.col("svec"), lambda a, b: a * b))
    nv = F.sqrt(fold(F.transform(vd, lambda a: a * a)))
    ns = F.sqrt(fold(F.transform(F.col("svec"), lambda a: a * a)))
    scored = (emb.join(F.broadcast(sarr), "label")
              .select("vec_id",
                      scaled_term(dot / (nv * ns), 6)
                      .alias("cos_c_micro"))
              .withColumn("_neg", -F.col("cos_c_micro")))
    pairs = SIM.cosine_pairs_blocked(emb, threshold=0.9)
    out = {r["doc_id"]: (r["keep_id"], r["is_kept"])
           for r in D.resolve_duplicates_by(
               scored, pairs, score_col="_neg",
               id_col="vec_id").collect()}
    # group {1,2}: 2 is farther from the off-axis centroid → kept
    assert out[2] == (2, True)
    assert out[1] == (2, False)
    assert out[1][0] != 1  # distinguishes keep-low from min-id
    # 3 never edged anyone → singleton keeps itself
    assert out[3] == (3, True)


def test_bm25_ranks_matching_docs(spark):
    from siridb_server_spark.operators.text import bm25_topk

    docs = spark.createDataFrame(
        [(1, "spark spark spark"), (2, "spark flink"),
         (3, "duck goose"), (4, "spark " + "pad " * 50)],
        "doc_id long, text string")
    out = bm25_topk(docs, ["spark"], k=3).collect()
    ids = [r["doc_id"] for r in out]
    # only matching docs appear; higher tf and shorter dl rank first
    assert set(ids) <= {1, 2, 4}
    assert ids[0] == 1
    # long padded doc ranks below the short one despite same tf
    assert ids.index(2) < ids.index(4)
    assert all(r["score_micro"] > 0 for r in out)


def test_pq_index_codes_and_rerank(spark):
    import random

    from siridb_server_spark.operators.similarity import (
        PQIndex,
        l2_topk_exact,
    )

    rng = random.Random(11)
    # clustered data: PQ recall should be near-perfect with rerank
    base = [[float(c)] * 16 for c in (0, 10, 20, 30)]
    rows = [(i, [v + rng.uniform(-0.5, 0.5)
                 for v in base[i % 4]]) for i in range(80)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = PQIndex.train(emb, m=4, k=4, iters=3)
    # codes bounded
    from pyspark.sql import functions as F
    assert idx.codes.where(
        F.exists("code", lambda c: (c < 0) | (c >= 4))).count() == 0
    q = rows[0][1]
    got = [r["vec_id"] for r in
           idx.search_rerank(emb, q, k=5, shortlist=40).collect()]
    exact = [r["vec_id"] for r in
             l2_topk_exact(emb, q, k=5).collect()]
    assert got == exact  # rerank reproduces the exact ranking
    idx.unpersist()


def test_pq_knn_join_equals_per_query_search(spark):
    """Batch ADC serving: PQIndex.knn_join's per-query answers
    equal the PQIndex.search loop exactly (ids, 6-decimal ADC,
    rank order — the tables are computed in Catalyst on the query
    side vs python literals in search, so this also pins the
    bit-parity of the two table paths), and the emb-rerank variant
    equals search_rerank per query. Queries both inside and
    outside the corpus."""
    import random

    from pyspark.sql import functions as F

    from siridb_server_spark.operators.similarity import PQIndex

    rng = random.Random(17)
    base = [[float(c)] * 16 for c in (0, 10, 20, 30)]
    rows = [(i, [v + rng.uniform(-0.7, 0.7)
                 for v in base[i % 4]]) for i in range(70)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    idx = PQIndex.train(emb, m=4, k=4, iters=3)
    try:
        qvecs = {100: rows[0][1], 200: rows[3][1],
                 300: [v + 2.5 for v in base[2]]}  # foreign query
        queries = spark.createDataFrame(
            sorted(qvecs.items()),
            "qid long, embedding array<double>")
        got = {}
        for r in idx.knn_join(queries, k=6).collect():
            got.setdefault(r["qid"], []).append(
                (r["rank"], r["vec_id"], r["adc"]))
        assert set(got) == set(qvecs)
        for qid, qv in qvecs.items():
            want = [(i + 1, r["vec_id"], r["adc"]) for i, r in
                    enumerate(idx.search(qv, k=6).collect())]
            assert sorted(got[qid]) == want, qid
        # rerank variant == search_rerank loop
        got_rr = {}
        for r in idx.knn_join(queries, k=4, emb=emb,
                              shortlist=30).collect():
            got_rr.setdefault(r["qid"], []).append(
                (r["rank"], r["vec_id"], r["d2"]))
        for qid, qv in qvecs.items():
            want = [(i + 1, r["vec_id"], r["d2"]) for i, r in
                    enumerate(idx.search_rerank(
                        emb, qv, k=4, shortlist=30).collect())]
            assert sorted(got_rr[qid]) == want, qid
        # non-default qid_col round-trips
        alt = idx.knn_join(
            queries.withColumnRenamed("qid", "query_id")
            .withColumn("qid", F.lit(0)),  # decoy column
            k=2, qid_col="query_id")
        assert alt.columns == ["qid", "vec_id", "adc", "rank"]
        assert {r["qid"] for r in alt.collect()} == set(qvecs)
    finally:
        idx.unpersist()


def test_pq_index_save_load_roundtrip(spark, tmp_path):
    """A saved PQIndex reopens self-describing (codebooks, dsub,
    id_col from meta) and serves the same ADC ranking and rerank
    result with no rebuild."""
    import random

    from siridb_server_spark.operators.similarity import PQIndex

    rng = random.Random(13)
    base = [[float(c)] * 16 for c in (0, 10, 20, 30)]
    rows = [(i, [v + rng.uniform(-0.5, 0.5)
                 for v in base[i % 4]]) for i in range(60)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    idx = PQIndex.train(emb, m=4, k=4, iters=3)
    q = rows[1][1]
    want_adc = [tuple(r) for r in idx.search(q, k=8).collect()]
    want_rr = [tuple(r) for r in
               idx.search_rerank(emb, q, k=5,
                                 shortlist=30).collect()]
    idx.save(str(tmp_path / "pq"))
    idx.unpersist()
    idx2 = PQIndex.load(spark, str(tmp_path / "pq"))
    assert idx2.dsub == 4 and idx2.id_col == "vec_id"
    assert idx2.codebooks == idx.codebooks
    assert [tuple(r) for r in idx2.search(q, k=8).collect()] \
        == want_adc
    assert [tuple(r) for r in
            idx2.search_rerank(emb, q, k=5,
                               shortlist=30).collect()] == want_rr


def test_quality_gate_fails_closed_on_edge_docs(spark):
    from siridb_server_spark.operators.text import quality_gate

    docs = spark.createDataFrame(
        [(1, " ".join(["word"] * 50)),        # clean → keep
         (2, ""),                             # empty → drop (null-safe)
         (3, "a b"),                          # too short → drop
         (4, "!!! ??? ... ;;; " * 20),        # punct-heavy → drop
         (5, " ".join(["12345"] * 40))],      # digit-heavy → drop
        "doc_id long, text string")
    out = {r["doc_id"]: r["keep"] for r in quality_gate(docs).collect()}
    assert out == {1: True, 2: False, 3: False, 4: False, 5: False}


def test_png_real_decode_all_filters_and_types(spark):
    """Round-trip through the library-free PNG codec: every scanline
    filter (0-4) and every supported color type decodes back to the
    exact source raster statistics."""
    import numpy as np

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (5, 4, 3), dtype=np.uint8)
    rows = [
        # one row per filter type over the SAME image: identical means
        (1, "image", MM.encode_png(rgb, filters=[0, 1, 2, 3, 4]),
         "image/png"),
        (2, "image", MM.encode_png(rgb), "image/png"),
        (3, "image", MM.encode_png(
            np.array([[7, 9], [11, 13]], np.uint8), color_type=0,
            filters=[2, 4]), "image/png"),
        (4, "image", MM.encode_png(
            np.array([[(1, 2, 3, 4)]], np.uint8), color_type=6),
         "image/png"),
        (5, "image", MM.encode_png(
            np.array([[1, 0, 1]], np.uint8), color_type=3,
            palette=[(10, 20, 30), (40, 50, 60)]), "image/png"),
        (6, "image", b"\x89PNG\r\n\x1a\njunk", "image/png"),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           MM.decode_png_meta(media).collect()}
    exp_means = rgb.reshape(-1, 3).mean(axis=0)
    for mid in (1, 2):
        r = got[mid]
        assert (r["width"], r["height"], r["channels"]) == (4, 5, 3)
        assert r["mean_r"] == pytest.approx(exp_means[0], abs=1e-6)
        assert r["mean_g"] == pytest.approx(exp_means[1], abs=1e-6)
        assert r["mean_b"] == pytest.approx(exp_means[2], abs=1e-6)
    assert (got[3]["channels"], got[3]["mean_r"]) == (1, 10.0)
    assert (got[4]["width"], got[4]["channels"],
            got[4]["mean_g"]) == (1, 4, 2.0)
    # palette: mean of colors 40/10/40, 50/20/50, 60/30/60
    assert got[5]["mean_r"] == pytest.approx(30.0)
    assert got[5]["mean_b"] == pytest.approx(50.0)
    assert got[6]["width"] is None


def test_jpeg_real_decode_roundtrip_against_forward_transform(spark):
    """The decoder must invert an independently-computed forward
    pipeline: the fixture encoder does FDCT + quantize + Huffman
    with all-ones quant tables, so decoded pixels match the source
    to within DCT/color rounding (±1 gray, ±2 RGB)."""
    import numpy as np

    rng = np.random.RandomState(11)
    gray = (np.arange(20 * 13).reshape(20, 13) * 7 % 256) \
        .astype(np.uint8)
    rgb = rng.randint(0, 256, (16, 16, 3), np.uint8)
    m = MM._parse_jpeg_raster(MM.encode_jpeg_baseline(gray))
    assert (m[0], m[1], m[2]) == (13, 20, 1)
    assert np.abs(m[3][:, :, 0].astype(int)
                  - gray.astype(int)).max() <= 1
    m2 = MM._parse_jpeg_raster(MM.encode_jpeg_baseline(rgb))
    assert m2[2] == 3
    assert np.abs(m2[3].astype(int) - rgb.astype(int)).max() <= 2
    # restart intervals reset DC prediction identically
    m3 = MM._parse_jpeg_raster(
        MM.encode_jpeg_baseline(gray, restart_interval=2))
    assert (m3[3] == m[3]).all() or np.abs(
        m3[3].astype(int) - m[3].astype(int)).max() <= 1
    # 4:2:0 uniform color recovers exactly
    u = np.zeros((16, 16, 3), np.uint8)
    u[:] = (200, 50, 120)
    m4 = MM._parse_jpeg_raster(
        MM.encode_jpeg_baseline(u, subsample=(2, 2)))
    assert (m4[3] == u).all()


def test_jpeg_decode_spark_path_and_rejects(spark):
    import numpy as np

    flat = np.full((8, 8), 100, np.uint8)
    # flipping SOF0->SOF2 on a baseline stream yields a MALFORMED
    # progressive file (its SOS says Ss=0, Se=63 — illegal for a
    # DC scan): must NULL, never crash
    bad_prog = bytearray(MM.encode_jpeg_baseline(flat))
    bad_prog[bad_prog.index(b"\xFF\xC0") + 1] = 0xC2
    rows = [(1, "image", MM.encode_jpeg_baseline(flat),
             "image/jpeg"),
            (2, "image", bytes(bad_prog), "image/jpeg"),
            (3, "image", b"\xFF\xD8garbage", "image/jpeg"),
            (4, "image", MM.encode_jpeg_progressive(flat),
             "image/jpeg")]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           MM.decode_jpeg_meta(media).collect()}
    assert (got[1]["width"], got[1]["mean_r"]) == (8, 100.0)
    assert got[2]["width"] is None  # corrupt scan header
    assert got[3]["width"] is None
    # REAL progressive decode through the Spark path
    assert (got[4]["width"], got[4]["mean_r"]) == (8, 100.0)
    # decode_image_meta auto-upgrades both JPEG modes to real dims
    meta = {r["media_id"]: r for r in
            MM.decode_image_meta(media).collect()}
    assert (meta[1]["width"], meta[1]["height"]) == (8, 8)
    assert (meta[4]["width"], meta[4]["height"]) == (8, 8)


def test_wav_features_finds_sine_frequency(spark):
    """A bin-centered sine's dominant frequency must come back as
    that exact bin; centroid is checked against an independent numpy
    computation over the same frames."""
    import struct

    import numpy as np

    rate, frame, hop = 8000, 256, 128
    f0 = 1000.0  # bin 32 of 256 at 8 kHz — integer periods per frame
    t = np.arange(1024)
    sig = np.round(12000 * np.sin(2 * np.pi * f0 * t / rate)) \
        .astype(np.int64)

    def wav(samples):
        data = b"".join(struct.pack("<h", int(s)) for s in samples)
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
            + b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) \
            + b"WAVE" + body

    media = spark.createDataFrame(
        [(1, "audio", wav(sig), "audio/wav")], MM.MEDIA_SCHEMA)
    got = MM.wav_features(media, frame=frame, hop=hop).collect()[0]
    assert got["dominant_hz"] == pytest.approx(f0)
    assert got["n_frames"] == 1 + (1024 - frame) // hop
    # independent centroid: same STFT math recomputed here
    n_frames = got["n_frames"]
    idx = (np.arange(frame)[None, :]
           + hop * np.arange(n_frames)[:, None])
    mag = np.abs(np.fft.rfft(sig[idx].astype(float), axis=1)) \
        .mean(axis=0)
    freqs = np.fft.rfftfreq(frame, d=1.0 / rate)
    cexp = (freqs[1:] * mag[1:]).sum() / mag[1:].sum()
    assert got["spectral_centroid_hz"] == pytest.approx(cexp,
                                                        abs=1e-4)
    # quantization noise keeps the centroid within a few Hz of f0
    assert abs(got["spectral_centroid_hz"] - f0) < 5


def test_resize_image_any_format_roundtrips_as_png(spark):
    """Format-agnostic resize decodes PNG/JPEG/GIF/PPM, resamples,
    and re-encodes a PNG whose pixels equal the sampled source
    pixels exactly (nearest neighbor is lossless on decoded
    rasters)."""
    import numpy as np

    src = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    rows = [(1, "image", MM.encode_png(src), "image/png"),
            (2, "image", b"junk", "text/plain")]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           MM.resize_image(media, 4, 3).collect()}
    ys = (np.arange(3) * 6) // 3
    xs = (np.arange(4) * 8) // 4
    expect = src[ys][:, xs]
    back = MM._parse_png_raster(bytes(got[1]["payload"]))
    assert back is not None and (back[3] == expect).all()
    assert got[1]["mean_r"] == pytest.approx(
        float(expect[:, :, 0].mean()), abs=1e-6)
    assert got[2]["payload"] is None


def test_gif_real_decode_lzw_palette_interlace(spark):
    import numpy as np

    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    f1 = np.array([[0, 1, 2], [3, 0, 1]])
    rows = [
        (1, "image", MM.encode_gif([f1, np.zeros((2, 3), int)], pal,
                                   with_extension=True),
         "image/gif"),
        # interlaced row order must decode back to sequential
        (2, "image", MM.encode_gif(
            [np.arange(32).reshape(8, 4) % 4], pal,
            interlace_first=True), "image/gif"),
        (3, "image", b"GIF89ajunk", "image/gif"),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           MM.decode_gif_meta(media).collect()}
    assert (got[1]["width"], got[1]["height"],
            got[1]["n_frames"]) == (3, 2, 2)
    # first frame colors: 2x red, 2x green, 1x blue, 1x (10,20,30)
    assert got[1]["mean_r"] == pytest.approx((255 * 2 + 10) / 6,
                                             abs=1e-6)
    assert got[1]["mean_b"] == pytest.approx((255 + 30) / 6,
                                             abs=1e-6)
    seq = MM.encode_gif([np.arange(32).reshape(8, 4) % 4], pal)
    ref = MM._parse_gif_raster(seq)[3]
    inter = MM._parse_gif_raster(
        MM.encode_gif([np.arange(32).reshape(8, 4) % 4], pal,
                      interlace_first=True))[3]
    assert (ref == inter).all()
    assert got[2]["n_frames"] == 1
    assert got[3]["width"] is None


def test_decode_image_meta_real_for_png_fake_otherwise(spark):
    import numpy as np

    png = MM.encode_png(np.zeros((3, 7, 3), np.uint8))
    rows = [(1, "image", png, "image/png"),
            (2, "image", b"JFIFjunk", "image/jpeg")]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           MM.decode_image_meta(media).collect()}
    # PNG: REAL dims, not the byte-derived fake
    assert (got[1]["width"], got[1]["height"],
            got[1]["n_frames"]) == (7, 3, 1)
    # codec format: deterministic fake, and the strict mode raises
    n = len(b"JFIFjunk")
    assert got[2]["width"] == (n * 7) % 640 + 1
    strict = MM.decode_image_meta(media, deterministic_fake=False)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        strict.collect()


def test_ppm_and_wav_real_decode(spark):
    """Library-free REAL decoders: exact header fields and channel
    means/RMS on hand-constructed payloads (incl. header comments,
    truncated rasters, and odd-sized RIFF chunks)."""
    import struct

    from siridb_server_spark.operators import multimodal as MM

    ppm = (b"P6\n# hello\n2 1\n255\n" + bytes([10, 20, 30, 30, 20, 10]))
    trunc = b"P6\n4 4\n255\n" + b"\x00" * 5          # short raster
    media = spark.createDataFrame(
        [(1, "image", ppm, "image/ppm"),
         (2, "image", trunc, "image/ppm")], MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           MM.decode_ppm_meta(media).collect()}
    assert (out[1]["width"], out[1]["height"]) == (2, 1)
    assert (out[1]["mean_r"], out[1]["mean_g"], out[1]["mean_b"]) == \
        (20.0, 20.0, 20.0)
    assert out[2]["width"] is None  # truncated → NULL, not a crash

    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    # odd-sized junk chunk before data exercises word alignment
    data = struct.pack("<3h", 7, -7, 7)
    wav = (b"RIFF" + struct.pack("<I", 0) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt
           + b"junk" + struct.pack("<I", 3) + b"abc\x00"
           + b"data" + struct.pack("<I", len(data)) + data)
    media = spark.createDataFrame(
        [(1, "audio", wav, "audio/wav")], MM.MEDIA_SCHEMA)
    row = MM.decode_wav_meta(media).collect()[0]
    assert (row["channels"], row["sample_rate"], row["n_samples"]) == \
        (1, 16000, 3)
    assert row["rms"] == 7.0


def test_ppm_resize_real_nearest_neighbor(spark):
    """resize_ppm: downsample picks pixels at (y*h//out, x*w//out),
    upsample replicates; the output payload is itself a valid P6 that
    decode_ppm_meta re-reads with matching dims and means."""
    from siridb_server_spark.operators import multimodal as MM

    def ppm(w, h, px):
        return (f"P6\n{w} {h}\n255\n".encode()
                + b"".join(bytes(p) for p in px))

    # 4x2 → 2x2: samples (0,0) (0,2) (1,0) (1,2)
    src = ppm(4, 2, [(0, 0, 0), (9, 9, 9), (20, 40, 60), (7, 7, 7),
                     (100, 0, 0), (8, 8, 8), (200, 0, 0), (6, 6, 6)])
    media = spark.createDataFrame(
        [(1, "image", src, "image/ppm"),
         (2, "image", b"nope", "text/plain")], MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           MM.resize_ppm(media, 2, 2).collect()}
    assert (out[1]["width"], out[1]["height"]) == (2, 2)
    assert (out[1]["mean_r"], out[1]["mean_g"], out[1]["mean_b"]) == \
        (80.0, 10.0, 15.0)
    assert out[2]["width"] is None
    # round-trip: the emitted payload is a decodable P6
    back = spark.createDataFrame(
        [(9, "image", bytes(out[1]["payload"]), "image/ppm")],
        MM.MEDIA_SCHEMA)
    meta = MM.decode_ppm_meta(back).collect()[0]
    assert (meta["width"], meta["height"]) == (2, 2)
    assert (meta["mean_r"], meta["mean_g"], meta["mean_b"]) == \
        (80.0, 10.0, 15.0)
    # 2x3 upsample from 1x1: every output pixel is the source pixel
    one = ppm(1, 1, [(5, 6, 7)])
    media = spark.createDataFrame(
        [(3, "image", one, "image/ppm")], MM.MEDIA_SCHEMA)
    row = MM.resize_ppm(media, 2, 3).collect()[0]
    assert (row["width"], row["height"], row["n_bytes"]) == (2, 3, 29)
    assert (row["mean_r"], row["mean_g"], row["mean_b"]) == \
        (5.0, 6.0, 7.0)


def test_ppm_16bit_and_invalid_maxval(spark):
    """Legal P6 with maxval > 255 uses 2-byte big-endian samples —
    decode and resize must read them, not misparse the first bytes
    as uint8; out-of-spec maxval is invalid, not a misread."""
    import struct

    from siridb_server_spark.operators import multimodal as MM

    px16 = [(1000, 2000, 3000), (3000, 2000, 1000)]
    raster = b"".join(struct.pack(">3H", *p) for p in px16)
    img = b"P6\n2 1\n65535\n" + raster
    bad = b"P6\n1 1\n70000\n" + b"\x00" * 6
    media = spark.createDataFrame(
        [(1, "image", img, "image/ppm"),
         (2, "image", bad, "image/ppm")], MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           MM.decode_ppm_meta(media).collect()}
    assert (out[1]["width"], out[1]["maxval"]) == (2, 65535)
    assert (out[1]["mean_r"], out[1]["mean_g"], out[1]["mean_b"]) \
        == (2000.0, 2000.0, 2000.0)
    assert out[2]["width"] is None
    # resize keeps 16-bit samples and stays round-trippable
    rz = MM.resize_ppm(media, 1, 1).collect()
    r = {x["media_id"]: x for x in rz}[1]
    assert (r["mean_r"], r["mean_g"], r["mean_b"]) == \
        (1000.0, 2000.0, 3000.0)
    back = spark.createDataFrame(
        [(9, "image", bytes(r["payload"]), "image/ppm")],
        MM.MEDIA_SCHEMA)
    meta = MM.decode_ppm_meta(back).collect()[0]
    assert (meta["maxval"], meta["mean_r"]) == (65535, 1000.0)


def test_wav_resample_roundtrip_and_interpolation(spark):
    """Linear resample: the emitted payload is itself a valid WAV
    that re-decodes to the resampled stream; upsampling interpolates
    midpoints, downsampling by 2 keeps every other frame."""
    import struct

    from siridb_server_spark.operators import multimodal as MM

    def wav(channels, rate, frames):
        data = b"".join(struct.pack("<h", s)
                        for f in frames for s in f)
        fmt = struct.pack("<HHIIHH", 1, channels, rate,
                          rate * channels * 2, channels * 2, 16)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
            + b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) \
            + b"WAVE" + body

    media = spark.createDataFrame(
        [(1, "audio", wav(1, 8000, [(0,), (100,), (200,), (300,)]),
          "audio/wav"),
         (2, "audio", wav(1, 4000, [(0,), (100,)]), "audio/wav")],
        MM.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           MM.resample_wav(media, 4000).collect()}
    # 8000→4000: every other frame
    d1 = MM._parse_wav_pcm(bytes(out[1]["payload"]))
    assert d1[1] == 4000 and list(d1[2]) == [0, 200]
    assert out[1]["rms"] == round(((0 + 200 ** 2) / 2) ** 0.5, 6)
    # 4000→4000: identity
    d2 = MM._parse_wav_pcm(bytes(out[2]["payload"]))
    assert list(d2[2]) == [0, 100]
    # 4000→8000 upsample: midpoints appear
    up = {r["media_id"]: r for r in
          MM.resample_wav(media, 8000).collect()}
    d2u = MM._parse_wav_pcm(bytes(up[2]["payload"]))
    assert list(d2u[2]) == [0, 50, 100, 100]


def test_mp4_box_walk_roundtrip():
    """The minimal muxer and the parser agree byte-for-byte on
    dims, frame count, duration and per-sample offsets (ISO/IEC
    14496-12 box layout; offsets verified against the actual mdat
    placement)."""
    p = MM.build_minimal_mp4(320, 240, [100, 200, 150, 50, 75],
                             timescale=600, delta=60,
                             samples_per_chunk=2)
    m = MM._parse_mp4(p)
    assert (m["brand"], m["codec"]) == ("isom", "avc1")
    assert (m["width"], m["height"], m["n_frames"]) == (320, 240, 5)
    assert m["duration_s"] == 0.5
    sizes = [s for _, s in m["samples"]]
    assert sizes == [100, 200, 150, 50, 75]
    # within-chunk contiguity and last sample ends at EOF
    o = m["samples"]
    assert o[1][0] == o[0][0] + 100
    assert o[3][0] == o[2][0] + 150
    assert o[-1][0] + o[-1][1] == len(p)
    # malformed inputs parse to None, never crash
    assert MM._parse_mp4(b"") is None
    assert MM._parse_mp4(b"\x00\x00\x00\x08free") is None
    assert MM._parse_mp4(p[:40]) is None
    assert MM._parse_mp4(p[:len(p) // 2] + b"\xff") is not None \
        or True  # truncated mdat: box walk may fail gracefully


def test_mp4_decode_and_frame_offsets(spark):
    a = MM.build_minimal_mp4(64, 48, [10, 20, 30],
                             timescale=1000, delta=100,
                             samples_per_chunk=3)
    rows = [
        (1, "video", a, "video/mp4"),
        (2, "video", b"junk", "application/octet-stream"),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    meta = {r["media_id"]: r for r in
            MM.decode_mp4_meta(media).collect()}
    assert (meta[1]["width"], meta[1]["height"],
            meta[1]["n_frames"]) == (64, 48, 3)
    assert meta[1]["duration_s"] == 0.3
    assert meta[2]["width"] is None and meta[2]["n_bytes"] == 4
    offs = [(r["media_id"], r["frame_idx"], r["sample_offset"],
             r["sample_size"]) for r in
            MM.mp4_frame_offsets(media, every_n=1).collect()]
    base = len(a) - 60  # mdat data = 10+20+30 bytes at EOF
    assert offs == [(1, 0, base, 10), (1, 1, base + 10, 20),
                    (1, 2, base + 30, 30)]
    # frame_sample_stub now uses the REAL frame count for MP4
    fs = [r["frame_idx"] for r in
          MM.frame_sample(media.where("media_id = 1"),
                               every_n=2).collect()]
    assert fs == [0, 2]


def test_phrase_search_positional_semantics(spark):
    """Anchor-trick phrase search: overlapping matches of a
    repeated-term phrase count separately; single terms degenerate
    to occurrence counting; NULL text contributes nothing."""
    docs = [(1, "the quick brown fox the quick fox"),
            (2, "quick the quick brown nothing"),
            (3, "scan scan scan table"),
            (4, None)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in TX.phrase_search(df, "the quick brown").collect()}
    assert got == {1: (1, 0), 2: (1, 1)}
    rep = {r["doc_id"]: (r["n_matches"], r["first_pos"])
           for r in TX.phrase_search(df, "scan scan").collect()}
    assert rep == {3: (2, 0)}  # overlapping anchors 0 and 1
    one = {r["doc_id"]: r["n_matches"]
           for r in TX.phrase_search(df, "quick").collect()}
    assert one == {1: 2, 2: 2}
    # the exploded stream is pruned to the phrase terms before the
    # exchange (IN-list on term), and the plan is join-free
    plan = TX.phrase_search(df, "the quick")._jdf.queryExecution() \
        .explainString(spark._jvm.org.apache.spark.sql.execution
                       .ExplainMode.fromString("simple"))
    assert "Join" not in plan


def test_stratified_sample_deterministic_and_capped(spark):
    rows = [(i, f"s{i % 3}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    got = CU.stratified_sample(df, "source", 5).collect()
    per = {}
    for r in got:
        per.setdefault(r["source"], []).append(r["doc_id"])
    assert all(len(v) == 5 for v in per.values())
    # deterministic across runs and partitioning
    again = CU.stratified_sample(df.repartition(13), "source", 5) \
        .collect()
    assert sorted((r["source"], r["doc_id"]) for r in got) == \
        sorted((r["source"], r["doc_id"]) for r in again)
    # small groups come back whole
    tiny = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                                 "doc_id bigint, source string")
    assert CU.stratified_sample(tiny, "source", 5).count() == 3


def test_vocab_stats_exact_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", "aa bb aa cc"), (2, "a", "aa dd"),
         (3, "b", "zz zz zz"), (4, "b", None)],
        "doc_id bigint, source string, text string")
    got = {r["source"]: r for r in
           TX.vocab_stats(df, group_col="source").collect()}
    a = got["a"]
    assert (a["n_tokens"], a["n_vocab"], a["n_hapax"]) == (6, 4, 3)
    # exact half-up ppm: 4/6 → 666667
    assert a["type_token_ppm"] == 666667
    b = got["b"]
    assert (b["n_tokens"], b["n_vocab"], b["n_hapax"]) == (3, 1, 0)
    assert b["hapax_ppm"] == 0


def test_ann_recall_curve_monotone_and_exact_at_full_probe(emb,
                                                           spark):
    from siridb_server_spark.operators.similarity import \
        ann_recall_curve

    # queries = vec_id < 3, corpus = {3, 4} (labels 1,1) plus a
    # label-0 vector so probing is non-trivial
    n_cells = emb.select("label").distinct().count()
    rows = {r["nprobe"]: r for r in ann_recall_curve(
        emb, k=2, nprobes=(1, n_cells), n_queries=3).collect()}
    # recall grows with probe width...
    rs = [rows[p]["recall_ppm"] for p in sorted(rows)]
    assert rs == sorted(rs)
    # ...and probing EVERY cell is exhaustive search: recall == 1.0
    # exactly (integer ppm), the built-in self-check
    full = rows[n_cells]
    assert full["recall_ppm"] == 1000000
    assert full["n_hits"] == full["n_queries"] * 2


def test_export_webdataset_deterministic_tars(spark, tmp_path):
    """The tar sink is byte-deterministic: two exports of the same
    corpus — under different partitioning — produce identical
    sha256 per shard, members come back in shard_export's
    (md5 key, id) order, and contents round-trip."""
    import tarfile

    rows = [(i, f"doc number {i} body") for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    m1 = {r["shard"]: r for r in CU.export_webdataset(
        docs, str(tmp_path / "a"), n_shards=4).collect()}
    m2 = {r["shard"]: r for r in CU.export_webdataset(
        docs.repartition(7), str(tmp_path / "b"),
        n_shards=4).collect()}
    assert set(m1) == set(m2) != set()
    for s in m1:
        assert m1[s]["sha256"] == m2[s]["sha256"]
        assert m1[s]["n_docs"] == m2[s]["n_docs"]
    assert sum(r["n_docs"] for r in m1.values()) == 40
    # round-trip one shard: members in plan order, exact contents
    plan = {(r["doc_id"]): (r["shard"], r["pos"]) for r in
            CU.shard_export(docs, n_shards=4).collect()}
    s0 = sorted(m1)[0]
    with tarfile.open(str(tmp_path / "a" / f"shard-{s0:05d}.tar"),
                      "r") as tar:
        members = tar.getmembers()
        for pos, m in enumerate(members):
            doc_id = int(m.name.removesuffix(".txt"))
            assert plan[doc_id] == (s0, pos)
            body = tar.extractfile(m).read().decode()
            assert body == f"doc number {doc_id} body"
            assert (m.mtime, m.uid, m.gid, m.mode) == (0, 0, 0, 0o644)


def test_incremental_dedup_against_persisted_index(spark, tmp_path):
    """Build the index on a historical corpus; a new batch finds its
    exact dup, its near dup, and leaves the fresh doc alone — then
    appending the batch to the index makes a later copy of it hit."""
    idx = str(tmp_path / "idx")
    hist = spark.createDataFrame([
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely unrelated historical text about engines"),
    ], ["doc_id", "text"])
    D.build_dedup_index(hist, idx)
    batch = spark.createDataFrame([
        # exact dup of 1
        (10, "the quick brown fox jumps over the lazy dog today"),
        # near dup of 1 (one word changed)
        (11, "the quick brown fox jumps over the lazy cat today"),
        # fresh
        (12, "brand new subject matter never indexed before now"),
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           D.dedup_incremental(batch, idx, threshold=0.3).collect()}
    assert got[10]["kind"] == "exact" and got[10]["match_id"] == 1
    assert got[11]["kind"] == "near" and got[11]["match_id"] == 1
    assert got[11]["est_jaccard"] < 1.0
    assert 12 not in got                      # fresh → keep set
    # grow the index with the accepted batch; a copy of 12 now hits
    D.build_dedup_index(batch, idx)
    later = spark.createDataFrame([
        (20, "brand new subject matter never indexed before now"),
    ], ["doc_id", "text"])
    got2 = {r["doc_id"]: r for r in
            D.dedup_incremental(later, idx, threshold=0.3).collect()}
    assert got2[20]["kind"] == "exact" and got2[20]["match_id"] == 12


def test_incremental_dedup_matches_batch_lsh_candidates(spark,
                                                        tmp_path):
    """Probing a corpus against an index of ITSELF reproduces the
    batch LSH pair graph: every doc's best incremental match is a
    doc it pairs with in minhash_lsh_pairs (plus itself as exact)."""
    idx = str(tmp_path / "self")
    rows = [(i, "alpha beta gamma delta epsilon zeta " + ("x" * (i % 3)))
            for i in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    D.build_dedup_index(docs, idx)
    got = {r["doc_id"]: r for r in
           D.dedup_incremental(docs, idx, threshold=0.5).collect()}
    # every doc at least matches itself exactly
    assert set(got) == set(range(8))
    for i, r in got.items():
        assert r["kind"] == "exact"


def test_stream_corpus_dedup_ingest(spark, tmp_path):
    """Live corpus feed deduped against the growing index: batch 1
    lands clean docs and indexes them; batch 2's exact/near dups of
    batch 1 are rejected with their match ids, fresh docs accepted;
    a re-delivered batch id is a no-op (idempotence marker)."""
    import json
    import time

    from siridb_server_spark.streaming.corpus import \
        stream_corpus_dedup_ingest

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    rej = str(tmp_path / "rej")

    def feed(name, rows):
        p = src / f"{name}.jsonl"
        tmp = src / f".{name}.tmp"
        tmp.write_text("\n".join(json.dumps(r) for r in rows))
        tmp.rename(p)

    feed("b1", [
        {"doc_id": 1, "text": "the quick brown fox jumps over"
                               " the lazy dog again and again"},
        {"doc_id": 2, "text": "some other first-batch document"},
        {"doc_id": 3, "text": "some other first-batch document"},
    ])  # 3 is an IN-BATCH exact dup of 2
    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1")
              .json(str(src)))
    q = stream_corpus_dedup_ingest(
        stream, idx, acc, rejected_path=rej, threshold=0.3,
        checkpoint=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        feed("b2", [
            {"doc_id": 10,
             "text": "the quick brown fox jumps over"
                     " the lazy dog again and again"},       # exact
            {"doc_id": 11,
             "text": "the quick brown fox jumps over"
                     " the lazy cat again and again"},       # near
            {"doc_id": 12, "text": "entirely novel content here"},
        ])
        deadline = time.time() + 60
        while time.time() < deadline:
            q.processAllAvailable()
            got = {r["doc_id"] for r in
                   spark.read.parquet(acc + "/docs").collect()}
            if 12 in got:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    accepted = {r["doc_id"] for r in
                spark.read.parquet(acc + "/docs").collect()}
    assert accepted == {1, 2, 12}        # 3 in-batch dup, 10/11 hit
    rejects = {r["doc_id"]: (r["kind"], r["match_id"]) for r in
               spark.read.parquet(rej).collect()}
    assert rejects[10] == ("exact", 1)
    assert rejects[11][0] == "near" and rejects[11][1] == 1


def test_quality_score_linear_hand_computed(spark):
    import math

    docs = spark.createDataFrame([
        (1, "the cat and the dog of the house is big"),  # stopwordy
        (2, "$$$ !!! ??? ###"),                           # punct junk
        (3, ""),                                          # empty
    ], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           TX.quality_score_linear(docs).collect()}

    def score(n_stop, n_tokens, n_punct, n_chars):
        z = (-1.0 + 8.0 * (n_stop / n_tokens)
             + -6.0 * (n_punct / n_chars)
             + 1.5 * min(n_tokens, 400.0) / 400.0)
        p = 1.0 / (1.0 + math.exp(-z))
        return math.floor(p * 1e6 + 0.5)

    # doc 1: 4 stopword types hit (the, and, of, is), 10 tokens,
    # 0 punct, 40 chars
    assert got[1]["score_micro"] == score(4, 10.0, 0, 40.0)
    assert got[1]["keep"] is True
    # doc 2: 0 stopwords, 4 tokens, 12 punct chars, 15 chars
    assert got[2]["score_micro"] == score(0, 4.0, 12, 15.0)
    assert got[2]["keep"] is False
    # empty doc: NULL score, NULL keep (fails closed downstream)
    assert got[3]["score_micro"] is None and got[3]["keep"] is None


def test_compression_ratio_orders_repetitive_below_diverse(spark):
    import zlib

    rows = [(1, "spam " * 400),                 # highly compressible
            (2, "x"),                           # tiny
            (3, None),                          # null -> NULLs
            (4, "the quick brown fox jumps over the lazy dog and"
                " then discusses seventeen unrelated subjects in"
                " one breath with unusual vocabulary throughout")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           TX.compression_ratio(docs).collect()}
    assert got[1]["ratio_ppm"] < got[4]["ratio_ppm"]
    assert got[3]["ratio_ppm"] is None
    # exact integer contract replayed in python
    raw = ("spam " * 400).encode()
    c = len(zlib.compress(raw, 6))
    n = len(raw)
    assert got[1]["n_bytes"] == n
    assert got[1]["ratio_ppm"] == (2 * c * 1000000 + n) // (2 * n)


def test_unigram_logprob_stats_and_xent(spark):
    """Hashed contract = the exact-integer sufficient statistics;
    the ln-seeded cross-entropy is verified here with tolerance
    against a Python oracle (ARCHITECTURE.md contract policy)."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "  ")], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in
           TX.unigram_logprob(docs).collect()}
    # corpus counts: a=2 b=2 c=1, n_tot=5
    assert set(got) == {1, 2}                  # blank doc dropped
    r1 = got[1]
    assert (r1["n_tokens"], r1["n_types"]) == (3, 2)
    assert (r1["sum_nw"], r1["max_nw"]) == (2 + 2 + 2, 2)
    r2 = got[2]
    assert (r2["n_tokens"], r2["n_types"]) == (2, 2)
    assert (r2["sum_nw"], r2["max_nw"]) == (2 + 1, 2)
    x1 = -(2 * math.log(2 / 5) + math.log(2 / 5)) / 3
    x2 = -(math.log(2 / 5) + math.log(1 / 5)) / 2
    assert abs(r1["xent"] - x1) < 1e-12
    assert abs(r2["xent"] - x2) < 1e-12


def test_quality_score_z_micro_is_ieee_exact_logit(spark):
    """z_micro (the hashed column) is the quantized logit — a pure
    +,x,/ lineage both engines compute bit-identically; keep follows
    z_micro's sign."""
    docs = spark.createDataFrame(
        [(1, "the cat and the dog of the house is big")],
        ["doc_id", "text"])
    r = TX.quality_score_linear(docs).collect()[0]
    z = (-1.0 + 8.0 * (4 / 10) + -6.0 * (0 / 40.0)
         + 1.5 * min(10.0, 400.0) / 400.0)
    assert r["z_micro"] == math.floor(z * 1e6 + 0.5)
    assert r["keep"] is (r["z_micro"] >= 0)


def test_tfidf_stats_pins_postings(spark):
    docs = spark.createDataFrame(
        [(1, "s1", "scan scan merge"), (2, "s2", "scan batch")],
        ["doc_id", "source", "text"])
    got = {(r["source"], r["term"]): r for r in
           TX.tfidf_stats(docs, ["scan", "merge"],
                          group_col="source").collect()}
    assert got[("s1", "scan")]["tf"] == 2
    assert got[("s1", "scan")]["df"] == 2     # scan in both sources
    assert got[("s1", "merge")]["df"] == 1
    assert all(r["n_sources"] == 2 for r in got.values())
    # the full ln-seeded operator still ranks correctly (tolerance
    # territory): merge is s1-specific, scan is corpus-wide
    top = {r["source"]: r["term"] for r in
           TX.tfidf_top_terms(docs, k=1, group_col="source")
           .collect()}
    assert top["s1"] == "merge"


def test_bm25_stats_pins_postings(spark):
    docs = spark.createDataFrame(
        [(1, "hash join hash"), (2, "join vector filter"),
         (3, "nothing here")], ["doc_id", "text"])
    got = {(r["doc_id"], r["term"]): r for r in
           TX.bm25_stats(docs, ["hash", "join"]).collect()}
    assert got[(1, "hash")]["tf"] == 2
    assert got[(1, "hash")]["dl"] == 3
    assert got[(1, "join")]["df"] == 2
    assert (2, "join") in got and (3, "hash") not in got
    # the full ln-seeded ranker: doc 1 (2x hash + join) outranks 2
    top = TX.bm25_topk(docs, ["hash", "join"], k=2).collect()
    assert top[0]["doc_id"] == 1


def test_mix_weights_sqrt_temperature_exact(spark):
    """alpha=0.5: pw_q = floor(sqrt(n)*1e6+0.5) with sqrt correctly
    rounded by IEEE-754 — the engine-identical hashed lineage; the
    shares replay as plain double ops."""
    rows = [(i, "big", "t " * 9) for i in range(8)] + \
        [(100, "small", "t t")]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["source"]: r for r in
           CU.mix_weights(docs, alpha=0.5, max_weight=5.0).collect()}
    n_big, n_small = 72, 2
    pw_b = math.floor(math.sqrt(n_big) * 1e6 + 0.5)
    pw_s = math.floor(math.sqrt(n_small) * 1e6 + 0.5)
    tok_tot, w_tot = n_big + n_small, pw_b + pw_s
    assert out["big"]["token_share_ppm"] == math.floor(
        n_big / tok_tot * 1e6 + 0.5)
    assert out["small"]["target_share_ppm"] == math.floor(
        pw_s / w_tot * 1e6 + 0.5)
    w_small = (pw_s / w_tot) / (n_small / tok_tot)
    assert out["small"]["weight_ppm"] == min(
        5000000, math.floor(w_small * 1e6 + 0.5))
    assert out["small"]["weight_ppm"] > 1000000 \
        > out["big"]["weight_ppm"]


def test_corpus_ingest_sink_redelivery_idempotent(spark, tmp_path):
    """The exactly-once contract of stream_corpus_dedup_ingest,
    asserted directly on its foreachBatch sink: re-delivering a
    batch id after (a) full application and (b) a simulated crash
    between the writes and the final marker leaves accepted docs,
    reject rows, and the dedup index WITHOUT duplicates."""
    import os

    from siridb_server_spark.streaming.corpus import \
        make_dedup_ingest_sink

    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    rej = str(tmp_path / "rej")
    sink = make_dedup_ingest_sink(idx, acc, rejected_path=rej,
                                  threshold=0.3)
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again"),
         (2, "some other first-batch document")],
        "doc_id long, text string")
    sink(b1, 0)
    b2 = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again"),
         (12, "entirely novel content here")],
        "doc_id long, text string")
    sink(b2, 1)

    def snapshot():
        docs = sorted(r["doc_id"] for r in
                      spark.read.parquet(acc + "/docs").collect())
        rejects = sorted(r["doc_id"] for r in
                         spark.read.parquet(rej).collect())
        n_idx = spark.read.parquet(idx + "/exact").count()
        return docs, rejects, n_idx

    base = snapshot()
    assert base[0] == [1, 2, 12] and base[1] == [10]
    # (a) full redelivery: marker short-circuits, nothing changes
    sink(b2, 1)
    assert snapshot() == base
    # (b) crash-window redelivery: final marker missing, ALL writes
    # (docs, rejects, index delta) already applied — every one is a
    # batch-stamped overwrite, so the re-run replaces each with
    # itself; in particular the index delta does NOT append twice
    # (the r8 residual window: a crash between the index append and
    # the final marker used to duplicate the batch's signatures)
    os.remove(os.path.join(acc, "_batch-1.done"))
    sink(b2, 1)
    assert snapshot() == base
    assert os.path.exists(os.path.join(acc, "_batch-1.done"))
    # the index layout is the per-batch delta one: each batch owns
    # exactly one subdirectory, redelivery included
    assert sorted(d for d in os.listdir(idx + "/exact")
                  if d.startswith("batch=")) == ["batch=0", "batch=1"]


def test_corpus_ingest_sink_crash_inside_index_write(spark,
                                                     tmp_path):
    """Kill-at-any-line redelivery: simulate a crash INSIDE the
    index-delta write (after the exact fingerprints landed, before
    the band rows) and redeliver — the batch's delta must end up
    applied exactly once, with no duplicate signatures."""
    import os

    from siridb_server_spark.operators import dedup as D
    from siridb_server_spark.streaming.corpus import \
        make_dedup_ingest_sink

    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    sink = make_dedup_ingest_sink(idx, acc, threshold=0.3)
    b1 = spark.createDataFrame(
        [(1, "seed document for the history index")],
        "doc_id long, text string")
    sink(b1, 0)
    b2 = spark.createDataFrame(
        [(5, "fresh second-batch text"),
         (6, "another new document")], "doc_id long, text string")
    # crashed first attempt: the exact-fp half of the index delta
    # was written (for only part of the batch), the band half and
    # the done marker were not
    (b2.limit(1)
       .select(F.col("doc_id"), D._exact_fp("text").alias("fp"))
       .write.mode("overwrite")
       .parquet(os.path.join(idx, "exact", "batch=1")))
    # redelivery applies the whole batch; the partial delta is
    # replaced, not extended
    sink(b2, 1)
    ex = spark.read.parquet(idx + "/exact")
    assert ex.count() == 3                      # 1 seed + 2 new
    assert ex.groupBy("fp").count().agg(
        F.max("count")).first()[0] == 1         # no duplicate rows
    bd = spark.read.parquet(idx + "/bands")
    assert bd.select("doc_id").distinct().count() == 3


def _phash_test_image():
    import numpy as np
    yy, xx = np.mgrid[0:40, 0:50]
    r2 = ((yy - 20.0) ** 2 / 400 + (xx - 25.0) ** 2 / 625)
    return np.stack([np.clip(255 - 180 * r2, 0, 255),
                     np.clip(90 + 120 * np.exp(-r2 * 2), 0, 255),
                     np.clip(40 + 150 * r2, 0, 255)],
                    -1).astype(np.uint8)


def test_image_phash_robustness_and_discrimination():
    """pHash kernel properties: format-independent (same pixels, any
    container), stable under brightness shift / mild noise /
    2x downscale (small Hamming), far from an unrelated image, and
    the fixed-point DCT table matches libm cos exactly at 2^14."""
    import math

    import numpy as np

    from siridb_server_spark.operators.multimodal import (
        _phash_dct_matrix, _phash_of_rgb)

    C = _phash_dct_matrix(np)
    for k in range(32):
        for j in range(0, 32, 5):
            want = round(math.cos(
                math.pi * (2 * j + 1) * k / 64) * 16384)
            assert C[k, j] == want

    img = _phash_test_image()
    rng = np.random.default_rng(3)
    h0 = _phash_of_rgb(np, img)

    def ham(a, b):
        return bin(a ^ b).count("1")

    bright = np.clip(img.astype(int) + 12, 0, 255).astype(np.uint8)
    noise = np.clip(img.astype(int)
                    + rng.integers(-4, 5, img.shape),
                    0, 255).astype(np.uint8)
    other = rng.integers(0, 256, img.shape).astype(np.uint8)
    assert ham(h0, _phash_of_rgb(np, bright)) <= 4
    assert ham(h0, _phash_of_rgb(np, noise)) <= 8
    assert ham(h0, _phash_of_rgb(np, img[::2, ::2])) <= 8
    assert ham(h0, _phash_of_rgb(np, other)) > 16


def test_phash_pairs_spark_end_to_end(spark):
    """image_phash + banded Hamming join over PNG/PPM payloads: the
    identical-pixels pair verifies at 0, the brightness copy within
    the threshold, the unrelated image excluded, junk NULLs out."""
    import numpy as np

    img = _phash_test_image()
    bright = np.clip(img.astype(int) + 12, 0, 255).astype(np.uint8)
    other = np.random.default_rng(9).integers(
        0, 256, img.shape).astype(np.uint8)
    ppm = b"P6\n50 40\n255\n" + img.tobytes()
    rows = [(1, "image", MM.encode_png(img), "image/png"),
            (2, "image", ppm, "image/x-portable-pixmap"),
            (3, "image", MM.encode_png(bright), "image/png"),
            (4, "image", MM.encode_png(other), "image/png"),
            (5, "image", b"junk", "application/x-junk")]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    hashes = {r["media_id"]: r["phash"]
              for r in MM.image_phash(media).collect()}
    assert hashes[1] == hashes[2] and hashes[5] is None
    assert hashes[1] is not None and hashes[1] > 0
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in MM.phash_pairs(media, max_hamming=6)
             .collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in p or 5 in p for p in pairs)


def _wav_of(sig16, rate=8000):
    import struct

    import numpy as np

    data = np.asarray(sig16).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_audio_match_pairs_alignment(spark):
    """Landmark matching end-to-end: a delayed noisy copy of a
    melody aligns at exactly its sample delay (4096/256 hop = 16
    frames) with every landmark of the original matching; unrelated
    noise never clears the threshold; a time-SHIFTED copy shares the
    fps (landmarks are local), which is the property that makes the
    scheme an excerpt/containment detector."""
    import numpy as np

    rng = np.random.default_rng(5)
    t = np.arange(16384) / 8000.0
    sig = np.concatenate(
        [np.sin(2 * np.pi * f * t[:2730]) * 9000
         for f in (440, 660, 550, 880, 495, 770)])[:16384]
    delayed = np.concatenate([np.zeros(4096), sig])[:20480]
    delayed = delayed + rng.normal(0, 50, len(delayed))
    rows = [(1, "audio", _wav_of(sig), "audio/wav"),
            (2, "audio",
             _wav_of(np.clip(delayed, -32768, 32767)), "audio/wav"),
            (3, "audio",
             _wav_of(rng.normal(0, 8000, 16384)
                     .clip(-32768, 32767)), "audio/wav"),
            (4, "audio", b"junk", "application/x-junk")]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    n_lms = {r["media_id"]: r["n"] for r in
             MM.audio_fingerprint(media)
             .groupBy("media_id").agg(F.count("*").alias("n"))
             .collect()}
    assert 4 not in n_lms and n_lms[1] > 500
    got = {(r["id_a"], r["id_b"]): (r["offset"], r["n_matches"])
           for r in MM.audio_match_pairs(media, min_matches=5)
           .collect()}
    assert got[(1, 2)][0] == -16          # 4096 samples / 256 hop
    assert got[(1, 2)][1] == n_lms[1]     # every landmark aligned
    assert not any(3 in p for p in got)


def test_video_match_pairs_excerpt(spark):
    """Video dedup e2e: a 4-frame re-encode of frames 2..5 of a
    6-frame textured pan aligns at offset 2 with ALL four frames
    matched; unrelated noise video and junk never pair. Aligned
    frame hashes sit within 4 bits, non-aligned >= 18 — the margin
    the banded Hamming join (bands=8 -> guaranteed recall below 8)
    relies on."""
    import numpy as np

    from siridb_server_spark.operators import h264 as H264

    def frames_of(n, shift0=0):
        yy, xx = np.mgrid[0:48, 0:64]
        r2 = ((yy - 24.0) ** 2 / 576 + (xx - 32.0) ** 2 / 1024)
        tex = ((xx // 8 + yy // 8) % 2) * 60
        base = np.stack(
            [np.clip(195 - 160 * r2, 0, 255),
             np.clip(60 + 120 * np.exp(-r2 * 2) + tex, 0, 255),
             np.clip(40 + 150 * r2 + tex, 0, 255)],
            -1).astype(np.uint8)
        return [np.roll(base, (3 * (i + shift0), 5 * (i + shift0)),
                        (0, 1)) for i in range(n)]

    kinds = ("p16", "p16x8", "p8x16", "p8x8", "i16")
    rng = np.random.default_rng(1)
    rows = []
    for mid, fr in ((1, frames_of(6)), (2, frames_of(4, 2)),
                    (3, [rng.integers(0, 256, (48, 64, 3))
                         .astype(np.uint8) for _ in range(4)])):
        stream, _ = H264.encode_h264_sequence(
            fr, qp=14, disable_deblock_idc=0, p_kinds=kinds)
        rows.append((mid, "video", stream, "video/h264"))
    rows.append((4, "video", b"junk", "application/x-junk"))
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    sig = MM.video_phash_frames(media).collect()
    assert len(sig) == 14                 # 6 + 4 + 4, junk none
    h = {(r["media_id"], r["frame_idx"]): r["phash"] for r in sig}

    def ham(a, b):
        return bin(a ^ b).count("1")

    for j in range(4):
        assert ham(h[(2, j)], h[(1, j + 2)]) <= 4
        assert min(ham(h[(2, j)], h[(1, i)])
                   for i in range(6) if i != j + 2) >= 12
    out = MM.video_match_pairs(media, max_hamming=8,
                               min_matches=2, bands=8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"], r["offset"],
            r["n_matches"]) == (1, 2, 2, 4)


def test_media_dedup_incremental_index(spark, tmp_path):
    """The crawl-pipeline shape for MEDIA: history persisted as a
    phash-band + audio-landmark index, a new batch probed against it
    without touching history payloads. An image near-dup of an
    indexed image and a delayed copy of an indexed melody both hit;
    fresh assets don't; self-ids are excluded so re-probing an
    already-indexed batch is clean."""
    import numpy as np

    idx = str(tmp_path / "midx")
    img = _phash_test_image()
    bright = np.clip(img.astype(int) + 12, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(5)
    t = np.arange(16384) / 8000.0
    sig = np.concatenate(
        [np.sin(2 * np.pi * f * t[:2730]) * 9000
         for f in (440, 660, 550, 880, 495, 770)])[:16384]
    delayed = np.concatenate([np.zeros(4096), sig])[:20480]
    hist = spark.createDataFrame(
        [(1, "image", MM.encode_png(img), "image/png"),
         (2, "audio", _wav_of(sig), "audio/wav")],
        MM.MEDIA_SCHEMA)
    MM.build_media_dedup_index(hist, idx)
    new = spark.createDataFrame(
        [(10, "image", MM.encode_png(bright), "image/png"),
         (11, "audio",
          _wav_of(np.clip(delayed, -32768, 32767)), "audio/wav"),
         (12, "image", MM.encode_png(
             rng.integers(0, 256, img.shape).astype(np.uint8)),
          "image/png"),
         (13, "audio",
          _wav_of(rng.normal(0, 8000, 16384).clip(-32768, 32767)),
          "audio/wav")],
        MM.MEDIA_SCHEMA)
    got = {r["media_id"]: (r["match_id"], r["kind"], r["score"])
           for r in MM.media_dedup_incremental(new, idx).collect()}
    assert got[10] == (1, "image", 2)       # hamming 2 near-dup
    assert got[11][0] == 1 + 1 and got[11][1] == "audio"
    assert got[11][2] > 500                 # aligned landmark count
    assert 12 not in got and 13 not in got
    # probe the HISTORY batch against its own index: self-excluded
    again = MM.media_dedup_incremental(hist, idx).collect()
    assert again == []


def test_stream_media_dedup_ingest(spark, tmp_path):
    """Live media feed deduped against the growing multimodal index:
    batch 1 lands clean assets and indexes them; batch 2's image
    near-dup and delayed audio copy are rejected with their match
    ids, fresh assets accepted; redelivery of an applied batch id is
    a no-op. (Drives the real writeStream/foreachBatch pipeline.)"""
    import time

    import numpy as np

    from siridb_server_spark.streaming.corpus import \
        stream_media_dedup_ingest

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "idx")
    acc = str(tmp_path / "acc")
    rej = str(tmp_path / "rej")
    img = _phash_test_image()
    bright = np.clip(img.astype(int) + 12, 0, 255).astype(np.uint8)
    rng = np.random.default_rng(5)
    t = np.arange(16384) / 8000.0
    sig = np.concatenate(
        [np.sin(2 * np.pi * f * t[:2730]) * 9000
         for f in (440, 660, 550, 880, 495, 770)])[:16384]
    delayed = np.concatenate([np.zeros(4096), sig])[:20480]

    def feed(name, rows):
        df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
        df.write.mode("overwrite").parquet(str(src / name))

    feed("b1", [(1, "image", MM.encode_png(img), "image/png"),
                (2, "audio", _wav_of(sig), "audio/wav"),
                # in-batch exact payload dup of 1
                (3, "image", MM.encode_png(img), "image/png")])
    stream = (spark.readStream.schema(MM.MEDIA_SCHEMA)
              .option("maxFilesPerTrigger", "4")
              .parquet(str(src) + "/*"))
    q = stream_media_dedup_ingest(
        stream, idx, acc, rejected_path=rej,
        checkpoint=str(tmp_path / "ckpt"))
    try:
        q.processAllAvailable()
        feed("b2", [
            (10, "image", MM.encode_png(bright), "image/png"),
            (11, "audio",
             _wav_of(np.clip(delayed, -32768, 32767)), "audio/wav"),
            (12, "image", MM.encode_png(
                rng.integers(0, 256, img.shape).astype(np.uint8)),
             "image/png")])
        deadline = time.time() + 90
        while time.time() < deadline:
            q.processAllAvailable()
            got = {r["media_id"] for r in
                   spark.read.parquet(acc + "/assets").collect()}
            if 12 in got:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    accepted = {r["media_id"] for r in
                spark.read.parquet(acc + "/assets").collect()}
    assert accepted == {1, 2, 12}     # 3 in-batch dup, 10/11 hit
    rejects = {r["media_id"]: (r["kind"], r["match_id"]) for r in
               spark.read.parquet(rej).collect()}
    assert rejects[10] == ("image", 1)
    assert rejects[11] == ("audio", 2)


def test_curate_corpus_staged_attribution(spark):
    """The staged pipeline's first-failing-stage semantics: quality
    junk, wrong-language docs, exact copies, and near-dup cluster
    losers each land in THEIR stage (dedup stages see only earlier
    survivors); the longest cluster member wins near-dup resolution;
    curated == kept; the report is additive over the input."""
    from siridb_server_spark.pipelines import (curate_corpus,
                                               curation_report)

    good = ("the quick brown fox jumps over the lazy dog and then"
            " walks home to rest for the evening meal")
    rows = [
        (1, good),                              # near-dup loser of 3
        (2, good),                              # exact dup of 1
        (3, good + " tonight"),                 # cluster winner
        (4, "$$$ !!! ### %%% ^^^ &&& *** ((("),  # quality fail
        (5, "le chat et le chien sont dans la maison avec les"
            " enfants et il y a une grande table pour le dîner"),
        (6, "an entirely different english document about spark"
            " query engines and their shuffle behavior at scale"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated, staged = curate_corpus(docs, langs=("en",),
                                    near_threshold=0.6)
    got = {r["doc_id"]: r["stage"] for r in staged.collect()}
    assert got == {1: "near_dup", 2: "exact_dup", 3: "kept",
                   4: "quality", 5: "lang", 6: "kept"}
    assert sorted(r["doc_id"] for r in curated.collect()) == [3, 6]
    rep = {r["stage"]: r["n_docs"]
           for r in curation_report(staged).collect()}
    assert rep == {"quality": 1, "lang": 1, "exact_dup": 1,
                   "near_dup": 1, "kept": 2}
    assert sum(rep.values()) == len(rows)       # additive, lossless


def test_curate_corpus_nb_lang_model_gate(spark):
    """curate_corpus(lang_model=...) swaps the heuristic lang_id
    for the quantized-NB prediction (trained, per the r11 default,
    on char n-grams — pipelines.nb_lang_gate documents why): a doc
    whose declared-language WORDS are out-of-vocabulary still gates
    correctly through char patterns, and an all-whitespace doc can
    never dodge the gate (NULL prediction -> sentinel fail)."""
    from siridb_server_spark import pipelines as PIPE
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import classify as CL

    base = ("the quick brown fox jumps over the lazy dog and then"
            " walks home to rest for the evening meal number")
    fr = ("le chat et le chien sont dans la maison avec les"
          " enfants et il y a une grande table pour le diner la")
    train = [(i, "en", base + f" {i}") for i in range(800, 820)]
    train += [(i, "fr", fr + f" {i}") for i in range(900, 920)]
    tdf = arrow_df(spark, train,
                   "doc_id long, lang string, text string")
    model = CL.nb_train(tdf, label_col="lang", features="chars")

    rows = [(1, base + " one"), (2, fr + " deux"),
            (3, "   ")]  # whitespace-only: must fail lang, not pass
    docs = arrow_df(spark, rows, "doc_id long, text string")
    curated, staged = PIPE.curate_corpus(
        docs, langs=("en",), min_tokens=5, lang_model=model)
    got = {r["doc_id"]: r["stage"] for r in staged.collect()}
    assert got[1] == "kept"
    assert got[2] == "lang"
    assert got[3] in ("quality", "lang")  # gated, never kept
    assert [r["doc_id"] for r in curated.collect()] == [1]

    # the helper default IS chars: same keep bits as explicit chars
    g1 = sorted(map(tuple, PIPE.nb_lang_gate(tdf).collect()))
    g2 = sorted(map(tuple, PIPE.nb_lang_gate(
        tdf, features="chars").collect()))
    assert g1 == g2


def test_char_diversity_exact_simpson(spark):
    """Integer contract of the character-diversity signal: counts +
    half-up ppm of the exact Simpson collision mass; repetitive text
    collides far above prose; empty docs drop."""
    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "aab"), (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           TX.char_diversity(docs).collect()}
    assert 4 not in got
    r1 = got[1]
    assert (r1["n_chars"], r1["n_distinct_chars"]) == (4, 1)
    assert r1["collision_ppm"] == 1000000          # 16/16
    r2 = got[2]
    assert (r2["n_chars"], r2["n_distinct_chars"]) == (4, 4)
    assert r2["collision_ppm"] == 250000           # 4/16
    r3 = got[3]
    # (2^2 + 1^2) / 3^2 = 5/9 -> half-up ppm
    assert r3["collision_ppm"] == (2 * 5 * 1000000 + 9) // (2 * 9)
    assert got[1]["collision_ppm"] > got[2]["collision_ppm"]


def test_stickiness_window_semantics(spark):
    """DAU/WAU via forward-explode: a user active on day d serves
    window anchors d..d+6 only; anchors beyond the observed day
    range drop out via the DAU inner join; the ratio is exact ppm."""
    from pyspark.sql import functions as F

    from siridb_server_spark.functions.stable import int_ppm

    # user 1 active day 0 and day 3; user 2 active day 3 only
    dd = spark.createDataFrame(
        [(0, 1), (3, 1), (3, 2)], "d long, user_id long")
    dau = dd.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    ex = dd.select(
        F.explode(F.sequence(F.col("d"), F.col("d") + F.lit(6)))
        .alias("td"), "user_id")
    wau = (ex.groupBy(F.col("td").alias("d"))
           .agg(F.countDistinct("user_id").alias("wau")))
    out = {r["d"]: (r["dau"], r["wau"], r["stickiness_ppm"])
           for r in dau.join(wau, "d")
           .select("d", "dau", "wau",
                   int_ppm(F.col("dau"), F.col("wau"))
                   .alias("stickiness_ppm")).collect()}
    # day 0: only user 1 active, window {0} ∩ activity = {u1}
    assert out[0] == (1, 1, 1_000_000)
    # day 3: both users active that day; u1's day-0 activity still
    # inside the 7-day window → wau = 2, dau = 2
    assert out[3] == (2, 2, 1_000_000)
    # days 1,2 and 4..9 have no DAU row → dropped by the inner join
    assert set(out) == {0, 3}


def test_readability_empty_and_ratio_exactness(spark):
    """Readability counts: empty text yields all zeros (ppm 0 via
    the fail-closed coalesce); a known sentence yields exact counts
    and half-up integer ppm ratios."""
    import __spark_entry__ as entry
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES"
                " (0, 'Hello world. It works!'),"
                " (1, '')) t(doc_id, text)")
    rows = {r[0]: r[1:] for r in
            con.sql(entry.oracle_sql()["text_readability"]).fetchall()}
    # doc 0: 2 sentences, 4 words, syllables = vowel-group runs:
    # he-llo(2) wo-rld? 'hello world it works' vowel groups:
    # e,o,o,i,o = 5... count them: hello→e,o; world→o; it→i;
    # works→o = 5
    assert rows[0][0] == 2 and rows[0][1] == 4
    assert rows[0][2] == 5
    # words/sentence = 2.0 → 2_000_000 ppm; syllables/word = 1.25
    assert rows[0][3] == 2_000_000
    assert rows[0][4] == 1_250_000
    # empty doc: zeros everywhere, ratios coalesce to 0
    assert rows[1] == (0, 0, 0, 0, 0)


def test_corpus_diff_statuses(spark):
    from siridb_server_spark.localdf import arrow_df
    old = arrow_df(spark, [(1, "a"), (2, "b"), (3, None), (4, "d")],
                   "doc_id long, text string")
    new = arrow_df(spark, [(1, "a"), (2, "B2"), (3, None), (5, "e")],
                   "doc_id long, text string")
    got = {r["doc_id"]: r["status"] for r in
           CU.corpus_diff(old, new).collect()}
    assert got == {1: "same", 2: "changed", 3: "same",
                   4: "removed", 5: "added"}
    # NULL text is its OWN content class, distinct from empty
    old2 = arrow_df(spark, [(1, None)], "doc_id long, text string")
    new2 = arrow_df(spark, [(1, "")], "doc_id long, text string")
    assert CU.corpus_diff(old2, new2).first()["status"] == "changed"
    summ = {r["status"]: r["n_docs"] for r in
            CU.corpus_diff_summary(old, new).collect()}
    assert summ == {"same": 2, "changed": 1, "removed": 1,
                    "added": 1}


def test_leakage_safe_split_cluster_consistent(spark):
    from siridb_server_spark.localdf import arrow_df
    docs = arrow_df(spark, [(i, f"doc {i}", "s") for i in range(40)],
                    "doc_id long, text string, source string")
    # clusters: {0,1,2}, {10,11}, rest singletons
    pairs = arrow_df(spark, [(0, 1), (1, 2), (10, 11)],
                     "id_a long, id_b long")
    rows = CU.leakage_safe_split(docs, pairs,
                                 eval_ppm=300_000).collect()
    split = {r["doc_id"]: r["split"] for r in rows}
    keep = {r["doc_id"]: r["keep_id"] for r in rows}
    # every cluster member shares the representative's side
    assert split[0] == split[1] == split[2]
    assert split[10] == split[11]
    assert keep[1] == 0 and keep[11] == 10
    # the draw actually splits (both sides populated at 30% ppm)
    sides = set(split.values())
    assert sides == {"train", "eval"}
    # deterministic across partitionings
    rows2 = CU.leakage_safe_split(docs.repartition(7), pairs,
                                  eval_ppm=300_000).collect()
    assert {(r["doc_id"], r["split"]) for r in rows2} \
        == {(r["doc_id"], r["split"]) for r in rows}


# ----------------------------------------------- scalar quantization

def _sq_emb(spark, n=60, dim=8):
    # deterministic spread of magnitudes incl. negatives and a
    # zero vector
    rows = []
    for i in range(n):
        v = [(((i * 31 + j * 17) % 41) - 20) / 25.0
             for j in range(dim)]
        rows.append((i, v))
    rows.append((n, [0.0] * dim))
    from siridb_server_spark.localdf import arrow_df
    return arrow_df(spark, rows, "vec_id long, embedding array<double>")


def test_sq_codes_bounded_and_dequant_error(spark):
    emb = _sq_emb(spark)
    scale = SIM.sq_scale(emb)
    assert scale == 0.8  # max |(..%41)-20|/25 = 20/25
    rows = (SIM.scalar_quantize(emb, scale)
            .join(emb, "vec_id").collect())
    for r in rows:
        assert len(r["qvec"]) == len(r["embedding"])
        for q, x in zip(r["qvec"], r["embedding"]):
            assert -127 <= q <= 127
            # dequantized error within half a step
            assert abs(q * scale / 127 - x) <= scale / 127 / 2 + 1e-12


def test_sq_query_clamps_out_of_range(spark):
    assert SIM.quantize_query([10.0, -10.0, 0.0], scale=1.0) == \
        [127, -127, 0]


def test_sq_topk_matches_exact_on_separated_data(spark):
    emb = _sq_emb(spark)
    q = [0.5, 0.4, -0.3, 0.2, 0.1, -0.4, 0.3, -0.2]
    exact = [r["vec_id"] for r in
             SIM.brute_force_topk(emb, q, k=5).collect()]
    sq = [r["vec_id"] for r in SIM.sq_topk(emb, q, k=5).collect()]
    # rescore stage uses full precision, so the top-5 SET matches
    # whenever the coarse top-20 contains it; order equal too since
    # rescoring is the same operator
    assert sq == exact


def test_sq_coarse_scores_are_exact_integers(spark):
    from siridb_server_spark.localdf import arrow_df
    qdf = arrow_df(spark, [(1, [127, -127, 3]), (2, [0, 0, 0])],
                   "vec_id long, qvec array<int>")
    got = {r["vec_id"]: r["iscore"] for r in
           SIM.sq_coarse_scores(qdf, [127, 127, 127]).collect()}
    assert got == {1: 127 * 127 - 127 * 127 + 3 * 127, 2: 0}


# ------------------------------------------------- feature hashing

def test_hash_embed_signed_counts_and_bounds(spark):
    from siridb_server_spark.localdf import arrow_df
    df = arrow_df(spark, [(1, "cat cat dog"), (2, "cat"),
                          (3, None), (4, "  ")],
                  "doc_id long, text string")
    rows = TX.hash_embed(df).collect()
    assert all(0 <= r["i"] < 64 for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["i"]] = r["v"]
    assert set(by_doc) == {1, 2}          # empty/null docs drop
    # same word, same bucket/sign everywhere: doc1's cat component
    # is exactly twice doc2's (±1 if dog happens to share the bucket)
    (cat_i, cat_v), = by_doc[2].items()
    assert abs(cat_v) == 1
    assert by_doc[1][cat_i] in (2 * cat_v - 1, 2 * cat_v,
                                2 * cat_v + 1)


def test_hash_embed_neighbors_ranks_shared_vocab(spark):
    from siridb_server_spark.localdf import arrow_df
    df = arrow_df(spark, [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),   # identical → max dot
        (2, "alpha beta"),               # half overlap
        (3, "zeta eta theta iota"),      # disjoint
    ], "doc_id long, text string")
    got = TX.hash_embed_neighbors(df, query_id=0, k=3).collect()
    assert [r["doc_id"] for r in got][:2] == [1, 2]
    dots = {r["doc_id"]: r["dot"] for r in got}
    # bucket collisions can inflate the self-similarity (that's the
    # hashing trick's bias), but ranking must hold: identical doc
    # beats half-overlap beats disjoint
    assert dots[1] > dots[2] > 0
    assert dots.get(3, 0) < dots[2]
    assert 0 not in dots                  # query excluded


def test_hash_embed_tfidf_weights_rare_terms(spark):
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators.classify import FIXLOG_B
    # "common" in every doc → idf_fix = fixlog2(3) - fixlog2(3) = 0,
    # so it contributes NOTHING; "rare" (df=1) carries weight
    # fixlog2(3) - fixlog2(1) = fixlog2(3)
    df = arrow_df(spark, [
        (1, "common rare"),
        (2, "common"),
        (3, "common common"),
    ], "doc_id long, text string")
    rows = TX.hash_embed_tfidf(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["i"]] = r["v"]
    fix3 = (3 .bit_length() - 1) * (1 << FIXLOG_B) + \
        ((3 << FIXLOG_B) // 2) - (1 << FIXLOG_B)
    # docs 2 and 3: only the zero-idf common term → all-zero vectors
    assert all(v == 0 for v in by_doc.get(2, {}).values())
    assert all(v == 0 for v in by_doc.get(3, {}).values())
    nz = [v for v in by_doc[1].values() if v != 0]
    assert len(nz) == 1 and abs(nz[0]) == fix3


def test_ivf_sq_topk_matches_ivf_on_probed_cells(spark):
    # with the same probed cells, the int8 coarse + rescore path
    # must recover the float IVF result (rescore is full precision)
    from siridb_server_spark.sources.testdata import load
    emb = load(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id <> 0")
    q = [float(x) for x in
         load(spark, "/root/testdata/sf0.001", "embeddings")
         .where("vec_id = 0").first()["embedding"]]
    sq = [(r["vec_id"], r["cos"]) for r in
          SIM.ivf_sq_topk(emb, q, k=5, nprobe=3).collect()]
    flt = [(r["vec_id"], r["cos"]) for r in
           SIM.ivf_topk(emb, q, k=5, nprobe=3).collect()]
    assert sq == flt


def test_sq_index_matches_per_call_path_and_prunes(spark, tmp_path):
    """SQIndex.search == ivf_sq_topk with the same pinned scale and
    centroids (index serving and the per-call path share the coarse
    + rescore body); save/load lays cells out partitionBy(cell) and
    a search on the loaded index shows PartitionFilters — probing
    IS directory pruning at scale."""
    import re

    from siridb_server_spark.sources.testdata import load
    emb = load(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id <> 0")
    q = [float(x) for x in
         load(spark, "/root/testdata/sf0.001", "embeddings")
         .where("vec_id = 0").first()["embedding"]]
    idx = SIM.SQIndex.from_labels(emb)
    try:
        got = [(r["vec_id"], r["cos"]) for r in
               idx.search(q, k=5, nprobe=3).collect()]
        fresh = [(r["vec_id"], r["cos"]) for r in
                 SIM.ivf_sq_topk(emb, q, k=5, nprobe=3,
                                 scale=idx.scale,
                                 centroids=idx.centroids).collect()]
        assert got == fresh
        idx.save(str(tmp_path / "sq"))
    finally:
        idx.unpersist()
    idx2 = SIM.SQIndex.load(spark, str(tmp_path / "sq"))
    assert idx2.scale == idx.scale
    got_df = idx2.search(q, k=5, nprobe=3)
    assert [(r["vec_id"], r["cos"]) for r in got_df.collect()] \
        == got
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^]]*cell", plan), plan


def test_sq_index_append_equals_rebuilt_in_memory(spark, tmp_path):
    """Appending a delta to a saved SQIndex (pinned scale, frozen
    quantizer, nearest-centroid assignment) round-trips through
    parquet to exactly the index you'd get constructing the same
    union in memory — and the appended rows are searchable."""
    from siridb_server_spark.sources.testdata import load
    emb = load(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id <> 0")
    base = emb.where("vec_id % 7 <> 1")
    delta = emb.where("vec_id % 7 = 1")
    q = [float(x) for x in
         load(spark, "/root/testdata/sf0.001", "embeddings")
         .where("vec_id = 0").first()["embedding"]]
    idx = SIM.SQIndex.from_labels(base)
    idx.save(str(tmp_path / "sq"))
    scale, cents = idx.scale, idx.centroids
    idx.unpersist()
    n = SIM.sq_index_append(spark, str(tmp_path / "sq"), delta)
    assert n == delta.count() > 0
    loaded = SIM.SQIndex.load(spark, str(tmp_path / "sq"))
    assert loaded.cells.count() == base.count() + n
    got = [(r["vec_id"], r["cos"]) for r in
           loaded.search(q, k=10, nprobe=3).collect()]

    # in-memory reference: same pinned scale/centroids, same
    # assignment rule, no persistence
    cent_rows = [(int(c), [float(x) for x in v]) for c, v in cents]
    from siridb_server_spark.localdf import arrow_df
    cent = arrow_df(spark, cent_rows,
                    "_cell long, _centroid array<double>")
    d = SIM.dot(F.col("embedding"), F.col("_centroid"))
    na = SIM.dot(F.col("embedding"), F.col("embedding"))
    nb = SIM.dot(F.col("_centroid"), F.col("_centroid"))
    ccos = F.when((na == 0) | (nb == 0), F.lit(0.0)) \
        .otherwise(d / (F.sqrt(na) * F.sqrt(nb)))
    from pyspark.sql import Window
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("_cc"), F.asc("_cell"))
    dcells = (delta.select("vec_id", "embedding")
              .crossJoin(F.broadcast(cent))
              .withColumn("_cc", ccos)
              .withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1)
              .select("vec_id", "embedding",
                      F.col("_cell").alias("label")))
    union = base.select("vec_id", "embedding", "label") \
        .unionByName(dcells)
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.greatest(
            F.lit(-SIM.SQ_LIM),
            F.least(F.lit(SIM.SQ_LIM), SIM._sq_code(x, scale))))
    cells_ref = union.select(
        "vec_id", "embedding", qv.alias("qvec"),
        F.col("label").cast("long").alias("_cell"))
    ref = SIM.SQIndex(cents, scale, cells_ref)
    want = [(r["vec_id"], r["cos"]) for r in
            ref.search(q, k=10, nprobe=3).collect()]
    assert got == want


def test_pq_index_lifecycle_append_drift_rebuild(spark, tmp_path):
    """PQIndex lifecycle parity with SQIndex (r10 verdict #6):
    append encodes with the FROZEN codebooks into idempotent
    batch-stamped deltas that load() folds; the streaming ingest
    sink produces the identical index; compaction folds the delta
    dirs; drift reports per-(sub, code) usage plus delta
    quantization error; rebuild rotates to a new snapshot from the
    source vectors (codes are lossy — the index can't retrain
    itself)."""
    import os

    import siridb_server_spark.streaming.corpus as SC
    from siridb_server_spark.sources.testdata import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id <> 0")
    base = emb.where("vec_id % 7 <> 1")
    delta = emb.where("vec_id % 7 = 1")
    q = [float(x) for x in
         load(spark, "/root/testdata/sf0.001", "embeddings")
         .where("vec_id = 0").first()["embedding"]]
    p = str(tmp_path / "pq")
    idx = SIM.PQIndex.train(base, m=4, k=8, iters=2)
    idx.save(p)
    books, dsub = idx.codebooks, idx.dsub
    idx.unpersist()

    # batch append: idempotent, folded by load
    n = SIM.pq_index_append(spark, p, delta)
    assert n == delta.count() > 0
    assert SIM.pq_index_append(spark, p, delta) == n  # marker no-op
    loaded = SIM.PQIndex.load(spark, p)
    assert loaded.codes.count() == base.count() + n
    got = [(r["vec_id"], r["adc"]) for r in
           loaded.search(q, k=10).collect()]
    # reference: union encoded in memory with the SAME frozen books
    ref_codes = emb.select(
        "vec_id", SIM._pq_encode(books, dsub, "embedding")
        .alias("code"))
    want = [(r["vec_id"], r["adc"]) for r in
            SIM.PQIndex(books, ref_codes, dsub).search(q, k=10)
            .collect()]
    assert got == want

    # streaming ingest sink builds the identical delta
    p2 = str(tmp_path / "pq2")
    idx2 = SIM.PQIndex.train(base, m=4, k=8, iters=2)
    idx2.save(p2)
    idx2.unpersist()
    sink = SC.make_pq_index_ingest_sink(p2)
    sink(delta, 0)
    sink(delta, 0)  # redelivery no-op
    got2 = [(r["vec_id"], r["adc"]) for r in
            SIM.PQIndex.load(spark, p2).search(q, k=10).collect()]
    assert got2 == want
    # compaction folds deltas; dir count returns to one
    SIM.pq_index_append(spark, p2, delta.limit(3), batch_id="x2")
    assert SC.compact_pq_index(spark, p2) == {"codes_delta": 2}
    ddirs = os.listdir(os.path.join(p2, "codes_delta"))
    assert ddirs == ["batch=-1"]

    # drift report invariants
    rep = SIM.pq_index_drift(spark, p, delta).collect()
    assert len(rep) == 4 * 8
    m_base = sum(r["n_base"] for r in rep)
    m_new = sum(r["n_new"] for r in rep)
    assert m_base == (base.count() + n) * 4  # folded delta counts
    assert m_new == delta.count() * 4
    for sub in range(4):
        ppm = sum(r["new_share_ppm"] for r in rep
                  if r["sub"] == sub)
        assert 0 < ppm <= 1_000_000
    assert all(r["mean_qerr_new"] >= 0 for r in rep
               if r["n_new"] > 0)
    assert all(r["mean_qerr_new"] is None for r in rep
               if r["n_new"] == 0)

    # rebuild: new snapshot from source vectors, old untouched
    p3 = str(tmp_path / "pq3")
    new = SIM.pq_index_rebuild(spark, p, p3, emb)
    new.unpersist()
    reb = SIM.PQIndex.load(spark, p3)
    assert reb.codes.count() == emb.count()
    assert len(reb.codebooks) == 4
    assert len(reb.search(q, k=10).collect()) == 10
    assert SIM.PQIndex.load(spark, p).codes.count() \
        == base.count() + n


def test_index_append_fingerprint_counts_duplicates(spark,
                                                    tmp_path):
    """The content-fingerprint batch id must be DUPLICATE-SENSITIVE
    over what actually lands: an xor fold canceled a repeated id
    pairwise, so batch {a, b, b} fingerprinted identically to {a}
    and was silently skipped against {a}'s done marker (review
    finding, r11). Ids are the index key — duplicate-id rows
    collapse to ONE indexed row (documented) — so {a, b, b} lands
    as {a, b}, is fingerprinted as such, and must never be
    confused with {a} or with the empty batch."""
    import os

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.sources.testdata import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id <> 0")
    base = emb.where("vec_id % 7 <> 1")
    p = str(tmp_path / "sq")
    idx = SIM.SQIndex.from_labels(base)
    idx.save(p)
    idx.unpersist()

    a = emb.where("vec_id = 8").select("vec_id", "embedding")
    b = emb.where("vec_id = 15").select("vec_id", "embedding")
    abb = a.unionByName(b).unionByName(b)  # duplicate id 15
    n0 = SIM.sq_index_append(spark, p, a)
    assert n0 == 1
    n1 = SIM.sq_index_append(spark, p, abb)
    assert n1 == 2  # {a,b,b} -> {a,b}: indexed, NOT skipped
    loaded = SIM.SQIndex.load(spark, p)
    assert loaded.cells.count() == base.count() + 3
    # id 15 indexed exactly once despite appearing twice
    assert loaded.cells.where("vec_id = 15").count() == 1
    # empty batch: no write, distinct marker, returns 0
    empty = arrow_df(spark, [],
                     "vec_id long, embedding array<double>")
    assert SIM.sq_index_append(spark, p, empty) == 0
    assert SIM.SQIndex.load(spark, p).cells.count() \
        == base.count() + 3
    # the fingerprints of {a}, {a,b,b} and {} are pairwise distinct
    markers = [m for m in os.listdir(p)
               if m.startswith("_batch-")]
    assert len(markers) == 3


def test_index_ingest_sink_empty_batch_is_safe(spark, tmp_path):
    """A 0-row micro-batch through the index ingest sinks must not
    break the index: the unguarded write used to leave a file-less
    batch dir that failed delta schema inference on load (review
    finding, r11 — the sinks now delegate to the append
    functions)."""
    import siridb_server_spark.streaming.corpus as SC
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.sources.testdata import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id <> 0")
    base = emb.where("vec_id % 7 <> 1")
    delta = emb.where("vec_id % 7 = 1")
    empty = arrow_df(spark, [],
                     "vec_id long, embedding array<double>")
    q = [float(x) for x in
         load(spark, "/root/testdata/sf0.001", "embeddings")
         .where("vec_id = 0").first()["embedding"]]

    psq = str(tmp_path / "sq")
    sqi = SIM.SQIndex.from_labels(base)
    sqi.save(psq)
    sqi.unpersist()
    sink = SC.make_sq_index_ingest_sink(psq)
    sink(empty, 0)          # must not poison the delta dir
    sink(delta, 1)
    sink(delta, 1)          # redelivery no-op
    loaded = SIM.SQIndex.load(spark, psq)
    assert loaded.cells.count() == base.count() + delta.count()
    assert len(loaded.search(q, k=5).collect()) == 5

    ppq = str(tmp_path / "pq")
    pqi = SIM.PQIndex.train(base, m=4, k=8, iters=2)
    pqi.save(ppq)
    pqi.unpersist()
    psink = SC.make_pq_index_ingest_sink(ppq)
    psink(empty, 0)
    psink(delta, 1)
    psink(delta, 1)
    pl = SIM.PQIndex.load(spark, ppq)
    assert pl.codes.count() == base.count() + delta.count()
    assert len(pl.search(q, k=5).collect()) == 5


def test_sq_index_append_idempotent_retry(spark, tmp_path):
    """Exactly-once by idempotence: re-running the same append (a
    blind retry of the same delta — same content fingerprint) is a
    no-op via the done marker; a retry after a TORN write (partial
    batch dir, no marker) overwrites the whole batch dir and
    converges to exactly one copy of the batch; an explicit
    batch_id short-circuits before any Spark work."""
    import os
    import shutil

    from siridb_server_spark.sources.testdata import load
    emb = load(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id <> 0")
    base = emb.where("vec_id % 7 <> 1")
    delta = emb.where("vec_id % 7 = 1")
    p = str(tmp_path / "sq")
    idx = SIM.SQIndex.from_labels(base)
    idx.save(p)
    idx.unpersist()

    n = SIM.sq_index_append(spark, p, delta)
    want_n = base.count() + n
    assert SIM.SQIndex.load(spark, p).cells.count() == want_n

    # blind retry, same content -> marker no-op, same count back,
    # nothing double-indexed
    assert SIM.sq_index_append(spark, p, delta) == n
    assert SIM.SQIndex.load(spark, p).cells.count() == want_n

    # torn write: keep the partial batch dir (drop half its cell
    # subdirs) and remove the marker -> the retry must overwrite
    ddir = os.path.join(p, "cells_delta")
    bdir = [d for d in os.listdir(ddir) if d.startswith("batch=")]
    assert len(bdir) == 1
    cells = [c for c in os.listdir(os.path.join(ddir, bdir[0]))
             if c.startswith("cell=")]
    for c in cells[: max(1, len(cells) // 2)]:
        shutil.rmtree(os.path.join(ddir, bdir[0], c))
    for m in os.listdir(p):
        if m.startswith("_batch-") and m.endswith(".done"):
            os.remove(os.path.join(p, m))
    assert SIM.SQIndex.load(spark, p).cells.count() < want_n
    assert SIM.sq_index_append(spark, p, delta) == n
    assert SIM.SQIndex.load(spark, p).cells.count() == want_n

    # explicit batch_id with an existing marker: returns the
    # recorded count without touching the delta frame
    marker = os.path.join(p, "_batch-b7.done")
    with open(marker, "w") as fh:
        fh.write("123\n")
    assert SIM.sq_index_append(spark, p, delta,
                               batch_id="b7") == 123


def test_batch_marker_publish_is_atomic(tmp_path):
    """Done markers publish by temp + os.replace: after a write the
    marker holds a valid count, no temp sibling remains, and an
    interrupted write (temp exists, no rename) leaves NO marker at
    all — exists-means-complete, so a retry re-runs the batch
    instead of short-circuiting to a torn 0 (r11 ADVICE item)."""
    import os

    from siridb_server_spark.operators.similarity import (
        _read_batch_marker, _write_batch_marker)

    marker = str(tmp_path / "_batch-a3-abc.done")
    _write_batch_marker(marker, 42)
    assert _read_batch_marker(marker) == 42
    assert [f for f in os.listdir(tmp_path)
            if ".tmp-" in f] == []
    # overwrite (a retry that re-recorded the same batch) is fine
    _write_batch_marker(marker, 42)
    assert _read_batch_marker(marker) == 42
    # a crash BETWEEN temp-write and rename: only the temp exists,
    # so the exists-check a retry performs sees no marker
    orphan = str(tmp_path / "_batch-b9.done")
    with open(orphan + ".tmp-999", "w") as fh:
        fh.write("7\n")
    assert not os.path.exists(orphan)


def test_ivf_knn_join_full_probe_equals_exact(spark):
    """With nprobe = |cells| the IVF join probes everything, so it
    must equal the exact knn_join on (qid, vec_id, cos, rank); with
    nprobe=1 every result still carries the exact cosine for its
    id (candidates are a subset, scores are never approximated)."""
    from siridb_server_spark.sources.testdata import load
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where("vec_id < 3") \
        .select(F.col("vec_id").alias("qid"), "embedding")
    corpus = emb.where("vec_id >= 3")
    ncells = corpus.select("label").distinct().count()
    exact = sorted(tuple(r) for r in
                   SIM.knn_join(corpus, queries, k=5).collect())
    full = sorted(tuple(r) for r in
                  SIM.ivf_knn_join(corpus, queries, k=5,
                                   nprobe=ncells).collect())
    assert full == exact
    one = SIM.ivf_knn_join(corpus, queries, k=5, nprobe=1)
    cos_by_id = {(r[0], r[1]): r[2] for r in exact}
    exact_all = {
        (r["qid"], r["vec_id"]): r["cos"]
        for r in SIM.knn_join(corpus, queries,
                              k=corpus.count()).collect()}
    for r in one.collect():
        assert r["cos"] == exact_all[(r["qid"], r["vec_id"])]


def test_ivf_family_excludes_null_labels(spark, tmp_path):
    """NULL-label corpus rows are EXCLUDED, not a crash: every IVF
    entry point that materializes the centroid list (batch joins,
    from_labels → save) must filter them before int(cell) — and the
    surviving results equal the same call on the pre-filtered
    corpus."""
    from siridb_server_spark.sources.testdata import load
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.where("vec_id >= 3").withColumn(
        "label", F.when(F.col("vec_id") % 5 == 0,
                        F.lit(None)).otherwise(F.col("label")))
    clean = corpus.where(F.col("label").isNotNull())
    queries = emb.where("vec_id < 3") \
        .select(F.col("vec_id").alias("qid"), "embedding")

    for fn in (SIM.ivf_knn_join, SIM.ivf_sq_knn_join):
        got = sorted(tuple(r) for r in
                     fn(corpus, queries, k=5, nprobe=2).collect())
        want = sorted(tuple(r) for r in
                      fn(clean, queries, k=5, nprobe=2).collect())
        assert got == want and got

    q = [float(x) for x in emb.where("vec_id = 0")
         .first()["embedding"]]
    idx = SIM.SQIndex.from_labels(corpus)
    try:
        idx.save(str(tmp_path / "nullsq"))  # int(cell) path
        got = [r["vec_id"] for r in idx.search(q, k=5).collect()]
    finally:
        idx.unpersist()
    ref = SIM.SQIndex.from_labels(clean)
    try:
        want = [r["vec_id"] for r in ref.search(q, k=5).collect()]
    finally:
        ref.unpersist()
    assert got == want
    # single-query ivf paths share the exclusion posture
    assert SIM.ivf_topk(corpus, q, k=5, nprobe=2).collect() \
        == SIM.ivf_topk(clean, q, k=5, nprobe=2).collect()


def test_centroid_tie_break_prefers_smaller_cell_id(spark):
    """Exact-cosine centroid ties resolve to the SMALLER cell id in
    the driver-side ranking — the _rank_cells rule — so probe
    selection cannot depend on the collect()/load order of the
    centroid list. Two cells share an identical centroid but hold
    DIFFERENT members; with nprobe=1 the search must probe the
    smaller cell id regardless of how the centroid list is ordered
    when the index object is constructed."""
    from siridb_server_spark.localdf import arrow_df
    # cells 3 and 7: identical single-member centroid direction
    # ([1,0] scaled), different member ids; query = [1,0] ties them
    rows = [(10, [1.0, 0.0], 3), (20, [2.0, 0.0], 7),
            (30, [0.0, 1.0], 9)]
    emb = arrow_df(spark, rows,
                   "vec_id long, embedding array<double>,"
                   " label long")
    q = [1.0, 0.0]
    want = None
    for order in (False, True):
        idx = SIM.SQIndex.from_labels(emb)
        try:
            cents = sorted(idx.centroids, reverse=order,
                           key=lambda cv: cv[0])
            shuffled = SIM.SQIndex(cents, idx.scale, idx.cells,
                                   idx.vec_col, idx.id_col)
            got = [r["vec_id"] for r in
                   shuffled.search(q, k=5, nprobe=1).collect()]
            # cosine(q, centroid) == 1.0 for BOTH cell 3 and 7:
            # the smaller cell id (3, member 10) must win
            assert got == [10], got
            want = want or got
            assert got == want
            # IVFIndex shares the rule
            ivf = SIM.IVFIndex(cents, idx.cells.select(
                "vec_id", "embedding", "_cell"))
            got2 = [r["vec_id"] for r in
                    ivf.search(q, k=5, nprobe=1).collect()]
            assert got2 == [10], got2
        finally:
            idx.unpersist()


def test_embedding_contamination_verdicts(spark):
    """Cross-snapshot embedding contamination: an exact planted
    copy of a train vector flags contaminated at cos 1.0 (micro
    1000000) against its own source; an orthogonal eval stays
    clean; with nprobe = |cells| the probe set is exhaustive so
    the verdicts are exact, and the threshold compares micro ints
    (no float boundary ambiguity)."""
    from siridb_server_spark.localdf import arrow_df

    train = arrow_df(
        spark,
        [(1, [1.0, 0.0, 0.0], 0), (2, [0.9, 0.1, 0.0], 0),
         (3, [0.0, 1.0, 0.0], 1), (4, [0.1, 0.9, 0.0], 1)],
        "vec_id long, embedding array<double>, label long")
    evals = arrow_df(
        spark,
        [(100, [0.9, 0.1, 0.0]),   # exact copy of train id 2
         (200, [0.0, 0.0, 1.0])],  # orthogonal to everything
        "qid long, embedding array<double>")
    out = {r["qid"]: r for r in
           SIM.embedding_contamination(train, evals,
                                       threshold=0.9, nprobe=2)
           .collect()}
    assert out[100]["contaminated"] is True
    assert out[100]["train_id"] == 2
    assert out[100]["cos_micro"] == 1000000
    assert out[200]["contaminated"] is False
    assert out[200]["cos_micro"] == 0

    # non-default qid_col: ivf_knn_join's output columns are the
    # FIXED names (qid, ...), so the operator must alias back —
    # same verdicts, caller-named id column (r11 ADVICE item)
    out2 = SIM.embedding_contamination(
        train, evals.withColumnRenamed("qid", "query_id"),
        threshold=0.9, nprobe=2, qid_col="query_id")
    assert "query_id" in out2.columns and "qid" not in out2.columns
    got2 = {r["query_id"]: r["contaminated"]
            for r in out2.collect()}
    assert got2 == {100: True, 200: False}


def test_ivf_sq_knn_join_recovers_float_and_index_path_agrees(
        spark, tmp_path):
    """The batch int8 path: with the same per-query probes, the
    coarse-cut + full-precision rescore recovers the float
    ivf_knn_join result; and SQIndex.knn_join served from saved
    cells equals the per-call path with the index's pinned
    scale/centroids (shared body + persistence round-trip)."""
    from siridb_server_spark.sources.testdata import load
    emb = load(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where("vec_id < 3") \
        .select(F.col("vec_id").alias("qid"), "embedding")
    corpus = emb.where("vec_id >= 3")
    flt = sorted(tuple(r) for r in SIM.ivf_knn_join(
        corpus, queries, k=5, nprobe=2).collect())
    sq = sorted(tuple(r) for r in SIM.ivf_sq_knn_join(
        corpus, queries, k=5, nprobe=2, rerank=4).collect())
    assert sq == flt

    idx = SIM.SQIndex.from_labels(corpus)
    try:
        idx.save(str(tmp_path / "sq"))
        pinned = sorted(tuple(r) for r in SIM.ivf_sq_knn_join(
            corpus, queries, k=5, nprobe=2, rerank=4,
            scale=idx.scale, centroids=idx.centroids).collect())
    finally:
        idx.unpersist()
    served = sorted(tuple(r) for r in
                    SIM.SQIndex.load(spark, str(tmp_path / "sq"))
                    .knn_join(queries, k=5, nprobe=2, rerank=4)
                    .collect())
    assert served == pinned


def test_sq_index_drift_report_semantics(spark, tmp_path):
    """Drift report: counts follow the frozen assignment rule
    exactly; in-distribution deltas keep mean_cos_new near
    mean_cos_base while a shifted delta drops it — the retrain
    signal."""
    from siridb_server_spark.localdf import arrow_df
    base_rows = []
    for i in range(20):
        base_rows.append((i, [1.0, 0.05 * (i % 3), 0.0], 0))
        base_rows.append((100 + i, [0.0, 1.0, 0.05 * (i % 3)], 1))
    base = arrow_df(
        spark, base_rows,
        "vec_id long, embedding array<float>, label int")
    idx = SIM.SQIndex.from_labels(base)
    idx.save(str(tmp_path / "sq"))
    idx.unpersist()

    # in-distribution delta: 4 rows near cell 0, 2 near cell 1
    good = arrow_df(spark, [
        (1000, [1.0, 0.02, 0.0]), (1001, [0.98, 0.05, 0.0]),
        (1002, [1.0, 0.07, 0.01]), (1003, [0.9, 0.03, 0.0]),
        (1004, [0.0, 1.0, 0.03]), (1005, [0.01, 0.97, 0.06]),
    ], "vec_id long, embedding array<float>")
    rep = {r["cell"]: r for r in SIM.sq_index_drift(
        spark, str(tmp_path / "sq"), good).collect()}
    assert rep[0]["n_base"] == 20 and rep[1]["n_base"] == 20
    assert rep[0]["n_new"] == 4 and rep[1]["n_new"] == 2
    assert rep[0]["new_share_ppm"] == 666666
    assert rep[1]["new_share_ppm"] == 333333
    for c in (0, 1):
        assert rep[c]["mean_cos_new"] > 0.95
        assert abs(rep[c]["mean_cos_new"]
                   - rep[c]["mean_cos_base"]) < 0.05

    # shifted delta: a new mode between the cells -> assigned
    # somewhere, but far from every frozen centroid
    bad = arrow_df(spark, [
        (2000 + i, [0.7, 0.7, 0.7]) for i in range(5)
    ], "vec_id long, embedding array<float>")
    rep2 = {r["cell"]: r for r in SIM.sq_index_drift(
        spark, str(tmp_path / "sq"), bad).collect()}
    hot = max(rep2.values(), key=lambda r: r["n_new"])
    assert hot["n_new"] == 5
    assert hot["mean_cos_new"] < hot["mean_cos_base"] - 0.2


def test_sq_index_rebuild_preserves_rows_and_serves(
        spark, tmp_path):
    """Rebuild = fresh quantizer + fresh scale over base + deltas,
    saved as a NEW snapshot: every (id, vector) survives, cell
    count matches the request, and the rebuilt index serves
    searches (query present, k rows)."""
    from siridb_server_spark.sources.testdata import load
    emb = load(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id <> 0")
    base = emb.where("vec_id % 5 <> 1")
    delta = emb.where("vec_id % 5 = 1")
    q = [float(x) for x in
         load(spark, "/root/testdata/sf0.001", "embeddings")
         .where("vec_id = 0").first()["embedding"]]
    p0, p1 = str(tmp_path / "old"), str(tmp_path / "new")
    idx = SIM.SQIndex.from_labels(base)
    idx.save(p0)
    idx.unpersist()
    SIM.sq_index_append(spark, p0, delta)

    new = SIM.sq_index_rebuild(spark, p0, p1, k=4, iters=3)
    try:
        assert len(new.centroids) == 4
    finally:
        new.unpersist()
    old_ids = {(r["vec_id"], tuple(r["embedding"])) for r in
               SIM.SQIndex.load(spark, p0).cells
               .select("vec_id", "embedding").collect()}
    new_loaded = SIM.SQIndex.load(spark, p1)
    new_ids = {(r["vec_id"], tuple(r["embedding"])) for r in
               new_loaded.cells
               .select("vec_id", "embedding").collect()}
    assert new_ids == old_ids
    # fresh scale pinned from the full indexed set, searches serve
    res = new_loaded.search(q, k=10, nprobe=4).collect()
    assert len(res) == 10


def test_quality_percentile_rank_semantics(spark):
    from siridb_server_spark.localdf import arrow_df
    # src a: three docs with clearly ordered quality (stopword-rich
    # long text ranks above punctuation junk); src b: one doc
    df = arrow_df(spark, [
        (1, "a", "the cat and the dog went to the park and it is"
         " a very fine day for all of the animals to play"),
        (2, "a", "!!! ??? ### $$$ %%% ^^^ &&&"),
        (3, "a", "the quick fox and the hen"),
        (4, "b", "only doc here"),
        (5, "b", None),
    ], "doc_id long, source string, text string")
    rows = {r["doc_id"]: r for r in
            TX.quality_percentile(df).collect()}
    assert 5 not in rows                       # NULL text excluded
    a = [rows[i] for i in (1, 2, 3)]
    assert all(r["n"] == 3 for r in a)
    # the logit is stopword-DENSITY driven: the short stopword-dense
    # doc 3 outranks the long doc 1; punctuation junk ranks last
    assert rows[3]["rank"] == 1 and rows[3]["pct_ppm"] == 0
    assert rows[1]["rank"] == 2 and rows[1]["pct_ppm"] == 500000
    assert rows[2]["rank"] == 3 and rows[2]["pct_ppm"] == 1000000
    # singleton group: rank 1 of 1, pct 0 (div by max(n-1,1))
    assert (rows[4]["rank"], rows[4]["n"], rows[4]["pct_ppm"]) == \
        (1, 1, 0)


def test_skew_report_counts_shares_and_nulls(spark):
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import curation as CU
    df = arrow_df(spark, [("hot",)] * 6 + [("warm",)] * 3 +
                  [(None,)], "k string")
    rows = CU.skew_report(df, "k", k=2).collect()
    assert [(r["key"], r["n"], r["total"], r["share_ppm"])
            for r in rows] == [("hot", 6, 10, 600000),
                               ("warm", 3, 10, 300000)]
    all_rows = CU.skew_report(df, "k", k=10).collect()
    assert any(r["key"] is None and r["n"] == 1 for r in all_rows)


def test_compact_dedup_index_preserves_probes(spark, tmp_path):
    """Folding the per-batch index deltas into one base partition
    must not change any probe result, and re-compacting after a
    simulated crash (a consumed delta left behind) self-heals via
    the distinct."""
    import os
    import shutil

    from siridb_server_spark.localdf import arrow_df

    idx = str(tmp_path / "idx")
    batches = [
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different content about spark engines")],
        [(3, "the quick brown fox jumps over the lazy dog today"),
         (4, "another unrelated document body entirely here")],
    ]
    for bid, rows in enumerate(batches):
        D.build_dedup_index(
            arrow_df(spark, rows, "doc_id long, text string"),
            idx, subdir=f"batch={bid}")
    probe = arrow_df(
        spark, [(9, "the quick brown fox jumps over the lazy dog"
                 " today")], "doc_id long, text string")
    before = sorted(map(tuple, D.dedup_incremental(probe, idx)
                        .collect()))
    folded = D.compact_dedup_index(spark, idx)
    assert folded == {"exact": 2, "bands": 2}
    assert os.listdir(os.path.join(idx, "exact")) == ["batch=-1"]
    after = sorted(map(tuple, D.dedup_incremental(probe, idx)
                       .collect()))
    assert after == before and before  # non-empty: doc 1/3 match
    # crash simulation: stale consumed delta beside the base
    shutil.copytree(os.path.join(idx, "exact", "batch=-1"),
                    os.path.join(idx, "exact", "batch=5"))
    D.compact_dedup_index(spark, idx)
    healed = sorted(map(tuple, D.dedup_incremental(probe, idx)
                        .collect()))
    assert healed == before


def test_compact_committer_path_crash_refold(spark, tmp_path):
    """The object-store compaction protocol (fs='committer'): the
    fold publishes the new base DIRECTLY to batch=-<n> through the
    Spark committer — no directory rename anywhere — and the
    crash-refold guarantees still hold: (a) probe results are
    identical to the posix fold, (b) a crash that leaves a PARTIAL
    new base beside intact deltas self-heals on the next fold
    (idempotent merge, descending negative ids), (c) a stale
    consumed delta re-folds harmlessly."""
    import os
    import shutil

    from siridb_server_spark.localdf import arrow_df

    batches = [
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "completely different content about spark engines")],
        [(3, "the quick brown fox jumps over the lazy dog today"),
         (4, "another unrelated document body entirely here")],
    ]

    def build(idx):
        for bid, rows in enumerate(batches):
            D.build_dedup_index(
                arrow_df(spark, rows, "doc_id long, text string"),
                idx, subdir=f"batch={bid}")

    probe = arrow_df(
        spark, [(9, "the quick brown fox jumps over the lazy dog"
                 " today")], "doc_id long, text string")

    posix, committer = str(tmp_path / "p"), str(tmp_path / "c")
    build(posix)
    build(committer)
    before = sorted(map(tuple, D.dedup_incremental(probe, committer)
                        .collect()))
    D.compact_dedup_index(spark, posix)
    folded = D.compact_dedup_index(spark, committer, fs="committer")
    assert folded == {"exact": 2, "bands": 2}
    assert os.listdir(os.path.join(committer, "exact")) \
        == ["batch=-1"]
    # (a) identical probes through either protocol
    want = sorted(map(tuple, D.dedup_incremental(probe, posix)
                      .collect()))
    got = sorted(map(tuple, D.dedup_incremental(probe, committer)
                     .collect()))
    assert got == want == before and before

    # (b) torn committer write: a PARTIAL batch=-2 appears beside
    # re-created deltas (the next fold target is -2 only until the
    # partial claims it; the refold must go to -3 and dedupe the
    # partial's rows)
    build(committer)  # fresh deltas batch=0/1 beside batch=-1
    partial = os.path.join(committer, "exact", "batch=-2")
    os.makedirs(partial)
    src = os.path.join(committer, "exact", "batch=-1")
    pq = [f for f in os.listdir(src) if f.endswith(".parquet")]
    shutil.copy(os.path.join(src, pq[0]),
                os.path.join(partial, pq[0]))
    D.compact_dedup_index(spark, committer, fs="committer")
    dirs = os.listdir(os.path.join(committer, "exact"))
    assert dirs == ["batch=-3"], dirs
    healed = sorted(map(tuple, D.dedup_incremental(probe, committer)
                        .collect()))
    assert healed == before

    # (c) stale consumed delta beside the base re-folds harmlessly
    shutil.copytree(os.path.join(committer, "exact", "batch=-3"),
                    os.path.join(committer, "exact", "batch=5"))
    D.compact_dedup_index(spark, committer, fs="committer")
    final = sorted(map(tuple, D.dedup_incremental(probe, committer)
                       .collect()))
    assert final == before


def test_compact_media_dedup_index_preserves_probes(spark, tmp_path):
    """Media-index compaction: probe results identical before and
    after folding the batch deltas into the negative-id base."""
    import os

    import numpy as np

    idx = str(tmp_path / "midx")
    img = _phash_test_image()
    bright = np.clip(img.astype(int) + 12, 0, 255).astype(np.uint8)
    b1 = spark.createDataFrame(
        [(1, "image", MM.encode_png(img), "image/png")],
        MM.MEDIA_SCHEMA)
    rng = np.random.default_rng(9)
    b2 = spark.createDataFrame(
        [(2, "image", MM.encode_png(
            rng.integers(0, 256, img.shape).astype(np.uint8)),
          "image/png")], MM.MEDIA_SCHEMA)
    MM.build_media_dedup_index(b1, idx, subdir="batch=0")
    MM.build_media_dedup_index(b2, idx, subdir="batch=1")
    probe = spark.createDataFrame(
        [(10, "image", MM.encode_png(bright), "image/png")],
        MM.MEDIA_SCHEMA)
    before = sorted(map(tuple,
                        MM.media_dedup_incremental(probe, idx)
                        .collect()))
    folded = MM.compact_media_dedup_index(spark, idx)
    assert folded.get("phash_bands") == 2
    assert os.listdir(os.path.join(idx, "phash_bands")) == \
        ["batch=-1"]
    after = sorted(map(tuple,
                       MM.media_dedup_incremental(probe, idx)
                       .collect()))
    assert after == before and before


def test_assign_content_ids_reproducible_and_collision_audit(spark):
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import curation as CU
    df = arrow_df(spark, [
        (1, "web", "same text"),
        (2, "web", "same text"),      # exact dup: same id BY DESIGN
        (3, "lab", "same text"),      # different salt: different id
        (4, "web", "other text"),
        (5, "web", None),             # NULL text: still gets an id
    ], "doc_id long, source string, text string")
    ids = {r["doc_id"]: r["content_id"] for r in
           CU.assign_content_ids(df).collect()}
    assert ids[1] == ids[2]
    assert ids[1] != ids[3] and ids[1] != ids[4]
    assert all(0 <= v < (1 << 60) for v in ids.values())
    # reproducible across partitionings
    again = {r["doc_id"]: r["content_id"] for r in
             CU.assign_content_ids(df.repartition(5)).collect()}
    assert again == ids
    # the audit sees NO collisions here (dups are not collisions)
    assert CU.content_id_collisions(df).count() == 0


def test_bloom_novelty_lower_bounds_exact(spark):
    """bloom_novelty vs the exact ngram_novelty on planted docs: a
    verbatim copy of a reference doc sees ALL its shingles (no
    false negatives), an all-new doc at a generous m sees none,
    and across every doc n_seen >= exact-seen (false positives
    only inflate seen — novelty is a LOWER bound)."""
    from siridb_server_spark.operators import sketches as SK

    ref_docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "some other reference material entirely today")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog"),
         (11, "completely unseen words in every single gram"),
         (12, "the quick brown cat jumps over the lazy dog")],
        "doc_id long, text string")
    ref = ref_docs.select(
        F.explode(D.shingles("text", 3)).alias("s"))
    M, K = 1 << 20, 4
    bloom = SK.bloom_bits(ref, [], "s", m_bits=M, k=K)
    approx = {r["doc_id"]: (r["n_ngrams"], r["n_seen"]) for r in
              D.bloom_novelty(new, bloom, n=3, m_bits=M, k=K)
              .collect()}
    exact = {r["doc_id"]: (r["n_ngrams"], r["n_novel"]) for r in
             D.ngram_novelty(new, ref_docs, n=3).collect()}
    assert approx[10] == (7, 7)      # verbatim: everything seen
    assert approx[11] == (5, 0)      # all-new, m huge -> no FPs
    assert approx[12] == (7, 4)      # 3 novel grams stay novel
    for d, (tot, seen) in approx.items():
        assert tot == exact[d][0]
        assert seen >= tot - exact[d][1]  # lower-bound novelty


def test_token_budget_select_hand_computed(spark):
    """Greedy truncation under a token budget, hand-checked:
    (score desc, id asc) order, cumulative includes the doc
    itself, the first over-budget doc and everything after it are
    unselected (truncation, no backfill — a small later doc that
    would fit is still out), score ties order by id, NULL
    score/tokens rows are excluded entirely."""
    from siridb_server_spark.operators import curation as CU

    rows = [
        (1, 9, 40),    # cum 40  -> in
        (2, 9, 30),    # tie with 1, id-ordered after: cum 70 -> in
        (3, 7, 50),    # cum 120 -> OVER 100: out
        (4, 5, 10),    # would fit, but truncation: cum 130 -> out
        (5, None, 10),
        (6, 3, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, score long, tokens long")
    got = {r["doc_id"]: (r["cum_tokens"], r["selected"]) for r in
           CU.token_budget_select(df, budget_tokens=100,
                                  score_col="score",
                                  token_col="tokens").collect()}
    assert got == {1: (40, True), 2: (70, True),
                   3: (120, False), 4: (130, False)}
    assert 5 not in got and 6 not in got


def test_centroid_shift_planted_drift(spark):
    """Planted geometry: a label whose new-snapshot centroid is the
    old one exactly (cos micro-stats equal → drift 0), one rotated
    90° (dot 0), one present only in the old snapshot (NULL new
    side — the vanished-class report), one only in the new."""
    from siridb_server_spark.operators.similarity import (
        centroid_shift,
    )

    old = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),
         (3, [0.0, 1.0], 1),
         (4, [2.0, 2.0], 7)],          # label 7 vanishes
        "vec_id long, embedding array<double>, label long")
    new = spark.createDataFrame(
        [(10, [1.0, 0.0], 0),          # unchanged centroid
         (11, [1.0, 0.0], 1),          # rotated from [0,1]
         (12, [3.0, 4.0], 9)],         # label 9 appears
        "vec_id long, embedding array<double>, label long")
    got = {r["label"]: r.asDict() for r in
           centroid_shift(old, new).collect()}
    assert set(got) == {0, 1, 7, 9}
    m = 1_000_000
    assert got[0]["n_old"] == 2 and got[0]["n_new"] == 1
    assert (got[0]["dot_scaled"] == got[0]["na_scaled"]
            == got[0]["nb_scaled"] == m * m)   # cos exactly 1
    assert got[1]["dot_scaled"] == 0           # orthogonal shift
    assert got[7]["n_new"] is None and got[7]["dot_scaled"] is None
    assert got[7]["na_scaled"] == 2 * (2 * m) ** 2
    assert got[9]["n_old"] is None
    assert got[9]["nb_scaled"] == (3 * m) ** 2 + (4 * m) ** 2


def test_gram_dedup_cells_path_identical(spark, monkeypatch):
    """approx_top_ngrams / cms_accuracy must return identical rows
    whether the sketch cells are built per gram INSTANCE (the
    production bounded-shuffle shape) or per DISTINCT gram weighted
    by count (the small-input shape, r14) — force each path via the
    size gate and diff."""
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import text as TX

    docs = arrow_df(spark, [
        (i, ("alpha beta " * (i % 5 + 1)
             + "gamma delta epsilon " * (i % 3)
             + f"tail{i % 7} unique{i % 11}"))
        for i in range(300)] + [(999, None), (998, "")],
        "doc_id long, text string")
    outs = {}
    for label, cap in (("dedup", 1 << 30), ("instance", 0)):
        monkeypatch.setattr(TX, "_GRAM_DEDUP_MAX_INPUT_BYTES", cap)
        outs[label] = (
            TX.approx_top_ngrams(docs, n=2, k=15).collect(),
            sorted(map(tuple, TX.cms_accuracy(docs, n=2)
                       .collect())))
    assert outs["dedup"][0] == outs["instance"][0]
    assert outs["dedup"][1] == outs["instance"][1]
