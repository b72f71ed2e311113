"""Hand-computable fixtures for the round-4 operators: bigram LM
scoring, mixture weights, shard export, and the bucketed range join."""

import math

import pytest
from pyspark.sql import functions as F

from siridb_server_spark.operators import curation as CU
from siridb_server_spark.operators import text as TX
from siridb_server_spark.operators import timeseries as TSO


def test_bigram_logprob_two_docs(spark):
    # corpus: "a b a b" and "a b" → bigrams: (a,b)x3, (b,a)x1
    # c(a,b)=3 c(b,a)=1 c1(a)=3 c1(b)=1 V=|{a,b}|=2
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           TX.bigram_logprob(docs).collect()}
    p_ab = (3 + 0.5) / (3 + 0.5 * 2)
    p_ba = (1 + 0.5) / (1 + 0.5 * 2)
    # exact-integer sufficient statistics (the hashed contract)
    assert out[1]["n_bigrams"] == 3
    assert (out[1]["sum_nab"], out[1]["sum_na"]) == (3 + 3 + 1,
                                                     3 + 3 + 1)
    assert out[1]["v"] == 2
    assert out[2]["n_bigrams"] == 1
    assert (out[2]["sum_nab"], out[2]["sum_na"], out[2]["v"]) == \
        (3, 3, 2)
    # the ln-seeded score is pytest-verified with tolerance, per the
    # contract policy (ARCHITECTURE.md) — never hashed
    x1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert abs(out[1]["xent2"] - x1) < 1e-12
    assert abs(out[2]["xent2"] - (-math.log(p_ab))) < 1e-12


def test_bigram_logprob_short_docs_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "single"), (2, "   "), (3, "x y")], ["doc_id", "text"])
    got = TX.bigram_logprob(docs).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_mix_weights_flattens_toward_small_sources(spark):
    rows = [(i, "big", "t " * 9) for i in range(8)] + \
        [(100, "small", "t t")]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["source"]: r for r in
           CU.mix_weights(docs, alpha=0.3, max_weight=5.0).collect()}
    assert out["big"]["n_tokens"] == 8 * 9
    assert out["small"]["n_tokens"] == 2
    # temperature flattening: small source upweighted, big capped ≤ 1
    assert out["small"]["weight_ppm"] > 1000000
    assert out["big"]["weight_ppm"] < 1000000
    # cap applies
    assert out["small"]["weight_ppm"] <= 5000000
    # shares sum to 1 (ppm, half-up rounding slack)
    assert abs(out["big"]["token_share_ppm"]
               + out["small"]["token_share_ppm"] - 1000000) <= 1


def test_mix_weights_invariant_under_repartition(spark):
    # CORRECTNESS_r04 regression: w_tot was a double F.sum whose value
    # depended on partial-aggregation order, flipping round(x, 6) at a
    # round-half boundary between local[4] and local[32]. The decimal
    # sum in _stable_dsum must make every output bit-identical across
    # partitionings.
    rows = [(i, f"s{i % 7}", "tok " * (3 + (i * 37) % 50))
            for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    baseline = None
    for n in (1, 3, 7, 32):
        got = sorted(
            tuple(r) for r in
            CU.mix_weights(docs.repartition(n), alpha=0.3,
                           max_weight=5.0).collect())
        if baseline is None:
            baseline = got
        else:
            assert got == baseline, f"repartition({n}) changed output"


def test_sample_by_source_invariant_under_repartition(spark):
    rows = [(i, f"s{i % 5}") for i in range(300)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    baseline = None
    for n in (1, 4, 32):
        got = sorted(
            tuple(r) for r in
            CU.sample_by_source(docs.repartition(n), alpha=0.5,
                                target_frac=0.5).collect())
        if baseline is None:
            baseline = got
        else:
            assert got == baseline, f"repartition({n}) changed output"


def test_shard_export_deterministic_dense_positions(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], ["doc_id"])
    a = CU.shard_export(docs, n_shards=8).collect()
    b = CU.shard_export(docs, n_shards=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_shard = {}
    for r in a:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for positions in by_shard.values():
        # dense 0..n-1 within each shard
        assert sorted(positions) == list(range(len(positions)))


def test_point_in_interval_join_matches_theta_join(spark):
    pts = spark.createDataFrame(
        [(t,) for t in range(0, 1000, 7)], ["ts"])
    ivl = spark.createDataFrame(
        [(1, 10, 10), (2, 95, 210), (3, 500, 999), (4, 1500, 1600)],
        ["ivl_id", "lo", "hi"])
    got = (TSO.point_in_interval_join(pts, ivl, width=100)
           .groupBy("ivl_id").agg(F.count(F.lit(1)).alias("n"))
           .collect())
    expect = {}
    for i, lo, hi in [(1, 10, 10), (2, 95, 210), (3, 500, 999),
                      (4, 1500, 1600)]:
        n = sum(1 for t in range(0, 1000, 7) if lo <= t <= hi)
        if n:
            expect[i] = n
    assert {r["ivl_id"]: r["n"] for r in got} == expect


def test_point_in_interval_join_no_duplicate_pairs(spark):
    # interval spanning many buckets must still yield each point once
    pts = spark.createDataFrame([(50,), (250,), (990,)], ["ts"])
    ivl = spark.createDataFrame([(1, 0, 1000)], ["ivl_id", "lo", "hi"])
    got = TSO.point_in_interval_join(pts, ivl, width=100).collect()
    assert sorted(r["ts"] for r in got) == [50, 250, 990]


def test_remove_boilerplate_lines(spark):
    banner = "accept all cookies"
    docs = spark.createDataFrame([
        (1, f"{banner}\nunique content one\nmore text"),
        (2, f"{banner}\nother body"),
        (3, f"  {banner}  \nthird doc"),          # trim-matched
        (4, "nothing shared here"),
        (5, ""),                                   # single empty line
    ], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           TX.remove_boilerplate_lines(docs, min_docs=3).collect()}
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 2)
    assert out[1]["text_clean"] == "unique content one\nmore text"
    assert out[2]["text_clean"] == "other body"
    assert out[3]["text_clean"] == "third doc"
    # below the threshold nothing is touched
    assert out[4]["text_clean"] == "nothing shared here"
    # empty docs survive with empty output, not dropped rows
    assert (out[5]["n_lines"], out[5]["n_kept"]) == (1, 1)
    assert out[5]["text_clean"] == ""


def test_remove_boilerplate_keeps_order(spark):
    shared = "shared line"
    docs = spark.createDataFrame([
        (1, f"z last\n{shared}\na first"),
        (2, f"{shared}\nx"),
        (3, f"{shared}\ny"),
    ], ["doc_id", "text"])
    out = {r["doc_id"]: r["text_clean"] for r in
           TX.remove_boilerplate_lines(docs, min_docs=3).collect()}
    assert out[1] == "z last\na first"  # original order, not sorted


def test_correlated_series_hand_computed(spark):
    # ref series "a" has most points; "b" = 2*a + 1 (corr +1),
    # "c" = -a (corr -1), "d" shares only 2 buckets (filtered out)
    rows = []
    for b, v in [(0, 1.0), (1, 3.0), (2, 2.0), (3, 5.0)]:
        rows.append(("a", b * 10, v))
        rows.append(("b", b * 10, 2 * v + 1))
        rows.append(("c", b * 10, -v))
    rows += [("d", 0, 9.0), ("d", 10, 1.0)]
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    out = TSO.correlated_series(df, group_ns=10, k=10).collect()
    assert [(r["series"], r["corr"]) for r in out] == [
        ("b", 1.0), ("c", -1.0)]
    assert all(r["n_buckets"] == 4 for r in out)


def test_correlated_series_constant_ref_excluded(spark):
    # zero-variance pairing yields NULL/NaN corr → filtered, not crash
    rows = [("a", i * 10, 5.0) for i in range(4)] + \
        [("z", i * 10, float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    assert TSO.correlated_series(df, group_ns=10, k=10).count() == 0


def test_containment_detects_excerpt_jaccard_misses(spark):
    from siridb_server_spark.operators import dedup as D

    quote = "the quick brown fox jumps over the lazy dog"
    long_doc = quote + " " + " ".join(
        f"filler{i} pad{i} word{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, quote), (2, long_doc), (3, "unrelated text entirely")],
        ["doc_id", "text"])
    out = D.containment_pairs(docs, threshold=0.9,
                              shingle_n=3).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["contain_a"] == 1.0       # all of the quote is inside
    assert r["contain_b"] < 0.2        # ...a doc that is mostly not
    # symmetric Jaccard on the same pair stays far below threshold
    jac = D.shingle_jaccard_pairs(docs, threshold=0.0,
                                  shingle_n=3).collect()
    j = {(r["id_a"], r["id_b"]): r["jaccard"] for r in jac}
    assert j[(1, 2)] < 0.2


def test_seasonal_profile_phase_math(spark):
    # period 10, 3 buckets: phase = (ts // 10) % 3
    rows = [("s", 0, 1.0), ("s", 5, 3.0),      # phase 0: mean 2
            ("s", 10, 4.0),                    # phase 1: single point
            ("s", 20, 0.0), ("s", 50, 6.0)]    # phase 2: mean 3
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    out = {r["phase"]: r for r in
           TSO.seasonal_profile(df, period_ns=10, n_buckets=3)
           .collect()}
    assert out[0]["avg_val"] == 2.0 and out[0]["n"] == 2
    assert out[1]["avg_val"] == 4.0
    assert out[1]["std_val"] is None          # n=1 → NULL, not crash
    assert out[2]["avg_val"] == 3.0
    import math
    assert out[2]["std_val"] == pytest.approx(
        math.sqrt(((0 - 3) ** 2 + (6 - 3) ** 2) / 1), abs=1e-6)


def test_seasonal_anomalies_phase_relative(spark):
    """A value normal globally but abnormal for its phase flags, and
    vice versa: phase 0 oscillates near 100, phase 1 near 0 — a 0 at
    phase 0 is anomalous even though 0 is a common value overall."""
    rows = []
    for i in range(10):
        rows.append(("s", i * 20, 100.0 + (i % 2)))     # phase 0
        rows.append(("s", i * 20 + 10, 0.0 + (i % 2)))  # phase 1
    rows.append(("s", 200, 0.0))    # phase 0 ← anomalous FOR phase 0
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    out = TSO.seasonal_anomalies(df, period_ns=10, n_buckets=2,
                                 threshold=3.0).collect()
    flagged = {(r["ts"], r["phase"]) for r in out}
    assert (200, 0) in flagged
    # the same value at phase 1 is perfectly normal → never flagged
    assert all(p == 0 for _t, p in flagged)


def test_ewma_exact_recursion(spark):
    """Point-by-point EWMA trajectory: y_0 = x_0, then
    y = 0.75*y + 0.25*x — exact doubles, no tolerance."""
    pts = spark.createDataFrame(
        [("s", 1, 4.0), ("s", 2, 8.0), ("s", 3, 0.0), ("u", 5, 2.0)],
        ["series", "ts", "val"])
    out = {(r["series"], r["ts"]): r["ewma"]
           for r in TSO.ewma(pts, alpha=0.25).collect()}
    assert out[("s", 1)] == 4.0
    assert out[("s", 2)] == 0.75 * 4.0 + 0.25 * 8.0
    assert out[("s", 3)] == 0.75 * 5.0 + 0.25 * 0.0
    assert out[("u", 5)] == 2.0   # first point of a series is itself


def test_ewma_seq_tiebreak(spark):
    """Duplicate timestamps order by seq, so the fold is
    deterministic: (ts=1,seq=1,v=0) then (ts=1,seq=2,v=8)."""
    pts = spark.createDataFrame(
        [("s", 1, 2, 8.0), ("s", 1, 1, 0.0)],
        ["series", "ts", "seq", "val"])
    out = [r["ewma"] for r in
           TSO.ewma(pts, alpha=0.25, seq_col="seq")
           .orderBy("ewma").collect()]
    assert out == [0.0, 0.75 * 0.0 + 0.25 * 8.0]


def test_dsir_weights_hand_computed(spark):
    """Target says 'good', raw pool says 'junk': a raw doc written
    like the target outscores one written like the raw pool, and the
    λ values match the add-k formula exactly."""
    docs = spark.createDataFrame(
        [(1, "en", "good good"), (2, "en", "good good"),
         (3, "xx", "junk junk"), (4, "xx", "good good"),
         (5, "xx", "junk junk")],
        ["doc_id", "lang", "text"])
    rows = {r["doc_id"]: r for r in CU.dsir_weights(
        docs, is_target=F.col("lang") == "en").collect()}
    # c_t(good)=4; c_r = {junk:4, good:2}; N_t=4 N_r=6 V=2 k=0.5
    lam_good = math.log((4 + 0.5) / (4 + 1.0)) \
        - math.log((2 + 0.5) / (6 + 1.0))
    lam_junk = math.log((0 + 0.5) / (4 + 1.0)) \
        - math.log((4 + 0.5) / (6 + 1.0))
    # the hashed contract is the exact-integer sufficient stats
    # (counts each token instance joined against); the λ score is
    # pytest-verified with tolerance per the contract policy
    assert (rows[4]["sum_nt"], rows[4]["sum_nr"]) == (4 + 4, 2 + 2)
    assert (rows[3]["sum_nt"], rows[3]["sum_nr"]) == (0, 4 + 4)
    assert rows[4]["dsir"] > 0 > rows[3]["dsir"]
    # both docs are one word repeated twice → mean = the λ term
    assert abs(rows[4]["dsir"] - lam_good) < 1e-12
    assert abs(rows[3]["dsir"] - lam_junk) < 1e-12
    assert rows[1]["n_tokens"] == 2          # target docs score too
    assert rows[1]["dsir"] == rows[4]["dsir"]


def test_approx_top_ngrams_matches_exact_when_collision_free(spark):
    """Full sample + wide sketch on a tiny corpus: the count-min
    estimate is exact and the approximate top-k equals the exact
    census; shrinking the sketch can only INFLATE estimates."""
    docs = spark.createDataFrame(
        [(i, "red fox " * 5 + "blue owl " * 2) for i in range(4)]
        + [(100, "green ant " * 3)], ["doc_id", "text"])
    exact = TX.top_ngrams(docs, n=2, k=5).collect()
    approx = TX.approx_top_ngrams(
        docs, n=2, k=5, width=1 << 14, sample_frac=1.0).collect()
    assert [(r["ngram"], r["n_occurrences"]) for r in exact] == \
        [(r["ngram"], r["est_count"]) for r in approx]
    # 2-cell sketch: heavy collisions — estimates never drop below
    # the true counts (count-min one-sided error)
    truth = {r["ngram"]: r["n_occurrences"] for r in
             TX.top_ngrams(docs, n=2, k=100).collect()}
    tiny = TX.approx_top_ngrams(
        docs, n=2, k=100, width=2, sample_frac=1.0).collect()
    assert tiny and all(
        r["est_count"] >= truth[r["ngram"]] for r in tiny)


def test_rolling_median_ignores_single_spike(spark):
    """A lone outlier never moves the rolling median (window 3),
    while a moving average would absorb it for 3 points."""
    rows = [("s", t, 10.0) for t in range(1, 7)]
    rows[3] = ("s", 4, 1000.0)     # spike at ts=4
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    out = {r["ts"]: r["median"] for r in
           TSO.rolling_median(df, window=3).collect()}
    # ts=1: [10] → 10; ts=4: [10,10,1000] → 10; ts=5: [10,1000,10]
    # → 10; ts=6: [1000,10,10] → 10
    assert out == {1: 10.0, 2: 10.0, 3: 10.0,
                   4: 10.0, 5: 10.0, 6: 10.0}
    # interpolation on an even window: [10, 1000] → 505
    out2 = {r["ts"]: r["median"] for r in
            TSO.rolling_median(df, window=2).collect()}
    assert out2[5] == 505.0


def test_holt_linear_hand_computed(spark):
    """Pinned init (l1=x1, b1=NULL; l2=x2, b2=x2-x1) and the exact
    update equations, checked per point."""
    df = spark.createDataFrame(
        [("s", 1, 10.0), ("s", 2, 12.0), ("s", 3, 20.0),
         ("u", 9, 7.0)], ["series", "ts", "val"])
    out = {(r["series"], r["ts"]): (r["level"], r["trend"])
           for r in TSO.holt_linear(df).collect()}
    assert out[("s", 1)] == (10.0, None)
    assert out[("s", 2)] == (12.0, 2.0)
    l3 = 0.25 * 20.0 + 0.75 * (12.0 + 2.0)
    b3 = 0.125 * (l3 - 12.0) + 0.875 * 2.0
    assert out[("s", 3)] == (l3, b3)
    assert out[("u", 9)] == (7.0, None)


def test_holt_linear_batch_boundary_carry(spark):
    """The (level, trend) carry continues a series split across
    Arrow batches bit-for-bit."""
    rows = [("s", t, float((t * 7) % 13)) for t in range(1, 41)]
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    whole = {r["ts"]: (r["level"], r["trend"])
             for r in TSO.holt_linear(df).collect()}
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                   "3")
    try:
        split = {r["ts"]: (r["level"], r["trend"])
                 for r in TSO.holt_linear(df).collect()}
    finally:
        spark.conf.unset(
            "spark.sql.execution.arrow.maxRecordsPerBatch")
    assert whole == split


def test_winsorize_clips_to_series_band(spark):
    """Values clip into each series' OWN percentile band: the spike
    clips, normal values pass through, and another series' scale
    never leaks in."""
    rows = [("s", t, float(t)) for t in range(1, 20)] \
        + [("s", 99, 1000.0)] + [("big", 1, 1e6), ("big", 2, 2e6)]
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    out = {(r["series"], r["ts"]): r["clipped"]
           for r in TSO.winsorize(df, lo=0.05, hi=0.95).collect()}
    assert out[("s", 99)] < 1000.0          # spike clipped
    assert out[("s", 10)] == 10.0           # interior untouched
    assert out[("big", 1)] >= 1e6 * 0.95    # own band, not s's


def test_interval_coverage_merges_overlaps(spark):
    """Three events 10 apart with length 25 merge into ONE island
    covering last+25-first; a far event opens a second island."""
    df = spark.createDataFrame(
        [(1, 0), (1, 10), (1, 20), (1, 1000), (2, 5)],
        ["user_id", "ts"])
    out = {r["user_id"]: (r["n_islands"], r["covered"])
           for r in TSO.interval_coverage(
               df, length=25, key_col="user_id").collect()}
    assert out[1] == (2, (20 + 25 - 0) + 25)
    assert out[2] == (1, 25)


def test_ewma_and_holt_keep_nonstring_key_type(spark):
    """The output schema preserves the caller's key column type —
    integer series IDs must not crash the Arrow conversion."""
    pts = spark.createDataFrame(
        [(7, 1, 4.0), (7, 2, 8.0)], ["series", "ts", "val"])
    e = TSO.ewma(pts, alpha=0.25).collect()
    assert {r["series"] for r in e} == {7}
    h = TSO.holt_linear(pts).collect()
    assert {r["series"] for r in h} == {7}


def test_chunk_documents_windows_and_short_doc(spark):
    """Chunk layout: stride = chunk−overlap windows, last window
    only if it adds new tokens; short docs yield one chunk."""
    text10 = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame(
        [(1, text10), (2, "a b"), (3, "  ")], ["doc_id", "text"])
    out = {(r["doc_id"], r["chunk_id"]):
           (r["chunk_text"], r["n_tokens"]) for r in
           TX.chunk_documents(docs, chunk_tokens=4, overlap=2)
           .collect()}
    # doc 1: stride 2 → chunks at 0,2,4,6,8 → ceil((10-2)/2)=4
    # chunks 0..3 cover tokens 0..9 (last = [6,10))
    ids = sorted(k for k in out if k[0] == 1)
    assert [i for _, i in ids] == [0, 1, 2, 3]
    assert out[(1, 0)] == ("w0 w1 w2 w3", 4)
    assert out[(1, 3)] == ("w6 w7 w8 w9", 4)
    # doc 2 shorter than overlap: exactly one (short) chunk
    assert out[(2, 0)] == ("a b", 2)
    assert (3, 0) not in out            # blank doc emits nothing


def test_label_centroid_dims_mean_pooling(spark):
    from siridb_server_spark.operators import similarity as SIM
    emb = spark.createDataFrame(
        [(1, [1.0, 3.0], 0), (2, [3.0, 5.0], 0), (3, [9.0, 9.0], 1)],
        ["vec_id", "embedding", "label"])
    out = {(r["label"], r["dim"]): (r["n_vectors"], r["centroid"])
           for r in SIM.label_centroid_dims(emb).collect()}
    assert out[(0, 0)] == (2, 2.0)
    assert out[(0, 1)] == (2, 4.0)
    assert out[(1, 1)] == (1, 9.0)


def test_robust_scale_outlier_immune(spark):
    """One huge outlier must not move the MAD (it WOULD move a
    stddev by orders of magnitude)."""
    clean = [("s", t, 10.0 + (t % 3)) for t in range(9)]
    df1 = spark.createDataFrame(clean, ["series", "ts", "val"])
    df2 = spark.createDataFrame(
        clean[:-1] + [("s", 99, 1e9)], ["series", "ts", "val"])
    r1 = TSO.robust_scale(df1).collect()[0]
    r2 = TSO.robust_scale(df2).collect()[0]
    assert r1["med"] == 11.0 and r2["med"] == 11.0
    assert abs(r1["mad"] - r2["mad"]) <= 1.0   # scale barely moves
    assert r2["n_points"] == 9


def test_funnel_steps_strict_ordering(spark):
    """A later-step event BEFORE an earlier step never counts, and
    the chain breaks NULL-forward from the first missing step."""
    rows = [
        # u1 completes in order: view@1 click@2 purchase@3
        (1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
        # u2's click precedes its first view → chain stops at t1
        (2, 5, "click"), (2, 6, "view"),
        # u3 has click after view but purchase BEFORE the click
        (3, 1, "view"), (3, 4, "click"), (3, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["user_id"]: (r["t1"], r["t2"], r["t3"]) for r in
           TSO.funnel_steps(df, ["view", "click", "purchase"])
           .collect()}
    assert out[1] == (1, 2, 3)
    assert out[2] == (6, None, None)
    assert out[3] == (1, 4, None)


def test_cross_source_dup_rates(spark):
    """Near-dup pairs roll up into an ordered source-pair matrix."""
    from siridb_server_spark.operators import dedup as D
    text = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [(1, text, "feedB"), (2, text, "feedA"),
         (3, text, "feedA"), (4, "totally different words here",
          "feedC")],
        ["doc_id", "text", "source"])
    out = {(r["source_a"], r["source_b"]):
           (r["n_pairs"], r["sum_jaccard"]) for r in
           D.cross_source_dup_rates(docs, threshold=0.8).collect()}
    # pairs (1,2) (1,3) cross feedA/feedB; (2,3) inside feedA
    assert out[("feedA", "feedB")] == (2, 2.0)
    assert out[("feedA", "feedA")] == (1, 1.0)
    assert ("feedC", "feedC") not in out


def test_resolve_duplicates_by_highest_score(spark):
    """The cluster keeps its highest-scoring member (ties → smaller
    id); singletons keep themselves."""
    from siridb_server_spark.operators import dedup as D
    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 9.0), (4, 1.0)],
        ["doc_id", "score"])
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["id_a", "id_b"])   # {1,2,3} one cluster
    out = {r["doc_id"]: (r["keep_id"], r["is_kept"]) for r in
           D.resolve_duplicates_by(docs, pairs, "score").collect()}
    # 2 and 3 tie at 9.0 → smaller id 2 wins
    assert out[1] == (2, False)
    assert out[2] == (2, True)
    assert out[3] == (2, False)
    assert out[4] == (4, True)                # singleton
    # the skew-safe groupBy path (for unbounded component sizes) is
    # semantically identical to the single-window default
    safe = {r["doc_id"]: (r["keep_id"], r["is_kept"]) for r in
            D.resolve_duplicates_by(docs, pairs, "score",
                                    skew_safe=True).collect()}
    assert safe == out


def test_linear_trend_exact_line_and_degenerate(spark):
    """A perfect line recovers its slope/intercept with R²=1; a
    single point and a zero-time-variance series yield NULL slope."""
    ns = 1_000_000_000
    rows = [("s", t * ns, 3.0 + 2.0 * t) for t in range(5)] \
        + [("one", 7 * ns, 9.0)] \
        + [("flat", 5 * ns, 1.0), ("flat", 5 * ns, 2.0)]
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    out = {r["series"]: r for r in TSO.linear_trend(df).collect()}
    assert out["s"]["slope_per_s"] == 2.0
    assert out["s"]["intercept"] == 3.0
    assert out["s"]["r2"] == 1.0
    assert out["one"]["slope_per_s"] is None
    assert out["flat"]["slope_per_s"] is None


def test_level_shifts_flags_step_change_only(spark):
    """A clean step change flags at the boundary; steady noise-free
    plateaus never flag, and edge positions without full windows
    never flag."""
    rows = [("s", t, 10.0 + (t % 2) * 0.1) for t in range(10)] \
        + [("s", t, 50.0 + (t % 2) * 0.1) for t in range(10, 20)]
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    out = TSO.level_shifts(df, window=5, threshold=3.0).collect()
    flagged = {r["ts"] for r in out}
    assert 10 in flagged                  # the step boundary
    # detection begins as soon as the post window TOUCHES the step
    # (ts = boundary − window + 1) and ends at the boundary — after
    # it, the pre window's inflated std suppresses the z
    assert flagged == set(range(6, 11))
    for r in out:
        if r["ts"] == 10:
            assert r["post_mean"] > r["pre_mean"]
            assert r["shift_z"] > 3.0


def test_trigram_logprob_hand_computed(spark):
    """One doc, one trigram: all counts are 1, so
    P = 0.5·(1.5/1+.5V) + 0.3·(1.5/1+.5V) + 0.2·(1.5/1+.5V)."""
    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "ab")], ["doc_id", "text"])
    rows = TX.trigram_logprob(docs).collect()
    assert [r["doc_id"] for r in rows] == [1]   # doc 2 too short
    r = rows[0]
    v = 1.0    # one distinct final token 'z'
    comp = 1.5 / (1 + 0.5 * v)
    p = 0.5 * comp + 0.3 * comp + 0.2 * comp
    assert r["n_trigrams"] == 1
    # hashed contract = the integer sufficient statistics
    assert (r["sum_nabc"], r["sum_nab"], r["sum_nbc"],
            r["sum_nb"], r["sum_nc"], r["v"]) == (1, 1, 1, 1, 1, 1)
    # the λ-interpolated ln score: pytest tolerance, never hashed
    assert abs(r["xent3"] - (-math.log(p))) < 1e-12


def test_standardize_embeddings_whitens_and_keeps_arity(spark):
    """Each dimension z-scores independently; a zero-variance dim
    becomes NULL but keeps its slot in the reassembled vector."""
    from siridb_server_spark.operators import similarity as SIM
    emb = spark.createDataFrame(
        [(1, [0.0, 7.0]), (2, [2.0, 7.0]), (3, [4.0, 7.0])],
        ["vec_id", "embedding"])
    out = {r["vec_id"]: r["vector"] for r in
           SIM.standardize_embeddings(emb).collect()}
    # dim 0: mean 2, sd 2 → z = -1, 0, 1; dim 1 constant → NULL
    assert out[1] == [-1.0, None]
    assert out[2] == [0.0, None]
    assert out[3] == [1.0, None]


def test_similar_docs_retrieval(spark):
    """An exact copy ranks first with Jaccard 1; a half-overlap doc
    ranks below it; a disjoint doc never appears; the query doc is
    excluded from its own results."""
    from siridb_server_spark.operators import dedup as D
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d"), (3, "a b x y"),
         (4, "p q r s")], ["doc_id", "text"])
    out = [(r["doc_id"], r["jaccard"]) for r in
           D.similar_docs(docs, query_id=1, k=5).collect()]
    assert out[0] == (2, 1.0)
    assert out[1][0] == 3 and abs(out[1][1] - 2 / 6) < 1e-6
    assert all(d != 4 for d, _ in out)
    assert all(d != 1 for d, _ in out)


def test_value_histogram_bins_and_degenerate(spark):
    """Bins split each series' own range; the max lands in the last
    bin; a constant series collapses into bin 0."""
    rows = [("s", t, float(t)) for t in range(11)] \
        + [("c", 0, 5.0), ("c", 1, 5.0)]
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    out = {(r["series"], r["bin"]): (r["n"], r["lo"], r["hi"])
           for r in TSO.value_histogram(df, n_bins=10).collect()}
    # s: range [0,10], width 1 → one point per bin, 10 at bin 9
    assert out[("s", 0)] == (1, 0.0, 1.0)
    assert out[("s", 9)] == (2, 9.0, 10.0)   # 9 and the max 10
    assert ("s", 10) not in out
    assert out[("c", 0)][0] == 2             # constant → bin 0


def test_bucket_pct_change_skips_missing_buckets(spark):
    """Change compares adjacent EXISTING buckets; the first bucket
    per series reports NULL change."""
    rows = [("s", 0, 10.0), ("s", 5, 10.0),        # bucket 0: 20
            ("s", 35, 30.0),                       # bucket 30: 30
            ("s", 10 * 30, 15.0)]                  # bucket 300: 15
    df = spark.createDataFrame(rows, ["series", "ts", "val"])
    out = {r["bucket"]: (r["total"], r["change"], r["pct_change"])
           for r in TSO.bucket_pct_change(df, bucket_ns=30)
           .collect()}
    assert out[0] == (20.0, None, None)
    assert out[30] == (30.0, 10.0, 0.5)
    # gap: bucket 300 compares against bucket 30, not zero-filled 60
    assert out[300] == (15.0, -15.0, -0.5)


def test_uptime_report_gap_excess(spark):
    """Only the excess beyond the heartbeat counts as downtime; a
    single-point series has zero span and NULL uptime."""
    rows = [("s", 0), ("s", 10), ("s", 40), ("s", 50), ("one", 5)]
    df = spark.createDataFrame(rows, ["series", "ts"])
    out = {r["series"]: r for r in
           TSO.uptime_report(df, heartbeat_ns=10).collect()}
    s = out["s"]
    # gaps 10, 30, 10 → downtime = 30 − 10 = 20; span 50
    assert (s["span"], s["max_gap"], s["downtime"]) == (50, 30, 20)
    assert s["uptime_frac"] == 1.0 - 20 / 50
    assert out["one"]["uptime_frac"] is None


def test_sentence_features(spark):
    docs = spark.createDataFrame(
        [(1, "one two three. four five! six?"), (2, "   ")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           TX.sentence_features(docs).collect()}
    r = out[1]
    assert r["n_sentences"] == 3
    assert r["avg_sentence_words"] == round((3 + 2 + 1) / 3, 6)
    assert r["max_sentence_words"] == 3
    assert out[2]["n_sentences"] == 0
    assert out[2]["avg_sentence_words"] is None
    assert out[2]["max_sentence_words"] == 0


def test_round6_half_away_from_zero():
    """numpy scoring paths must round like F.round/DuckDB (half away
    from zero), not np.round's half-to-even (ADVICE r5)."""
    import numpy as np

    from siridb_server_spark.operators.similarity import _round6

    a = np.array([0.0000005, -0.0000005, 0.1234565, -0.1234565,
                  0.9999994, 1.25, -2e-7])
    got = _round6(a)
    exp = np.array([0.000001, -0.000001, 0.123457, -0.123457,
                    0.999999, 1.25, 0.0])
    assert np.allclose(got, exp, atol=1e-12)
    # np.round would disagree on the .5 boundaries
    assert np.round(0.0000005, 6) == 0.0


def test_scaled_dsum_cross_engine_bit_identical(spark):
    """The IEEE-identical claim behind functions/stable.py
    scaled_dsum: Spark and DuckDB produce the SAME long term for
    every double — including adversarial values near the .5
    quantization boundaries (dyadic rationals like k/128 scale to
    exact halves) and sign flips — so the summed contract can never
    hash-diverge. 4000 deterministic pseudo-random doubles across
    magnitudes."""
    import random
    import struct

    import duckdb

    from siridb_server_spark.functions.stable import (
        SCALED_DSUM_SQL,
        scaled_dsum,
    )

    rng = random.Random(0xC0FFEE)
    vals = []
    for _ in range(3000):
        mag = 10.0 ** rng.uniform(-8, 6)
        vals.append(rng.uniform(-1.0, 1.0) * mag)
    # dyadic rationals: x*1e6 lands EXACTLY on .5 boundaries
    vals += [k / 128.0 for k in range(-256, 256)]
    vals += [k / 64.0 for k in range(-128, 128)]
    # bit-pattern fuzz (finite doubles only)
    for _ in range(500):
        b = struct.pack("<Q", rng.getrandbits(64))
        (x,) = struct.unpack("<d", b)
        if x == x and abs(x) < 1e12:  # finite, in-range
            vals.append(x)

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = df.agg(scaled_dsum(F.col("x")).alias("s")) \
        .collect()[0]["s"]

    con = duckdb.connect()
    con.execute("CREATE TABLE t(x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    frag = SCALED_DSUM_SQL.format(x="x", s=10 ** 6)
    got_duck = con.sql(f"SELECT {frag} AS s FROM t").fetchone()[0]

    # repr-level equality — the same bar the driver's hash applies
    assert repr(got_spark) == repr(got_duck), (got_spark, got_duck)
    # and per-row term equality on the boundary values
    term_sql = ("SELECT CASE WHEN CAST(x AS DOUBLE) >= 0.0"
                " THEN CAST(floor(CAST(x AS DOUBLE) * 1000000.0"
                " + 0.5) AS BIGINT)"
                " ELSE -CAST(floor(-CAST(x AS DOUBLE) * 1000000.0"
                " + 0.5) AS BIGINT) END FROM t")
    duck_terms = [r[0] for r in con.sql(term_sql).fetchall()]
    from siridb_server_spark.functions.stable import scaled_term
    spark_terms = [r["t"] for r in
                   df.select(scaled_term(F.col("x")).alias("t"))
                   .collect()]
    assert spark_terms == duck_terms


def test_epoch_plan_expands_weights_deterministically(spark):
    """A doc with weight 2.x appears in epochs {0, 1} always and in
    epoch 2 iff the md5 draw on 'doc_id:2' clears the fraction —
    replayed here in python, byte-for-byte."""
    import hashlib

    rows = [(i, "big", "t " * 9) for i in range(8)] + \
        [(100, "small", "t t"), (101, "small", "t t")]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    w = {r["source"]: r["weight_ppm"] for r in
         CU.mix_weights(docs, alpha=0.3, max_weight=5.0).collect()}
    got = {}
    for r in CU.epoch_plan(docs, alpha=0.3,
                           max_weight=5.0).collect():
        got.setdefault(r["doc_id"], set()).add(r["epoch"])

    def u01(key):
        return int(hashlib.md5(key.encode()).hexdigest()[:8],
                   16) / 4294967296.0

    for doc_id, src in [(i, "big") for i in range(8)] + \
            [(100, "small"), (101, "small")]:
        full, frac = w[src] // 1000000, w[src] % 1000000
        exp = set(range(full))
        if u01(f"{doc_id}:{full}") * 1e6 < frac:
            exp.add(full)
        assert got.get(doc_id, set()) == exp, (doc_id, w[src])
    # the small source is upweighted: at least one full extra epoch
    assert w["small"] > 1000000 > w["big"]


def test_length_buckets_batches_within_power_of_two(spark):
    rows = [(1, "a"), (2, "a b c"), (3, "a b c d"),
            (4, "a b c d e f g"), (5, "")] + \
        [(10 + i, "w " * 5) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = CU.length_buckets(docs, batch_docs=32).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert 5 not in by_id                    # empty docs dropped
    assert by_id[1]["bucket"] == 1           # 1 token  -> bin '1'
    assert by_id[2]["bucket"] == 2           # 3 tokens -> bin '11'
    assert by_id[3]["bucket"] == 3           # 4 tokens -> '100'
    assert by_id[4]["bucket"] == 3           # 7 tokens -> '111'
    # the 40 five-token docs share bucket 3 with docs 3/4: 42 docs
    # -> batch 0 full (32 docs, pos 0..31) and batch 1 partial
    b3 = [r for r in out if r["bucket"] == 3]
    assert len(b3) == 42
    assert sorted(r["pos"] for r in b3 if r["batch_id"] == 0) \
        == list(range(32))
    assert sorted(r["pos"] for r in b3 if r["batch_id"] == 1) \
        == list(range(10))


def test_acf_known_signals(spark):
    """ACF sanity on constructed series: a period-2 alternating
    signal has acf_1 = -1 and acf_2 = +1-ish (finite-sample scaled);
    a constant series has zero variance -> NULL; a linear ramp is
    strongly positive at lag 1."""
    rows = []
    alt = [1.0 if i % 2 == 0 else -1.0 for i in range(40)]
    for i, v in enumerate(alt):
        rows.append(("alt", i * 10, v))
    for i in range(40):
        rows.append(("const", i * 10, 5.0))
        rows.append(("ramp", i * 10, float(i)))
    df = spark.createDataFrame(rows, "series string, ts long, val double")
    got = {r["series"]: r for r in TSO.acf(df).collect()}
    import math
    # exact finite-sample values: mean 0, ss = n; r_k = (n-k)(-1)^k/n
    n = 40
    assert math.isclose(got["alt"]["acf_1"], -(n - 1) / n,
                        abs_tol=1e-6)
    assert math.isclose(got["alt"]["acf_2"], (n - 2) / n,
                        abs_tol=1e-6)
    assert got["const"]["acf_1"] is None         # zero variance
    assert got["ramp"]["acf_1"] > 0.85
