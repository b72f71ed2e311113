"""Grid interpolation, sessionization, counter-rate operators."""

from siridb_server_spark.operators import timeseries as TS


def test_resample_interpolate(spark):
    pts = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 25, 4.0), ("a", 30, 6.0),
         ("b", 7, 5.0)],
        "series string, ts long, val double")
    out = {(r["series"], r["ts"]): r["val"]
           for r in TS.resample_interpolate(pts, 10).collect()}
    # a: pairs (10,25] -> grid 20; (25,30] -> grid 30; first pt 10
    assert out[("a", 10)] == 1.0            # exact first point on grid
    assert out[("a", 20)] == 3.0            # 1 + 3*(10/15)
    assert out[("a", 30)] == 6.0            # boundary hits v1 exactly
    # b: single point off-grid -> nothing
    assert [k for k in out if k[0] == "b"] == []
    assert len(out) == 3


def test_resample_interpolate_gap_fill(spark):
    pts = spark.createDataFrame(
        [("s", 0, 0.0), ("s", 40, 8.0)],
        "series string, ts long, val double")
    out = {r["ts"]: r["val"]
           for r in TS.resample_interpolate(pts, 10).collect()}
    assert out == {0: 0.0, 10: 2.0, 20: 4.0, 30: 6.0, 40: 8.0}


def test_sessionize(spark):
    ev = spark.createDataFrame(
        [(1, 100, 0), (1, 150, 1), (1, 400, 2), (1, 420, 3),
         (2, 90, 4)],
        "user_id long, ts long, event_id long")
    out = {r["event_id"]: r["session_id"]
           for r in TS.sessionize(ev, gap=100,
                                  seq_col="event_id").collect()}
    assert out[0] == 1 and out[1] == 1      # 50 <= gap
    assert out[2] == 2                      # 250 > gap -> new session
    assert out[3] == 2
    assert out[4] == 1                      # separate key


def test_counter_rate(spark):
    pts = spark.createDataFrame(
        [("c", 0, 10.0), ("c", 10, 30.0), ("c", 20, 5.0),
         ("c", 30, 25.0)],
        "series string, ts long, val double")
    out = {r["ts"]: r["rate"]
           for r in TS.counter_rate(pts).collect()}
    assert 0 not in out                     # first point: no rate
    assert out[10] == 2.0                   # (30-10)/10
    assert out[20] == 0.5                   # reset: 5/10
    assert out[30] == 2.0                   # (25-5)/10


def test_moving_avg_trailing_frame(spark):
    from siridb_server_spark.operators.timeseries import moving_avg

    pts = spark.createDataFrame(
        [("a", t, float(v)) for t, v in
         [(1, 1.0), (2, 2.0), (3, 3.0), (4, 4.0), (5, 5.0),
          (6, 6.0)]] + [("b", 1, 10.0)],
        "series string, ts long, val double")
    rows = {(r["series"], r["ts"]): r["avg"]
            for r in moving_avg(pts, window=5).collect()}
    assert rows[("a", 1)] == 1.0          # frame = first point only
    assert rows[("a", 3)] == 2.0          # mean(1,2,3)
    assert rows[("a", 5)] == 3.0          # mean(1..5)
    assert rows[("a", 6)] == 4.0          # mean(2..6): window slides
    assert rows[("b", 1)] == 10.0         # keys independent


def test_top_series_rounded_rank_and_ties(spark):
    from siridb_server_spark.operators.timeseries import top_series

    pts = spark.createDataFrame(
        [("b", 1, 2.0), ("b", 2, 1.0), ("a", 1, 3.0),
         ("c", 1, 0.5)],
        "series string, ts long, val double")
    out = top_series(pts, k=2).collect()
    # a and b tie at 3.0 → lexicographic, c excluded by k
    assert [(r["series"], r["total"]) for r in out] == \
        [("a", 3.0), ("b", 3.0)]


def test_zscore_anomalies_exclusive_frame(spark):
    from siridb_server_spark.operators.timeseries import (
        zscore_anomalies,
    )

    # stable baseline then one spike; baseline alternates so sd > 0
    pts = [("a", t, float(v)) for t, v in
           [(1, 1.0), (2, 1.2), (3, 0.8), (4, 1.1), (5, 0.9),
            (6, 1.0), (7, 50.0), (8, 1.0)]]
    df = spark.createDataFrame(
        pts, "series string, ts long, val double")
    out = zscore_anomalies(df, window=5, threshold=3.0).collect()
    assert [(r["ts"], r["val"]) for r in out] == [(7, 50.0)]
    assert out[0]["z"] > 3.0


# ----------------------------------------------------------- DTW

def _dtw_ref(a, b, band):
    # plain full-matrix banded DP reference
    INF = 1 << 62
    n, m = len(a), len(b)
    w = max(band, abs(n - m))
    D = [[INF] * (m + 1) for _ in range(n + 1)]
    D[0][0] = 0
    for i in range(1, n + 1):
        for j in range(max(1, i - w), min(m, i + w) + 1):
            d = abs(a[i - 1] - b[j - 1])
            D[i][j] = d + min(D[i - 1][j], D[i][j - 1],
                              D[i - 1][j - 1])
    return D[n][m]


def test_dtw_topk_matches_reference_dp(spark):
    import random

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    rng = random.Random(7)
    series = {f"s{i}": [rng.randint(-50, 50) for _ in range(40)]
              for i in range(6)}
    rows = [(name, t, float(v)) for name, vs in series.items()
            for t, v in enumerate(vs)]
    df = arrow_df(spark, rows, "series string, ts long, val double")
    got = {r["series"]: r["dtw_cost"] for r in
           TSO.dtw_topk(df, "s0", k=6, band=8).collect()}
    q = [v * 1000 for v in series["s0"]]
    for name, vs in series.items():
        want = _dtw_ref([v * 1000 for v in vs], q, band=8)
        assert got[name] == want, name
    assert got["s0"] == 0


def test_dtw_topk_elastic_beats_pointwise(spark):
    import math

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    rows = []
    for i in range(64):
        rows.append(("query", i, math.sin(i / 5)))
        rows.append(("shifted", i, math.sin((i - 3) / 5)))
        rows.append(("flat", i, 0.1))
    df = arrow_df(spark, rows, "series string, ts long, val double")
    got = [r["series"] for r in
           TSO.dtw_topk(df, "query", k=3).collect()]
    assert got == ["query", "shifted", "flat"]
    # deterministic across partitionings
    again = [r["series"] for r in
             TSO.dtw_topk(df.repartition(7), "query", k=3).collect()]
    assert again == got


def test_dtw_batch_kernel_matches_reference_dp():
    """The batched anti-diagonal kernel is bit-identical to the
    full-matrix reference DP over randomized mixed-length batches
    (including empty series and length-1 edges)."""
    import numpy as np

    from siridb_server_spark.operators import timeseries as TSO

    rng = np.random.RandomState(11)
    for trial in range(25):
        nq = rng.randint(1, 129)
        q = rng.randint(-10**6, 10**6, size=nq).astype(np.int64)
        ser = [rng.randint(-10**6, 10**6,
                           size=rng.randint(0, 129)).astype(np.int64)
               for _ in range(rng.randint(1, 30))]
        got = TSO._dtw_batch(ser, q, 8)
        for s, g in zip(ser, got):
            if len(s) == 0:
                assert g == 1 << 62
            else:
                assert g == _dtw_ref(list(map(int, s)),
                                     list(map(int, q)), 8), trial


def test_dtw_topk_prefilter_exact_two_phase(spark):
    """prefilter=True is an EXACT top-k: the SAX-pooled + endpoint-
    lower-bound two-phase search returns the unfiltered ranking on
    a shape corpus where most series are prunable (distant offset
    levels -> huge endpoint LB), with a pool far smaller than the
    corpus."""
    import math

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    rows = []
    for i in range(64):
        rows.append(("query", i, math.sin(i / 5)))
        rows.append(("shifted", i, math.sin((i - 3) / 5)))
        rows.append(("flat", i, 0.1))
        for m in range(30):
            # far series: big constant offsets the endpoint bound
            # sees immediately
            rows.append((f"far{m:02d}", i,
                         100.0 + 10 * m + math.sin(i / 3)))
    df = arrow_df(spark, rows, "series string, ts long, val double")
    base = [(r["series"], r["dtw_cost"]) for r in
            TSO.dtw_topk(df, "query", k=3).collect()]
    gated = [(r["series"], r["dtw_cost"]) for r in
             TSO.dtw_topk(df, "query", k=3, prefilter=True,
                          pool=4).collect()]
    assert base == gated
    assert [s for s, _ in base] == ["query", "shifted", "flat"]


def test_dtw_topk_prefilter_randomized_equality(spark):
    """Randomized corpora: the two-phase search equals the
    unfiltered top-k regardless of data shape — the exactness is a
    property of the lower bound, not of any fixture."""
    import random

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    rng = random.Random(23)
    for trial in range(3):
        rows = []
        for s in range(25):
            n = rng.randint(1, 60)
            lvl = rng.uniform(-50, 50)
            for i in range(n):
                rows.append((f"s{s:02d}", i,
                             lvl + rng.uniform(-5, 5)))
        df = arrow_df(spark, rows,
                      "series string, ts long, val double")
        base = [(r["series"], r["dtw_cost"]) for r in
                TSO.dtw_topk(df, "s00", k=7).collect()]
        gated = [(r["series"], r["dtw_cost"]) for r in
                 TSO.dtw_topk(df, "s00", k=7, prefilter=True,
                              pool=8).collect()]
        assert base == gated, trial


def test_dtw_knn_join_randomized_equality_with_loop(spark):
    """The batch join equals the per-query dtw_topk loop on
    randomized corpora — queries both inside and OUTSIDE the
    corpus, single-point series included, small pool to force the
    LB-pruning path to do real work. Exactness is the lower bound's
    theorem, not fixture luck."""
    import random

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    rng = random.Random(41)
    for trial in range(2):
        rows = []
        for s in range(20):
            n = 1 if s == 7 else rng.randint(1, 50)
            lvl = rng.uniform(-40, 40)
            for i in range(n):
                rows.append((f"s{s:02d}", i,
                             lvl + rng.uniform(-4, 4)))
        corpus = arrow_df(spark, rows,
                          "series string, ts long, val double")
        # queries: two corpus members (one the single-point series)
        # plus one foreign series not in the corpus at all
        qrows = [(s, t, v) for s, t, v in rows
                 if s in ("s03", "s07")]
        qrows += [("zq", i, 1000.0 + i) for i in range(10)]
        queries = arrow_df(spark, qrows,
                           "series string, ts long, val double")
        got = {}
        for r in TSO.dtw_knn_join(corpus, queries, k=6,
                                  pool=4).collect():
            got.setdefault(r["qseries"], []).append(
                (r["rank"], r["series"], r["n_points"],
                 r["dtw_cost"]))
        assert set(got) == {"s03", "s07", "zq"}, trial
        # per-query reference: dtw_topk over corpus ∪ that query
        # alone (the query must exist in the searched frame), its
        # own row dropped for the foreign query
        for qn in ("s03", "s07", "zq"):
            searched = corpus if qn != "zq" else corpus.unionByName(
                arrow_df(spark, [r for r in qrows if r[0] == "zq"],
                         "series string, ts long, val double"))
            ref = [r for r in TSO.dtw_topk(searched, qn, k=7)
                   .collect()]
            if qn == "zq":
                ref = [r for r in ref if r["series"] != "zq"]
            want = [(i + 1, r["series"], r["n_points"],
                     r["dtw_cost"]) for i, r in enumerate(ref[:6])]
            assert sorted(got[qn]) == want, (trial, qn)


def test_dtw_knn_join_banding_cannot_change_answer(spark):
    """The banded pool is a recall heuristic only: band_cap=1
    (which drops EVERY shared band bucket, leaving just the
    floor pool) and bands=1 must return byte-identical top-k to
    the default — a missed pool candidate has to beat τ through
    the exhaustive endpoint LB to matter, and the LB never
    misses. Also pins the documented candidate-stream invariant
    n_pool_stream ≤ bands·|q|·band_cap and the r13 plan shape:
    the r11 word crossJoin AND the r12 endpoint-LB grid BNLJ are
    both gone — the LB gate is a bin equi-join now, so the only
    NestedLoop left in the whole plan is the tiny broadcast floor
    pool."""
    import random

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    rng = random.Random(13)
    rows = []
    for s in range(18):
        n = rng.randint(2, 40)
        lvl = rng.uniform(-30, 30)
        for i in range(n):
            rows.append((f"s{s:02d}", i, lvl + rng.uniform(-3, 3)))
    corpus = arrow_df(spark, rows,
                      "series string, ts long, val double")
    queries = corpus.where(
        "series IN ('s02', 's05', 's11')")

    def run(**kw):
        return sorted(
            tuple(r) for r in
            TSO.dtw_knn_join(corpus, queries, k=4, pool=4, **kw)
            .collect())

    stats = {}
    base = run(band_cap=None, _stats=stats)
    assert run(band_cap=1) == base
    assert run(bands=1) == base
    assert run(bands=8, band_cap=2) == base
    # stream invariant: ≤ bands·|q|·cap when capped; the uncapped
    # run still can't exceed the full band-match volume
    stats_capped = {}
    run(bands=4, band_cap=3, _stats=stats_capped)
    assert stats_capped["n_pool_stream"] <= 4 * 3 * 3

    # plan shape: exactly one NestedLoop join survives (the
    # broadcast floor pool); the endpoint-LB gate must appear as a
    # bin equi-join, never a grid BNLJ
    plan = (TSO.dtw_knn_join(corpus, queries, k=4, pool=4)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_sax_words_structure_and_similarity(spark):
    import math

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    rows = []
    for i in range(64):
        rows.append(("rampup", i, float(i)))
        rows.append(("rampup2", i, float(i) * 2 + 5))  # same shape
        rows.append(("rampdown", i, float(64 - i)))
        rows.append(("vee", i, float(abs(i - 32))))
    df = arrow_df(spark, rows, "series string, ts long, val double")
    got = {r["series"]: r for r in TSO.sax_words(df).collect()}
    for r in got.values():
        assert r["n_points"] == 64
        assert len(r["word"]) == 8
        assert set(r["word"]) <= set("0123")
    # equi-range symbols see SHAPE, not scale: both ramps share a
    # word; the reverse ramp is its mirror; the vee differs from all
    assert got["rampup"]["word"] == got["rampup2"]["word"]
    assert got["rampdown"]["word"] == got["rampup"]["word"][::-1]
    assert got["vee"]["word"] not in (got["rampup"]["word"],
                                      got["rampdown"]["word"])
    # monotone ramp: symbols non-decreasing
    w = got["rampup"]["word"]
    assert list(w) == sorted(w)


def test_sax_from_vectors_row_local_matches_exploded(spark):
    """The row-local word computation (r14: zero exchanges of its
    own) is row-identical to the posexplode + two-groupBy reference
    pipeline it replaced — exercised across word_len/alphabet/
    max_len combos, negative values (trunc-div edge) and short
    series — and sax_words' whole plan keeps exactly ONE exchange
    (the vector-assembly groupBy)."""
    from pyspark.sql import functions as F

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO
    from siridb_server_spark.operators.timeseries import (
        _sax_from_vectors,
        _series_vectors,
    )

    def exploded_reference(per, word_len, alphabet):
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:alphabet]
        pos = per.select("series", F.size("vals").alias("n"),
                         F.posexplode("vals").alias("i", "v"))
        paa = (pos.withColumn(
            "j", F.expr(f"CAST(i * {word_len} AS BIGINT) div n"))
            .groupBy("series", "j")
            .agg(F.expr("CAST(sum(v) AS BIGINT) div count(1)")
                 .alias("paa"), F.max("n").alias("n")))
        rng = (paa.groupBy("series")
               .agg(F.min("paa").alias("lo"),
                    F.max("paa").alias("hi"),
                    F.max("n").alias("n_points")))
        sym = (paa.join(rng, "series")
               .withColumn("s", F.least(
                   F.lit(alphabet - 1),
                   F.expr(f"CAST((paa - lo) * {alphabet} AS BIGINT)"
                          " div (hi - lo + 1)")))
               .withColumn("c", F.substring(
                   F.lit(digits), F.col("s").cast("int") + 1, 1)))
        return (sym.groupBy("series")
                .agg(F.max("n_points").alias("n_points"),
                     F.concat_ws("", F.transform(
                         F.array_sort(F.collect_list(
                             F.struct("j", "c"))),
                         lambda x: x["c"])).alias("word")))

    rows = []
    for i in range(64):
        rows.append(("rampup", i, float(i)))
        rows.append(("neg", i, float(-50 + (i * 3) % 97)))
        rows.append(("const", i, -2.5))
    for i in range(5):
        rows.append(("short", i, float(i * i - 6)))
    rows.append(("single", 0, -42.0))
    df = arrow_df(spark, rows, "series string, ts long, val double")
    for wl, al, ml in ((8, 4, 128), (5, 3, 7), (16, 36, 128),
                       (3, 2, 2)):
        per = _series_vectors(df, ml, 1000)
        new = _sax_from_vectors(per, wl, al)
        old = exploded_reference(per, wl, al)
        assert new.exceptAll(old).count() == 0, (wl, al, ml)
        assert old.exceptAll(new).count() == 0, (wl, al, ml)
    plan = (TSO.sax_words(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("Exchange") == 1, plan


def test_sax_word_py_matches_pipeline(spark):
    """The driver-side SAX-word twin (_sax_word_py, used by
    dtw_topk's prefilter for the query's own word) is byte-identical
    to the distributed word pipeline — including short series,
    single-point series, negative and constant values (negative
    bucket sums exercise the trunc-vs-floor div edge)."""
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO
    from siridb_server_spark.operators.timeseries import (
        _sax_word_py,
        _series_vectors,
    )

    rows = []
    for i in range(64):
        rows.append(("rampup", i, float(i)))
        rows.append(("neg", i, float(-3 - (i % 7))))
        rows.append(("vee", i, float(abs(i - 32))))
        rows.append(("const", i, 5.0))
    for i in range(5):
        rows.append(("short", i, float(i * i)))
    rows.append(("single", 0, 42.0))
    df = arrow_df(spark, rows, "series string, ts long, val double")
    per = {r["series"]: [int(x) for x in r["vals"]]
           for r in _series_vectors(df, 128, 1000).collect()}
    words = {r["series"]: r["word"]
             for r in TSO.sax_words(df).collect()}
    assert set(per) == set(words)
    for name, vals in per.items():
        assert _sax_word_py(vals, 8, 4) == words[name], name


def test_wilson_bounds_match_python_reference(spark):
    """Wilson bounds equal the textbook formula (same fixed op
    order, sqrt-only) and behave: contain p̂, tighten with n,
    NULL at n=0."""
    import math

    from pyspark.sql import functions as F

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    rows = [(1, 8, 10), (2, 80, 100), (3, 800, 1000),
            (4, 0, 50), (5, 50, 50), (6, 3, 0),
            # invalid k/n pairs (k > n, k < 0): NULL, never NaN —
            # a NaN would silently reach the hashed oracle surface
            (7, 11, 10), (8, -1, 10)]
    df = arrow_df(spark, rows, "id long, k long, n long")
    lo, hi = TSO.wilson_bounds(F.col("k"), F.col("n"))
    got = {r["id"]: (r["lo"], r["hi"]) for r in
           df.select("id", lo.alias("lo"), hi.alias("hi"))
           .collect()}

    def ref(k, n, z=1.96):
        p = k / n
        z2 = z * z
        den = 1.0 + z2 / n
        c = (p + z2 / (2.0 * n)) / den
        h = (z * math.sqrt(p * (1.0 - p) / n
                           + z2 / (4.0 * (n * n)))) / den
        return c - h, c + h

    for i, k, n in rows:
        if n == 0 or k < 0 or k > n:
            assert got[i] == (None, None)
            continue
        rl, rh = ref(k, n)
        assert got[i] == (rl, rh), i
        assert rl <= k / n <= rh
    # interval tightens as n grows at fixed p
    w10 = got[1][1] - got[1][0]
    w100 = got[2][1] - got[2][0]
    w1000 = got[3][1] - got[3][0]
    assert w10 > w100 > w1000
    # degenerate proportions stay inside [0, 1]
    assert got[4][0] >= 0.0 and got[5][1] <= 1.0


def test_seasonal_backtest_hand_computed(spark):
    """Planted periodic series: period-4 sawtooth with a +0.5
    drift on the held-out points — seasonal errors are exactly the
    drift, naive-1 errors the step size; a second series shorter
    than the season skips all its test points; MASE < 1 verdict
    reproduced by hand."""
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    rows = []
    # s1: 12 points of pattern [10, 20, 30, 40], then the test
    # window (last 2 points) carries +0.5 vs one season earlier
    base = [10.0, 20.0, 30.0, 40.0] * 3
    base[-1] += 0.5
    base[-2] += 0.5
    rows += [("s1", i, v) for i, v in enumerate(base)]
    rows += [("tiny", i, float(i)) for i in range(3)]  # < season
    df = arrow_df(spark, rows, "series string, ts long, val double")
    got = {r["series"]: (r["n_test"], r["n_skipped"],
                         r["sae_seasonal"], r["sae_naive"]) for r in
           TSO.seasonal_backtest(df, season=4, horizon=2,
                                 scale=1000).collect()}
    # test points: vals 30.5 (vs slag 30 -> 0.5; nlag 20 -> 10.5)
    #              40.5 (vs slag 40 -> 0.5; nlag 30.5 -> 10.0)
    assert got["s1"] == (2, 0, 1000, 20500), got
    assert got["tiny"] == (0, 2, 0, 0), got


def test_seasonal_backtest_rejects_leaky_horizon(spark):
    """horizon > season means the seasonal lag reads held-out
    actuals — the geometry raises instead of flattering the
    score."""
    import pytest

    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import timeseries as TSO

    df = arrow_df(spark, [("s", i, float(i)) for i in range(20)],
                  "series string, ts long, val double")
    with pytest.raises(ValueError, match="horizon.*must be <="):
        TSO.seasonal_backtest(df, season=4, horizon=8)
