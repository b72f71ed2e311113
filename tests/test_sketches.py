"""HLL sketches (operators/sketches.py): estimate accuracy against
exact distincts across cardinality regimes, merge semantics
(associative, idempotent, equal to one-shot), and null handling."""

from __future__ import annotations

from pyspark.sql import functions as F

from siridb_server_spark.operators import sketches as SK


def _regs_of_range(spark, n, key="k"):
    df = spark.range(n).select(
        F.lit(key).alias("key"),
        F.concat(F.lit("member-"), F.col("id")).alias("m"))
    return SK.hll_registers(df, "key", "m")


def test_estimate_accuracy_small_and_large(spark):
    # linear-counting regime (n << m) and the raw regime (n >> m)
    for n, tol in ((300, 0.05), (5_000, 0.05), (120_000, 0.05)):
        regs = _regs_of_range(spark, n)
        est = SK.hll_estimate(regs, "key").first()["estimate"]
        assert abs(est - n) / n < tol, (n, est)


def test_merge_equals_one_shot_and_is_idempotent(spark):
    df = spark.range(20_000).select(
        (F.col("id") % 5).cast("string").alias("key"),
        F.concat(F.lit("u"), (F.col("id") % 7_777)).alias("m"),
        (F.col("id") % 13).alias("part"))
    direct = SK.hll_registers(df, "key", "m")
    parts = SK.hll_registers(df, ["key", "part"], "m")
    merged = SK.hll_merge(parts, "key")
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0
    # merging a merged table with itself changes nothing
    again = SK.hll_merge(merged.unionByName(merged), "key")
    assert again.exceptAll(merged).count() == 0
    assert merged.exceptAll(again).count() == 0


def test_registers_bounded_and_null_members_skipped(spark):
    from siridb_server_spark.localdf import arrow_df
    df = arrow_df(spark, [("a", "x"), ("a", "y"), ("a", None),
                          ("b", None)],
                  "key string, m string")
    regs = SK.hll_registers(df, "key", "m").collect()
    assert all(r["key"] == "a" for r in regs)     # b: only nulls
    assert all(0 <= r["bucket"] < SK.M for r in regs)
    assert all(1 <= r["rho"] <= SK.RHO_MAX for r in regs)


def test_union_estimate_via_merge(spark):
    # sketch(A) merged with sketch(B) estimates |A ∪ B|
    a = spark.range(4_000).select(
        F.lit("k").alias("key"),
        F.concat(F.lit("m"), F.col("id")).alias("m"))
    b = spark.range(2_000, 6_000).select(
        F.lit("k").alias("key"),
        F.concat(F.lit("m"), F.col("id")).alias("m"))
    merged = SK.hll_merge(
        SK.hll_registers(a, "key", "m")
        .unionByName(SK.hll_registers(b, "key", "m")), "key")
    est = SK.hll_estimate(merged, "key").first()["estimate"]
    assert abs(est - 6_000) / 6_000 < 0.05


def test_kmv_estimate_and_exact_small(spark):
    for n, tol in ((100, 0.0), (50_000, 0.15)):
        df = spark.range(n).select(
            F.lit("k").alias("key"),
            F.concat(F.lit("m"), F.col("id")).alias("m"))
        sk = SK.kmv_sketch(df, "key", "m")
        est = SK.kmv_estimate(sk, "key").first()
        if n <= SK.KMV_K:
            assert est["estimate"] == float(n)   # exact below k
        else:
            assert abs(est["estimate"] - n) / n < tol


def test_kmv_merge_exactness_and_idempotence(spark):
    df = spark.range(30_000).select(
        (F.col("id") % 3).cast("string").alias("key"),
        F.concat(F.lit("u"), (F.col("id") % 9_999)).alias("m"),
        (F.col("id") % 11).alias("part"))
    direct = SK.kmv_sketch(df, "key", "m")
    merged = SK.kmv_merge(
        SK.kmv_sketch(df, ["key", "part"], "m"), "key")
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0
    again = SK.kmv_merge(merged.unionByName(merged), "key")
    assert again.exceptAll(merged).count() == 0


def test_kmv_jaccard_overlap_estimate(spark):
    # |A|=6000, |B|=6000, |A∩B|=3000 → J = 3000/9000 = 1/3
    a = spark.range(6_000).select(
        F.lit("a").alias("key"),
        F.concat(F.lit("m"), F.col("id")).alias("m"))
    b = spark.range(3_000, 9_000).select(
        F.lit("b").alias("key"),
        F.concat(F.lit("m"), F.col("id")).alias("m"))
    ska = SK.kmv_sketch(a, "key", "m")
    skb = SK.kmv_sketch(b, "key", "m")
    j = SK.kmv_jaccard(ska, skb)
    assert abs(j - 1 / 3) < 0.1
    # disjoint sets estimate ~0
    c = spark.range(50_000, 56_000).select(
        F.lit("c").alias("key"),
        F.concat(F.lit("m"), F.col("id")).alias("m"))
    assert SK.kmv_jaccard(ska, SK.kmv_sketch(c, "key", "m")) < 0.02


def test_stream_sketch_ingest_matches_one_shot(spark, tmp_path):
    """Live sketch maintenance (streaming/corpus.py
    stream_sketch_ingest): after the stream drains, the folded
    per-batch deltas equal a one-shot build over everything seen —
    and redelivering a batch id (crash before the done marker)
    changes nothing."""
    import os

    from pyspark.sql import functions as FF

    from siridb_server_spark.streaming.corpus import (
        make_sketch_ingest_sink, read_quantile_sketch,
        read_sketches, stream_sketch_ingest)

    src = tmp_path / "src"
    src.mkdir()
    spath = str(tmp_path / "sk")

    def rows(lo, hi):
        return spark.range(lo, hi).select(
            (FF.col("id") % 3).cast("string").alias("key"),
            FF.concat(FF.lit("u"), FF.col("id") % 500).alias("m"),
            FF.col("id").alias("rid"),
            (FF.col("id") % 97).cast("double").alias("v"))

    def feed(name, lo, hi):
        rows(lo, hi).write.parquet(str(src / name))

    feed("b1", 0, 900)
    stream = (spark.readStream
              .schema("key string, m string, rid long, v double")
              .option("maxFilesPerTrigger", "4")
              .parquet(str(src) + "/*"))
    q = stream_sketch_ingest(stream, spath, "key", "m",
                             checkpoint=str(tmp_path / "ckpt"),
                             value_col="v", id_col="rid")
    try:
        q.processAllAvailable()
        feed("b2", 900, 2_000)
        q.processAllAvailable()
    finally:
        q.stop()

    hll, kmv = read_sketches(spark, spath, "key")
    qsk = read_quantile_sketch(spark, spath, "key")
    everything = rows(0, 2_000)
    dh = SK.hll_registers(everything, "key", "m")
    dk = SK.kmv_sketch(everything, "key", "m")
    dq = SK.quantile_sketch(everything, "key", "v", "rid")
    assert hll.exceptAll(dh).count() == 0
    assert dh.exceptAll(hll).count() == 0
    assert kmv.exceptAll(dk).count() == 0
    assert dk.exceptAll(kmv).count() == 0
    assert qsk.exceptAll(dq).count() == 0
    assert dq.exceptAll(qsk).count() == 0

    # crash-window redelivery: drop a done marker and re-apply rows
    # from the same feed (foreachBatch redelivers the same rows; a
    # superset of the batch keeps every hash a true member). The
    # replaced delta + idempotent merge must leave the folded
    # sketches EQUAL to the one-shot build — nothing double-counts.
    markers = [f for f in os.listdir(spath)
               if f.endswith(".done")]
    assert markers
    os.remove(os.path.join(spath, markers[0]))
    bid = int(markers[0].split("-")[1].split(".")[0])
    sink = make_sketch_ingest_sink(spath, "key", "m",
                                   value_col="v", id_col="rid")
    sink(everything, bid)
    hll2, kmv2 = read_sketches(spark, spath, "key")
    qsk2 = read_quantile_sketch(spark, spath, "key")
    assert hll2.exceptAll(dh).count() == 0
    assert dh.exceptAll(hll2).count() == 0
    assert kmv2.exceptAll(dk).count() == 0
    assert dk.exceptAll(kmv2).count() == 0
    assert qsk2.exceptAll(dq).count() == 0
    assert dq.exceptAll(qsk2).count() == 0


# ------------------------------------------------- quantile sketch

def _qdata(spark, n=20_000, keys=4):
    # values: a per-key affine ramp — known exact quantiles
    return spark.range(n).select(
        (F.col("id") % keys).cast("string").alias("key"),
        F.col("id").alias("rid"),
        (F.col("id") / F.lit(float(n))).alias("v"))


def test_quantile_sketch_bounded_and_sample_uniform(spark):
    sk = SK.quantile_sketch(_qdata(spark), "key", "v", "rid")
    rows = sk.collect()
    per = {}
    for r in rows:
        per.setdefault(r["key"], []).append(r)
    for key, rs in per.items():
        assert len(rs) == SK.QSK_K
        assert sorted(r["pos"] for r in rs) == list(
            range(1, SK.QSK_K + 1))
        # priority order: pos increases with pri
        byp = sorted(rs, key=lambda r: r["pos"])
        assert all(a["pri"] <= b["pri"]
                   for a, b in zip(byp, byp[1:]))


def test_quantile_merge_exact_and_idempotent(spark):
    df = _qdata(spark).withColumn("part", F.col("rid") % 9)
    direct = SK.quantile_sketch(df, "key", "v", "rid")
    parts = SK.quantile_sketch(df, ["key", "part"], "v", "rid")
    merged = SK.quantile_merge(parts, "key")
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0
    again = SK.quantile_merge(merged.unionByName(merged), "key")
    assert again.exceptAll(merged).count() == 0
    assert merged.exceptAll(again).count() == 0


def test_quantile_estimate_rank_error_within_theory(spark):
    # uniform ramp per key: true q-quantile value ≈ q, so the
    # estimate's population rank error obeys the sampling bound
    # |rank − q·n| ≲ 4·n·√(q(1−q)/k) (4 sd — deterministic here,
    # the md5 sample is fixed)
    n, keys = 20_000, 4
    per_key = n // keys
    sk = SK.quantile_sketch(_qdata(spark, n, keys), "key", "v",
                            "rid")
    est = SK.quantile_estimate(
        sk, "key", [100000, 500000, 900000, 990000]).collect()
    assert len(est) == keys * 4
    for r in est:
        q = r["q_ppm"] / 1e6
        assert r["sample_n"] == SK.QSK_K
        # ramp: rank of value v within a key ≈ v·per_key
        rank = r["est"] * per_key
        bound = 4 * per_key * (q * (1 - q) / SK.QSK_K) ** 0.5
        assert abs(rank - q * per_key) <= bound + 1, (r, rank)


def test_quantile_estimate_exact_when_sample_is_everything(spark):
    # fewer rows than k: the sketch holds the whole population and
    # the ceil-rank order statistic IS the exact lower quantile
    df = spark.range(100).select(
        F.lit("k").alias("key"), F.col("id").alias("rid"),
        F.col("id").cast("double").alias("v"))
    sk = SK.quantile_sketch(df, "key", "v", "rid")
    est = {r["q_ppm"]: r for r in SK.quantile_estimate(
        sk, "key", [500000, 990000, 1000000]).collect()}
    assert est[500000]["sample_n"] == 100
    assert est[500000]["est"] == 49.0   # ceil(.5·100) = 50th of 0..99
    assert est[990000]["est"] == 98.0
    assert est[1000000]["est"] == 99.0


def test_quantile_sketch_skips_null_values(spark):
    from siridb_server_spark.localdf import arrow_df
    df = arrow_df(spark, [("a", 1, 5.0), ("a", 2, None),
                          ("b", 3, None)],
                  "key string, rid long, v double")
    rows = SK.quantile_sketch(df, "key", "v", "rid").collect()
    assert [(r["key"], r["val"]) for r in rows] == [("a", 5.0)]


def test_quantile_filter_gates_per_group(spark):
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.operators import curation as CU
    # group "a": ramp 0..999 — p5/p95 cut the tails; group "b":
    # constant value — everything kept
    rows = [( "a", i, float(i)) for i in range(1000)] + \
           [("b", 10_000 + i, 7.0) for i in range(50)]
    df = arrow_df(spark, rows, "src string, rid long, v double")
    out = CU.quantile_filter(df, "v", "rid", "src",
                             lo_ppm=50000, hi_ppm=950000)
    rows = out.collect()
    assert len(rows) == 1050
    a = [r for r in rows if r["src"] == "a"]
    b = [r for r in rows if r["src"] == "b"]
    assert all(r["keep"] for r in b)
    lo = a[0]["lo"]; hi = a[0]["hi"]
    # sketch thresholds approximate the true p5/p95 of 0..999
    assert 0 < lo < 150 and 850 < hi < 999
    kept = [r for r in a if r["keep"]]
    assert all(lo <= r["value"] <= hi for r in kept)
    dropped = [r for r in a if not r["keep"]]
    assert all(r["value"] < lo or r["value"] > hi for r in dropped)


def test_quantile_prefilter_equals_unfiltered(spark):
    from siridb_server_spark.localdf import arrow_df
    # the threshold pre-filter must be invisible in the output —
    # exact bottom-k either way (5000 rows/key > PREF_MULT·k = 2048,
    # so the real thr < MAX branch is exercised)
    df = _qdata(spark, n=20_000, keys=4)
    fast = SK.quantile_sketch(df, "key", "v", "rid",
                              prefilter=True)
    slow = SK.quantile_sketch(df, "key", "v", "rid",
                              prefilter=False)
    assert fast.exceptAll(slow).count() == 0
    assert slow.exceptAll(fast).count() == 0
    # small keys (n <= 8k) take the keep-all threshold branch
    small = arrow_df(spark, [("s", i, float(i)) for i in range(40)],
                     "key string, rid long, v double")
    f2 = SK.quantile_sketch(small, "key", "v", "rid")
    assert f2.count() == 40


def test_sketch_collect_cap_lazy_path_identical(spark, monkeypatch):
    # above SKETCH_COLLECT_CAP_ROWS the build must stay LAZY (no
    # driver collect of the sketch) and still return the identical
    # exact bottom-k — force the gate with a tiny cap and diff the
    # two paths on the same data
    from siridb_server_spark.localdf import arrow_df

    df = _qdata(spark, n=20_000, keys=4)
    eager_q = SK.quantile_sketch(df, "key", "v", "rid")
    kdf = spark.range(20_000).select(
        (F.col("id") % 3).cast("string").alias("key"),
        F.concat(F.lit("m"), F.col("id") % 9_000).alias("m"))
    eager_k = SK.kmv_sketch(kdf, "key", "m")
    monkeypatch.setattr(SK, "SKETCH_COLLECT_CAP_ROWS", 1)
    lazy_q = SK.quantile_sketch(df, "key", "v", "rid")
    lazy_k = SK.kmv_sketch(kdf, "key", "m")
    # the gated path returns the lazy rank plan (its window is still
    # in the plan), not a collected local relation
    assert "indow" in lazy_q._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert "indow" not in eager_q._jdf.queryExecution() \
        .optimizedPlan().toString()
    for a, b in ((eager_q, lazy_q), (eager_k, lazy_k)):
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0


def test_quantile_sketch_differential_random_frames(spark, tmp_path):
    """Differential check on RANDOM data (the fixed-corpus oracle
    gate can miss data-dependent divergence): random frames with
    adversarial doubles (±0.0, ±inf, NaN, denormals, ties) must
    produce byte-identical sketches and estimates in Spark and
    DuckDB. Deterministic seed — failures reproduce."""
    import math
    import random

    import duckdb

    rng = random.Random(0xC0FFEE)
    special = [0.0, -0.0, float("inf"), float("-inf"),
               float("nan"), 5e-324, -5e-324, 1e308, 27.0]

    def rand_rows(n):
        rows = []
        for i in range(n):
            r = rng.random()
            v = (rng.choice(special) if r < 0.3
                 else rng.uniform(-1e6, 1e6) if r < 0.9
                 else float(rng.randint(-5, 5)))  # ties
            rows.append((str(rng.randint(0, 2)), i, v))
        return rows

    qsk_sql = (
        "WITH s AS (SELECT DISTINCT key, val,"
        " CAST(('0x' || substr(md5(CAST(rid AS VARCHAR)), 1, 15))"
        " AS BIGINT) AS pri FROM t WHERE val IS NOT NULL"
        " AND rid IS NOT NULL),"
        " r AS (SELECT key, pri, val, row_number() OVER"
        " (PARTITION BY key ORDER BY pri, val) AS pos FROM s)"
        " SELECT key, CAST(pos AS INT) AS pos, pri, val FROM r"
        " WHERE pos <= 256")

    def norm(v):
        if isinstance(v, float) and math.isnan(v):
            return "nan"
        return v

    for trial in range(5):
        rows = rand_rows(400)
        df = spark.createDataFrame(rows,
                                   "key string, rid long, val double")
        got = sorted(tuple(norm(c) for c in r) for r in
                     SK.quantile_sketch(df, "key", "val", "rid")
                     .collect())
        pq = str(tmp_path / f"t{trial}.parquet")
        df.coalesce(1).write.mode("overwrite").parquet(pq)
        con = duckdb.connect()
        con.sql(f"CREATE VIEW t AS SELECT * FROM '{pq}/*.parquet'")
        want = sorted(tuple(norm(c) for c in r) for r in
                      con.sql(qsk_sql).fetchall())
        assert got == want, f"trial {trial}"


def test_quantile_build_and_merge_agree_on_duplicate_rows(spark):
    from siridb_server_spark.localdf import arrow_df
    # duplicate (id, value) rows — redelivered copies: the build's
    # distinct and the merge's distinct must land on the SAME sample
    rows = [("k", i, float(i % 13)) for i in range(600)]
    rows += rows[:200]                     # 200 duplicated rows
    df = arrow_df(spark, rows, "key string, rid long, v double") \
        .withColumn("part", F.col("rid") % 5)
    direct = SK.quantile_sketch(df, "key", "v", "rid")
    merged = SK.quantile_merge(
        SK.quantile_sketch(df, ["key", "part"], "v", "rid"), "key")
    assert direct.exceptAll(merged).count() == 0
    assert merged.exceptAll(direct).count() == 0
    # and NULL ids are excluded, not ranked first
    df2 = arrow_df(spark, [("k", None, 1.0), ("k", 7, 2.0)],
                   "key string, rid long, v double")
    got = SK.quantile_sketch(df2, "key", "v", "rid").collect()
    assert [(r["pos"], r["val"]) for r in got] == [(1, 2.0)]


def test_streaming_quantiles_nan_matches_batch(spark, tmp_path):
    """NaN values must not corrupt the streaming tracker's order
    statistics (Python tuple sort mis-orders NaN): the emitted
    quantiles still equal the batch estimator, which sorts NaN
    last like Spark/DuckDB."""
    from pyspark.sql import functions as FF

    from siridb_server_spark.operators import sketches as SKM
    from siridb_server_spark.streaming import stateful as ST

    src = tmp_path / "in"
    src.mkdir()
    rows = [("k", i, float(i)) for i in range(50)]
    rows += [("k", 1000 + i, float("nan")) for i in range(5)]
    spark.createDataFrame(rows, "key string, id long, value double") \
        .coalesce(1).write.parquet(str(src / "b1"))
    out = str(tmp_path / "out")

    def sink(bdf, bid):
        bdf.withColumn("bid", FF.lit(bid)) \
            .write.mode("append").parquet(out)

    stream = spark.readStream \
        .schema("key string, id long, value double") \
        .parquet(str(src) + "/*")
    q = (ST.streaming_quantiles(stream, key_col="key",
                                value_col="value", id_col="id")
         .writeStream.foreachBatch(sink).outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    last = spark.read.parquet(out).orderBy("bid").collect()[-1]

    batch = spark.createDataFrame(
        rows, "key string, id long, value double")
    sk = SKM.quantile_sketch(batch, "key", "value", "id")
    est = {r["q_ppm"]: r["est"] for r in SKM.quantile_estimate(
        sk, "key", [500000, 900000, 990000]).collect()}
    import math

    def norm(v):
        # the stream's pandas/Arrow boundary surfaces a NaN order
        # statistic as NULL (documented in streaming_quantiles);
        # the batch estimator returns NaN — treat as equivalent
        return "nan" if v is None or (
            isinstance(v, float) and math.isnan(v)) else v

    assert last["sample_n"] == 55
    assert norm(last["p50"]) == norm(est[500000])
    assert norm(last["p90"]) == norm(est[900000])
    assert norm(last["p99"]) == norm(est[990000]) == "nan"


def test_streaming_quantiles_null_ids_match_batch(spark, tmp_path):
    """NULL-id rows must be dropped by the stream exactly like the
    batch quantile_sketch drops them — not crash the stateful
    worker on int(NaN) when the NULL priority crosses the Arrow
    boundary."""
    from pyspark.sql import functions as FF

    from siridb_server_spark.operators import sketches as SKM
    from siridb_server_spark.streaming import stateful as ST

    src = tmp_path / "in"
    src.mkdir()
    rows = [("k", i, float(i)) for i in range(40)]
    rows += [("k", None, 1e9), ("k", None, -1e9), ("j", None, 5.0)]
    spark.createDataFrame(rows, "key string, id long, value double") \
        .coalesce(1).write.parquet(str(src / "b1"))
    out = str(tmp_path / "out")

    def sink(bdf, bid):
        bdf.withColumn("bid", FF.lit(bid)) \
            .write.mode("append").parquet(out)

    stream = spark.readStream \
        .schema("key string, id long, value double") \
        .parquet(str(src) + "/*")
    q = (ST.streaming_quantiles(stream, key_col="key",
                                value_col="value", id_col="id")
         .writeStream.foreachBatch(sink).outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out).collect()
    # key "j" has ONLY a NULL-id row -> no state, no output row
    assert sorted(r["key"] for r in got) == ["k"]
    last = got[0]

    batch = spark.createDataFrame(
        rows, "key string, id long, value double")
    sk = SKM.quantile_sketch(batch, "key", "value", "id")
    est = {r["q_ppm"]: r["est"] for r in SKM.quantile_estimate(
        sk, "key", [500000, 900000, 990000]).collect()}
    assert last["sample_n"] == 40
    assert last["p50"] == est[500000]
    assert last["p90"] == est[900000]
    assert last["p99"] == est[990000]


def test_compact_sketches_preserves_folds_and_survives_crash(
        spark, tmp_path):
    """Compaction folds per-batch deltas into one negative-id base
    without changing any reader result, and a crash between the
    base rename and the delta cleanup (consumed dirs left behind)
    re-folds harmlessly — every family's merge is idempotent."""
    import os
    import shutil

    from pyspark.sql import functions as FF

    from siridb_server_spark.streaming.corpus import (
        compact_sketches, make_sketch_ingest_sink,
        read_quantile_sketch, read_sketches)

    spath = str(tmp_path / "sk")
    sink = make_sketch_ingest_sink(spath, "key", "m",
                                   value_col="v", id_col="rid")

    def rows(lo, hi):
        return spark.range(lo, hi).select(
            (FF.col("id") % 3).cast("string").alias("key"),
            FF.concat(FF.lit("u"), FF.col("id") % 400).alias("m"),
            FF.col("id").alias("rid"),
            (FF.col("id") % 89).cast("double").alias("v"))

    for bid, (lo, hi) in enumerate([(0, 500), (500, 900),
                                    (900, 1500)]):
        sink(rows(lo, hi), bid)

    before = [sorted(map(tuple, f.collect())) for f in
              (*read_sketches(spark, spath, "key"),
               read_quantile_sketch(spark, spath, "key"))]
    folded = compact_sketches(spark, spath, "key")
    assert folded == {"hll": 3, "kmv": 3, "quantile": 3}
    assert os.listdir(os.path.join(spath, "hll")) == ["batch=-1"]
    after = [sorted(map(tuple, f.collect())) for f in
             (*read_sketches(spark, spath, "key"),
              read_quantile_sketch(spark, spath, "key"))]
    assert after == before

    # crash window: base written+renamed but one consumed delta
    # survived — simulate by feeding a NEW batch then duplicating
    # the base next to it before compacting again
    sink(rows(1500, 1800), 3)
    hll_dir = os.path.join(spath, "hll")
    shutil.copytree(os.path.join(hll_dir, "batch=-1"),
                    os.path.join(hll_dir, "batch=7"))  # stale dup
    folded2 = compact_sketches(spark, spath, "key")
    assert folded2["hll"] == 3          # -1, 3, and the stale 7
    want_hll = sorted(map(tuple, read_sketches(
        spark, spath, "key")[0].collect()))
    one_shot = sorted(map(tuple, SK.hll_registers(
        rows(0, 1800), "key", "m").collect()))
    assert want_hll == one_shot


def test_bloom_no_false_negatives_and_merge(spark):
    """Bloom invariants on planted members: every built member
    probes true (NO false negatives — the theorem), non-members
    probe mostly false at a generous m, the sketch merges by plain
    union-distinct (bits(A ∪ B) == merge(bits A, bits B)), and
    NULL members are excluded on both sides."""
    a = spark.createDataFrame(
        [(f"member-{i}",) for i in range(200)] + [(None,)],
        "m string")
    b = spark.createDataFrame(
        [(f"member-{i}",) for i in range(150, 400)], "m string")
    other = spark.createDataFrame(
        [(f"absent-{i}",) for i in range(300)] + [(None,)],
        "m string")
    M, K = 1 << 20, 4

    bloom_a = SK.bloom_bits(a, [], "m", m_bits=M, k=K)
    # no false negatives, NULL row dropped
    mc = SK.bloom_might_contain(a, bloom_a, "m", m_bits=M, k=K)
    got = mc.collect()
    assert len(got) == 200 and all(r["might_contain"] for r in got)
    # at m=2^20 with n=200 the FP rate is ~0 — non-members all miss
    miss = SK.bloom_might_contain(other, bloom_a, "m",
                                  m_bits=M, k=K)
    rows = miss.collect()
    assert len(rows) == 300
    assert sum(r["might_contain"] for r in rows) == 0
    # merge == one-shot over the union
    bloom_b = SK.bloom_bits(b, [], "m", m_bits=M, k=K)
    merged = sorted(r["bit"] for r in SK.bloom_merge(
        bloom_a.unionByName(bloom_b), []).collect())
    one_shot = sorted(r["bit"] for r in SK.bloom_bits(
        a.unionByName(b), [], "m", m_bits=M, k=K).collect())
    assert merged == one_shot
    # shuffled-join probe path agrees with the broadcast path
    flat = sorted(map(tuple, SK.bloom_might_contain(
        other.unionByName(a), bloom_a, "m", m_bits=M, k=K,
        broadcast_bloom=False).collect()))
    bc = sorted(map(tuple, SK.bloom_might_contain(
        other.unionByName(a), bloom_a, "m", m_bits=M, k=K)
        .collect()))
    assert flat == bc


def test_bloom_keyed_and_validation(spark):
    """Keyed sketches stay independent per key (a member of key x
    must not probe true under key y unless it collides), and the
    geometry guards reject k outside one md5 digest / degenerate
    m."""
    import pytest

    df = spark.createDataFrame(
        [("x", "alpha"), ("x", "beta"), ("y", "gamma")],
        "k string, m string")
    bloom = SK.bloom_bits(df, ["k"], "m", m_bits=1 << 20, k=4)
    probe = spark.createDataFrame(
        [("x", "alpha"), ("y", "alpha"), ("y", "gamma")],
        "k string, m string")
    got = {(r["k"], r["m"]): r["might_contain"] for r in
           SK.bloom_might_contain(probe, bloom, "m",
                                  m_bits=1 << 20, k=4,
                                  key_cols=["k"]).collect()}
    assert got == {("x", "alpha"): True, ("y", "alpha"): False,
                   ("y", "gamma"): True}
    with pytest.raises(ValueError, match=r"k must be in \[1, 4\]"):
        SK.bloom_bits(df, [], "m", k=5)
    with pytest.raises(ValueError, match="m_bits"):
        SK.bloom_bits(df, [], "m", m_bits=1)
