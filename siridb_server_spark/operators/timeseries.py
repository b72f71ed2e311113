"""Time-series operators beyond the SiriDB surface: grid resampling
with linear interpolation, inactivity-gap sessionization, and
monotonic-counter rates with reset handling.

All are single-shuffle window algebra — hash partition on the
series/entity key, one per-partition sort, then row-local math. No
Python, no self-joins, no driver loops; the shapes scale linearly and
AQE handles residual skew. (Interpolation's grid explode multiplies
rows by ~gap/step, the same factor any gap-filling engine pays.)
The one exception is :func:`ewma`, whose per-series recursion no
window frame can express — it uses an Arrow-batched applyInPandas
over the same single series-key shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_interpolate(df: DataFrame, step: int,
                         key_col: str = "series",
                         ts_col: str = "ts",
                         val_col: str = "val",
                         est_bytes: int | None = None) -> DataFrame:
    """Resample each series onto the regular ``step`` grid, linearly
    interpolating between the neighbouring observed points (gap
    filling). Grid points are the multiples of ``step`` inside each
    adjacent observed pair ``(t0, t1]``, plus a series' first point
    when it lands exactly on the grid — i.e. every multiple of step
    in ``[min_ts, max_ts]`` per series.

    One lead() window per series then a row-local ``sequence`` +
    explode — no joins. Output: (key, ts, val) with val =
    v0 + (v1-v0)·(t-t0)/(t1-t0), 6 decimals."""
    from ..localdf import fan_out_keyed

    # the explode multiplies rows ~gap/step AFTER the window's
    # shuffle, so that shuffle must be sized for the EXPANDED
    # output: on a provably-small input (where AQE would coalesce
    # it to 1-2 tasks) pin it at core count — same single exchange,
    # no-op on any realistic input (see fan_out_keyed; callers
    # that know their source size pass est_bytes to skip the
    # gate's optimizer-stats fallback)
    df = fan_out_keyed(df, key_col, est_bytes=est_bytes)
    w = Window.partitionBy(key_col).orderBy(ts_col)
    nxt_t = F.lead(ts_col).over(w)
    nxt_v = F.lead(val_col).over(w)
    # grid points in (t0, t1]: first multiple of step STRICTLY after
    # t0, through the last at-or-before t1. Modulo arithmetic, not
    # floor(ts/step): long/int division goes through double, which
    # is lossy past 2^53 — ns-epoch timestamps are ~1.7e18
    g0 = F.col(ts_col) - F.col(ts_col) % step + step
    g1 = F.col("__t1") - F.col("__t1") % step
    first_on_grid = (F.col(ts_col) % step == 0) & \
        F.row_number().over(w).eqNullSafe(1)
    pairs = (df.select(
        F.col(key_col).alias("key"), F.col(ts_col),
        F.col(val_col).cast("double").alias("v0"),
        nxt_t.alias("__t1"), nxt_v.cast("double").alias("__v1"),
        first_on_grid.alias("__first")))
    grid = F.when(
        F.col("__t1").isNotNull() & (g1 >= g0),
        F.sequence(g0, g1, F.lit(step))).otherwise(
        F.array().cast("array<bigint>"))
    # exact-hit starts contribute themselves (the sequence above is
    # strictly-after t0, so a first point on the grid is added here)
    grid = F.when(F.col("__first"),
                  F.concat(F.array(F.col(ts_col)), grid)) \
        .otherwise(grid)
    interp = F.col("v0") + (F.col("__v1") - F.col("v0")) * \
        (F.col("g") - F.col(ts_col)) / (F.col("__t1") - F.col(ts_col))
    val = F.when(F.col("g") == F.col(ts_col), F.col("v0")) \
        .otherwise(interp)
    return (pairs
            .select("key", F.col(ts_col), "v0", "__t1", "__v1",
                    F.explode(grid).alias("g"))
            .select(F.col("key").alias(key_col),
                    F.col("g").alias(ts_col),
                    (F.round(val, 6) + F.lit(0.0)).alias(val_col)))


def sessionize(df: DataFrame, gap: int,
               key_col: str = "user_id", ts_col: str = "ts",
               seq_col: str | None = None) -> DataFrame:
    """Inactivity-gap sessionization: within each key, a new session
    starts when the time since the previous event exceeds ``gap``.
    ``seq_col`` breaks duplicate-timestamp ordering ties
    deterministically. Output: input columns + ``session_id``
    (1-based per key, in time order)."""
    order = [F.col(ts_col)] + \
        ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev.isNull() | (F.col(ts_col) - prev > gap), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_sess).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))


def counter_rate(df: DataFrame, scale: int = 1,
                 key_col: str = "series", ts_col: str = "ts",
                 val_col: str = "val") -> DataFrame:
    """Per-second (×``scale``) rate of a monotonic counter with reset
    handling: a value drop means the counter restarted, so the
    increase since the reset is the value itself (the standard
    Prometheus ``rate()`` treatment). First point per key has no
    rate. Output: (key, ts, rate), 6 decimals."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    pv = F.lag(val_col).over(w)
    pt = F.lag(ts_col).over(w)
    inc = F.when(F.col(val_col) >= pv, F.col(val_col) - pv) \
        .otherwise(F.col(val_col))
    rate = inc * F.lit(scale) / (F.col(ts_col) - pt)
    return (df.select(
        F.col(key_col), F.col(ts_col),
        (F.round(rate, 6) + F.lit(0.0)).alias("rate"))
        .where(F.col("rate").isNotNull()))


def moving_avg(df: DataFrame, window: int = 5,
               key_col: str = "series", ts_col: str = "ts",
               val_col: str = "val") -> DataFrame:
    """Trailing moving average over the previous ``window`` points
    (inclusive) per series — the standard smoothing pass before
    anomaly thresholds.

    One window over one hash shuffle on the series key; the frame is
    ROWS-based so duplicate timestamps don't change the math (the
    caller supplies deduped points). Output: (key, ts, avg), 6
    decimals."""
    w = (Window.partitionBy(key_col).orderBy(ts_col)
         .rowsBetween(-(window - 1), 0))
    return df.select(
        F.col(key_col), F.col(ts_col),
        (F.round(F.avg(F.col(val_col)).over(w), 6) + F.lit(0.0))
        .alias("avg"))


def uptime_report(df: DataFrame, heartbeat_ns: int,
                  key_col: str = "series",
                  ts_col: str = "ts") -> DataFrame:
    """Per-series availability from heartbeat timestamps: any
    inter-point gap beyond ``heartbeat_ns`` counts its excess as
    downtime; uptime fraction is 1 − downtime/span — the SRE
    answer ("was this emitter alive?") derived purely from
    arrival times, no status field needed.

    One lag window + one grouped aggregate over the same key
    exchange. Integer ns math until the final fraction. Series with
    a single point span zero time and report NULL uptime. Output:
    (key, n_points, span, max_gap, downtime, uptime_frac) — the
    fraction at 6 decimals."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    base = df.select(F.col(key_col), F.col(ts_col),
                     gap.alias("_gap"))
    agg = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        (F.max(ts_col) - F.min(ts_col)).alias("span"),
        F.max("_gap").alias("max_gap"),
        F.sum(F.when(F.col("_gap") > heartbeat_ns,
                     F.col("_gap") - F.lit(heartbeat_ns))
              .otherwise(F.lit(0))).alias("downtime"))
    up = F.lit(1.0) - F.try_divide(
        F.col("downtime").cast("double"),
        F.col("span").cast("double"))
    return agg.select(
        F.col(key_col), "n_points", "span", "max_gap", "downtime",
        (F.round(up, 6) + F.lit(0.0)).alias("uptime_frac"))


def bucket_pct_change(df: DataFrame, bucket_ns: int,
                      key_col: str = "series", ts_col: str = "ts",
                      val_col: str = "val") -> DataFrame:
    """Bucketed rollup with period-over-period change: per series,
    the value sum per ``bucket_ns`` window plus the absolute and
    percent change against the PREVIOUS existing bucket — the
    day-over-day / week-over-week report. Missing buckets are
    skipped, not zero-filled: the comparison is always against the
    last bucket that had data (resample first if calendar-adjacent
    semantics are needed).

    One counting/sum groupBy on (key, bucket), then a lag window
    over the same key partitioning — the exchange is reused. First
    bucket per series reports NULL change. Output: (key, bucket,
    total, change, pct_change), 6 decimals."""
    b = (F.col(ts_col) - F.col(ts_col) % F.lit(bucket_ns)) \
        .alias("bucket")
    agg = (df.groupBy(F.col(key_col), b)
           .agg(F.sum(val_col).alias("_tot")))
    w = Window.partitionBy(key_col).orderBy("bucket")
    prev = F.lag("_tot").over(w)
    return agg.select(
        F.col(key_col), "bucket",
        (F.round("_tot", 6) + F.lit(0.0)).alias("total"),
        (F.round(F.col("_tot") - prev, 6) + F.lit(0.0))
        .alias("change"),
        (F.round(F.try_divide(F.col("_tot") - prev, prev), 6)
         + F.lit(0.0)).alias("pct_change"))


def value_histogram(df: DataFrame, n_bins: int = 10,
                    key_col: str = "series",
                    val_col: str = "val") -> DataFrame:
    """Per-series fixed-bin value histogram over each series' own
    [min, max] range — the distribution summary behind latency
    heatmaps and drift dashboards, at O(|series|×bins) output no
    matter how many points feed it.

    Two passes sharing one key shuffle shape: a per-series min/max
    aggregate (|series| rows, broadcast back) and one counting
    groupBy on (key, bin) with map-side partial combine. The bin is
    ``min(n_bins−1, floor((v−vmin)/width))`` so the maximum lands in
    the last bin; a constant series collapses into bin 0. Output:
    (key, bin, n, lo, hi) — bin edges at 6 decimals."""
    rng = df.groupBy(key_col).agg(
        F.min(val_col).alias("_vmin"), F.max(val_col).alias("_vmax"))
    width = (F.col("_vmax") - F.col("_vmin")) / F.lit(float(n_bins))
    raw_bin = F.floor((F.col(val_col) - F.col("_vmin"))
                      / F.col("_width"))
    bin_ = F.when(F.col("_width") > 0,
                  F.least(F.lit(n_bins - 1).cast("long"), raw_bin)) \
        .otherwise(F.lit(0).cast("long"))
    lo = F.col("_vmin") + F.col("bin") * F.col("_width")
    hi = F.col("_vmin") + (F.col("bin") + 1) * F.col("_width")
    return (df.join(F.broadcast(rng), key_col)
            .withColumn("_width", width)
            .select(F.col(key_col), bin_.alias("bin"),
                    "_vmin", "_width")
            .groupBy(key_col, "bin", "_vmin", "_width")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col(key_col), "bin", "n",
                    (F.round(lo, 6) + F.lit(0.0)).alias("lo"),
                    (F.round(hi, 6) + F.lit(0.0)).alias("hi")))


def level_shifts(df: DataFrame, window: int = 10,
                 threshold: float = 3.0,
                 key_col: str = "series", ts_col: str = "ts",
                 val_col: str = "val") -> DataFrame:
    """Level-shift (changepoint) detection: at every position,
    compare the mean of the NEXT ``window`` points (current
    included) against the mean and sample-stddev of the PREVIOUS
    ``window``; ``|post−pre| > threshold·pre_std`` flags a step
    change — the regime shift a per-point z-score dilutes into many
    small anomalies and a seasonal baseline can't see at all.

    Two ROWS frames over ONE series-key window shuffle, all JVM —
    same plan family as moving_avg. Only positions with FULL
    windows on both sides and non-zero pre-variance can flag (no
    edge-effect false positives). Output: flagged rows only —
    (key, ts, pre_mean, post_mean, shift_z), 6 decimals."""
    w = Window.partitionBy(key_col).orderBy(ts_col)
    wpre = w.rowsBetween(-window, -1)
    wpost = w.rowsBetween(0, window - 1)
    v = F.col(val_col)
    pre_mean = F.avg(v).over(wpre)
    pre_std = F.stddev_samp(v).over(wpre)
    post_mean = F.avg(v).over(wpost)
    z = F.try_divide(post_mean - pre_mean, pre_std)
    return (df.select(
        F.col(key_col), F.col(ts_col),
        F.count(v).over(wpre).alias("_np"),
        F.count(v).over(wpost).alias("_nq"),
        pre_mean.alias("_pre"), pre_std.alias("_std"),
        post_mean.alias("_post"), z.alias("_z"))
        .where((F.col("_np") == window) & (F.col("_nq") == window)
               & (F.col("_std") > 0)
               & (F.abs(F.col("_z")) > threshold))
        .select(F.col(key_col), F.col(ts_col),
                (F.round("_pre", 6) + F.lit(0.0)).alias("pre_mean"),
                (F.round("_post", 6) + F.lit(0.0))
                .alias("post_mean"),
                (F.round("_z", 6) + F.lit(0.0)).alias("shift_z")))


def acf(df: DataFrame, lags: tuple = (1, 2, 3),
        key_col: str = "series", ts_col: str = "ts",
        val_col: str = "val") -> DataFrame:
    """Per-series sample autocorrelation at small lags — the
    "is this metric periodic/sticky or white" answer (an ACF near 1
    at lag 1 means momentum, alternating signs mean oscillation,
    ~0 means noise). r_k = Σ_{i>k}(v_i−v̄)(v_{i−k}−v̄) / Σ(v_i−v̄)².

    One hash shuffle: the per-series mean comes from a
    whole-partition window (reusing the same partitioning the lag
    windows need), deviations and their lags are row-local, and one
    groupBy folds the lag products. Series with zero variance or
    n ≤ k report NULL at that lag. Output: (key, n_points,
    acf_1..acf_k), 6 decimals."""
    w = Window.partitionBy(key_col)
    wo = w.orderBy(ts_col)
    dev = (F.col(val_col).cast("double")
           - F.avg(F.col(val_col).cast("double")).over(w))
    base = df.select(F.col(key_col), F.col(ts_col),
                     dev.alias("_d"))
    cols = [F.col(key_col), F.col("_d")]
    for k in lags:
        cols.append((F.col("_d")
                     * F.lag("_d", k).over(wo)).alias(f"_p{k}"))
    lagged = base.select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_points"),
            F.sum(F.col("_d") * F.col("_d")).alias("_ss")]
    for k in lags:
        aggs.append(F.sum(f"_p{k}").alias(f"_s{k}"))
    out = lagged.groupBy(key_col).agg(*aggs)
    sel = [F.col(key_col), F.col("n_points")]
    for k in lags:
        sel.append((F.round(F.col(f"_s{k}")
                            / F.when(F.col("_ss") != 0,
                                     F.col("_ss")), 6)
                    + F.lit(0.0)).alias(f"acf_{k}"))
    return out.select(*sel)


def linear_trend(df: DataFrame, key_col: str = "series",
                 ts_col: str = "ts",
                 val_col: str = "val") -> DataFrame:
    """Per-series ordinary-least-squares trend line: slope (per
    second), intercept at the series' first timestamp, and R² — the
    "is this metric drifting, and how fast" answer a single EWMA
    level can't give.

    Closed form from five sums over ONE hash shuffle: a
    whole-partition min re-bases time per series and the groupBy
    reuses the same partitioning; slope = cov(x,y)/var(x) with
    x = (ts − min_ts)/1e9 s. Time is re-based BEFORE squaring — ns
    epochs are ~1.7e18 and x² would otherwise burn double
    precision. Series with <2 points or zero time-variance report
    NULL slope. Output: (key, n_points, slope_per_s, intercept,
    r2), 6 decimals."""
    x = (F.col(ts_col) -
         F.min(ts_col).over(Window.partitionBy(key_col))) \
        / F.lit(1e9)
    base = df.select(F.col(key_col), x.alias("x"),
                     F.col(val_col).cast("double").alias("y"))
    agg = base.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    n = F.col("n_points")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = F.try_divide(cov, varx)
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = F.try_divide(cov * cov, varx * vary)
    return agg.select(
        F.col(key_col), "n_points",
        (F.round(slope, 6) + F.lit(0.0)).alias("slope_per_s"),
        (F.round(intercept, 6) + F.lit(0.0)).alias("intercept"),
        (F.round(r2, 6) + F.lit(0.0)).alias("r2"))


def funnel_steps(df: DataFrame, steps: list,
                 key_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered k-step funnel: per key, the earliest timestamp at
    which each step completes given every previous step completed
    STRICTLY earlier (view → click → purchase, in that order —
    a click before the first view doesn't count). The k=2 special
    case is the conversion funnel; this generalizes to any k.

    Shape: k chained whole-partition window minima over ONE hash
    shuffle on the key — every window and the final per-key collapse
    share the same partitioning, so Catalyst plans a single
    exchange; no self-joins and no per-step corpus passes. Output:
    one row per key with (t1..tk), NULL from the first broken step
    onward."""
    w = Window.partitionBy(key_col)
    out = df.select(key_col, ts_col, type_col)
    prev = None
    for i, s in enumerate(steps, 1):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) > F.col(prev))
        out = out.withColumn(
            f"t{i}", F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = f"t{i}"
    return out.groupBy(key_col).agg(*[
        F.min(f"t{i}").alias(f"t{i}")
        for i in range(1, len(steps) + 1)])


def robust_scale(df: DataFrame, key_col: str = "series",
                 val_col: str = "val") -> DataFrame:
    """Median/MAD per series: location = interpolated median, scale
    = median absolute deviation around it — the outlier-immune
    counterpart of mean/stddev for normalizing series before
    cross-series comparison (one glitch reading moves a stddev; it
    cannot move a MAD).

    ONE grouped pass: per-series sorted value array (collect_list —
    the same rows a percentile aggregate buffers, collected once
    instead of twice) and both medians read off it row-locally with
    the exact interpolation arithmetic ``F.percentile`` uses —
    t = (m−1)·p; (⌈t⌉−t)·a[⌊t⌋] + (t−⌊t⌋)·a[⌈t⌉] — so every float
    bit matches the two-pass shape (the r13 form re-computed the
    whole upstream plan for the deviation pass and paid two
    interpreted ObjectHashAggregate percentile walks). The
    deviation median binds its sorted array once (functions/bind
    let) — med is O(1) per reference but the deviation ARRAY is
    O(m log m) and med_of reads it three times.
    Output: (key, n_points, med, mad), 6 decimals."""
    from ..functions.bind import let

    def med_of(a):
        # F.percentile's interpolation, verbatim: skip-null count m,
        # target rank t=(m−1)/2 over the SORTED values, linear
        # interpolation between the two bracketing elements. IEEE
        # mult/add are operand-order commutative, so the products
        # and their sum reproduce the aggregate bit for bit.
        m = F.size(a)
        t = (m - 1).cast("double") * F.lit(0.5)
        lo = F.floor(t).cast("int")
        hi = F.ceil(t).cast("int")
        lov = F.element_at(a, lo + 1)
        hiv = F.element_at(a, hi + 1)
        return F.when(m == 0, F.lit(None).cast("double")) \
            .otherwise(F.when(lo == hi, lov).otherwise(
                (hi.cast("double") - t) * lov
                + (t - lo.cast("double")) * hiv))

    g = (df.groupBy(key_col)
         .agg(F.array_sort(F.collect_list(F.col(val_col)))
              .alias("_a"),
              F.count(F.lit(1)).alias("n_points"))
         .select(F.col(key_col), "n_points", "_a",
                 med_of(F.col("_a")).alias("_med")))
    mad = let(
        F.array_sort(F.transform(
            F.col("_a"), lambda x: F.abs(x - F.col("_med")))),
        med_of)
    return g.select(
        F.col(key_col), "n_points",
        (F.round("_med", 6) + F.lit(0.0)).alias("med"),
        (F.round(mad, 6) + F.lit(0.0)).alias("mad"))


def winsorize(df: DataFrame, lo: float = 0.05, hi: float = 0.95,
              key_col: str = "series", ts_col: str = "ts",
              val_col: str = "val") -> DataFrame:
    """Per-series winsorization: clip every value into its own
    series' [p(lo), p(hi)] interpolated-percentile band — the
    robust pre-normalization step that keeps one glitched sensor
    reading from dominating a downstream mean/scale fit.

    Two passes: a per-series percentile aggregate (|series| rows,
    map-side partial), broadcast back onto the point stream as a
    map-side join. All JVM. Output: (key, ts, val, clipped), 6
    decimals on the clipped value."""
    q = df.groupBy(key_col).agg(
        F.percentile(F.col(val_col), F.lit(lo)).alias("_qlo"),
        F.percentile(F.col(val_col), F.lit(hi)).alias("_qhi"))
    clipped = F.least(F.greatest(F.col(val_col), F.col("_qlo")),
                      F.col("_qhi"))
    return (df.join(F.broadcast(q), key_col)
            .select(F.col(key_col), F.col(ts_col),
                    F.col(val_col).alias("val"),
                    (F.round(clipped, 6) + F.lit(0.0))
                    .alias("clipped")))


def interval_coverage(df: DataFrame, length: int,
                      key_col: str = "user_id",
                      ts_col: str = "ts") -> DataFrame:
    """Union-of-intervals coverage per key: each event opens an
    activity interval ``[ts, ts+length)``; overlapping intervals
    merge, and the output is how much time each key was covered and
    in how many disjoint activity islands — "minutes active" from
    raw event timestamps, the quantity a naive count×length
    over-states wherever events overlap.

    Gap-and-island in one window pass: an interval starts a new
    island when its ts clears the running max of all previous ends
    (a window running-max — no self-join, no explode); islands then
    reduce with one grouped aggregate. All JVM, two hash shuffles on
    the key. Integer ns math throughout. Output:
    (key, n_islands, covered)."""
    w = (Window.partitionBy(key_col).orderBy(ts_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    prev_max_end = F.max(F.col(ts_col) + length).over(w)
    new_island = F.when(
        prev_max_end.isNull()
        | (F.col(ts_col) > prev_max_end), 1).otherwise(0)
    wi = (Window.partitionBy(key_col).orderBy(ts_col)
          .rowsBetween(Window.unboundedPreceding, 0))
    islands = (df.select(F.col(key_col), F.col(ts_col))
               .withColumn("island",
                           F.sum(new_island).over(wi))
               .groupBy(key_col, "island")
               .agg((F.max(F.col(ts_col) + length)
                     - F.min(F.col(ts_col))).alias("span")))
    return (islands.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_islands"),
                 F.sum("span").alias("covered")))


def seasonal_backtest(df: DataFrame, season: int = 24,
                      horizon: int = 8, scale: int = 1000,
                      key_col: str = "series", ts_col: str = "ts",
                      val_col: str = "val") -> DataFrame:
    """Seasonal-naive forecast BACKTEST per series — the evaluation
    a forecasting pipeline runs before trusting any model: hold out
    each series' last ``horizon`` points, "forecast" each held-out
    point with the actual value ``season`` points earlier
    (seasonal naive — the standard no-model baseline, row-indexed
    so irregular series work), score against the naive-1 baseline
    (the previous actual). The ratio sae_seasonal/sae_naive is
    MASE-style: < 1 means the seasonal structure is real and worth
    modeling; ≥ 1 means a model must beat plain persistence first.

    Integer contract (hashes cross-engine): absolute errors are
    scaled longs ``floor(|err|·scale + 0.5)`` summed per series —
    the subtraction is exact IEEE on both engines, floor/abs are
    exact, so no float leaves the operator. Held-out points
    missing either lag (a series shorter than season + its test
    window) are excluded and counted in ``n_skipped``.

    REQUIRES unique ``ts_col`` per series (pre-aggregate duplicate
    timestamps first — e.g. max per (series, ts) — or the lag
    windows are nondeterministic), and ``horizon ≤ season``: with
    a longer horizon the seasonal lag for the most recent test
    points lands INSIDE the held-out window — forecasting from
    hold-out actuals the gate must be blind to — so that geometry
    raises instead of silently flattering the seasonal score. One
    window family over (series, ts): single shuffle. Output:
    (series, n_test, n_skipped, sae_seasonal, sae_naive)."""
    if int(horizon) > int(season):
        raise ValueError(
            f"horizon ({horizon}) must be <= season ({season}): "
            "the seasonal lag would read held-out actuals")
    def sabs(c):
        return F.floor(F.abs(c) * F.lit(float(scale))
                       + F.lit(0.5)).cast("long")
    pts = (df.select(F.col(key_col).alias("series"),
                     F.col(ts_col).alias("_ts"),
                     F.col(val_col).alias("_v"))
           .withColumn("_rev", F.row_number().over(
               Window.partitionBy("series").orderBy(F.desc("_ts"))))
           .withColumn("_slag", F.lag("_v", int(season)).over(
               Window.partitionBy("series").orderBy(F.asc("_ts"))))
           .withColumn("_nlag", F.lag("_v", 1).over(
               Window.partitionBy("series").orderBy(F.asc("_ts")))))
    test = pts.where(F.col("_rev") <= int(horizon))
    ok = F.col("_slag").isNotNull() & F.col("_nlag").isNotNull()
    return (test.groupBy("series")
            .agg(F.sum(ok.cast("long")).alias("n_test"),
                 F.sum((~ok).cast("long")).alias("n_skipped"),
                 F.sum(F.when(ok, sabs(F.col("_v") - F.col("_slag")))
                       .otherwise(F.lit(0))).alias("sae_seasonal"),
                 F.sum(F.when(ok, sabs(F.col("_v") - F.col("_nlag")))
                       .otherwise(F.lit(0))).alias("sae_naive")))


def holt_linear(df: DataFrame, alpha: float = 0.25,
                beta: float = 0.125,
                key_col: str = "series", ts_col: str = "ts",
                val_col: str = "val",
                seq_col: str | None = None) -> DataFrame:
    """Holt double exponential smoothing (level + trend) per series —
    the forecasting step up from :func:`ewma`, which a trending
    series defeats (a plain EWMA lags a ramp forever).

    Initialization is pinned so every engine can replay it:
    ``l_1 = x_1, b_1 = NULL``; ``l_2 = x_2, b_2 = x_2 − x_1``; then
    ``l_t = α·x_t + (1−α)·(l + b)`` and
    ``b_t = β·(l_t − l) + (1−β)·b``. The defaults 0.25/0.125 have
    exactly-representable complements, so the same literals appear on
    both sides of the oracle contract and the folds are bit-identical
    (a recursive CTE replays them; see the ts_holt_forecast oracle).
    An h-step forecast is ``level + h·trend`` off the last row.

    Same scale shape as :func:`ewma`: hash repartition on the key +
    partition sort, then ONE mapInPandas scan; the coupled recursion
    runs as a per-row loop over the batch's numpy arrays with an
    O(series-per-partition) carry dict — no per-group pandas
    dispatch. Output: (key, ts, level, trend) per input point
    (trend NULL on a series' first point)."""
    import numpy as np
    import pandas as pd

    a, one_a = alpha, 1.0 - alpha
    bt, one_b = beta, 1.0 - beta
    key_tp = dict(df.dtypes)[key_col]   # keep the caller's key type
    out_schema = (f"{key_col} {key_tp}, {ts_col} long,"
                  " level double, trend double")

    def gen(batches):
        carry: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            keys = pdf[key_col].to_numpy()
            vals = pdf[val_col].to_numpy(dtype="float64")
            out_l = np.empty(len(vals))
            out_b = np.empty(len(vals))
            for j in range(len(vals)):
                k, x = keys[j], vals[j]
                st = carry.get(k)
                if st is None:
                    l_, b_, n = x, np.nan, 1
                elif st[2] == 1:
                    l_, b_, n = x, x - st[0], 2
                else:
                    l0, b0, n0 = st
                    lb = l0 + b0
                    l_ = a * x + one_a * lb
                    b_ = bt * (l_ - l0) + one_b * b0
                    n = n0 + 1
                carry[k] = (l_, b_, n)
                out_l[j] = l_
                out_b[j] = b_
            trend = pd.array(out_b, dtype="Float64")
            trend[np.isnan(out_b)] = pd.NA   # first point: NULL
            yield pd.DataFrame({
                key_col: keys,
                ts_col: pdf[ts_col].to_numpy(),
                "level": out_l,
                "trend": trend})

    cols = [key_col, ts_col, val_col] + ([seq_col] if seq_col else [])
    sort_cols = [key_col, ts_col] + ([seq_col] if seq_col else [])
    return (df.select(*cols)
            .repartition(F.col(key_col))
            .sortWithinPartitions(*sort_cols)
            .mapInPandas(gen, out_schema))


def rolling_median(df: DataFrame, window: int = 7,
                   key_col: str = "series", ts_col: str = "ts",
                   val_col: str = "val") -> DataFrame:
    """Trailing rolling median over the previous ``window`` points
    (inclusive) per series — the robust despiking filter a moving
    average can't provide (one outlier drags a mean for ``window``
    points; a median ignores it outright).

    Exact interpolated percentile over a ROWS frame on ONE series-key
    window shuffle, JVM-side throughout — same plan shape as
    :func:`moving_avg`, just a different frame aggregate. Output:
    (key, ts, median), 6 decimals."""
    w = (Window.partitionBy(key_col).orderBy(ts_col)
         .rowsBetween(-(window - 1), 0))
    med = F.percentile(F.col(val_col), F.lit(0.5)).over(w)
    return df.select(
        F.col(key_col), F.col(ts_col),
        (F.round(med, 6) + F.lit(0.0)).alias("median"))


def top_series(df: DataFrame, k: int = 20,
               key_col: str = "series",
               val_col: str = "val") -> DataFrame:
    """The k series with the largest total value — the "which metrics
    dominate" leaderboard.

    One groupBy with partial aggregation (result is |series| rows),
    then a k-row TakeOrdered — no global sort. The total accumulates
    as exact decimal (functions/stable.py) and is rounded BEFORE
    ranking, so both the values and the order are insensitive to
    summation order; ties break by name. Output: (series, total)."""
    from ..functions.stable import stable_dsum

    totals = (df.groupBy(key_col)
              .agg((F.round(stable_dsum(F.col(val_col)), 4)
                    + F.lit(0.0))
                   .alias("total")))
    return totals.orderBy(F.desc("total"), F.asc(key_col)).limit(k)


def zscore_anomalies(df: DataFrame, window: int = 20,
                     threshold: float = 3.0,
                     key_col: str = "series", ts_col: str = "ts",
                     val_col: str = "val") -> DataFrame:
    """Trailing z-score anomaly detection: each point scored against
    the mean/stddev of the PREVIOUS ``window`` points (exclusive —
    the point can't suppress its own anomaly). Points with
    |z| > threshold and at least 3 prior points are flagged.

    One window over one hash shuffle on the series key; sample
    stddev to match SQL engines. Output: (key, ts, val, z) for
    flagged points only, z at 6 decimals."""
    w = (Window.partitionBy(key_col).orderBy(ts_col)
         .rowsBetween(-window, -1))
    mu = F.avg(F.col(val_col)).over(w)
    sd = F.stddev_samp(F.col(val_col)).over(w)
    n = F.count(F.col(val_col)).over(w)
    z = (F.col(val_col) - mu) / sd
    return (df.select(
        F.col(key_col), F.col(ts_col), F.col(val_col),
        F.when((n >= 3) & (sd > 0), z).alias("_z"))
        .where(F.abs(F.col("_z")) > threshold)
        .select(key_col, ts_col, val_col,
                (F.round(F.col("_z"), 6) + F.lit(0.0)).alias("z")))


def point_in_interval_join(points: DataFrame, intervals: DataFrame,
                           width: int,
                           ts_col: str = "ts",
                           lo_col: str = "lo",
                           hi_col: str = "hi",
                           how: str = "inner") -> DataFrame:
    """Bucketed range join (point-in-interval): the classic scale
    rewrite of the theta-join ``lo <= ts AND ts <= hi`` that a naive
    planner turns into a broadcast-nested-loop. Each interval is
    exploded into the coarse ``width``-sized buckets it overlaps;
    each point maps to exactly one bucket; the pair space collapses
    to an EQUI-join on the bucket key, and the exact containment
    predicate filters the equi-joined candidates.

    Cost: interval rows duplicate by ~(hi-lo)/width + 1, points are
    never duplicated, and the join is a plain hash shuffle — pick
    ``width`` near the typical interval length so the duplication
    factor stays ~2 while each bucket pairs only co-located
    candidates. Works at any scale; skewed buckets (one hot window)
    are AQE skew-join territory.

    ``points`` and ``intervals`` keep their own columns (names must
    not collide). Integer bucket math — no doubles, no 2^53 loss."""
    b_lo = F.col(lo_col) - F.col(lo_col) % width
    b_hi = F.col(hi_col) - F.col(hi_col) % width
    ivl = intervals.withColumn(
        "_rb", F.explode(F.sequence(b_lo, b_hi, F.lit(width))))
    pts = points.withColumn(
        "_rb", F.col(ts_col) - F.col(ts_col) % width)
    joined = pts.join(
        ivl, (pts["_rb"] == ivl["_rb"])
        & (F.col(ts_col) >= F.col(lo_col))
        & (F.col(ts_col) <= F.col(hi_col)), how)
    return joined.drop("_rb")


def correlated_series(df: DataFrame, group_ns: int, k: int = 10,
                      min_buckets: int = 3,
                      key_col: str = "series",
                      ts_col: str = "ts",
                      val_col: str = "val") -> DataFrame:
    """Top-k series most correlated with a reference series — the
    "which metrics move together" query every TSDB dashboard grows.
    The reference series is picked deterministically (most points,
    name tie-break), each series is reduced to aligned bucket means,
    and Pearson correlation runs over co-present buckets only
    (>= ``min_buckets``).

    Scale shape: one bucket-mean aggregate over the points (map-side
    partial), the reference's bucket vector is a tiny broadcast
    (span/group rows), correlation is one hash aggregate per series,
    and the top-k is a TakeOrdered — never a global sort, never a
    series×series matrix. Output: (series, n_buckets, corr) ordered
    by corr desc, name asc."""
    bm = (df.groupBy(key_col,
                     F.expr(f"{ts_col} div {int(group_ns)}")
                     .alias("_b"))
          .agg(F.avg(val_col).alias("_v")))
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    ref = (counts.orderBy(F.desc("_n"), F.asc(key_col)).limit(1)
           .select(key_col))
    refb = (bm.join(ref, key_col)
            .select(F.col("_b"), F.col("_v").alias("_qv")))
    joined = (bm.join(ref.withColumnRenamed(key_col, "_refname"),
                      F.col(key_col) == F.col("_refname"),
                      "left_anti")
              .join(F.broadcast(refb), "_b"))
    # explicit Pearson (not F.corr): ANSI mode makes corr() throw
    # DIVIDE_BY_ZERO on a zero-variance pairing, and the fixed
    # sum-of-products op order is what the SQL oracle replays
    agg = (joined.groupBy(key_col)
           .agg(F.count(F.lit(1)).alias("n_buckets"),
                F.sum(F.col("_v") * F.col("_qv")).alias("_sxy"),
                F.sum("_v").alias("_sx"),
                F.sum("_qv").alias("_sy"),
                F.sum(F.col("_v") * F.col("_v")).alias("_sxx"),
                F.sum(F.col("_qv") * F.col("_qv")).alias("_syy")))
    n = F.col("n_buckets")
    num = n * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.sqrt(
        F.greatest(F.lit(0.0),
                   n * F.col("_sxx") - F.col("_sx") * F.col("_sx"))
        * F.greatest(F.lit(0.0),
                     n * F.col("_syy") - F.col("_sy") * F.col("_sy")))
    c = F.try_divide(num, den)
    corr = (agg.select(key_col, "n_buckets", c.alias("_c"))
            .where((F.col("n_buckets") >= min_buckets)
                   & F.col("_c").isNotNull() & ~F.isnan("_c")))
    return (corr.select(key_col, "n_buckets",
                        (F.round("_c", 6) + F.lit(0.0)).alias("corr"))
            .orderBy(F.desc("corr"), F.asc(key_col)).limit(k))


def seasonal_profile(df: DataFrame, period_ns: int, n_buckets: int,
                     key_col: str = "series",
                     ts_col: str = "ts",
                     val_col: str = "val") -> DataFrame:
    """Seasonal baseline per series: mean/stddev of the value in each
    phase bucket of a repeating period (hour-of-day profile =
    period 1 h, 24 buckets; day-of-week = period 1 day, 7 buckets).
    The profile is what seasonality-aware alerting compares against —
    "is 3 AM traffic low for 3 AM?", not "is it low overall?".

    One partial-aggregated groupBy over (series, phase) — output is
    |series| × n_buckets rows no matter how many points flow in.
    Sample stddev via the explicit sum-of-squares form with a fixed
    op order (oracle-replayable; try_divide → NULL when n = 1).
    Output: (series, phase, n, avg_val, std_val)."""
    phase = F.expr(
        f"({ts_col} div {int(period_ns)}) % {int(n_buckets)}")
    agg = (df.groupBy(F.col(key_col).alias("series"),
                      phase.alias("phase"))
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(val_col).alias("_sx"),
                F.sum(F.col(val_col) * F.col(val_col)).alias("_sxx")))
    n = F.col("n")
    mean = F.col("_sx") / n
    var = F.try_divide(
        F.greatest(F.lit(0.0),
                   F.col("_sxx") - F.col("_sx") * F.col("_sx") / n),
        n - F.lit(1))
    return agg.select(
        "series", "phase", "n",
        (F.round(mean, 6) + F.lit(0.0)).alias("avg_val"),
        (F.round(F.sqrt(var), 6) + F.lit(0.0)).alias("std_val"))


def seasonal_anomalies(df: DataFrame, period_ns: int, n_buckets: int,
                       threshold: float = 3.0,
                       key_col: str = "series",
                       ts_col: str = "ts",
                       val_col: str = "val") -> DataFrame:
    """Seasonality-aware anomaly detection: score each point against
    its series' SEASONAL baseline (the :func:`seasonal_profile` for
    its phase), flagging |val − avg| > threshold·std — "low for a
    Tuesday 3 AM", which a global or trailing-window z-score can't
    express.

    Plan shape: the profile is |series|×buckets rows → broadcast
    back onto the point stream (a pure map-side join at any volume);
    the only shuffle is the profile's own aggregate. Phases with
    n < 3 or zero variance never flag (NULL z). Output:
    (series, ts, val, phase, z) for flagged points, z at 6
    decimals."""
    prof = seasonal_profile(df, period_ns, n_buckets,
                            key_col, ts_col, val_col)
    phase = F.expr(
        f"({ts_col} div {int(period_ns)}) % {int(n_buckets)}")
    pts = df.select(F.col(key_col).alias("series"),
                    F.col(ts_col).alias("ts"),
                    F.col(val_col).alias("val"),
                    phase.alias("phase"))
    z = F.try_divide(F.col("val") - F.col("avg_val"),
                     F.col("std_val"))
    return (pts.join(F.broadcast(prof), ["series", "phase"])
            .where((F.col("n") >= 3) & (F.col("std_val") > 0))
            .withColumn("_z", z)
            .where(F.abs(F.col("_z")) > threshold)
            .select("series", "ts", "val", "phase",
                    (F.round("_z", 6) + F.lit(0.0)).alias("z")))


def ewma(df: DataFrame, alpha: float = 0.25,
         key_col: str = "series", ts_col: str = "ts",
         val_col: str = "val",
         seq_col: str | None = None) -> DataFrame:
    """Exact exponentially-weighted moving average per series:
    ``y_0 = x_0``, ``y_t = (1-alpha)·y_{t-1} + alpha·x_t`` — the
    infinite-memory smoother behind EWMA alerting and rate limiters,
    which no finite window frame can reproduce.

    The recursion is inherently sequential per series, so this is one
    of the few operators that drops to Python — but NOT to per-group
    Python: a ``groupBy().applyInPandas`` pays function-call/frame
    overhead per SERIES (measured ~5 s on 7.5k short series where the
    math itself is 0.1 s). Instead: one hash repartition on the key +
    a per-partition sort, then a ``mapInPandas`` scan whose batches
    run pandas' C ``groupby.ewm`` kernel over MANY series at once; a
    series split across consecutive Arrow batches is continued
    exactly by injecting its carried level as a virtual first row
    (y₀ = carry, y₁ = (1-a)·carry + a·x₀ — the fold's own next
    step). Worker memory is O(series per partition) carry doubles.

    The float op order is pinned to ``(1-alpha)*acc + alpha*x`` so a
    left fold in any engine (e.g. DuckDB ``list_reduce``) reproduces
    the trajectory bit-for-bit — that exactness is what makes the
    smoother oracle-checkable and restart-stable. pandas'
    ``ewm(adjust=False)`` computes ``((1-a)·prev + a·x)/((1-a)+a)``,
    the same IEEE sequence whenever the divisor is exactly 1.0 —
    provable for exactly-complemented alphas (0.25, 0.5, …) and
    verified for any alpha by a one-time 4096-point bit-equality
    probe against the reference fold; a probe mismatch falls back to
    the exact per-point loop (same carry injection).
    Output: (key, ts, ewma) per input point, raw doubles."""
    import numpy as np
    import pandas as pd

    one = 1.0 - alpha
    a = alpha

    def _fold(vals: "np.ndarray") -> "np.ndarray":
        out = vals.copy()
        acc = 0.0
        for i in range(len(out)):
            acc = out[i] if i == 0 else one * acc + a * out[i]
            out[i] = acc
        return out

    probe = np.sin(np.arange(4096, dtype="float64") * 0.37) * 1e3
    vec_ok = bool(np.array_equal(
        pd.Series(probe).ewm(alpha=alpha, adjust=False)
        .mean().to_numpy(), _fold(probe)))

    key_tp = dict(df.dtypes)[key_col]   # keep the caller's key type
    out_schema = f"{key_col} {key_tp}, {ts_col} long, ewma double"

    def gen(batches):
        carry: dict = {}
        for pdf in batches:
            if not len(pdf):
                continue
            held = [k for k in pd.unique(pdf[key_col]) if k in carry]
            if held:
                inj = pd.DataFrame({
                    key_col: held,
                    ts_col: np.zeros(len(held), dtype="int64"),
                    val_col: np.array([carry[k] for k in held],
                                      dtype="float64"),
                    "_inj": True})
                body = pd.concat(
                    [inj, pdf.assign(_inj=False)], ignore_index=True)
                # stable sort by key alone: each injected carry row
                # lands directly BEFORE its series' (already
                # ts-ordered) rows
                body = body.sort_values(
                    [key_col], kind="mergesort", ignore_index=True)
            else:
                body = pdf.assign(_inj=False)
            vals = body[val_col].astype("float64")
            if vec_ok:
                ew = (vals.groupby(body[key_col], sort=False)
                      .ewm(alpha=a, adjust=False).mean()
                      .reset_index(level=0, drop=True))
                body = body.assign(ewma=ew)
            else:
                parts = []
                for _k, sub in vals.groupby(body[key_col],
                                            sort=False):
                    parts.append(pd.Series(
                        _fold(sub.to_numpy()), index=sub.index))
                body = body.assign(ewma=pd.concat(parts))
            for k, v in body.groupby(body[key_col],
                                     sort=False)["ewma"].last() \
                    .items():
                carry[k] = float(v)
            out = body[~body["_inj"]]
            yield pd.DataFrame({
                key_col: out[key_col].to_numpy(),
                ts_col: out[ts_col].to_numpy(),
                "ewma": out["ewma"].to_numpy()})

    cols = [key_col, ts_col, val_col] + ([seq_col] if seq_col else [])
    sort_cols = [key_col, ts_col] + ([seq_col] if seq_col else [])
    return (df.select(*cols)
            .repartition(F.col(key_col))
            .sortWithinPartitions(*sort_cols)
            .mapInPandas(gen, out_schema))


def _series_vectors(df: DataFrame, max_len: int, scale: int,
                    est_bytes: int | None = None) -> DataFrame:
    """(series, vals array<long>): the first ``max_len`` points per
    series in (ts, val) order, integer-scaled — ONE definition of
    the vector-assembly contract shared by the DTW scorer and the
    SAX prefilter so the two can never diverge. NULL values are
    excluded up front (they would poison the integer DP and skew
    the PAA means differently per engine).

    The keyed fan-out pins the assembly groupBy's output at core
    count when the input is provably small (guide §2.5): the DTW
    DP mapInPandas and the SAX word expressions both run directly
    on this groupBy's output partitions, and AQE sizes those from
    the pre-assembly bytes — a few MB of points would coalesce the
    whole scorer onto 1-2 cores. Same single exchange (the
    repartition satisfies the groupBy's distribution); no-op at
    realistic scale."""
    from ..localdf import fan_out_keyed

    return (fan_out_keyed(df.where(F.col("val").isNotNull()),
                          "series", est_bytes=est_bytes)
            .groupBy("series")
            .agg(F.slice(F.array_sort(F.collect_list(
                F.struct("ts", "val"))), 1, max_len).alias("pv"))
            .select("series",
                    F.transform("pv", lambda s: F.floor(
                        s["val"] * F.lit(float(scale)))
                        .cast("long")).alias("vals")))


def _dtw_batch(series_list, qa, band):
    """Banded-DTW costs for a BATCH of int64 series against one
    query, vectorized across the batch per anti-diagonal: cell
    (i, j=t−i) on diagonal t reads (i, j−1) = diag t−1 idx i,
    (i−1, j) = diag t−1 idx i−1, (i−1, j−1) = diag t−2 idx i−1 —
    no intra-diagonal dependency, so each diagonal is one
    vectorized min+add over (batch × band-window). Batching across
    series is what actually pays: a per-series numpy wavefront
    loses to plain dicts on ≤33-cell diagonals (ufunc overhead),
    while the batched kernel measures ~5-6× faster per series.
    Each diagonal's columns are sliced to the union band window
    [min ilo, max ihi], so per-step work is O(batch·band), not
    O(batch·max_len). Unreachable cells clamp AT INF instead of
    accumulating past it (int64 would wrap); every reachable value
    is the exact integer DP cost and the corner is always reachable
    for w ≥ |n−nq|, so outputs are bit-identical to the scalar
    reference DP (randomized-equality pinned in pytest)."""
    import numpy as np

    INF = 1 << 62
    B = len(series_list)
    nq = len(qa)
    ns = np.array([len(s) for s in series_list], dtype=np.int64)
    costs = np.full(B, INF, dtype=np.int64)
    if nq == 0 or B == 0 or ns.max(initial=0) == 0:
        return costs
    n_max = int(ns.max())
    S = np.zeros((B, n_max), dtype=np.int64)
    for b, s in enumerate(series_list):
        S[b, :len(s)] = s
    ws = np.maximum(band, np.abs(ns - nq))
    prev = np.full((B, n_max), INF, dtype=np.int64)
    prev2 = np.full((B, n_max), INF, dtype=np.int64)
    zero = np.zeros(B, dtype=np.int64)
    for t in range(n_max + nq - 1):
        ilo = np.maximum.reduce([zero, zero + (t - nq + 1),
                                 (t - ws + 1) // 2])
        ihi = np.minimum.reduce([ns - 1, zero + t, (t + ws) // 2])
        glo = int(ilo.min())
        ghi = int(ihi.max())
        cur = np.full((B, n_max), INF, dtype=np.int64)
        if glo <= ghi:
            wdt = ghi - glo + 1
            ii = np.arange(glo, ghi + 1)
            valid = (ii >= ilo[:, None]) & (ii <= ihi[:, None])
            qi = np.clip(t - ii, 0, nq - 1)
            d = np.abs(S[:, glo:ghi + 1] - qa[qi][None, :])
            best = prev[:, glo:ghi + 1].copy()
            sh = np.empty((B, wdt), dtype=np.int64)
            if glo == 0:
                sh[:, 0] = INF
                sh[:, 1:] = prev[:, :ghi]
            else:
                sh[:] = prev[:, glo - 1:ghi]
            np.minimum(best, sh, out=best)
            if glo == 0:
                sh[:, 1:] = prev2[:, :ghi]
            else:
                sh[:] = prev2[:, glo - 1:ghi]
            np.minimum(best, sh, out=best)
            if t == 0:
                best[:, 0] = 0
            cur[:, glo:ghi + 1] = np.where(
                valid, np.where(best >= INF, INF, best + d), INF)
        done = (ns + nq - 2 == t)
        if done.any():
            costs[done] = cur[done, ns[done] - 1]
        prev2, prev = prev, cur
    return costs


def dtw_topk(df: DataFrame, query_series: str, k: int = 10,
             band: int = 8, max_len: int = 128,
             scale: int = 1000, prefilter: bool = False,
             word_len: int = 8, alphabet: int = 4,
             pool: int = 32,
             est_bytes: int | None = None) -> DataFrame:
    """Top-k most-similar series to ``query_series`` by banded
    Dynamic Time Warping — the elastic-alignment similarity that
    correlation/euclidean top-k (correlated_series) can't express:
    two series tracing the same shape out of phase score as
    neighbors here and as strangers there.

    Spark shape: ONE groupBy assembles each series' first
    ``max_len`` points (ts-ordered, integer-scaled values — the DP
    is exact int64, so results are bit-stable across partitionings
    and re-runs); the query vector broadcasts inside an
    Arrow-batched mapInPandas where each series runs a
    Sakoe-Chiba-banded DP (O(len·band) per series) vectorized as a
    numpy anti-diagonal wavefront — cells on diagonal i+j=t depend
    only on diagonals t−1/t−2, so each diagonal is one vectorized
    min+add over the band window. Cost is linear in |series|,
    row-local, no pairwise join — the trajectory-search shape
    (cf. REPOSE, ICDE 2021) with the reference-point pruning
    replaced by Spark's partition parallelism. Top-k is a
    TakeOrdered, ties to series name.

    ``prefilter=True`` wires in the iSAX-style search that
    :func:`sax_words`' representation exists for, as an EXACT
    two-phase top-k (equality with the unfiltered ranking is a
    theorem, not fixture luck):

    1. candidate pool = the ``max(k, pool)`` series whose SAX words
       (same ``_series_vectors`` assembly, same word definition via
       ``_sax_from_vectors``) agree with the query's word at the
       most positions — the heuristic that puts likely neighbors
       first; the exact DP scores the pool and its k-th cost
       becomes the threshold τ (one k-bounded collect);
    2. every non-pool series is pruned by a PROVABLE lower bound:
       any (banded or not) DTW path matches first↔first and
       last↔last, so cost ≥ |s₀−q₀| + |s_last−q_last| (the two
       cells coincide only when both series are single-point) —
       an LB_Kim-style endpoint bound evaluated in pure Catalyst
       off the assembled vals array. lb > τ ⟹ cost > τ ⟹ the
       series can't displace any of the k pool candidates (ties
       are impossible: pruning is strict). Survivors run the exact
       DP and merge with the pool's top-k.

    At corpus scale the DP — the expensive part — runs on
    |pool| + |LB survivors| series instead of all of them, while
    the full-corpus work is one word aggregate and one row-local
    LB scan. How selective the bound is depends on the data (shape
    corpora prune hard, iid-noise corpora barely), but the answer
    is the unfiltered top-k either way.

    Output: (series, n_points long, dtw_cost long) — cost is
    Σ |a−b| over the optimal banded path in scaled units;
    the query itself scores 0."""
    import pandas as pd
    from pyspark.sql import types as T

    import numpy as np

    per = _series_vectors(df, max_len, scale, est_bytes=est_bytes)
    if prefilter:
        # the two-phase search drives several driver actions over
        # this |series|-bounded frame (pool top-k, LB scan) —
        # persist so the corpus groupBy runs once instead of per
        # action; unpersisted before returning, so the caller's
        # collect recomputes it exactly once more and no cached RDD
        # outlives the call (bench hygiene)
        per = per.persist()
    # the query's assembled vector from a FILTERED single-series
    # branch: fetching it out of `per` paid the full-corpus
    # groupBy's map side just to read ONE row. The same expressions
    # over only the query's own points produce the identical vector
    # (array_sort makes assembly order-free) for the cost of a
    # plain scan (guide §1.2 — don't compute what you throw away).
    # est_bytes=0 disables the fan-out gate outright: a single-
    # series branch has at most one busy partition whatever the
    # partitioning, so even the gate's free path is pointless here
    qrow = (_series_vectors(
        df.where(F.col("series") == query_series), max_len, scale,
        est_bytes=0)
        .first())
    if qrow is None:
        if prefilter:
            per.unpersist(blocking=True)
        raise ValueError(f"query series {query_series!r} not found")
    q = [int(x) for x in qrow["vals"]]

    schema = T.StructType([
        T.StructField("series", T.StringType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("dtw_cost", T.LongType()),
    ])

    def run(batches):
        qa = np.asarray(q, dtype=np.int64)
        for pdf in batches:
            sers = [np.asarray(v, dtype=np.int64)
                    for v in pdf["vals"]]
            yield pd.DataFrame({
                "series": pdf["series"],
                "n_points": [len(s) for s in sers],
                "dtw_cost": _dtw_batch(sers, qa, band)})

    if not prefilter:
        scored = per.mapInPandas(run, schema=schema)
        return (scored.orderBy(F.col("dtw_cost").asc(), "series")
                .limit(k))

    from ..localdf import arrow_df

    spark = df.sparkSession
    try:
        words = _sax_from_vectors(per, word_len, alphabet)
        # the query's word is a pure function of the vals already
        # collected — the Python twin (pinned in pytest against the
        # pipeline) saves a driver action that ran the whole
        # posexplode + two-groupBy word pipeline for ONE row
        qw = _sax_word_py(q, word_len, alphabet)
        qlit = qw.replace("'", "''")
        # agreement count with the query word over the shorter of
        # the two words (a short series is judged only on buckets
        # it has)
        agree_n = F.expr(
            f"size(filter(sequence(1, int(least(length(word),"
            f" {len(qw)}))), p -> substring(word, p, 1) ="
            f" substring('{qlit}', p, 1)))")
        pool_names = (words.select("series", agree_n.alias("na"))
                      .orderBy(F.desc("na"), "series")
                      .limit(max(k, pool))
                      .select("series"))
        pool_scored = (per.join(pool_names, "series", "semi")
                       .mapInPandas(run, schema=schema))
        top_pool = (pool_scored
                    .orderBy(F.col("dtw_cost").asc(), "series")
                    .limit(k).collect())
        if len(top_pool) < k:
            # fewer series than k: nothing can be pruned correctly
            scored = per.mapInPandas(run, schema=schema)
            return (scored
                    .orderBy(F.col("dtw_cost").asc(), "series")
                    .limit(k))
        tau = int(top_pool[-1]["dtw_cost"])
        # endpoint lower bound: every DTW path matches s[0]↔q[0]
        # and s[n−1]↔q[nq−1]; the two cells coincide only when
        # n==nq==1
        s0 = F.expr("element_at(vals, 1)")
        sl = F.expr("element_at(vals, size(vals))")
        lb = F.abs(s0 - F.lit(q[0]))
        if len(q) > 1:
            lb = lb + F.abs(sl - F.lit(q[-1]))
        else:
            lb = lb + F.when(F.size("vals") > 1,
                             F.abs(sl - F.lit(q[0]))) \
                .otherwise(F.lit(0))
        extra = (per.join(pool_names, "series", "left_anti")
                 .where(lb <= F.lit(tau))
                 .mapInPandas(run, schema=schema))
        pool_top = arrow_df(
            spark,
            [(r["series"], r["n_points"], r["dtw_cost"])
             for r in top_pool],
            "series string, n_points long, dtw_cost long")
        # run the final k-row top-k NOW, while the assembled-vector
        # cache is still live — a lazy return recomputed the whole
        # per-series groupBy assembly at the caller's action (the
        # finally-unpersist below must run before returning). k rows
        # by construction: hand back a literal local relation.
        final = (extra.unionByName(pool_top)
                 .orderBy(F.col("dtw_cost").asc(), "series")
                 .limit(k))
        rows = final.collect()
        return arrow_df(
            spark,
            [(r["series"], r["n_points"], r["dtw_cost"])
             for r in rows],
            "series string, n_points long, dtw_cost long")
    finally:
        # blocking: callers (the bench hygiene ledger) snapshot
        # cached RDDs immediately after the search returns
        per.unpersist(blocking=True)


def dtw_knn_join(corpus: DataFrame, queries: DataFrame, k: int = 10,
                 band: int = 8, max_len: int = 128,
                 scale: int = 1000, word_len: int = 8,
                 alphabet: int = 4, pool: int = 32,
                 bands: int = 4, band_cap: int | None = 1024,
                 _stats: dict | None = None,
                 est_bytes: int | None = None,
                 q_est_bytes: int | None = None) -> DataFrame:
    """Batch EXACT banded-DTW join: for EVERY series in ``queries``
    (a points frame — series, ts, val), the top-k most-similar
    series in ``corpus`` (same shape) — the corpus-vs-corpus
    series-similarity shape (series contamination between two
    snapshots, near-dup telemetry channels, shape-cluster seeding)
    that :func:`dtw_topk` can't serve once the query side is a
    corpus too: that path runs one driver-side search per query;
    here BOTH sides stay distributed and the answer per query is
    IDENTICAL to ``dtw_topk(prefilter=True)``'s (the per-query-loop
    equality the oracle entry pins).

    Spark shape, the two-phase exact search batched:

    1. one groupBy per side assembles the int64 vectors
       (:func:`_series_vectors` — the SAME assembly the per-query
       path uses) and their SAX words (:func:`_sax_from_vectors`);
    2. per-query candidate POOL = the ``max(k, pool)`` corpus
       series with the highest SAX-word agreement among the BANDED
       candidates: each word splits into ``bands`` contiguous
       slices, two series agreeing on every char of some band share
       that band's (position, slice) key, and candidates stream out
       of an EQUI-JOIN on the band key — the simhash_pairs
       pigeonhole pattern (``dedup.py``), never a |q|·|corpus| word
       crossJoin. ``band_cap`` drops super-hot band buckets
       (flat/common shapes), bounding the candidate stream at
       bands·|q|·band_cap rows whatever the key distribution.
       Per-char agreement then ranks only these candidates, and the
       lexicographically first k corpus series are unioned into
       every pool so τ always exists (pool quality — and therefore
       banding recall and the cap — affects only speed, never the
       answer: a pair the pool misses must still beat τ through the
       exhaustive endpoint LB below to reach the final DP);
    3. the exact DP scores pool pairs (one ``mapInPandas`` over
       (query, candidate) rows, the anti-diagonal kernel
       :func:`_dtw_batch` vectorized per query-group within each
       Arrow batch) and each query's k-th pool cost becomes its
       pruning threshold τ — collected as ONE (qseries, τ) row per
       query (16 bytes each; this is the only driver barrier, and
       it carries thresholds, never vectors — the reason the
       returned plan doesn't have to recompute the pool DP inside
       every downstream subtree);
    4. every non-pool (query, candidate) pair is pruned by the
       PROVABLE endpoint lower bound (cost ≥ |s₀−q₀| + |s_l−q_l|,
       the two cells coinciding only for two single-point series —
       same theorem as the per-query path) evaluated in pure
       Catalyst over endpoint scalars only (never the arrays);
       lb > τ ⟹ the pair cannot displace any pool candidate
       (strict pruning, ties impossible). The gate itself is a
       quantized-bin EQUI-join, not a grid scan: cost ≥ |s₀−q₀|
       means a survivor's first endpoint lies in [q₀−τ, q₀+τ], so
       with bin width W = max(1, max τ) each query probes only the
       ≤ 3 bins covering that interval and corpus bins farther out
       are provably excludable; the exact lb ≤ τ filter on the
       join output makes the survivor set IDENTICAL to the full
       grid's (the banding's cannot-change-the-answer pattern);
    5. pool ∪ survivors run the exact DP in ONE pass and a
       per-query window takes the final top-k (cost asc, series
       asc).

    At corpus scale the expensive part — the O(len·band) DP — runs
    on |pool|·|q| + |survivors| pairs (the pool twice: once for τ,
    once in the returned plan); the endpoint-LB gate touches each
    side ONCE (hash the corpus endpoints by bin, probe ≤ 3 bins per
    query) — no |q|·|corpus| term remains anywhere in the operator.
    The assembled-vector frames are persisted only for the τ action
    and released (blocking) before returning, so no cached state
    outlives the call. The K=8 probe bound asserts the DP-candidate
    volume stays linear; pass a dict as ``_stats`` to get
    {n_queries, n_corpus, n_pool_stream, n_candidates} filled in
    (the three counts are extra actions — diagnostics only).

    Output: (qseries, series, n_points, dtw_cost, rank 1..k) —
    exact integer costs in scaled units; a query series also
    present in the corpus ranks itself first at cost 0."""
    import pandas as pd
    from pyspark.sql import types as T

    import numpy as np

    per_c = _series_vectors(corpus, max_len, scale,
                            est_bytes=est_bytes)
    per_q = (_series_vectors(queries, max_len, scale,
                             est_bytes=q_est_bytes)
             .select(F.col("series").alias("qseries"),
                     F.col("vals").alias("qvals")))
    w_c = _sax_from_vectors(per_c, word_len, alphabet) \
        .select("series", "word")
    w_q = (_sax_from_vectors(
        per_q.select(F.col("qseries").alias("series"),
                     F.col("qvals").alias("vals")),
        word_len, alphabet)
        .select(F.col("series").alias("qseries"),
                F.col("word").alias("qword")))

    # 2. per-query pool by BANDED word agreement: band-key equi-join
    # for candidates (hot buckets dropped above band_cap — whole-
    # bucket drops are deterministic under any partitioning), then
    # exact per-char agreement (over the shorter word — a short
    # series is judged only on buckets it has) ranks the candidates,
    # unioned with the first-k-by-name floor so every query has
    # ≥ min(k, |corpus|) pool members and τ always exists
    from .dedup import _cap_hot_buckets

    blen = max(1, -(-int(word_len) // int(bands)))
    bpos = F.explode(F.sequence(
        F.lit(0), F.lit(int(bands) - 1))).alias("b")
    bc = (w_c.select("series", "word", bpos)
          .withColumn("key", F.expr(
              f"substring(word, b * {blen} + 1, {blen})"))
          .where(F.length("key") > 0))
    bc = _cap_hot_buckets(bc, ["b", "key"], band_cap)
    bq = (w_q.select("qseries", "qword", bpos)
          .withColumn("key", F.expr(
              f"substring(qword, b * {blen} + 1, {blen})"))
          .where(F.length("key") > 0))
    agree_n = F.expr(
        "size(filter(sequence(1, int(least(length(word),"
        " length(qword)))), p -> substring(word, p, 1) ="
        " substring(qword, p, 1)))")
    # the words ride THROUGH the band join, so agreement is scored
    # on the join output directly (it is a pure function of the
    # pair, so distinct on (pair, score) ≡ distinct on pair) — no
    # join-back to the word frames
    cand = (bc.join(bq, ["b", "key"])
            .select("qseries", "series", agree_n.alias("_na"))
            .distinct())
    wp = Window.partitionBy("qseries").orderBy(
        F.desc("_na"), F.asc("series"))
    pool_pairs = (cand
                  .withColumn("_pr", F.row_number().over(wp))
                  .where(F.col("_pr") <= max(int(k), int(pool)))
                  .select("qseries", "series"))
    floor_names = (w_c.select("series")
                   .orderBy("series").limit(int(k)))
    pool_pairs = (pool_pairs.unionByName(
        w_q.select("qseries").crossJoin(F.broadcast(floor_names)))
        .distinct())

    schema = T.StructType([
        T.StructField("qseries", T.StringType()),
        T.StructField("series", T.StringType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("dtw_cost", T.LongType()),
    ])

    def run_pairs(batches):
        for pdf in batches:
            outs = []
            for _, grp in pdf.groupby("qseries", sort=True):
                qa = np.asarray(grp["qvals"].iloc[0],
                                dtype=np.int64)
                sers = [np.asarray(v, dtype=np.int64)
                        for v in grp["svals"]]
                outs.append(pd.DataFrame({
                    "qseries": grp["qseries"].to_numpy(),
                    "series": grp["series"].to_numpy(),
                    "n_points": [len(s) for s in sers],
                    "dtw_cost": _dtw_batch(sers, qa, band)}))
            yield (pd.concat(outs) if outs else pd.DataFrame(
                {f.name: [] for f in schema.fields}))

    def score(pairs: DataFrame) -> DataFrame:
        return (pairs
                .join(per_c.select("series",
                                   F.col("vals").alias("svals")),
                      "series")
                .join(per_q, "qseries")
                .select("qseries", "series", "svals", "qvals")
                .mapInPandas(run_pairs, schema=schema))

    wt = Window.partitionBy("qseries").orderBy(
        F.asc("dtw_cost"), F.asc("series"))

    # 3. pool DP → τ per query, collected (|q| rows of 16 bytes —
    # thresholds only). The persists make the τ action's four
    # references to the assembled vectors one groupBy each, and are
    # released before returning.
    from ..localdf import arrow_df

    per_c = per_c.persist()
    per_q = per_q.persist()
    try:
        tau_rows = [
            (r["qseries"], int(r["dtw_cost"])) for r in
            (score(pool_pairs)
             .withColumn("_rn", F.row_number().over(wt))
             .where(F.col("_rn") <= int(k))
             .groupBy("qseries")
             .agg(F.max("dtw_cost").alias("dtw_cost"))
             .collect())]
        tau = arrow_df(corpus.sparkSession, tau_rows,
                       "qseries string, _tau long")

        nq = len(tau_rows)

        # 4. endpoint LB prune, as a quantized-bin EQUI-join over
        # endpoint scalars (never the arrays, never a |q|·|corpus|
        # grid): lb ≥ |s0−q0| unconditionally, so a pair surviving
        # lb ≤ τ has s0 ∈ [q0−τ, q0+τ]; with bin width
        # W = max(1, max τ) that interval spans ≤ 3 bins, the
        # corpus hashes each endpoint into its bin once, and the
        # exact lb ≤ τ filter on the join output reproduces the
        # full grid's survivor set exactly. pmod keeps the floor
        # division exact in int64 for negative endpoints.
        tau_max = max((t for _, t in tau_rows), default=0)
        binw = max(1, int(tau_max))

        def _fbin(x: str) -> F.Column:
            return F.expr(
                f"(({x}) - pmod(({x}), {binw})) div {binw}")

        ends_c = per_c.select(
            "series",
            F.expr("element_at(vals, 1)").alias("_s0"),
            F.expr("element_at(vals, size(vals))").alias("_sl"),
            F.size("vals").alias("_sn")) \
            .withColumn("_b", _fbin("_s0"))
        ends_q = per_q.select(
            "qseries",
            F.expr("element_at(qvals, 1)").alias("_q0"),
            F.expr("element_at(qvals, size(qvals))").alias("_ql"),
            F.size("qvals").alias("_qn"))
        lb = (F.abs(F.col("_s0") - F.col("_q0"))
              + F.when((F.col("_sn") > 1) | (F.col("_qn") > 1),
                       F.abs(F.col("_sl") - F.col("_ql")))
              .otherwise(F.lit(0)))
        qbins = (ends_q.join(F.broadcast(tau), "qseries")
                 .withColumn("_b", F.explode(F.sequence(
                     _fbin("_q0 - _tau"), _fbin("_q0 + _tau")))))
        survivors = (ends_c
                     .join(F.broadcast(qbins), "_b")
                     .where(lb <= F.col("_tau"))
                     .select("qseries", "series"))

        # 5. ONE exact-DP pass over pool ∪ survivors, then the
        # final per-query top-k. The returned plan re-derives the
        # vector assembly lazily (no persisted state survives the
        # call); building it inside the try keeps the analysis
        # errors, if any, before the unpersist.
        candidates = pool_pairs.unionByName(survivors).distinct()
        if _stats is not None:
            _stats["n_queries"] = nq
            # a cached scan (the τ action materialized per_c) —
            # diagnostics only, no longer needed on the hot path
            _stats["n_corpus"] = per_c.count()
            # the banded pool stream — the number that was
            # |q|·|corpus| under the r11 word crossJoin and is now
            # provably ≤ bands·|q|·band_cap (whole hot buckets
            # drop), the invariant the scale gate asserts
            _stats["n_pool_stream"] = cand.count()
            _stats["n_candidates"] = candidates.count()
        out = (score(candidates)
               .withColumn("rank", F.row_number().over(wt))
               .where(F.col("rank") <= int(k))
               .select("qseries", "series", "n_points",
                       "dtw_cost", "rank"))
    finally:
        per_c.unpersist(blocking=True)
        per_q.unpersist(blocking=True)
    return out


def sax_words(df: DataFrame, word_len: int = 8, alphabet: int = 4,
              max_len: int = 128, scale: int = 1000,
              est_bytes: int | None = None) -> DataFrame:
    """SAX-style symbolic words per series — the indexable
    representation that makes series-similarity search scale: series
    whose words disagree everywhere can't be close, so a cheap
    word-equality/Hamming prefilter bounds how many candidates ever
    reach the DTW DP (the iSAX pattern; dtw_topk is the exact
    scorer behind it).

    Integer-exact variant (hashable cross-engine, unlike classic
    Gaussian-breakpoint SAX whose z-normalization is a float sum):
    the first ``max_len`` ts-ordered points are scaled to int64,
    split into ``word_len`` buckets (bucket of point i =
    i·word_len div n), PAA = integer-div bucket mean, and symbols
    are equi-range: (paa − min)·alphabet div (range+1) over the
    series' own PAA min/max. One groupBy per stage, all integer
    arithmetic. Output: (series, n_points, word string of
    [0-9a-z] symbols)."""
    per = _series_vectors(df, max_len, scale, est_bytes=est_bytes)
    return _sax_from_vectors(per, word_len, alphabet)


def _sax_word_py(vals, word_len: int, alphabet: int) -> str:
    """Driver-side twin of :func:`_sax_from_vectors` for ONE
    already-assembled vals vector — integer-exact, so the word is
    identical to the distributed pipeline's (pinned by
    tests/test_timeseries_ops.py::test_sax_word_py_matches_pipeline).
    Lets dtw_topk's prefilter derive the QUERY's word from the vals
    it has already collected instead of running the posexplode +
    two-groupBy word pipeline for a single row."""
    if not 2 <= alphabet <= 36:
        raise ValueError("alphabet must be in [2, 36]")
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:alphabet]
    n = len(vals)
    if n == 0:
        return ""
    buckets: dict[int, list] = {}
    for i, v in enumerate(vals):
        buckets.setdefault((i * word_len) // n, []).append(int(v))
    # paa = integer-div bucket mean; symbols equi-range over the
    # series' own PAA min/max — same formulas as _sax_from_vectors
    paa = {j: _trunc_div(sum(vs), len(vs))
           for j, vs in buckets.items()}
    lo, hi = min(paa.values()), max(paa.values())
    word = []
    for j in sorted(paa):
        s = min(alphabet - 1,
                _trunc_div((paa[j] - lo) * alphabet, hi - lo + 1))
        word.append(digits[s])
    return "".join(word)


def _trunc_div(a: int, b: int) -> int:
    """Spark's integral ``div`` truncates toward zero; Python's //
    floors — they differ on negative bucket sums, so mirror Spark
    exactly."""
    q = abs(a) // abs(b)
    if (a < 0) != (b < 0):
        q = -q
    return q


def _sax_from_vectors(per: DataFrame, word_len: int,
                      alphabet: int) -> DataFrame:
    """SAX words from an already-assembled ``_series_vectors``
    frame — the single word definition shared by :func:`sax_words`
    and :func:`dtw_topk`'s prefilter, so the index representation
    and the scorer's candidate gate can never diverge.

    ROW-LOCAL (guide §2.4 remove shuffles): the former
    posexplode + two-groupBy + join pipeline recomputed what is a
    pure function of each row's ``vals`` array through THREE extra
    exchanges. Bucket of point i (0-based) = (i·word_len) div n is
    non-decreasing in i, so bucket j is the contiguous slice
    [lo_j, hi_j) with lo_j = ceil(j·n/word_len) — empty exactly for
    the j values the exploded pipeline never emitted. Every term is
    the SAME integer expression as before (bigint sums, truncating
    ``div``), and integer addition is order-free, so the output is
    identical row for row; rows with an empty/null vals array are
    dropped, exactly as posexplode dropped them."""
    if not 2 <= alphabet <= 36:
        raise ValueError("alphabet must be in [2, 36]")
    digits = "0123456789abcdefghijklmnopqrstuvwxyz"[:alphabet]
    wl = int(word_len)
    lo_j = f"(j * cast(size(vals) as bigint) + {wl - 1}) div {wl}"
    hi_j = (f"((j + 1) * cast(size(vals) as bigint) + {wl - 1})"
            f" div {wl}")
    paas = F.expr(
        f"transform(filter(sequence(bigint(0), bigint({wl - 1})),"
        f" j -> {hi_j} > {lo_j}),"
        f" j -> aggregate(slice(vals, cast({lo_j} as int) + 1,"
        f" cast({hi_j} - ({lo_j}) as int)),"
        f" cast(0 as bigint), (acc, x) -> acc + x)"
        f" div ({hi_j} - ({lo_j})))")
    word = F.expr(
        f"concat_ws('', transform(_paas,"
        f" p -> substring('{digits}', cast(least("
        f"bigint({alphabet - 1}),"
        f" (p - _lo) * {alphabet} div (_hi - _lo + 1)) as int) + 1,"
        f" 1)))")
    return (per.where(F.size("vals") > 0)
            .withColumn("_paas", paas)
            .withColumn("_lo", F.array_min("_paas"))
            .withColumn("_hi", F.array_max("_paas"))
            .select("series", F.size("vals").alias("n_points"),
                    word.alias("word")))


def wilson_bounds(k, n, z: float = 1.96):
    """Wilson score interval for a binomial proportion k/n — the
    uncertainty number a funnel/conversion report needs before
    anyone compares two rates. Built from +, −, ×, / and sqrt
    ONLY: IEEE-754 requires sqrt correctly rounded (unlike ln/exp,
    which the hashed-oracle policy bans), so with this FIXED
    operator order the bounds are bit-identical across Spark,
    DuckDB and CPython and can be hashed after rounding. z defaults
    to the 95% normal quantile as the conventional 1.96 LITERAL —
    a library erf would be transcendental. Returns (lo, hi)
    columns, NULL when n = 0 — and NULL (not NaN) for invalid
    inputs outside 0 ≤ k ≤ n: k > n or k < 0 puts a negative value
    under the sqrt, and a silent NaN would otherwise propagate into
    the hashed oracle surface."""
    kk = k.cast("double")
    nn = n.cast("double")
    zz = F.lit(float(z))
    z2 = zz * zz
    p = kk / nn
    denom = F.lit(1.0) + z2 / nn
    center = (p + z2 / (F.lit(2.0) * nn)) / denom
    half = (zz * F.sqrt(p * (F.lit(1.0) - p) / nn
                        + z2 / (F.lit(4.0) * (nn * nn)))) / denom
    ok = (n > 0) & (k >= 0) & (k <= n)
    lo = F.when(ok, center - half)
    hi = F.when(ok, center + half)
    return lo, hi
