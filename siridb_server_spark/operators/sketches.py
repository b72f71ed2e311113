"""Mergeable distinct-count sketches (HyperLogLog) as PLAIN
DataFrames — the incremental-analytics shape: build per-partition
register tables once, persist them as parquet, merge them with a
groupBy-max, estimate at read time. 100 TB of history is never
rescanned; a day's distincts cost one pass over that day.

Everything up to estimation is integer/string arithmetic derived
from md5 — deliberately: both Spark and DuckDB compute md5
identically, so the register tables are cross-engine reproducible
and the driver's value-hash gate can pin them (sketch_hll_* entries
mirror the construction in SQL verbatim). p=12 keeps the bucket and
the 48-bit suffix HEX-ALIGNED (3 + 12 hex chars), which is what
makes leading-zero counting expressible as string ops on the hex
digest — no log2, no bit intrinsics, nothing engine-specific.

The float estimation step (harmonic mean + the standard HLL
small-range correction) stays OUT of hashed oracles per the
transcendental-ban policy; its accuracy is pytest-verified against
exact countDistinct (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: register-index bits: 2^12 = 4096 registers, rsd ≈ 1.04/√m ≈ 1.6%
P = 12
M = 1 << P
#: max rho: 48 suffix bits all zero → 49
RHO_MAX = 49


def _rho_cols(member):
    """(bucket, rho) columns from md5(member): bucket = first 3 hex
    chars (12 bits), rho = 1 + leading zero bits of the next 12 hex
    chars (48 bits). Pure string/CASE ops — byte-identical in Spark
    and DuckDB."""
    h = F.md5(member.cast("string"))
    bucket = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    sfx = F.substring(h, 4, 12)
    t = F.regexp_replace(sfx, "^0*", "")
    lzhex = F.lit(12) - F.length(t)
    nib = F.conv(F.substring(t, 1, 1), 16, 10).cast("int")
    nib_lz = (F.when(nib >= 8, 0).when(nib >= 4, 1)
              .when(nib >= 2, 2).otherwise(3))
    rho = (F.when(t == "", F.lit(RHO_MAX))
           .otherwise(lzhex * 4 + nib_lz + 1)).cast("int")
    return bucket, rho


def hll_registers(df: DataFrame, key_cols, member_col: str) -> DataFrame:
    """Per-key HLL register table: (key..., bucket, rho) with one
    row per OCCUPIED register (missing buckets mean rho 0). One
    map-side-combinable groupBy-max — the sketch build is a single
    shuffle whose width is ≤ |keys|·4096 rows no matter how many
    member rows went in."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    bucket, rho = _rho_cols(F.col(member_col))
    return (df.where(F.col(member_col).isNotNull())
            .select(*key_cols, bucket.alias("bucket"),
                    rho.alias("rho"))
            .groupBy(*key_cols, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_merge(regs: DataFrame, key_cols) -> DataFrame:
    """Merge register tables (e.g. daily partials → a weekly or
    all-time sketch): registers combine by MAX, which is associative
    and idempotent — re-merging or double-counting a partial cannot
    inflate the estimate. ``regs`` may carry extra columns (day,
    source file); only (key..., bucket, rho) survive."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    return (regs.groupBy(*key_cols, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_estimate(regs: DataFrame, key_cols) -> DataFrame:
    """Distinct-count estimates from a register table: the standard
    HLL harmonic mean with the linear-counting small-range
    correction (Flajolet et al. 2007). Float math — pytest-verified
    against exact distincts, kept out of hashed oracle contracts.
    Output: (key..., estimate double, n_occupied long)."""
    import math

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    alpha = 0.7213 / (1 + 1.079 / M)
    agg = (regs.groupBy(*key_cols)
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                .alias("_occ_sum"),
                F.count(F.lit(1)).alias("n_occupied")))
    zeros = F.lit(M) - F.col("n_occupied")
    denom = F.col("_occ_sum") + zeros.cast("double")
    raw = F.lit(alpha * M * M) / denom
    lc = F.lit(float(M)) * (F.lit(math.log(M))
                            - F.log(zeros.cast("double")))
    est = F.when((raw <= F.lit(2.5 * M)) & (zeros > 0), lc) \
        .otherwise(raw)
    return agg.select(*key_cols, est.alias("estimate"),
                      "n_occupied")


#: SQL fragment mirroring :func:`hll_registers` for oracle entries —
#: format with member=expr, keys=select-list, table=FROM source
HLL_REGISTERS_SQL = (
    "SELECT {keys}, bucket,"
    " CAST(CASE WHEN t = '' THEN 49 ELSE"
    " (12 - length(t)) * 4 +"
    " (CASE WHEN nib >= 8 THEN 0 WHEN nib >= 4 THEN 1"
    " WHEN nib >= 2 THEN 2 ELSE 3 END) + 1 END AS INT) AS rho"
    " FROM (SELECT {keys}, bucket, t,"
    " CAST(('0x' || CASE WHEN t = '' THEN '0'"
    " ELSE substr(t, 1, 1) END) AS BIGINT) AS nib"
    " FROM (SELECT {keys},"
    " CAST(('0x' || substr(h, 1, 3)) AS BIGINT) AS bucket,"
    " regexp_replace(substr(h, 4, 12), '^0*', '') AS t"
    " FROM (SELECT {keys}, md5({member}) AS h FROM {table}"
    " WHERE {member} IS NOT NULL)))")


# ---------------------------------------------------------------- KMV
#: KMV sketch size: k smallest hash values per key. Distinct-count
#: rsd ≈ 1/√(k−2) ≈ 6% at k=256; intersection/Jaccard estimates are
#: what HLL can't give.
KMV_K = 256
#: hashes are the first 15 hex chars of md5 → 60-bit non-negative
#: ints, identically computable in DuckDB (('0x'||substr)::BIGINT)
KMV_SPACE = 1 << 60


def _kmv_hash(member):
    return F.conv(F.substring(F.md5(member.cast("string")), 1, 15),
                  16, 10).cast("long")


def kmv_sketch(df: DataFrame, key_cols, member_col: str,
               k: int = KMV_K) -> DataFrame:
    """Per-key KMV (k-minimum-values) sketch: the k smallest
    DISTINCT 60-bit member hashes, with their order statistic.
    Where HLL answers "how many distinct", KMV also answers "how
    much do two sets OVERLAP" (Beyer et al. 2007): merged sketches
    estimate unions, and Jaccard falls out of hash-set intersection
    over the union's k minima — the cheap cross-corpus
    contamination/overlap estimator.

    Integer-exact and cross-engine reproducible like the HLL
    registers (md5-derived hashes, one distinct + one windowed
    top-k). Output: (key..., pos 1..k, h)."""
    from pyspark.sql import Window

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    hashes = (df.where(F.col(member_col).isNotNull())
              .select(*key_cols,
                      _kmv_hash(F.col(member_col)).alias("h")))
    # same scale shape as the quantile sketch: a priority-threshold
    # prefilter keeps BOTH the distinct shuffle and the rank window
    # off the full hash stream (exact — see
    # _bottomk_prefilter_distinct; defined below, resolved at call
    # time)
    cand, active, n_keys = _bottomk_prefilter_distinct(
        hashes, list(key_cols), k, pri_col="h")
    w = Window.partitionBy(*key_cols).orderBy("h")

    def rank(src):
        return (src.withColumn("pos", F.row_number().over(w))
                .where(F.col("pos") <= k)
                .select(*key_cols, "pos", "h"))

    out = rank(cand)
    if not active:
        return out
    if n_keys * k > SKETCH_COLLECT_CAP_ROWS:
        # not provably driver-small: stay lazy, verify exactness
        # with the eager candidate-count action instead
        if not _bottomk_candidate_check(
                cand, list(key_cols), k,
                active):  # pragma: no cover — e^-hundreds odds
            return rank(hashes.distinct())
        return out
    # sketch rows are driver-small (≤ k per key over n_keys keys —
    # gated above): collect once, run the exactness check on the
    # result, and hand the caller a literal local relation — the
    # corpus is scanned exactly once per build
    out_rows = out.collect()
    if not _bottomk_exactness_check(
            out_rows, list(key_cols), k,
            active):  # pragma: no cover — e^-hundreds odds
        return rank(hashes.distinct())
    from ..localdf import arrow_df
    return arrow_df(df.sparkSession, out_rows, out.schema)


def kmv_merge(sketches: DataFrame, key_cols,
              k: int = KMV_K) -> DataFrame:
    """Union of KMV sketches: the k smallest of the combined hash
    sets — since every sketch holds its set's k minima, the union's
    k minima are contained in their concatenation, so the merge is
    EXACT (the theorem the sketch_kmv_merge oracle pins).
    Idempotent and associative like the HLL merge."""
    from pyspark.sql import Window

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    w = Window.partitionBy(*key_cols).orderBy("h")
    return (sketches.select(*key_cols, "h").distinct()
            .withColumn("pos", F.row_number().over(w))
            .where(F.col("pos") <= k)
            .select(*key_cols, "pos", "h"))


def kmv_estimate(sketch: DataFrame, key_cols,
                 k: int = KMV_K) -> DataFrame:
    """Distinct-count estimates: (k−1)/u_k with u_k the k-th
    minimum normalized to (0,1); keys holding fewer than k hashes
    are EXACT (the sketch saw every member). Float math —
    pytest-verified, outside hashed oracles."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    agg = (sketch.groupBy(*key_cols)
           .agg(F.count(F.lit(1)).alias("n_min"),
                F.max("h").alias("h_k")))
    u_k = F.col("h_k").cast("double") / F.lit(float(KMV_SPACE))
    est = F.when(F.col("n_min") < k,
                 F.col("n_min").cast("double")) \
        .otherwise(F.lit(float(k - 1)) / u_k)
    return agg.select(*key_cols, est.alias("estimate"), "n_min")


def kmv_jaccard(a: DataFrame, b: DataFrame,
                k: int = KMV_K) -> float:
    """Jaccard estimate between two single-key sketches (frames of
    (pos, h) or (key, pos, h) with one key): over the k minima of
    the UNION, the fraction present in both input hash sets
    estimates |A∩B|/|A∪B| (each union-minimum is a uniform sample
    of A∪B). Driver-side on ≤3k rows — bounded by construction."""
    ha = {r["h"] for r in a.select("h").collect()}
    hb = {r["h"] for r in b.select("h").collect()}
    union_k = sorted(ha | hb)[:k]
    if not union_k:
        return 0.0
    inter = sum(1 for h in union_k if h in ha and h in hb)
    return inter / len(union_k)


# ----------------------------------------------------- quantile sample
#: quantile-sketch sample size: k rows per key. Rank error of the
#: sample q-quantile is ~ n·√(q(1−q)/k) (≈ 3% of n at k=256, q=0.5)
QSK_K = 256


def _row_priority(id_expr):
    """60-bit md5 priority of a row id — the deterministic 'coin'.
    A row's priority depends only on its id, so the k
    smallest-priority rows form a uniform without-replacement sample
    that every engine (and every partitioning) reconstructs
    identically. Randomized samplers (reservoir, KLL compaction
    coins) can't be pinned by a cross-engine value hash; this one
    can."""
    return F.conv(F.substring(F.md5(id_expr.cast("string")), 1, 15),
                  16, 10).cast("long")


#: pre-filter expectation multiple: keep ~PREF_MULT·k candidates
#: per key before the window (failure odds exp(-k·(PREF_MULT−1)²/…)
#: — astronomically small at 8×, and the fallback restores
#: exactness regardless)
PREF_MULT = 8


def _bottomk_prefilter_distinct(rows: DataFrame, key_cols: list,
                                k: int, pri_col: str = "pri"):
    """DISTINCT bottom-k superset of ``rows`` (key..., pri, ...):
    shrink to ~PREF_MULT·k candidates per key, then dedupe — WITHOUT
    changing the distinct bottom-k. Priorities are uniform 60-bit
    hashes, so rows with pri < PREF_MULT·k/n̂ · 2⁶⁰ number
    ~PREF_MULT·k per key (n̂ = approx_count_distinct of the
    priorities — HLL-based, partition-order independent, ±5%, far
    inside the 8× headroom); whenever ≥ k DISTINCT candidates
    survive they provably contain the k smallest distinct values
    (anything above the threshold is larger than k of them). This is
    what makes the sketch build scale: the corpus-size passes are a
    partial-agg sketch count and a broadcast-join filter — both
    scan-shaped; the dedup shuffle and the rank window only ever see
    the ~8k-row-per-key remnant. (An earlier draft deduped BEFORE
    filtering; with no exchange reuse across the check branches that
    recomputed a corpus-wide distinct up to 4×.)

    Returns ``(cand, active, n_keys)``: ``cand`` is the DISTINCT
    bottom-k superset (lazy), ``active`` the driver-side set of key
    tuples whose threshold was REAL (thr < KMV_SPACE; empty ⇒
    ``cand`` is just ``rows.distinct()``), ``n_keys`` the observed
    key count (the caller's n_keys·k driver-size bound for its
    collect-the-sketch fast path). Exactness is still CHECKED, not
    assumed, but by the CALLER on its (driver-small by contract)
    final sketch rows: for every active key, < k surviving distinct
    rows (possible only through astronomical hash luck) must route
    the build through the unfiltered path. Moving the check onto the
    k-rows-per-key OUTPUT — instead of an eager extra action over
    ``cand`` here — halves the corpus passes per build: the old
    shape ran est+cand once for the check and recomputed both in the
    final plan; now the |keys|-row estimate aggregate is collected
    ONCE (it had to be broadcast-small anyway — the thresholds
    rejoin as a literal local relation) and the filter pass runs
    once."""
    from ..localdf import arrow_df
    from pyspark.sql import types as T

    est_rows = (rows.groupBy(*key_cols)
                .agg(F.approx_count_distinct(pri_col).alias("_n"))
                .collect())
    active = set()
    bounds = []
    for r in est_rows:
        kt = tuple(r[c] for c in key_cols)
        n = int(r["_n"])
        if n <= PREF_MULT * k:
            thr = KMV_SPACE
        else:
            # same integer math as the former SQL expression:
            # (KMV_SPACE DIV n̂) · (PREF_MULT·k)
            thr = (KMV_SPACE // n) * (PREF_MULT * k)
            active.add(kt)
        bounds.append(kt + (thr,))
    if not active:
        return rows.distinct(), active, len(est_rows)
    schema = T.StructType(
        [rows.schema[c] for c in key_cols]
        + [T.StructField("_thr", T.LongType())])
    bdf = arrow_df(rows.sparkSession, bounds, schema)
    cand = (rows.join(F.broadcast(bdf), list(key_cols))
            .where(F.col(pri_col) < F.col("_thr"))
            .drop("_thr")
            .distinct())
    return cand, active, len(est_rows)


#: collect-the-sketch fast-path bound: above n_keys·k ≈ this many
#: rows the sketch is no longer provably driver-small (driver
#: maxResultSize / memory), so the build returns the LAZY rank plan
#: and verifies exactness with an eager candidate-count action
#: instead (one extra aggregate pass over the ~PREF_MULT·k-per-key
#: remnant — never the corpus)
SKETCH_COLLECT_CAP_ROWS = 1 << 20


def _bottomk_candidate_check(cand: DataFrame, key_cols: list,
                             k: int, active) -> bool:
    """Eager twin of :func:`_bottomk_exactness_check` for sketches
    too large to collect: every active key must keep ≥ k distinct
    candidates (``cand`` is already distinct, so a plain count per
    key counts distinct rows). |keys| result rows — the same driver
    size as the estimate aggregate that built the thresholds."""
    cnt = {tuple(r[c] for c in key_cols): r["_c"]
           for r in (cand.groupBy(*key_cols)
                     .agg(F.count(F.lit(1)).alias("_c"))
                     .collect())}
    return all(cnt.get(kt, 0) >= k for kt in active)


def _bottomk_exactness_check(out_rows, key_cols: list, k: int,
                             active) -> bool:
    """True iff the prefiltered build is PROVEN exact: every key
    whose threshold was real kept ≥ k distinct rows (they then
    provably contain the true bottom-k — anything cut was larger
    than k survivors). A key missing from ``out_rows`` entirely
    counts as 0 — the former bounds-side left join's guarantee."""
    from collections import Counter

    cnt = Counter(tuple(r[c] for c in key_cols) for r in out_rows)
    return all(cnt.get(kt, 0) >= k for kt in active)


def quantile_sketch(df: DataFrame, key_cols, value_col: str,
                    id_col: str, k: int = QSK_K,
                    prefilter: bool = True) -> DataFrame:
    """Per-key mergeable quantile sketch: the k rows with the
    smallest md5(id) priorities, carrying their values — a
    deterministic bottom-k priority sample (Duffield et al. 2007's
    priority sampling with a hash in place of the RNG; the KLL/GK
    alternative is order-dependent or coin-dependent and therefore
    unpinnable across engines). Any sample order statistic estimates
    the matching population quantile; the sketch is a plain
    DataFrame, persists as parquet, and merges EXACTLY (the global
    bottom-k lives inside the union of per-partial bottom-k — the
    KMV containment theorem applied to rows).

    Scale shape: the corpus-size work is one approx-distinct
    partial aggregate plus a priority threshold filter
    (:func:`_bottomk_prefilter_distinct`); the rank window — a
    per-key SORT, the one thing that must never see the full table
    — runs over the ~8k-row surviving candidates, as does the
    distinct shuffle.
    At 100 TB: build per-day partials in each day's ingest pass,
    merge with :func:`quantile_merge` at read time; history is
    never rescanned.

    Output: (key..., pos 1..k, pri, val). Ties (60-bit priority
    collisions) break deterministically on (val, pri)."""
    from pyspark.sql import Window

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    # distinct on (key, pri, val): duplicate (id, value) rows are
    # treated as redelivered copies, exactly like KMV's distinct
    # hashes — this is what makes build and merge agree (merge
    # dedupes partials on the same columns) and re-merging
    # idempotent. The prefilter performs the dedup AFTER its
    # threshold filter (same result — distinct commutes with a
    # row-deterministic filter — but the shuffle only carries the
    # ~8k-row remnant). NULL ids are excluded: a NULL priority
    # would rank first in Spark and last in DuckDB.
    rows = (df.where(F.col(value_col).isNotNull()
                     & F.col(id_col).isNotNull())
            .select(*key_cols,
                    _row_priority(F.col(id_col)).alias("pri"),
                    F.col(value_col).alias("val")))
    w = Window.partitionBy(*key_cols).orderBy("pri", "val")

    def rank(src):
        return (src.withColumn("pos", F.row_number().over(w))
                .where(F.col("pos") <= k)
                .select(*key_cols, "pos", "pri", "val"))

    if not prefilter:
        return rank(rows.distinct())
    cand, active, n_keys = _bottomk_prefilter_distinct(
        rows, key_cols, k)
    out = rank(cand)
    if not active:
        return out
    if n_keys * k > SKETCH_COLLECT_CAP_ROWS:
        # see kmv_sketch: not provably driver-small — stay lazy
        if not _bottomk_candidate_check(
                cand, key_cols, k,
                active):  # pragma: no cover — e^-hundreds odds
            return rank(rows.distinct())
        return out
    # see kmv_sketch: collect the (driver-small, gated above) sketch
    # once, check exactness on the result, return a local relation
    out_rows = out.collect()
    if not _bottomk_exactness_check(
            out_rows, key_cols, k,
            active):  # pragma: no cover — e^-hundreds odds
        return rank(rows.distinct())
    from ..localdf import arrow_df
    return arrow_df(df.sparkSession, out_rows, out.schema)


def quantile_merge(sketches: DataFrame, key_cols,
                   k: int = QSK_K) -> DataFrame:
    """Merge quantile-sketch partials: keep the k smallest
    priorities of the union. EXACT — equals the one-shot sketch over
    the combined rows (each partial retains its own bottom-k, and
    the union's bottom-k is contained in their concatenation), so
    merging is associative and idempotent; re-merging a partial
    cannot bias the sample. Distinct on (pri, val) absorbs
    re-delivered copies of the same partial — the same dedup the
    BUILD applies to its input rows, so merge == one-shot holds
    even when the raw input carried duplicate (id, value) rows."""
    from pyspark.sql import Window

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    w = Window.partitionBy(*key_cols).orderBy("pri", "val")
    return (sketches.select(*key_cols, "pri", "val").distinct()
            .withColumn("pos", F.row_number().over(w))
            .where(F.col("pos") <= k)
            .select(*key_cols, "pos", "pri", "val"))


def quantile_estimate(sketch: DataFrame, key_cols,
                      q_ppm: list) -> DataFrame:
    """Quantile estimates from a sketch: for each requested quantile
    q (given in INTEGER parts-per-million to keep the whole path in
    exact arithmetic), the sample order statistic at position
    ceil(q·k') with k' the per-key sample size — the standard
    sample-quantile estimator, rank error ~ n·√(q(1−q)/k').
    Everything is integer math plus a pass-through of source values,
    so estimates are hashable cross-engine (no transcendentals, no
    float division). Output: (key..., q_ppm, sample_n, est).

    The sketch's ``pos`` is PRIORITY order (the merge invariant);
    the order statistic needs VALUE order, so the sample is
    re-ranked by val here — a window over ≤k rows per key, trivial
    at any scale."""
    from pyspark.sql import Window

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    spark = sketch.sparkSession
    qf = F.broadcast(spark.range(1).select(
        F.explode(F.array(*[F.lit(int(q)) for q in q_ppm]))
        .alias("q_ppm")))
    wv = Window.partitionBy(*key_cols).orderBy("val", "pri")
    sketch = (sketch.select(*key_cols, "pri", "val")
              .withColumn("pos", F.row_number().over(wv)))
    kk = (sketch.groupBy(*key_cols)
          .agg(F.max("pos").alias("sample_n")))
    tgt = kk.crossJoin(qf).withColumn(
        "tpos",
        F.expr("(CAST(q_ppm AS BIGINT) * sample_n + 999999)"
               " div 1000000").cast("int"))
    tgt = tgt.withColumn(
        "tpos", F.greatest(F.lit(1), F.least(F.col("tpos"),
                                             F.col("sample_n"))))
    return (tgt.join(sketch.select(*key_cols,
                                   F.col("pos").alias("tpos"),
                                   F.col("val").alias("est")),
                     [*key_cols, "tpos"])
            .select(*key_cols, "q_ppm", "sample_n", "est"))


def _bloom_positions(member, m_bits: int, k: int) -> list:
    """k bit positions from ONE md5 digest: non-overlapping 7-hex
    (28-bit) slices mod ``m_bits`` — the same one-digest budget the
    count-min sketch uses (depth ≤ 4), so k ≤ 4. Pure string/conv
    arithmetic, byte-identical in Spark and DuckDB
    (``('0x' || substr(md5(x), 1 + 7·i, 7))::BIGINT % m``)."""
    if not 1 <= int(k) <= 4:
        raise ValueError("k must be in [1, 4] (one md5 digest)")
    if int(m_bits) < 2:
        raise ValueError("m_bits must be >= 2")
    h = F.md5(member.cast("string"))
    return [F.pmod(F.conv(F.substring(h, 1 + 7 * i, 7), 16, 10)
                   .cast("long"), F.lit(int(m_bits)))
            for i in range(int(k))]


def bloom_bits(df: DataFrame, key_cols, member_col: str,
               m_bits: int = 1 << 20, k: int = 4) -> DataFrame:
    """Bloom membership sketch as a PLAIN integer relation — the
    family's shape (HLL registers, KMV values): the sketch IS the
    distinct (key_cols..., bit) set-bit table. Build per partition/
    day/source, persist as parquet, MERGE BY UNION (set-OR is
    distinct on the union — :func:`bloom_merge`), probe with
    :func:`bloom_might_contain`. The structure a 100 TB
    decontamination or novelty pass uses when the reference's
    member set can't be collected or broadcast: membership tests
    against ~m/8 bytes instead of the member set, no false
    negatives ever (every member's k bits are set by
    construction), false positives at the standard
    (1 − e^(−k·n/m))^k rate.

    md5-derived positions, so the relation is cross-engine
    reproducible and the driver's value-hash gate pins it (the
    sketch_bloom_membership oracle replays build AND probe in
    SQL). NULL members are EXCLUDED (md5(NULL) has no positions) —
    the family's documented NULL posture. Output:
    (key_cols..., bit), distinct."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    keys = [F.col(c) for c in (key_cols or [])]
    pos = _bloom_positions(F.col(member_col), m_bits, k)
    return (df.where(F.col(member_col).isNotNull())
            .select(*keys, F.explode(F.array(*pos)).alias("bit"))
            .distinct())


def bloom_merge(sketches: DataFrame, key_cols) -> DataFrame:
    """Set-OR of bloom sketches: union the bit relations, distinct.
    Exact merge is the Bloom theorem (bits(A ∪ B) = bits(A) ∪
    bits(B) for a shared geometry) — pinned by pytest."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    return sketches.select(*(key_cols or []), "bit").distinct()


def bloom_might_contain(items: DataFrame, bloom: DataFrame,
                        member_col: str, m_bits: int = 1 << 20,
                        k: int = 4, key_cols=None,
                        broadcast_bloom: bool = True) -> DataFrame:
    """Probe: an item MIGHT be a member iff all k of its bit
    positions are set. One join of the probes' (key, bit) stream
    against the bit relation (broadcast for driver-small sketches;
    ``broadcast_bloom=False`` for a shuffled hash join when m is
    huge), one groupBy counting matched positions — hits == k is
    the verdict. Repeated positions (two hash slices landing on
    the same bit) stay correct: a row per slice must match, and
    duplicates of a set bit match with their multiplicity.
    Output: distinct (key_cols..., member_col, might_contain)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    keys = list(key_cols or [])
    probes = (items.where(F.col(member_col).isNotNull())
              .select(*keys, F.col(member_col).alias("_member"))
              .distinct())
    pb = probes.select(
        *keys, "_member",
        F.explode(F.array(*_bloom_positions(
            F.col("_member"), m_bits, k))).alias("bit"))
    b = bloom.select(*keys, "bit")
    if broadcast_bloom:
        b = F.broadcast(b)
    hits = (pb.join(b, keys + ["bit"], "semi")
            .groupBy(*keys, "_member")
            .agg(F.count(F.lit(1)).alias("_hits")))
    return (probes.join(hits, keys + ["_member"], "left")
            .select(*keys, F.col("_member").alias(member_col),
                    (F.coalesce("_hits", F.lit(0))
                     == F.lit(int(k))).alias("might_contain")))
