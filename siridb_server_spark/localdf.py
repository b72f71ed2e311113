"""Arrow-path construction of small driver-local DataFrames.

``spark.createDataFrame(list_of_tuples, schema)`` always takes the
pickle path: the rows are shipped to the JVM as pickled Python
objects and every SCAN of the resulting LogicalRDD round-trips
through a Python worker to deserialize them. On this platform
(gVisor-sandboxed local mode) that round trip costs ~0.3-0.4 s per
scan — and ~1 s *per parent partition* when a ``coalesce`` folds
several of them into one task. A constant 8-row fixture frame was
paying more per query than a full sf0.1 parquet scan.

Routing the same rows through ``pandas`` + the Arrow conversion
(``spark.sql.execution.arrow.pyspark.enabled``) materializes them
JVM-side ONCE at creation; later scans are pure JVM (measured
0.045 s vs 0.33 s for the same 8-row frame). On a real cluster the
same applies: pickle-path local frames re-run Python deserializers
on every scan, Arrow-path frames are plain InternalRows.

``arrow_df`` is the drop-in replacement: identical signature and
semantics to ``createDataFrame(rows, schema)``, falling back to the
pickle path for row shapes Arrow can't convert (nested Rows in
object columns, etc. — correctness is never at risk, only speed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def arrow_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Build a DataFrame from driver-local ``rows`` through the Arrow
    path so subsequent scans never re-enter a Python worker.

    ``schema`` must be a StructType or a DDL string ("a long, b
    string"). Falls back to the classic pickle path when pandas/Arrow
    cannot represent the rows (the conversion itself raises — we never
    hand Arrow something silently lossy: explicit schema + Spark's own
    arrow-to-catalyst cast do the coercion, same as the pickle path).
    """
    from pyspark.sql import types as T

    if isinstance(schema, str):
        schema = T._parse_datatype_string(schema)
    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    try:
        import pandas as pd

        prev = spark.conf.get(
            "spark.sql.execution.arrow.pyspark.enabled", "false")
        pdf = pd.DataFrame.from_records(
            [tuple(r) for r in rows], columns=schema.fieldNames())
        spark.conf.set(
            "spark.sql.execution.arrow.pyspark.enabled", "true")
        try:
            return spark.createDataFrame(pdf, schema)
        finally:
            spark.conf.set(
                "spark.sql.execution.arrow.pyspark.enabled", prev)
    except Exception:
        return spark.createDataFrame(rows, schema)


def fan_out_keyed(df: DataFrame, *key_cols: str,
                  est_bytes: int | None = None) -> DataFrame:
    """Pin the NEXT keyed shuffle at core-count partitions when the
    input is provably small — the per-operator replacement for the
    r13 session-global AQE-floor config (removed on driver
    evidence: it taxed every multi-join plan to speed a handful of
    row-expanding ones). Rationale (guide §2.2/§2.5, §3.3): an
    operator that EXPANDS rows after its shuffle (grid explode,
    partitioned encode) gets its parallelism from that shuffle's
    post-AQE partition count, and AQE sizes partitions from the
    PRE-expansion bytes — a few MB of input coalesces to 1-2 tasks
    no matter how many rows the operator emits. A keyed repartition
    with an EXPLICIT partition count collapses into the downstream
    requirement (same single exchange — plan-asserted in pytest)
    and AQE never coalesces user-numbered repartitions.

    Scale-adaptive by construction: the gate is a size estimate —
    only an input estimated under ~1 MB/core (i.e. one AQE would
    coalesce below core count) is repinned; any realistic input
    leaves the plan byte-identical. Row-preserving: cannot change
    any downstream result.

    ``est_bytes``: callers that KNOW their source's size (e.g. an
    os.stat of the parquet file the frame scans) should pass it —
    the fallback asks the OPTIMIZER for the plan's estimate, and
    that Catalyst run costs ~0.1 s of driver time per call, a real
    tax on sub-second queries (measured: stats() ≈ 100-140 ms on
    these plans). Compressed on-disk bytes under-estimate the
    shuffle bytes, which only makes the gate more conservative
    (fires on strictly smaller inputs)."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    if est_bytes is not None:
        est = int(est_bytes)
    else:
        try:
            est = int(str(df._jdf.queryExecution().optimizedPlan()
                          .stats().sizeInBytes()))
        except Exception:
            return df
    if est <= 0 or est >= cores * (1 << 20):
        return df
    return df.repartition(cores, *key_cols)


def fan_out(df: DataFrame) -> DataFrame:
    """Spread a few-split input across the session's cores before a
    CPU-HEAVY ROW-LOCAL stage (md5 per gram, per-shingle hash
    families, signature votes) — guide §2.5/§6: derive partitioning
    from what the operator needs instead of inheriting whatever the
    scan produced. The testdata corpora are single-row-group parquet
    (one split), and the r13 sweep measured the heavy gram/signature
    operators near-linear in split count (raw gram explode 2.30 s at
    4 splits vs 0.64 s at 32 on 32 cores) while every LIGHT consumer
    of the same tables prefers the few-split scan (task overhead on
    sub-second queries — dedup_exact 0.24 s at 4 splits vs 0.59 s at
    32). So the fan-out lives HERE, at the heavy operators' entry,
    not in the shared loader. No-op whenever the input already has
    at least core-count partitions — at production scale inputs
    arrive as thousands of native splits and this adds nothing.
    Row-preserving: cannot change any downstream result."""
    sc = df.sparkSession.sparkContext
    cores = sc.defaultParallelism
    try:
        parts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if parts >= cores:
        return df
    return df.repartition(cores)
