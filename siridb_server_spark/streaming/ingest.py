"""Structured Streaming ingest.

The reference's "streaming" is ingest-side only: clients push point
batches over TCP, the server buffers and flushes to shards
(src/siri/db/insert.c, series.c:131-178). There are no watermarks or
late-data semantics — late points are accepted and inserted in
ts-order (shard flag HAS_OVERLAP, shard.h:12). The Spark-equivalent
posture (SURVEY §2.8): an append-mode foreachBatch sink into the
partitioned store, NO watermark (late data must land), queries run
batch over the table.

``tee`` duplicates every incoming batch to a side output — the
equivalent of src/siri/db/tee.c (377 LoC, named-pipe fan-out).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model import POINTS_SCHEMA


def canonicalize(batch_df: DataFrame, series_col: str, ts_col: str,
                 value_col: str, seq_col: str | None = None) -> DataFrame:
    """Shape an arbitrary streaming frame into the points model.
    Value type is inferred from the column's Spark type (the model
    fixes a series' type at first insert, series.h:62)."""
    dtype = dict(batch_df.dtypes)[value_col]
    ts = F.col(ts_col).cast("long")
    seq = (F.col(seq_col).cast("long") if seq_col
           else F.monotonically_increasing_id())
    if dtype in ("bigint", "int", "smallint", "tinyint"):
        vals = [F.col(value_col).cast("long").alias("val_int"),
                F.lit(None).cast("double").alias("val_dbl"),
                F.lit(None).cast("string").alias("val_str"),
                F.lit(0).alias("tp")]
    elif dtype in ("double", "float") or dtype.startswith("decimal"):
        vals = [F.lit(None).cast("long").alias("val_int"),
                F.col(value_col).cast("double").alias("val_dbl"),
                F.lit(None).cast("string").alias("val_str"),
                F.lit(1).alias("tp")]
    else:
        vals = [F.lit(None).cast("long").alias("val_int"),
                F.lit(None).cast("double").alias("val_dbl"),
                F.col(value_col).cast("string").alias("val_str"),
                F.lit(2).alias("tp")]
    # the engine's insert path rejects negative timestamps
    # (model.point_row); the streaming path enforces the same model
    # invariant by dropping such rows (a stream can't raise back to
    # the producer) — also what keeps the store's bucket math and
    # rollup composition on the non-negative domain they assume
    return batch_df.select(
        F.col(series_col).cast("string").alias("series"),
        ts.alias("ts"), seq.alias("seq"), *vals) \
        .where(F.col("ts") >= 0)


def start_ingest(stream_df: DataFrame, store, *,
                 series_col: str = "series", ts_col: str = "ts",
                 value_col: str = "value", seq_col: str | None = None,
                 tee_path: str | None = None,
                 checkpoint: str | None = None,
                 trigger_seconds: float | None = None):
    """Start the append-only ingest job: micro-batch → canonical
    points → partitioned store append (the micro-batch IS the
    reference's write buffer, buffer.h:15); optional tee side-output.

    Returns the StreamingQuery (call .stop() / .awaitTermination())."""

    def sink(batch_df: DataFrame, batch_id: int):
        # tee duplicates the INCOMING batch before local processing,
        # exactly like the reference forwards the raw insert packet
        # to the pipe before handling it (tee.c)
        if tee_path is not None:
            (batch_df.write.mode("append")
             .option("compression", "zstd")
             .parquet(tee_path))
        pts = canonicalize(batch_df, series_col, ts_col, value_col,
                           seq_col)
        store.append_df(pts)

    writer = stream_df.writeStream.foreachBatch(sink) \
        .outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def windowed_rollup(stream_df: DataFrame, group_by_ns: int, *,
                    series_col: str = "series", ts_col: str = "ts",
                    value_col: str = "value",
                    watermark_delay: str | None = None):
    """Continuous tumbling-bucket rollup with the ENGINE's bucket
    semantics (right-closed, END-labeled, aggregate.c:41-43 — not
    F.window's left-closed buckets). Optional watermark for bounded
    state when the source can bound lateness; omit it for
    reference-parity (late data always accepted, SURVEY §2.8)."""
    g = int(group_by_ns)
    ts = F.col(ts_col).cast("long")
    shifted = ts + F.lit(g - 1)
    bucket = (shifted - (shifted % F.lit(g))).alias("bucket_ts")
    df = stream_df
    if watermark_delay is not None:
        # watermark needs a time-typed column; derive one transiently
        df = df.withColumn(
            "_event_time",
            F.timestamp_micros((ts / 1000).cast("long")))
        df = df.withWatermark("_event_time", watermark_delay)
    grouped = df.groupBy(F.col(series_col).alias("series"), bucket)
    return grouped.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(value_col).cast("double")).alias("sum"),
        F.min(F.col(value_col).cast("double")).alias("min"),
        F.max(F.col(value_col).cast("double")).alias("max"),
    )


def windowed_rollup_append(stream_df: DataFrame, group_by_ns: int, *,
                           watermark_delay: str = "10 seconds",
                           series_col: str = "series",
                           ts_col: str = "ts",
                           value_col: str = "value"):
    """Append-mode rollup with bounded state: the watermark closes
    buckets and DROPS later-than-delay data — the Spark-native scale
    path when the source can bound lateness (contrast: the engine /
    ``windowed_rollup`` accept late points forever, reference parity,
    SURVEY §2.8 — at the cost of unbounded reprocessing windows).

    Append mode requires the event-time window itself in the grouping
    keys, so the ENGINE's right-closed END-labeled buckets
    (aggregate.c:41-43) are expressed through ``F.window``'s
    left-closed [start, end) by shifting event time back one
    microsecond: a point at exactly k·g lands in [k·g - g, k·g) whose
    END is k·g — the engine's label. Requires ``group_by_ns`` to be a
    whole number of microseconds (every SiriDB bucket unit is).
    Output: (series, bucket_ts ns, cnt, sum, min, max) rows emitted
    once per closed bucket."""
    g = int(group_by_ns)
    if g % 1000:
        raise ValueError("group_by_ns must be whole microseconds")
    # ns → µs with the -1 ns shift for right-closed semantics, in
    # exact INTEGER arithmetic: `/` on bigints is double division,
    # and at epoch-ns magnitude (~1.6e18 > 2^53, ulp 256 ns) the
    # -1 shift would round away, mislabeling boundary points
    df = (stream_df
          .withColumn("_ts_l", F.col(ts_col).cast("long"))
          .withColumn("_event_time", F.timestamp_micros(
              F.expr("(_ts_l - 1) div 1000")))
          .drop("_ts_l")
          .withWatermark("_event_time", watermark_delay))
    win = F.window("_event_time", f"{g // 1000} microseconds")
    return (df.groupBy(F.col(series_col).alias("series"), win)
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.sum(F.col(value_col).cast("double")).alias("sum"),
                 F.min(F.col(value_col).cast("double")).alias("min"),
                 F.max(F.col(value_col).cast("double")).alias("max"))
            .select("series",
                    (F.unix_micros(F.col("window.end")) * 1000)
                    .alias("bucket_ts"),
                    "cnt", "sum", "min", "max"))
