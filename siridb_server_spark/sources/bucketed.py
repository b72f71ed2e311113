"""Bucketed corpus tables: pre-shuffled storage for co-located
fact-to-fact joins.

At 100 TB the joins that hurt are fact × fact on a shared key —
documents × embeddings on doc id, corpus × dedup-index on
fingerprint, points × annotations on series. Broadcasting is off the
table (neither side is small) and every ad-hoc join pays a full
shuffle of both sides. Bucketing pays that shuffle ONCE at write
time: both tables hash-partitioned into the same number of buckets
on the join key, so every later join (and groupBy on the key) is
exchange-free — the scan itself delivers co-partitioned splits.

This is Spark's native bucketing (``DataFrameWriter.bucketBy`` +
``saveAsTable``); buckets survive in the session catalog and the
files are plain parquet. The reference has no analogue (single-node,
its own shard files — ``/root/reference/src/siri/db/shard.c`` solves
physical locality per series the same way the store's shard
partitioning does); this module serves the training-data pipeline
side of the engine.

Scale notes:

- pick ``n_buckets`` so one bucket of the LARGER table fits an
  executor comfortably (~128–512 MB of parquet per bucket); both
  tables must use the SAME count for a shuffle-free join (Spark can
  also join pow2-ratio bucket counts when
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is set).
- ``sort_by`` the join key too: bucket files arrive pre-sorted, so
  the sort-merge join skips its per-partition sort at read time.
- bucket pruning: equality predicates on the bucket key scan ONE
  bucket (`spark.sql.sources.bucketing.enabled`, on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str | list,
                   n_buckets: int, path: str | None = None,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed parquet table in the session
    catalog. ``path`` makes it an external table (files live there;
    dropping the table keeps them). The write shuffles on ``key``
    once — that is the shuffle every subsequent co-located join
    skips."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.format("parquet").mode(mode) \
        .bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back. Bucket metadata lives in the
    catalog, so this must go through the table name — reading the
    parquet path directly loses the bucket spec (and with it the
    exchange-free join)."""
    return spark.table(table)


def colocated_join(spark: SparkSession, left: str, right: str,
                   on: str | list, how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket key. The
    physical plan contains NO Exchange on either side (pinned by
    tests/test_plans.py) — the scan's bucketing IS the partitioning
    the join needs. Sorted buckets also skip the merge-join sort."""
    keys = [on] if isinstance(on, str) else list(on)
    return read_bucketed(spark, left).join(
        read_bucketed(spark, right), keys, how)
