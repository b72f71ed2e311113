"""Persistent points storage: shard-equivalent partitioned parquet.

Reference storage model: time-bucketed shard files, shard id =
ts/duration*duration, per-series compressed blocks with a
(start_ts, end_ts) index (src/siri/db/shards.c:273-340,
series.h:149-157). Spark-first re-expression:

    <path>/kind=num|log/sid=<bucket>/part-*.parquet

- ``sid`` (the shard id) is a physical partition column → time-range
  queries prune whole directories (the analogue of shard skipping,
  series.c:927-938); within a file, parquet row-group min/max stats on
  ``ts``/``series`` replace the reference's per-series block index —
  both come free from the format.
- numeric vs string series live in separate ``kind`` partitions with
  independent durations (duration_num/duration_log), mirroring the
  reference's number/log shard split.
- compression: parquet dictionary/delta encodings + zstd replace the
  custom int-zip/double-xor codecs (points.c:459-889).
- out-of-order and duplicate-ts points append as-is (the reference
  marks such shards HAS_OVERLAP and re-sorts on read, shard.h:12;
  here sorting happens in the query's window/agg operators anyway).
- ``optimize()`` = the background shard-rewrite job (optimize.c:33-55):
  rewrites small fragmented appends into one compact file per
  partition.

At 100 TB: the same layout holds — sid partitions bound scan width,
appends are per-micro-batch files, OPTIMIZE compacts, and retention
drops whole sid directories without touching data files.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import POINTS_SCHEMA, TP_STRING

#: target points per shard (ref src/siri/db/shard.c:36)
OPTIMAL_POINTS_PER_SHARD = 2000

#: hash buckets for the incrementally-maintained series catalog — an
#: ingest batch rewrites only the buckets its series hash into, so the
#: per-batch catalog cost is O(|catalog|/buckets × touched buckets)
#: instead of a single-task full rewrite. This is the FLOOR: the
#: bucket count auto-grows at compaction time (powers of two, never
#: shrinks) so each bucket stays under TARGET_ROWS_PER_BUCKET rows —
#: a 100M-series catalog ends up at 128 buckets without anyone tuning
#: it. Pass PointsStore(catalog_buckets=...) to pin a fixed count.
N_CATALOG_BUCKETS = 8

#: auto-scale target: grow the bucket count once the average bucket
#: would exceed this many catalog rows
TARGET_ROWS_PER_BUCKET = 1_000_000

#: appends whose landed parquet bytes fit under this compute their
#: catalog delta with pyarrow on the driver — one fewer Spark job per
#: micro-batch (the common streaming-ingest shape). Larger appends
#: read the landed files back distributed.
ARROW_STATS_MAX_BYTES = 64 * 1024 * 1024

#: driver-held row batches up to this size write through the pure
#: pyarrow path (zero Spark jobs); beyond it, distribute via Spark
LOCAL_APPEND_MAX_ROWS = 5_000_000

_STATS_COLS = ["series", "ts", "seq", "val_int", "val_dbl",
               "val_str", "tp"]


def _pa_points_schema():
    import pyarrow as pa

    return pa.schema([
        ("series", pa.string()), ("ts", pa.int64()),
        ("seq", pa.int64()), ("val_int", pa.int64()),
        ("val_dbl", pa.float64()), ("val_str", pa.string()),
        ("tp", pa.int32())])


def _fold_stats_table(tbl) -> dict:
    """Fold a pyarrow points table into the catalog-stats dict
    ``{name: (length, start, end, tp, (f_seq, f_int, f_dbl, f_str),
    (l_seq, l_int, l_dbl, l_str))}`` — the driver-side twin of the
    Spark ``_batch_stats`` aggregation (first/last = argmin/argmax
    over (ts, seq)).

    Vectorized group-boundary fold: dictionary-encode the series
    column, lexsort (series, ts, seq), and read every per-group stat
    off the sorted arrays — firsts/lasts are the boundary rows,
    lengths are boundary diffs, tp is a ``maximum.reduceat``. The
    only Python-loop work is building the G-entry output dict, and
    the typed first/last values are materialized for just the 2·G
    boundary rows (``take`` keeps pyarrow's null-vs-NaN distinction,
    which pandas would destroy). Replaces a pandas object-sort +
    per-series ``.loc`` loop that cost ~0.9 s per 100k-point append
    (the round-6 ingest regression)."""
    import numpy as np
    import pyarrow as pa

    n = tbl.num_rows
    if n == 0:
        return {}
    dce = tbl.column("series").combine_chunks().dictionary_encode()
    codes = dce.indices.to_numpy()
    names = dce.dictionary.to_pylist()
    ts = tbl.column("ts").combine_chunks().to_numpy()
    seq = tbl.column("seq").combine_chunks().to_numpy()
    tp = tbl.column("tp").combine_chunks().to_numpy()
    order = np.lexsort((seq, ts, codes))
    codes_s = codes[order]
    starts = np.flatnonzero(
        np.r_[True, codes_s[1:] != codes_s[:-1]])
    stops = np.r_[starts[1:], n]
    first_idx = order[starts]
    last_idx = order[stops - 1]
    lengths = stops - starts
    tp_max = np.maximum.reduceat(tp[order], starts)
    f_take = pa.array(first_idx)
    l_take = pa.array(last_idx)

    def _vals(idx_arr):
        return [tbl.column(c).take(idx_arr).to_pylist()
                for c in ("val_int", "val_dbl", "val_str")]

    f_int, f_dbl, f_str = _vals(f_take)
    l_int, l_dbl, l_str = _vals(l_take)
    grp_names = [names[codes_s[s]] for s in starts]
    folded = {}
    for i, name in enumerate(grp_names):
        fi, li = first_idx[i], last_idx[i]
        folded[name] = (
            int(lengths[i]), int(ts[fi]), int(ts[li]),
            int(tp_max[i]),
            (int(seq[fi]), f_int[i], f_dbl[i], f_str[i]),
            (int(seq[li]), l_int[i], l_dbl[i], l_str[i]))
    return folded


def write_arrow_delta(path: str, folded: dict, buckets: int):
    """Append one catalog delta commit driver-side with pyarrow.

    ``folded`` is ``{name: (length, start, end, tp,
    (f_seq, f_int, f_dbl, f_str), (l_seq, l_int, l_dbl, l_str))}``.
    Writes one file per touched bucket under the same Hive-style
    ``bucket=N/`` layout as the engine's sharded Spark delta append —
    a consistent layout is what lets one ``spark.read`` cover deltas
    from both writers. All files of the commit share one uuid, so the
    store's append counter sees a single append. Bucket values are
    re-derived on fold, but use the store's persisted count so
    pruning stays aligned after an auto-resize."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from .xxh import xxh64_signed

    if not folded:
        return
    by_bucket: dict = {}
    for n in sorted(folded):
        b = xxh64_signed(n.encode("utf-8")) % buckets
        by_bucket.setdefault(b, []).append(n)
    ddir = os.path.join(path, "_catalog_delta")
    commit = uuid.uuid4().hex
    for b, names in by_bucket.items():
        delta = pa.table({
            "name": pa.array(names, pa.string()),
            "length": pa.array(
                [folded[n][0] for n in names], pa.int64()),
            "start": pa.array(
                [folded[n][1] for n in names], pa.int64()),
            "end": pa.array(
                [folded[n][2] for n in names], pa.int64()),
            "tp": pa.array(
                [folded[n][3] for n in names], pa.int32()),
            "f_seq": pa.array(
                [folded[n][4][0] for n in names], pa.int64()),
            "f_int": pa.array(
                [folded[n][4][1] for n in names], pa.int64()),
            "f_dbl": pa.array(
                [folded[n][4][2] for n in names], pa.float64()),
            "f_str": pa.array(
                [folded[n][4][3] for n in names], pa.string()),
            "l_seq": pa.array(
                [folded[n][5][0] for n in names], pa.int64()),
            "l_int": pa.array(
                [folded[n][5][1] for n in names], pa.int64()),
            "l_dbl": pa.array(
                [folded[n][5][2] for n in names], pa.float64()),
            "l_str": pa.array(
                [folded[n][5][3] for n in names], pa.string()),
        })
        bdir = os.path.join(ddir, f"bucket={b}")
        os.makedirs(bdir, exist_ok=True)
        pq.write_table(delta, os.path.join(
            bdir, f"delta-{commit}.parquet"))


#: ref src/siri/db/points.c:18
TOLERANCE_INTERVAL_DETECT = 10


def interval_from_points(ts_sorted) -> int:
    """Exact port of siridb_points_get_interval
    (points.c:1747-1787): the median of the first ≤63 consecutive
    ts deltas; 0 (undetected) when fewer than 8 points or when the
    Q1/Q3 spread exceeds 10% of the median (irregular sampling)."""
    if len(ts_sorted) < 8:
        return 0
    n = min(len(ts_sorted) - 1, 63)
    arr = sorted(ts_sorted[i + 1] - ts_sorted[i] for i in range(n))
    a_i = n // 4
    b_i = n // 2
    c = arr[(b_i << 1) - a_i]
    a, b = arr[a_i], arr[b_i]
    x = b // (100 // TOLERANCE_INTERVAL_DETECT)
    return 0 if (a + x < b or c - x > b) else b


def duration_from_interval(interval: int, factor: int,
                           duration_num: int = 0,
                           duration_log: int = 0) -> int:
    """Auto shard-duration from the median insert interval — exact
    port of siridb_shard_duration_from_interval
    (src/siri/db/shard.c:136-167)."""
    n = interval * OPTIMAL_POINTS_PER_SHARD
    if n == duration_num:
        return duration_num
    if n == duration_log:
        return duration_log
    week = 3600 * 24 * 7 * factor
    x = n // week
    if x:
        return (x + 1) * week
    day = 3600 * 24 * factor
    x = n // day
    if x:
        return (x + 1) * day
    hour = 3600 * factor
    x = n // hour
    return (x + 1) * hour


class PointsStore:
    def __init__(self, path: str, duration_num: int, duration_log: int,
                 catalog_buckets: int | None = None):
        self.path = path
        self.duration_num = duration_num
        self.duration_log = duration_log
        #: explicit override pins the count; None = auto-scale from
        #: the observed catalog size at compaction time
        self._buckets_fixed = catalog_buckets
# class-level: see _process_active below (shared across every store
# instance AND the Arrow datasource writer in this process)

    # ------------------------------------------------------------- write
    def _with_partitions(self, df: DataFrame) -> DataFrame:
        dur = F.when(F.col("tp") == TP_STRING,
                     F.lit(self.duration_log)) \
            .otherwise(F.lit(self.duration_num))
        return df.withColumn(
            "kind", F.when(F.col("tp") == TP_STRING, "log")
            .otherwise("num")) \
            .withColumn("sid", (F.col("ts") - F.col("ts") % dur)
                        .cast("long"))

    def append_df(self, df: DataFrame):
        # crash-consistency protocol for the maintained catalog: the
        # pending marker is set BEFORE points land and cleared only
        # AFTER the catalog swap. An interrupt anywhere between
        # (killed micro-batch, process crash) leaves the marker, and
        # the next read_catalog() sees it and rebuilds — the catalog
        # can lag but can never silently under-count. (On Delta the
        # same guarantee comes from writing both in one transaction.)
        spark = df.sparkSession
        with self._pending():
            # cluster the batch by its output partitions before the
            # write (guide §6: output file sizing): without this a
            # single-split source writes EVERY (kind, sid) dir from
            # one task (serialized encoding), and a many-split
            # source writes splits×dirs tiny files. REBALANCE is
            # AQE-aware — small batches coalesce to few tasks, a
            # skewed shard splits — with a plain hash repartition
            # fallback for AQE-off sessions.
            batch = self._with_partitions(df)
            # DataFrame.hint never raises for unsupported hints (an
            # unresolved hint is dropped at analysis with a warning),
            # so an AQE-off session must be detected explicitly for
            # the plain hash-repartition fallback to ever run
            aqe_on = str(spark.conf.get(
                "spark.sql.adaptive.enabled", "true")).lower()
            # (r14 note: a fan_out_keyed(batch, "kind", "sid") pass
            # was tried here and removed — sid is a TIME bucket, so
            # a small batch holds only a handful of distinct
            # (kind, sid) dirs and a keyed repartition cannot beat
            # REBALANCE's clustering by more than that dir count,
            # while its size-estimate gate re-ran the optimizer on
            # the whole upstream batch plan per append (~0.1 s of
            # driver time). Interleaved A/B measured the hint-only
            # shape equal-or-faster.)
            if aqe_on == "true":
                batch = batch.hint("rebalance", "kind", "sid")
            else:
                batch = batch.repartition("kind", "sid")
            landed = self._append_via_stage(
                batch, self.path, ["kind", "sid"],
                compression="zstd")
            if landed:
                # compute the catalog stats from the columnar bytes
                # JUST WRITTEN (restricted to this append's files)
                # instead of executing the batch plan a second time —
                # the upstream pipeline may be arbitrarily expensive,
                # the read-back is a pruned scan of what it produced.
                # Small appends (streaming micro-batches) fold the
                # stats driver-side with pyarrow — no second Spark
                # job at all; big ones read back distributed.
                if not self._merge_catalog_arrow(spark, landed):
                    stats_src = (spark.read
                                 .option("basePath", self.path)
                                 .parquet(*landed))
                    self._merge_catalog(spark,
                                        self._batch_stats(stats_src))
        if not os.path.exists(self._durations_path):
            # the durations define the sid layout; persist them with
            # the first data so every later opener agrees
            self.persist_durations()

    def _append_via_stage(self, df: DataFrame, target: str,
                          partition_cols: list,
                          compression: str | None = None):
        """Append by staging to a per-append sibling dir and renaming
        the files into place. A direct ``mode("append")`` is NOT safe
        under concurrent appenders: Hadoop's FileOutputCommitter
        shares one ``_temporary/0`` under the target, so one job's
        commit/cleanup deletes the other's staging mid-flight
        (observed as FileNotFoundException in the concurrency test).
        Staging dirs are unique per append and the moved part files
        carry per-job uuids, so concurrent appends are pure disjoint
        file additions; a crash mid-move leaves a partial set of
        visible files, which the caller's pending marker already
        covers (one-time catalog rebuild). Returns the list of moved
        (now-visible) file paths."""
        # dot-prefixed: invisible to Spark's file listing, so a
        # crash-leftover stage can never pollute reads
        stage = os.path.join(target, f".append-{uuid.uuid4().hex}")
        w = df.write.partitionBy(*partition_cols).mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        w.parquet(stage)
        moved = []
        try:
            for root, dirs, files in os.walk(stage):
                dirs[:] = [d for d in dirs if not d.startswith(".")]
                rel = os.path.relpath(root, stage)
                for f in files:
                    if not f.endswith(".parquet"):
                        continue
                    dest = target if rel == "." \
                        else os.path.join(target, rel)
                    os.makedirs(dest, exist_ok=True)
                    os.rename(os.path.join(root, f),
                              os.path.join(dest, f))
                    moved.append(os.path.join(dest, f))
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        return moved

    def append_rows(self, spark: SparkSession, rows: list):
        self.append_local(spark, rows)

    # alias used by the engine
    def append(self, spark: SparkSession, rows: list):
        self.append_rows(spark, rows)

    # -------------------------------------------------------------- read
    def read(self, spark: SparkSession) -> DataFrame:
        """Canonical points frame + the ``sid`` partition column (the
        engine adds sid predicates from time ranges → directory-level
        pruning shows up as PartitionFilters in the scan)."""
        self._repair_rewrites()
        if not self._exists():
            return spark.createDataFrame([], POINTS_SCHEMA)
        return spark.read.parquet(self.path).select(
            "series", "ts", "seq", "val_int", "val_dbl", "val_str",
            "tp", F.col("sid").cast("long").alias("_sid"))

    def _exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            e.startswith("kind=") for e in os.listdir(self.path))

    # ------------------------------------------------------------ catalog
    # Incrementally-maintained series catalog: (name, length, start,
    # end, tp) merged per ingest batch. The reference keeps the same
    # stats live on each series struct (series.h:54-72, updated on
    # every insert); a derived groupBy over the points table would be
    # a full 100 TB scan per `list series`/skip-points query, while
    # this merge costs O(|catalog| + |batch|) per batch. The side
    # table lives under `_catalog` — Spark's scan ignores
    # underscore-prefixed paths, so it's invisible to points reads.
    @property
    def _catalog_path(self) -> str:
        return os.path.join(self.path, "_catalog")

    @property
    def _catalog_meta_path(self) -> str:
        return os.path.join(self.path, "_catalog.meta.json")

    # Shard durations are PART OF THE LAYOUT (sid = ts - ts % dur):
    # reopening a store with different durations would silently split
    # shards and break sid pruning, so they persist alongside the
    # data and win over the opener's defaults.
    @property
    def _durations_path(self) -> str:
        return os.path.join(self.path, "_durations.json")

    def persist_durations(self):
        import json

        os.makedirs(self.path, exist_ok=True)
        tmp = f"{self._durations_path}.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump({"duration_num": int(self.duration_num),
                       "duration_log": int(self.duration_log)}, fh)
        os.replace(tmp, self._durations_path)

    def load_durations(self) -> tuple | None:
        import json

        try:
            with open(self._durations_path) as fh:
                d = json.load(fh)
            return int(d["duration_num"]), int(d["duration_log"])
        except (OSError, ValueError, KeyError):
            return None

    @property
    def catalog_buckets(self) -> int:
        """Active bucket count: the explicit override if pinned, else
        the persisted auto-scaled count (so every appender process
        agrees), else the floor default."""
        if self._buckets_fixed is not None:
            return self._buckets_fixed
        try:
            import json
            with open(self._catalog_meta_path) as fh:
                return int(json.load(fh)["buckets"])
        except (OSError, ValueError, KeyError):
            return N_CATALOG_BUCKETS

    def _persist_buckets(self, n: int):
        import json

        os.makedirs(self.path, exist_ok=True)
        tmp = f"{self._catalog_meta_path}.{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump({"buckets": int(n)}, fh)
        os.replace(tmp, self._catalog_meta_path)

    @staticmethod
    def _auto_buckets(n_rows: int) -> int:
        """Power-of-two bucket count keeping the average bucket under
        TARGET_ROWS_PER_BUCKET rows, floored at N_CATALOG_BUCKETS."""
        b = N_CATALOG_BUCKETS
        while n_rows > b * TARGET_ROWS_PER_BUCKET:
            b *= 2
        return b

    # Pending markers are PER-APPENDER (uuid-named, pid-stamped): a
    # shared single marker would let appender A's clear remove
    # appender B's crash protection mid-append. An appender clears
    # only its own token; readers treat a marker as a crash signal
    # only when its writing process is gone (on a distributed FS the
    # pid check becomes a lease timestamp — same protocol). Live
    # markers mean an append is IN FLIGHT, which is not a crash: its
    # catalog delta lands when it finishes.
    _PENDING_PREFIX = "_catalog.pending-"

    #: PROCESS-WIDE registry of marker/lock paths with an append in
    #: flight — class-level so every store instance and the Arrow
    #: datasource writer agree: a same-pid marker NOT in here is an
    #: abandoned append (exception mid-append), i.e. stale
    _process_active: set = set()

    def _set_pending(self) -> str:
        os.makedirs(self.path, exist_ok=True)
        tok = os.path.join(
            self.path, f"{self._PENDING_PREFIX}{uuid.uuid4().hex}")
        with open(tok, "w") as fh:
            fh.write(str(os.getpid()))
        PointsStore._process_active.add(tok)
        return tok

    def _clear_pending(self, tok: str):
        PointsStore._process_active.discard(tok)
        try:
            os.remove(tok)
        except FileNotFoundError:
            pass

    @contextlib.contextmanager
    def _pending(self):
        """Pending-marker scope: cleared on success; on an exception
        the token is ABANDONED (dropped from the active set but left
        on disk) so it reads as stale and the next read_catalog()
        repairs — without this, a failed append in a long-lived
        process would pin a 'live' marker over an under-counted
        catalog forever."""
        tok = self._set_pending()
        try:
            yield tok
        except BaseException:
            PointsStore._process_active.discard(tok)
            raise
        self._clear_pending(tok)

    def _pending_markers(self) -> list:
        if not os.path.isdir(self.path):
            return []
        return [os.path.join(self.path, e)
                for e in os.listdir(self.path)
                if e.startswith(self._PENDING_PREFIX)]

    def _marker_alive(self, path: str) -> bool:
        try:
            with open(path) as fh:
                pid = int(fh.read().strip() or "0")
        except (OSError, ValueError):
            return False  # unreadable/corrupt marker: treat as stale
        if pid <= 0:
            return False
        if pid == os.getpid():
            # our own process: alive only while the append is actually
            # in flight on this store instance
            return path in PointsStore._process_active
        try:
            os.kill(pid, 0)  # signal 0: existence probe only
        except ProcessLookupError:
            return False
        except PermissionError:
            return True  # exists, owned by another user
        return True

    def _stale_markers(self) -> list:
        return [m for m in self._pending_markers()
                if not self._marker_alive(m)]

    @staticmethod
    def _batch_stats(df: DataFrame) -> DataFrame:
        # start/end are the first/last TIMESTAMPS; the f_*/l_* block
        # carries the typed first/last VALUES + their seq tiebreak
        # (insert order on duplicate ts) so the engine's skip-points
        # fast path answers first()/last() without touching points —
        # the reference reads these from the series struct + one
        # block (listener.c:5447-5586); here they ride the catalog
        first = F.min_by(
            F.struct(F.col("seq").alias("f_seq"),
                     F.col("val_int").alias("f_int"),
                     F.col("val_dbl").alias("f_dbl"),
                     F.col("val_str").alias("f_str")),
            F.struct("ts", "seq"))
        last = F.max_by(
            F.struct(F.col("seq").alias("l_seq"),
                     F.col("val_int").alias("l_int"),
                     F.col("val_dbl").alias("l_dbl"),
                     F.col("val_str").alias("l_str")),
            F.struct("ts", "seq"))
        return (df.groupBy(F.col("series").alias("name")).agg(
            F.count(F.lit(1)).alias("length"),
            F.min("ts").alias("start"),
            F.max("ts").alias("end"),
            F.max("tp").alias("tp"),
            first.alias("_f"), last.alias("_l"))
            .select("name", "length", "start", "end", "tp",
                    "_f.f_seq", "_f.f_int", "_f.f_dbl", "_f.f_str",
                    "_l.l_seq", "_l.l_int", "_l.l_dbl", "_l.l_str"))

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        if "bucket" in df.columns:
            return df
        return df.withColumn(
            "bucket",
            F.pmod(F.xxhash64("name"), F.lit(self.catalog_buckets))
            .cast("int"))

    # The catalog is LSM-shaped: an ingest batch APPENDS one small
    # delta file — O(batch) work, no read-merge of the base — reads
    # fold base ∪ deltas (associative: sum/min/max), and once deltas
    # pile up a compaction folds them into only the bucket partitions
    # they touch. This is the reference's split between live in-memory
    # series stats and the periodically-flushed database file
    # (series.h:54-72 / db.c), re-expressed for a distributed FS.
    @property
    def _delta_path(self) -> str:
        return os.path.join(self.path, "_catalog_delta")

    #: compact when this many delta files accumulate
    DELTA_COMPACT_AT = 16

    def _n_delta_appends(self) -> int:
        """Number of APPENDS (not files) in the delta dir: every file
        of one Spark write job shares the job's UUID in its
        ``part-NNNNN-<uuid>[...].parquet`` name, so distinct UUIDs
        count commits; the Arrow datasource writer's single-file
        ``delta-<uuid>.parquet`` appends count one each. Counting raw
        files would trip the compaction threshold after one
        multi-bucket append."""
        if not os.path.isdir(self._delta_path):
            return 0
        jobs = set()
        for root, dirs, files in os.walk(self._delta_path):
            # skip in-flight/crashed append stages (dot-prefixed)
            dirs[:] = [d for d in dirs if not d.startswith(".")]
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                jobs.add(f.split("-", 2)[-1] if f.startswith("part-")
                         else f)
        return len(jobs)

    def _merge_catalog(self, spark: SparkSession, stats: DataFrame):
        # the appender holds the pending marker, so a crash anywhere
        # here (or mid-compaction) triggers the one-time rebuild.
        # The delta is sharded by the catalog's bucket column — an
        # append touching 10⁷ series fans out across buckets instead
        # of funneling through one task (the r4 coalesce(1)), and
        # reads/compaction prune to touched bucket dirs. The
        # repartition puts each bucket in one task → one file per
        # touched bucket per append; stage+rename keeps concurrent
        # appenders from sharing a committer _temporary dir.
        self._append_via_stage(
            self._with_bucket(stats).repartition("bucket"),
            self._delta_path, ["bucket"])
        if self._n_delta_appends() > self.DELTA_COMPACT_AT:
            self._compact_catalog(spark)

    def _merge_catalog_arrow(self, spark: SparkSession,
                             landed: list) -> bool:
        """Driver-side catalog delta for a SMALL append: fold the
        just-landed parquet files with pyarrow/pandas and write the
        delta commit directly (same layout the Spark path produces).
        Returns False — caller falls back to the distributed path —
        when the landed bytes exceed ARROW_STATS_MAX_BYTES or pyarrow
        is unavailable. This is exactly the Arrow datasource writer's
        commit shape (datasource.py), so a streaming micro-batch
        costs ONE Spark job (the points write), not two."""
        try:
            total = sum(os.path.getsize(f) for f in landed)
        except OSError:
            return False
        if total > ARROW_STATS_MAX_BYTES:
            return False
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover
            return False
        # integer_object_nulls downstream: null int64 must stay exact
        # Python ints/None, not lossy float64-with-NaN
        tbl = pa.concat_tables(
            pq.read_table(f, columns=_STATS_COLS) for f in landed)
        write_arrow_delta(self.path, _fold_stats_table(tbl),
                          self.catalog_buckets)
        if self._n_delta_appends() > self.DELTA_COMPACT_AT:
            self._compact_catalog(spark)
        return True

    def append_local(self, spark: SparkSession, rows: list):
        """Driver-local ingest: write the rows straight to their
        shard partitions with pyarrow and fold the catalog delta
        in-memory — ZERO Spark jobs. This is the reference's own
        ingest shape (points buffer → native shard file append,
        src/siri/db/insert.c + shards.c): a protocol insert's rows
        are already driver-resident, so a distributed write job buys
        nothing but ~1 s of scheduling. Same crash protocol as the
        Spark path: per-appender pending marker, dot-prefixed temp +
        rename per file. Falls back to :meth:`append_df` above
        LOCAL_APPEND_MAX_ROWS or without pyarrow."""
        if len(rows) > LOCAL_APPEND_MAX_ROWS:
            self.append_df(spark.createDataFrame(rows, POINTS_SCHEMA))
            return
        try:
            import pyarrow as pa
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover
            self.append_df(spark.createDataFrame(rows, POINTS_SCHEMA))
            return
        groups: dict = {}
        for r in rows:
            kind = "log" if r[6] == TP_STRING else "num"
            dur = self.duration_log if r[6] == TP_STRING \
                else self.duration_num
            ts = r[1]
            # Spark's % is trunc-mod (remainder keeps ts's sign),
            # Python's is floor-mod — match Spark so negative
            # timestamps land in the same sid the distributed
            # writer would pick
            rem = ts % dur if ts >= 0 else -((-ts) % dur)
            groups.setdefault((kind, ts - rem), []).append(r)
        schema = _pa_points_schema()
        with self._pending():
            commit = uuid.uuid4().hex
            tables = []
            for i, ((kind, sid), grp) in enumerate(
                    sorted(groups.items())):
                tbl = pa.table(
                    {name: [r[j] for r in grp]
                     for j, name in enumerate(_STATS_COLS)},
                    schema=schema)
                tgt = os.path.join(self.path, f"kind={kind}",
                                   f"sid={sid}")
                os.makedirs(tgt, exist_ok=True)
                base = f"local-{commit}-{i:05d}.parquet"
                tmp = os.path.join(tgt, f".{base}")
                pq.write_table(tbl, tmp, compression="zstd")
                os.rename(tmp, os.path.join(tgt, base))
                tables.append(tbl)
            if tables:
                write_arrow_delta(
                    self.path,
                    _fold_stats_table(pa.concat_tables(tables)),
                    self.catalog_buckets)
                if self._n_delta_appends() > self.DELTA_COMPACT_AT:
                    self._compact_catalog(spark)
        if not os.path.exists(self._durations_path):
            self.persist_durations()

    @property
    def _compact_lock_path(self) -> str:
        return os.path.join(self.path, "_catalog.compact.lock")

    def _acquire_compact_lock(self) -> bool:
        """O_EXCL pid-stamped lock serializing compactions. Two
        concurrent compactions would fold the same delta files into
        the base twice (double-counted lengths); the loser of the
        create simply skips — its deltas get folded by a later
        compaction. A lock left by a dead process is broken here."""
        path = self._compact_lock_path
        for _ in range(2):
            try:
                fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                with os.fdopen(fd, "w") as fh:
                    fh.write(str(os.getpid()))
                PointsStore._process_active.add(path)
                return True
            except FileExistsError:
                if self._marker_alive(path):
                    return False
                try:  # stale lock from a crashed compactor
                    os.remove(path)
                except FileNotFoundError:
                    pass
        return False

    def _release_compact_lock(self):
        PointsStore._process_active.discard(self._compact_lock_path)
        try:
            os.remove(self._compact_lock_path)
        except FileNotFoundError:
            pass

    def _delta_files(self) -> list:
        """Current delta parquet files (skipping in-flight dot
        stages), as absolute paths."""
        out = []
        if not os.path.isdir(self._delta_path):
            return out
        for root, dirs, files in os.walk(self._delta_path):
            dirs[:] = [d for d in dirs if not d.startswith(".")]
            out.extend(os.path.join(root, f) for f in files
                       if f.endswith(".parquet"))
        return out

    def _compact_catalog(self, spark: SparkSession):
        if not self._acquire_compact_lock():
            return  # another compactor is live; our deltas fold later
        try:
            if self._legacy_catalog():
                # pre-r6 layout lacks the first/last value columns
                # the folds carry now: one-time full recompute from
                # the points (includes any just-appended batch)
                self.rebuild_catalog(spark)
                return
            # Snapshot the delta FILE LIST first and fold exactly
            # those files; afterwards delete exactly those files. An
            # rmtree of the whole delta dir would race a concurrent
            # appender whose just-renamed delta landed after our read
            # — silently dropping its stats with no marker left.
            files = self._delta_files()
            if not files:
                return
            delta = (spark.read.option("basePath", self._delta_path)
                     .parquet(*files))
            base = (spark.read.parquet(self._catalog_path)
                    if os.path.isdir(self._catalog_path) else None)
            if base is None:
                folded = self._fold(delta)
                if self._buckets_fixed is None:
                    want = self._auto_buckets(folded.count())
                    if want != self.catalog_buckets:
                        self._persist_buckets(want)
                        folded = self._fold(delta)  # re-derive
                self._write_catalog(folded, full=True)
            elif (self._buckets_fixed is None
                  and self._auto_buckets(base.count())
                  != self.catalog_buckets):
                # catalog outgrew its bucket layout: grow the count
                # (inside the compaction lock) and rewrite the whole
                # catalog under the new numbering in one pass
                self._persist_buckets(self._auto_buckets(base.count()))
                self._write_catalog(
                    self._fold(base.unionByName(
                        delta.select(*base.columns))),
                    full=True)
            else:
                # fold deltas into ONLY the bucket partitions touched
                # (bucket sets re-derived from names — on-disk bucket
                # values may predate an auto-resize)
                base = self._with_bucket(base.drop("bucket"))
                dtouch = (self._with_bucket(delta.drop("bucket"))
                          .select("bucket").distinct())
                touched = base.join(dtouch, "bucket", "semi")
                self._write_catalog(
                    self._fold(touched.unionByName(
                        self._with_bucket(delta.drop("bucket")))),
                    full=False)
            for f in files:
                try:
                    os.remove(f)
                except FileNotFoundError:
                    pass
            # sweep now-empty bucket dirs (ignore non-empty: a
            # concurrent append may have added files)
            if os.path.isdir(self._delta_path):
                for entry in os.listdir(self._delta_path):
                    p = os.path.join(self._delta_path, entry)
                    if os.path.isdir(p):
                        try:
                            os.rmdir(p)
                        except OSError:
                            pass
                try:
                    os.rmdir(self._delta_path)
                except OSError:
                    pass
        finally:
            self._release_compact_lock()

    def _fold(self, stats: DataFrame) -> DataFrame:
        # bucket is ALWAYS re-derived from the name at the current
        # count (never trusted from disk): grouping by an on-disk
        # bucket would split one series into two rows whenever base
        # and delta files were written under different bucket counts
        # (auto-resize window). The first/last value blocks combine
        # by argmin/argmax over (ts, seq) across partials — exact
        # and associative, like the numeric folds.
        first = F.min_by(
            F.struct("f_seq", "f_int", "f_dbl", "f_str"),
            F.struct("start", "f_seq"))
        last = F.max_by(
            F.struct("l_seq", "l_int", "l_dbl", "l_str"),
            F.struct("end", "l_seq"))
        folded = (stats.drop("bucket").groupBy("name").agg(
            F.sum("length").alias("length"),
            F.min("start").alias("start"),
            F.max("end").alias("end"),
            F.max("tp").alias("tp"),
            first.alias("_f"), last.alias("_l"))
            .select("name", "length", "start", "end", "tp",
                    "_f.f_seq", "_f.f_int", "_f.f_dbl", "_f.f_str",
                    "_l.l_seq", "_l.l_int", "_l.l_dbl", "_l.l_str"))
        return self._with_bucket(folded)

    def _write_catalog(self, stats: DataFrame, full: bool = True):
        """Bucket-partitioned catalog write. ``full=False`` replaces
        only the bucket partitions present in ``stats``. Both paths
        stage to a sibling underscore dir first (the input may read
        from the live catalog, and Spark refuses to overwrite a path
        it is reading); crash-consistency comes from the caller's
        pending marker, not from write atomicity. (On Delta this whole
        dance is one MERGE.)"""
        if "bucket" not in stats.columns:
            stats = self._with_bucket(stats)
        # uuid'd staging dir: a fixed name would collide between
        # concurrent compactions/rebuilds
        stage = f"{self._catalog_path}.stage-{uuid.uuid4().hex}"
        # no explicit repartition: the _fold upstream already
        # shuffled on (name, bucket) and AQE coalesces its output, so
        # a tiny catalog writes from 1-2 tasks (few files per bucket
        # dir) while a 100M-series one fans out across tasks
        (stats.write.mode("overwrite")
         .partitionBy("bucket")
         .parquet(stage))
        if full:
            if os.path.isdir(self._catalog_path):
                shutil.rmtree(self._catalog_path)
            os.rename(stage, self._catalog_path)
            return
        for entry in os.listdir(stage):
            if not entry.startswith("bucket="):
                continue
            target = os.path.join(self._catalog_path, entry)
            if os.path.isdir(target):
                shutil.rmtree(target)
            os.rename(os.path.join(stage, entry), target)
        shutil.rmtree(stage, ignore_errors=True)

    # --------------------------------------------- crash-safe rewrites
    # Shard rewrites (delete_series/optimize) stage the new partition
    # under `_rewrite/` — underscore-prefixed, so Spark partition
    # discovery never sees a half-written replacement — and commit by
    # rmtree(old) + rename(staged). A staged dir is committable iff
    # its _SUCCESS marker exists; _repair_rewrites() finishes (or
    # discards) whatever a crash left behind, in either crash window.
    @property
    def _rewrite_root(self) -> str:
        return os.path.join(self.path, "_rewrite")

    def _rewrite_tmp(self, kind: str, sid: int) -> str:
        return os.path.join(self._rewrite_root, f"kind={kind}",
                            f"sid={sid}")

    def _repair_rewrites(self):
        root = self._rewrite_root
        if not os.path.isdir(root):
            return
        for kdir in os.listdir(root):
            kpath = os.path.join(root, kdir)
            if not os.path.isdir(kpath):
                continue
            for entry in os.listdir(kpath):
                tmp = os.path.join(kpath, entry)
                target = os.path.join(self.path, kdir, entry)
                committed = os.path.exists(
                    os.path.join(tmp, "_SUCCESS"))
                if committed and not os.path.exists(target):
                    # crash fell between rmtree(target) and rename:
                    # finish the swap — the staged dir is complete
                    os.makedirs(os.path.dirname(target), exist_ok=True)
                    os.rename(tmp, target)
                else:
                    # either the staged write never completed or the
                    # old partition is still in place — discard
                    shutil.rmtree(tmp)
        shutil.rmtree(root, ignore_errors=True)

    def _swap_partition(self, tmp: str, target: str):
        # the staged write is complete (caller just wrote it); stamp
        # the marker in case the committer was configured not to
        marker = os.path.join(tmp, "_SUCCESS")
        if not os.path.exists(marker):
            with open(marker, "w"):
                pass
        shutil.rmtree(target)
        os.rename(tmp, target)

    def _read_catalog_raw(self, spark: SparkSession) -> DataFrame | None:
        has_base = os.path.isdir(self._catalog_path)
        has_delta = self._n_delta_appends() > 0
        if not has_base and not has_delta:
            return None
        if not has_delta:
            return spark.read.parquet(self._catalog_path)
        delta = self._with_bucket(spark.read.parquet(self._delta_path))
        if not has_base:
            return self._fold(delta)
        base = self._with_bucket(spark.read.parquet(self._catalog_path))
        return self._fold(base.unionByName(
            delta.select(*base.columns)))

    def _legacy_catalog(self) -> bool:
        """True when any catalog/delta file predates the r6 layout
        (no first/last value columns) — one-time migration via
        rebuild_catalog, same stance as the marker repair."""
        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover
            return False
        candidates = []
        if os.path.isdir(self._catalog_path):
            for root, dirs, fs in os.walk(self._catalog_path):
                dirs[:] = [d for d in dirs if not d.startswith(".")]
                candidates.extend(os.path.join(root, f) for f in fs
                                  if f.endswith(".parquet"))
                if candidates:
                    break  # one base file decides the base layout
        candidates.extend(self._delta_files())
        for f in candidates:
            try:
                if "f_seq" not in pq.read_schema(f).names:
                    return True
            except Exception:
                continue  # racing compaction; decided by the rest
        return False

    def read_catalog_local(self) -> dict | None:
        """Driver-side catalog snapshot WITHOUT a Spark job: fold the
        base + delta parquet files with pyarrow into
        ``{name: (length, start, end, tp)}``. This is the engine's
        micro-latency path (the reference answers list/count/
        skip-points selects from in-memory series structs; Spark's
        job floor is ~0.2 s). Returns None when a crashed append
        needs the Spark-path repair first (stale pending marker) or
        when no catalog exists — callers then fall back to the
        distributed path."""
        if self._stale_markers():
            return None  # needs rebuild_catalog (Spark path) first
        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover
            return None
        files = []
        if os.path.isdir(self._catalog_path):
            for root, dirs, fs in os.walk(self._catalog_path):
                dirs[:] = [d for d in dirs if not d.startswith(".")]
                files.extend(os.path.join(root, f) for f in fs
                             if f.endswith(".parquet"))
        files.extend(self._delta_files())
        if not files:
            return None
        out: dict = {}
        cols = ["name", "length", "start", "end", "tp",
                "f_seq", "f_int", "f_dbl", "f_str",
                "l_seq", "l_int", "l_dbl", "l_str"]
        for f in files:
            try:
                tbl = pq.read_table(f, columns=cols)
            except Exception:
                # racing compaction removed the file, or a pre-r6
                # legacy file lacks the value columns → let the
                # Spark path repair/migrate
                return None
            d = tbl.to_pydict()
            for i, name in enumerate(d["name"]):
                row = (d["length"][i], d["start"][i], d["end"][i],
                       d["tp"][i],
                       (d["f_seq"][i], d["f_int"][i], d["f_dbl"][i],
                        d["f_str"][i]),
                       (d["l_seq"][i], d["l_int"][i], d["l_dbl"][i],
                        d["l_str"][i]))
                cur = out.get(name)
                if cur is None:
                    out[name] = row
                else:
                    # argmin/argmax over (ts, seq) across partials
                    fst = row[4] if (row[1], row[4][0]) \
                        < (cur[1], cur[4][0]) else cur[4]
                    lst = row[5] if (row[2], row[5][0]) \
                        > (cur[2], cur[5][0]) else cur[5]
                    out[name] = (cur[0] + row[0],
                                 min(cur[1], row[1]),
                                 max(cur[2], row[2]),
                                 max(cur[3], row[3]), fst, lst)
        return out

    def shard_stats_local(self) -> list | None:
        """Per-shard (kind, sid, points, start, end) from parquet
        FOOTERS only — pyarrow metadata, zero data pages read, no
        Spark job. The reference keeps exactly these stats on its
        in-memory shard structs (shard.h); parquet row-group
        statistics make them free here. None on any surprise
        (racing rewrite, missing ts stats) → Spark fallback."""
        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover
            return None
        out = []
        for kind, sid, p in self._sid_dirs():
            n, mn, mx = 0, None, None
            for f in os.listdir(p):
                if not f.endswith(".parquet"):
                    continue
                try:
                    md = pq.ParquetFile(os.path.join(p, f)).metadata
                except Exception:
                    return None
                n += md.num_rows
                ts_idx = None
                for i in range(md.num_columns):
                    if md.schema.column(i).name == "ts":
                        ts_idx = i
                        break
                if ts_idx is None:
                    return None
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(ts_idx).statistics
                    if st is None or not st.has_min_max:
                        return None
                    mn = st.min if mn is None else min(mn, st.min)
                    mx = st.max if mx is None else max(mx, st.max)
            if n:
                out.append({"kind": kind, "sid": sid, "points": n,
                            "start": mn, "end": mx})
        return out

    def read_catalog(self, spark: SparkSession) -> DataFrame | None:
        stale = self._stale_markers()
        if stale:
            # an append CRASHED between points and catalog (its
            # process is gone, or this process abandoned the token):
            # repair once from the points table. Markers of LIVE
            # appenders are left alone — their deltas land when they
            # finish; rebuilding under them would double-count.
            self.rebuild_catalog(spark)
            for m in stale:
                self._clear_pending(m)
        elif self._legacy_catalog():
            self.rebuild_catalog(spark)  # one-time r6 migration
        return self._read_catalog_raw(spark)

    def rebuild_catalog(self, spark: SparkSession):
        """Full recompute — the rare maintenance path (after expire,
        which changes per-series start/length at shard granularity).
        Supersedes any pending deltas, so they are cleared. Assumes a
        quiesced store (no concurrent appenders), like the
        reference's optimize/backup passes."""
        shutil.rmtree(self._delta_path, ignore_errors=True)
        if not self._exists():
            if os.path.isdir(self._catalog_path):
                shutil.rmtree(self._catalog_path)
            return
        self._write_catalog(
            self._batch_stats(spark.read.parquet(self.path)))

    # ------------------------------------------------------- maintenance
    def _sid_dirs(self):
        for kind in ("num", "log"):
            kdir = os.path.join(self.path, f"kind={kind}")
            if not os.path.isdir(kdir):
                continue
            for entry in os.listdir(kdir):
                if entry.startswith("sid="):
                    yield kind, int(entry[4:]), os.path.join(kdir, entry)

    def expire(self, spark: SparkSession, cutoff_sid: int,
               tp_str: bool):
        """Retention: drop whole shard partitions older than the
        cutoff (ref db.c:865-878 — expiration is shard-granular).
        Directory removal only — no data rewrite."""
        want = "log" if tp_str else "num"
        doomed = [p for kind, sid, p in self._sid_dirs()
                  if kind == want and sid < cutoff_sid]
        if not doomed:
            return
        # pending marker: a crash mid-loop leaves the catalog stale,
        # and the next read_catalog() rebuilds it from the points
        with self._pending():
            for p in doomed:
                shutil.rmtree(p)
            self.rebuild_catalog(spark)

    def delete_series(self, spark: SparkSession, names: list):
        """Anti-join rewrite (drop series). At 100 TB this is a Delta
        DELETE / partition-scoped rewrite; on plain parquet we rewrite
        the partitions that contain the series (parquet row-group
        stats tell us which via a pushed-down filter)."""
        self._repair_rewrites()
        if not self._exists() or not names:
            return
        df = spark.read.parquet(self.path)
        hit_sids = {(r["kind"], r["sid"]) for r in df.where(
            F.col("series").isin(names))
            .select("kind", "sid").distinct().collect()}
        if not hit_sids:
            return
        cat = self.read_catalog(spark)
        with self._pending():
            for kind, sid, p in list(self._sid_dirs()):
                if (kind, sid) not in hit_sids:
                    continue
                part = spark.read.parquet(p).where(
                    ~F.col("series").isin(names))
                tmp = self._rewrite_tmp(kind, sid)
                part.write.mode("overwrite") \
                    .option("compression", "zstd").parquet(tmp)
                self._swap_partition(tmp, p)
            shutil.rmtree(self._rewrite_root, ignore_errors=True)
            if cat is not None:
                # cat is the FOLDED base ∪ deltas view; writing it as
                # the new full base supersedes the delta files
                self._write_catalog(
                    cat.where(~F.col("name").isin(names)))
                shutil.rmtree(self._delta_path, ignore_errors=True)


    # ---------------------------------------------------------- rollup
    @property
    def _rollup_root(self) -> str:
        return os.path.join(self.path, "_rollup")

    @property
    def _rollup_meta_path(self) -> str:
        return os.path.join(self._rollup_root, "meta.json")

    def _rollup_data_path(self, gen: str) -> str:
        return os.path.join(self._rollup_root, f"data-{gen}")

    def rollup_info(self) -> dict | None:
        """{"bucket": b, "coverage": {"kind:sid": [files...]}} or
        None when no rollup is built."""
        import json

        try:
            with open(self._rollup_meta_path) as fh:
                return json.load(fh)
        except (OSError, ValueError):
            return None

    def _rollup_listing(self) -> dict:
        """Current {"kind:sid": sorted point-file names}."""
        out = {}
        for kind, sid, p in self._sid_dirs():
            files = sorted(f for f in os.listdir(p)
                           if f.endswith(".parquet"))
            out[f"{kind}:{sid}"] = files
        return out

    def build_rollup(self, spark: SparkSession, bucket: int) -> dict:
        """Build/refresh the rollup at the given bucket width (same
        unit as ts). Serialized behind the compact lock so the file
        listing and the aggregation read see the same shards; appends
        landing DURING the build simply show up as coverage
        mismatches and fall back to live partials until the next
        build. Returns the coverage meta."""
        import json

        from ..functions.pipeline import rollup_partials

        if bucket <= 0:
            raise ValueError("rollup bucket must be positive")
        covered_kinds = [
            k for k, dur in (("num", self.duration_num),
                             ("log", self.duration_log))
            if dur % bucket == 0]
        if not covered_kinds:
            raise ValueError(
                f"rollup bucket {bucket} divides neither shard "
                f"duration ({self.duration_num} num / "
                f"{self.duration_log} log)")
        if not self._acquire_compact_lock():
            raise RuntimeError("rollup build: compact lock busy")
        try:
            listing = {
                key: files for key, files in
                self._rollup_listing().items()
                if key.split(":", 1)[0] in covered_kinds}
            paths = []
            for key, files in listing.items():
                kind, sid = key.split(":", 1)
                d = os.path.join(self.path, f"kind={kind}",
                                 f"sid={sid}")
                paths.extend(os.path.join(d, f) for f in files)
            os.makedirs(self._rollup_root, exist_ok=True)
            gen = uuid.uuid4().hex
            tmp = os.path.join(self._rollup_root, f".build-{gen}")
            if paths:
                pts = (spark.read.option("basePath", self.path)
                       .parquet(*paths)
                       .select("series", "ts", "seq", "val_int",
                               "val_dbl", "val_str", "tp",
                               F.col("kind").cast("string")
                               .alias("kind"),
                               F.col("sid").cast("long")
                               .alias("sid")))
                partials = rollup_partials(pts, bucket,
                                           ["kind", "sid"])
                partials.write.mode("overwrite") \
                    .option("compression", "zstd").parquet(tmp)
            else:
                os.makedirs(tmp, exist_ok=True)
            # commit protocol: land the new generation dir, point the
            # meta at it atomically, THEN drop older generations — a
            # crash at any step leaves a consistent (meta, data) pair
            os.replace(tmp, self._rollup_data_path(gen))
            # v2: partials carry typed first/last structs (f/l) so
            # bucketed first()/last() serve from the rollup too;
            # v1 rollups are refused by read_rollup (points fallback
            # until the next build/maintain rebuilds them)
            meta = {"bucket": int(bucket), "gen": gen, "v": 2,
                    "coverage": listing}
            mtmp = self._rollup_meta_path + f".{uuid.uuid4().hex}"
            with open(mtmp, "w") as fh:
                json.dump(meta, fh)
            os.replace(mtmp, self._rollup_meta_path)
            for entry in os.listdir(self._rollup_root):
                if (entry.startswith("data-") and entry != f"data-{gen}") \
                        or entry.startswith(".build-"):
                    shutil.rmtree(
                        os.path.join(self._rollup_root, entry),
                        ignore_errors=True)
            return meta
        finally:
            self._release_compact_lock()

    def read_rollup(self, spark: SparkSession):
        """(partials_df, stale_keys) — partials_df holds ONLY shards
        whose current files exactly match the build-time coverage;
        stale_keys lists "kind:sid" shards (changed, new, or
        never-covered) the caller must aggregate live from points."""
        meta = self.rollup_info()
        if meta is None or "gen" not in meta \
                or meta.get("v") != 2:
            return None
        current = self._rollup_listing()
        # negative timestamps (possible only via the raw append API —
        # insert and streaming ingest reject them) would relabel
        # differently through the two-level bucket composition:
        # refuse to serve, the engine falls back to points wholesale.
        # They can only live in shards with sid <= 0, so the probe
        # is one footer read of those shards (usually none).
        for key in current:
            if int(key.split(":", 1)[1]) < 0:
                return None
        if any(int(k.split(":", 1)[1]) == 0 for k in current):
            stats = self.shard_stats_local()
            if stats is None:
                return None
            for s in stats:
                if s["sid"] == 0 and s["start"] is not None \
                        and s["start"] < 0:
                    return None
        cov = meta["coverage"]
        valid = [k for k, files in current.items()
                 if cov.get(k) == files]
        stale = [k for k in current if k not in set(valid)]
        data = self._rollup_data_path(meta["gen"])
        if os.path.isdir(data) and any(
                f.endswith(".parquet") for f in os.listdir(data)):
            df = spark.read.parquet(data)
        elif valid:
            # the generation the meta names is unreadable (crash or
            # concurrent swap window): covered shards MUST NOT be
            # silently dropped — demote every one of them to stale
            # so the engine aggregates them live from points
            stale = list(current)
            valid = []
            df = None
        else:
            df = None
        if df is not None:
            if not valid:
                df = df.limit(0)
            else:
                key = F.concat_ws(":", F.col("kind"),
                                  F.col("sid").cast("string"))
                if len(valid) <= 256:
                    df = df.where(key.isin(valid))
                else:
                    from ..localdf import arrow_df
                    vdf = arrow_df(spark, [(v,) for v in valid],
                                   "k string")
                    df = (df.withColumn("_k", key)
                          .join(F.broadcast(vdf),
                                F.col("_k") == F.col("k"), "semi")
                          .drop("_k"))
        return {"bucket": meta["bucket"], "partials": df,
                "stale": stale, "valid": valid}

    def read_points_of(self, spark: SparkSession, keys: list):
        """Points frame restricted to the given "kind:sid" shards
        (the live-fallback side of a rollup read)."""
        paths = []
        for key in keys:
            kind, sid = key.split(":", 1)
            d = os.path.join(self.path, f"kind={kind}", f"sid={sid}")
            if os.path.isdir(d):
                paths.append(d)
        if not paths:
            return None
        return (spark.read.option("basePath", self.path)
                .parquet(*paths)
                .select("series", "ts", "seq", "val_int", "val_dbl",
                        "val_str", "tp"))

    def optimize(self, spark: SparkSession,
                 max_files_per_partition: int = 1,
                 sort: bool = True):
        """Compaction (ref src/siri/optimize.c:33-55): rewrite
        fragmented partitions into ``max_files_per_partition`` files.

        ``sort=True`` additionally lays each rewritten file out in
        (series, ts, seq) order — the reference's optimize pass
        likewise re-sorts shards that accumulated out-of-order
        appends (HAS_OVERLAP, shard.h:12). Beyond parity, sorting
        tightens parquet column-chunk min/max stats: a per-series
        read of a compacted shard skips row groups whose series
        range can't match, the format-native analogue of the
        reference's per-series block index."""
        self._repair_rewrites()
        for kind, sid, p in list(self._sid_dirs()):
            files = [f for f in os.listdir(p) if f.endswith(".parquet")]
            if len(files) <= max_files_per_partition:
                continue
            part = spark.read.parquet(p) \
                .coalesce(max_files_per_partition)
            if sort:
                part = part.sortWithinPartitions("series", "ts", "seq")
            tmp = self._rewrite_tmp(kind, sid)
            part.write.mode("overwrite") \
                .option("compression", "zstd").parquet(tmp)
            self._swap_partition(tmp, p)
        shutil.rmtree(self._rewrite_root, ignore_errors=True)

    def stats(self) -> dict:
        out = {"partitions": 0, "files": 0, "bytes": 0}
        for _kind, _sid, p in self._sid_dirs():
            out["partitions"] += 1
            for f in os.listdir(p):
                if f.endswith(".parquet"):
                    out["files"] += 1
                    out["bytes"] += os.path.getsize(os.path.join(p, f))
        return out

    # ---------------------------------------------------------- backup
    def snapshot(self, dest: str) -> str:
        """Consistent point-in-time backup: copy the store directory
        (points partitions + catalog + deltas) to ``dest``. Refuses
        to run while an append is in flight (pending marker set) —
        the reference's backup_mode likewise quiesces the database
        before its file copy (src/siri/db/db.c backup handling).
        Parquet files are immutable once written, so a quiesced copy
        is consistent by construction; at 100 TB the same layout
        snapshots via the object store's native copy/manifest instead
        of a local copytree. Returns ``dest``."""
        if self._pending_markers():
            raise RuntimeError(
                "snapshot refused: an append is in progress "
                "(pending marker present)")
        if os.path.exists(dest):
            raise FileExistsError(dest)
        if self._exists() or os.path.isdir(self.path):
            shutil.copytree(self.path, dest)
        else:
            os.makedirs(dest, exist_ok=True)
        return dest

    @classmethod
    def restore(cls, snapshot_path: str, dest: str,
                duration_num: int, duration_log: int,
                catalog_buckets: int | None = None
                ) -> "PointsStore":
        """Materialize a snapshot as a live store at ``dest`` and
        open it. The copy is verbatim; the store's own crash-repair
        (pending-marker rebuild) covers a snapshot taken from an
        older layout."""
        if os.path.exists(dest):
            raise FileExistsError(dest)
        shutil.copytree(snapshot_path, dest)
        return cls(dest, duration_num, duration_log, catalog_buckets)


# ---------------------------------------------------------------------
# Bucketed rollups: a maintain-time materialized aggregate layer.
#
# The classic TSDB scale feature the reference lacks (it re-aggregates
# points per query): per-(kind, shard) partial aggregates at a fixed
# bucket width, built under the compact lock, served by the engine for
# count/sum/mean/min/max selects whose bucket is a multiple of the
# rollup bucket. Query-time work becomes O(|series| x |buckets|)
# instead of O(|points|).
#
# Safety model (no append-path changes, drop-safe by construction):
# - the rollup is keyed by (kind, sid) and records EXACTLY which
#   point files each shard's partials were computed from;
# - at read time a shard whose current file set differs (new append,
#   compaction rewrite, drop rewrite, retention) is EXCLUDED from the
#   rollup and the engine computes that shard's partials live from
#   points — results stay exact while the rollup lags;
# - the rollup bucket must divide the shard duration of a kind for
#   that kind to be covered (buckets then never span shards), else
#   the kind is simply never covered (permanent live fallback).
