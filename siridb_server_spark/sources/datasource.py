"""``spark.read.format("siridb")``: a PySpark Python DataSource over
the points store layout (see ``store.py``).

Why a custom source when ``spark.read.parquet`` already works: the
DataSource owns PARTITION PLANNING, so shard skipping becomes a
first-class part of the scan instead of engine-side sid predicates —
``df.filter("ts >= X")`` reaches :meth:`SiriDBShardReader.pushFilters`
and whole ``sid=...`` directories are dropped before a single task is
scheduled (the analogue of the reference's shard skipping,
src/siri/db/series.c:927-938). The same class exposes a streaming
reader: ``spark.readStream.format("siridb")`` tails newly-appended
shard files (the reference's on-ingest fan-out to live query clients).

Scale shape: one InputPartition per parquet file → a 100 TB store
fans out to as many tasks as it has files, pruned first by directory;
each task streams Arrow record batches straight from its file
(row-group ts/series stats prune within the file via the pushed
bounds), so nothing ever funnels through the driver but the file
listing — which at object-store scale is the same listing every
format-native scan performs.

Filters are used for PRUNING but always returned as unhandled, so
Spark re-applies them row-level: directory pruning is shard-granular
(a kept shard can still hold rows outside the ts bound) and
correctness never depends on the pruning math.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable, Iterator, List, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

from ..model import POINTS_SCHEMA

#: points columns + the two partition-derived columns
READ_SCHEMA = T.StructType(
    list(POINTS_SCHEMA.fields)
    + [
        T.StructField("kind", T.StringType(), False),
        T.StructField("sid", T.LongType(), False),
    ]
)

_POINT_COLS = [f.name for f in POINTS_SCHEMA.fields]


@dataclass
class ShardFilePartition(InputPartition):
    kind: str
    sid: int
    file: str
    ts_lo: int | None = None  # inclusive row-group pruning bound
    ts_hi: int | None = None  # inclusive


def _shard_files(path: str):
    """Yield (kind, sid, file_path, mtime_ns) for every committed
    shard parquet file. Underscore/dot-prefixed entries (catalog,
    rewrite staging, markers) are invisible, same as Spark's own
    partition discovery."""
    for kind in ("num", "log"):
        kdir = os.path.join(path, f"kind={kind}")
        if not os.path.isdir(kdir):
            continue
        for entry in sorted(os.listdir(kdir)):
            if not entry.startswith("sid="):
                continue
            sdir = os.path.join(kdir, entry)
            if not os.path.isdir(sdir):
                continue
            sid = int(entry[4:])
            for f in sorted(os.listdir(sdir)):
                if f.startswith(("_", ".")) or not f.endswith(
                        ".parquet"):
                    continue
                fp = os.path.join(sdir, f)
                yield kind, sid, fp, os.stat(fp).st_mtime_ns


class _Bounds:
    """ts/kind bounds extracted from pushed filters + options."""

    def __init__(self, options):
        self.ts_lo = self._opt_int(options, "ts_min")
        self.ts_hi = self._opt_int(options, "ts_max")
        self.kind = options.get("kind")
        self.dur = {
            "num": self._opt_int(options, "duration_num"),
            "log": self._opt_int(options, "duration_log"),
        }

    @staticmethod
    def _opt_int(options, key):
        v = options.get(key)
        return None if v is None else int(v)

    def _tighten(self, lo=None, hi=None):
        if lo is not None:
            self.ts_lo = lo if self.ts_lo is None else max(self.ts_lo, lo)
        if hi is not None:
            self.ts_hi = hi if self.ts_hi is None else min(self.ts_hi, hi)

    def absorb(self, filters: List[Filter]):
        for f in filters:
            col = f.attribute[0] if len(f.attribute) == 1 else None
            if col == "ts":
                if isinstance(f, GreaterThan):
                    self._tighten(lo=int(f.value) + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self._tighten(lo=int(f.value))
                elif isinstance(f, LessThan):
                    self._tighten(hi=int(f.value) - 1)
                elif isinstance(f, LessThanOrEqual):
                    self._tighten(hi=int(f.value))
                elif isinstance(f, EqualTo):
                    self._tighten(lo=int(f.value), hi=int(f.value))
            elif col == "kind" and isinstance(f, EqualTo):
                self.kind = str(f.value)
            elif col == "sid":
                # sid predicates map 1:1 onto directory names
                if isinstance(f, GreaterThanOrEqual):
                    self._tighten(lo=int(f.value))
                elif isinstance(f, EqualTo):
                    self._tighten(lo=int(f.value))

    def keep(self, kind: str, sid: int) -> bool:
        """Directory-level shard skip: keep iff [sid, sid+dur) can
        intersect [ts_lo, ts_hi]. Without a known duration the lower
        bound can't prune (a shard starting before ts_lo may still
        reach past it) but the upper bound always can (bucket start
        > ts_hi ⇒ every row > ts_hi)."""
        if self.kind is not None and kind != self.kind:
            return False
        if self.ts_hi is not None and sid > self.ts_hi:
            return False
        dur = self.dur.get(kind)
        if (self.ts_lo is not None and dur
                and sid + dur <= self.ts_lo):
            return False
        return True


def _read_file_batches(part: ShardFilePartition) -> Iterator:
    """Arrow record batches for one shard file, with the partition
    columns appended and pushed ts bounds applied at row-group level
    (parquet stats prune inside the file, mirroring the reference's
    per-series (start, end) block index)."""
    import pyarrow as pa
    import pyarrow.dataset as pads

    dataset = pads.dataset(part.file, format="parquet")
    expr = None
    if part.ts_lo is not None:
        expr = pads.field("ts") >= part.ts_lo
    if part.ts_hi is not None:
        e = pads.field("ts") <= part.ts_hi
        expr = e if expr is None else expr & e
    scanner = dataset.scanner(columns=_POINT_COLS, filter=expr)
    for batch in scanner.to_batches():
        n = batch.num_rows
        if n == 0:
            continue
        arrays = list(batch.columns) + [
            pa.array([part.kind] * n, pa.string()),
            pa.array([part.sid] * n, pa.int64()),
        ]
        yield pa.RecordBatch.from_arrays(
            arrays, names=_POINT_COLS + ["kind", "sid"])


class SiriDBShardReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "siridb source requires a path: .load('<store dir>')")
        self.bounds = _Bounds(options)

    def pushFilters(self, filters: List[Filter]) -> Iterable[Filter]:
        self.bounds.absorb(filters)
        # every filter is returned unhandled: pruning here is
        # shard/row-group-granular, Spark re-applies exact row-level
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        parts = [
            ShardFilePartition(kind, sid, fp,
                               self.bounds.ts_lo, self.bounds.ts_hi)
            for kind, sid, fp, _mt in _shard_files(self.path)
            if self.bounds.keep(kind, sid)
        ]
        # an empty seq is an error in the API; emit one no-op split
        return parts or [ShardFilePartition("num", 0, "")]

    def read(self, partition: ShardFilePartition) -> Iterator:
        if not partition.file:
            return iter(())
        return _read_file_batches(partition)


class SiriDBStreamReader(DataSourceStreamReader):
    """Micro-batch tail of the store: each batch covers the shard
    files that appeared since the last offset. Offsets are
    (mtime-ns watermark, files-at-watermark) — bounded state, no
    ever-growing seen-set. Files are immutable once committed
    (store appends write new files), so mtime ordering is stable."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError(
                "siridb stream requires a path: .load('<store dir>')")
        self.bounds = _Bounds(options)

    def initialOffset(self) -> dict:
        return {"w": 0, "at": []}

    def latestOffset(self) -> dict:
        w, at = 0, []
        for _k, _s, fp, mt in _shard_files(self.path):
            if mt > w:
                w, at = mt, [fp]
            elif mt == w:
                at.append(fp)
        return {"w": w, "at": sorted(at)}

    def partitions(self, start: dict, end: dict
                   ) -> Sequence[InputPartition]:
        s_w, s_at = start.get("w", 0), set(start.get("at", ()))
        e_w, e_at = end.get("w", 0), set(end.get("at", ()))
        parts = []
        for kind, sid, fp, mt in _shard_files(self.path):
            if not self.bounds.keep(kind, sid):
                continue
            after_start = mt > s_w or (mt == s_w and fp not in s_at)
            upto_end = mt < e_w or (mt == e_w and fp in e_at)
            if after_start and upto_end:
                parts.append(ShardFilePartition(
                    kind, sid, fp,
                    self.bounds.ts_lo, self.bounds.ts_hi))
        return parts or [ShardFilePartition("num", 0, "")]

    def read(self, partition: ShardFilePartition) -> Iterator:
        if not partition.file:
            return iter(())
        return _read_file_batches(partition)

    def commit(self, end: dict):
        pass


class SiriDBDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "siridb"

    def schema(self):
        return READ_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SiriDBShardReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return SiriDBStreamReader(self.options)


def register(spark) -> None:
    """Idempotent ``spark.dataSource.register`` of the format.

    Also enables ``spark.sql.python.filterPushdown.enabled`` (a
    runtime SQL conf, default false): Spark refuses to plan a Python
    source whose reader implements ``pushFilters`` while the conf is
    off, and shard skipping is the point of this source."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SiriDBDataSource)
