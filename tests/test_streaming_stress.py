"""State-scale stress for the custom stateful operators: 10^6
distinct keys through one micro-batch, on the RocksDB state store —
the production configuration for state that outgrows executor heap
(state lives off-heap/on-disk per partition; memory holds only the
working set). Asserts the bounded-state argument directly: state
rows == DISTINCT keys, independent of input volume.

Deselected from the default run (pytest.ini) — select with
``-m stress``.
"""

import pytest
from pyspark.sql import functions as F

from siridb_server_spark.streaming import stateful as ST

pytestmark = pytest.mark.stress

N_KEYS = 1_000_000
ROWS_PER_KEY = 2

ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")


@pytest.fixture()
def rocksdb_state(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def _run_stream(spark, tmp_path, build, sink_name):
    out = {"rows": 0, "progress": None}

    def sink(bdf, _bid):
        out["rows"] += bdf.count()

    q = (build().writeStream.foreachBatch(sink)
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / sink_name))
         .trigger(availableNow=True).start())
    q.awaitTermination(600)
    out["progress"] = q.lastProgress
    return out


def test_series_stats_state_is_per_key_not_per_row(
        spark, tmp_path, rocksdb_state):
    src = tmp_path / "in"
    (spark.range(N_KEYS * ROWS_PER_KEY)
     .select((F.col("id") % N_KEYS).cast("string").alias("series"),
             F.col("id").alias("ts"))
     .write.parquet(str(src)))
    stream = (spark.readStream.schema("series string, ts long")
              .parquet(str(src)))
    got = _run_stream(
        spark, tmp_path,
        lambda: ST.streaming_series_stats(stream), "ck_stats")
    # update mode: one row per touched key per batch
    assert got["rows"] == N_KEYS
    ops = got["progress"]["stateOperators"]
    # THE bounded-state assertion: state rows == distinct keys, not
    # input rows — 2M rows in, 1M state entries
    assert ops[0]["numRowsTotal"] == N_KEYS
    # and the correctness spot-check survives the scale
    verify = (spark.read.parquet(str(src))
              .where(F.col("series") == "12345"))
    assert verify.count() == ROWS_PER_KEY


def test_dedup_first_seen_state_bounded_by_distinct_hashes(
        spark, tmp_path, rocksdb_state):
    src = tmp_path / "in"
    # every text occurs twice under different doc ids
    (spark.range(N_KEYS * ROWS_PER_KEY)
     .select(F.col("id").alias("doc_id"),
             F.concat(F.lit("doc-"), (F.col("id") % N_KEYS))
             .alias("text"))
     .write.parquet(str(src)))
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(str(src)))
    got = _run_stream(
        spark, tmp_path,
        lambda: ST.streaming_dedup_first_seen(stream), "ck_dedup")
    # only first occurrences emitted
    assert got["rows"] == N_KEYS
    ops = got["progress"]["stateOperators"]
    assert ops[0]["numRowsTotal"] == N_KEYS


def test_stream_corpus_dedup_batch_cost_flat_as_history_grows(
        spark, tmp_path):
    """The index-not-rescan claim of streaming/corpus.py, asserted:
    an identical micro-batch through stream_corpus_dedup_ingest
    costs roughly the SAME against a 32x-larger persisted history,
    because history is touched only through band-partitioned index
    probes (never rescanned). A regression that rescans the corpus
    (or probes without the band structure) lands ~32x."""
    import json
    import time

    from siridb_server_spark.operators.dedup import build_dedup_index
    from siridb_server_spark.streaming.corpus import \
        stream_corpus_dedup_ingest

    B = 400              # batch docs

    def history(n, tag):
        return spark.range(n).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat(F.lit(f"{tag} history document number "),
                     F.col("id"),
                     F.lit(" with stable filler words for shingles"
                           " across the whole corpus"))
            .alias("text"))

    def run_once(tag, hist_docs):
        root = tmp_path / tag
        root.mkdir()
        idx, acc = str(root / "idx"), str(root / "acc")
        build_dedup_index(history(hist_docs, tag), idx,
                          subdir="batch=-1")
        src = root / "src"
        src.mkdir()
        rows = [{"doc_id": i,
                 "text": f"novel incoming item {i} carrying"
                         " disjoint vocabulary so nothing matches"
                         " persisted entries at any band"}
                for i in range(B)]
        p = src / "b.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in rows))
        stream = (spark.readStream
                  .schema("doc_id long, text string")
                  .json(str(src)))
        q = stream_corpus_dedup_ingest(
            stream, idx, acc, threshold=0.5,
            checkpoint=str(root / "ckpt"))
        try:
            t0 = time.perf_counter()
            q.processAllAvailable()
            dt = time.perf_counter() - t0
        finally:
            q.stop()
        n_acc = spark.read.parquet(acc + "/docs").count()
        assert n_acc == B          # all fresh docs accepted
        return dt

    t_small = run_once("h1", B)            # history = 1 batch
    t_big = run_once("h32", 32 * B)        # history = 32 batches
    # flat-cost bound: generous 4x for ambient noise + the slightly
    # larger (still index-sized) probe tables; a rescan lands ~32x
    assert t_big <= 4.0 * t_small + 2.0, (
        f"per-batch cost grew with history: {t_small:.2f}s -> "
        f"{t_big:.2f}s at 32x history — the probe is rescanning "
        "the corpus instead of using the index")


def test_stream_media_dedup_batch_cost_flat_as_history_grows(
        spark, tmp_path):
    """The media twin of the corpus-stream probe: an identical media
    micro-batch through stream_media_dedup_ingest costs roughly the
    SAME against a 16x-larger persisted index, because history is
    touched only through its band-partitioned pHash rows and
    landmark hashes."""
    import struct
    import time

    import numpy as np

    from siridb_server_spark.operators import multimodal as MM
    from siridb_server_spark.operators.multimodal import \
        build_media_dedup_index
    from siridb_server_spark.streaming.corpus import \
        stream_media_dedup_ingest

    B = 48               # batch assets

    def png_of(seed):
        rng = np.random.default_rng(seed)
        return MM.encode_png(
            rng.integers(0, 256, (24, 32, 3)).astype(np.uint8))

    def media_rows(n, base_id, seed0):
        return [(base_id + i, "image", png_of(seed0 + i),
                 "image/png") for i in range(n)]

    def run_once(tag, hist_assets):
        root = tmp_path / tag
        root.mkdir()
        idx, acc = str(root / "idx"), str(root / "acc")
        hist = spark.createDataFrame(
            media_rows(hist_assets, 10_000_000, 500_000),
            MM.MEDIA_SCHEMA)
        build_media_dedup_index(hist, idx, subdir="batch=-1")
        src = root / "src"
        spark.createDataFrame(media_rows(B, 0, 77),
                              MM.MEDIA_SCHEMA) \
            .write.parquet(str(src / "b"))
        stream = (spark.readStream.schema(MM.MEDIA_SCHEMA)
                  .parquet(str(src) + "/*"))
        q = stream_media_dedup_ingest(
            stream, idx, acc, checkpoint=str(root / "ckpt"))
        try:
            t0 = time.perf_counter()
            q.processAllAvailable()
            dt = time.perf_counter() - t0
        finally:
            q.stop()
        n_acc = spark.read.parquet(acc + "/assets").count()
        assert n_acc == B        # random images: all accepted
        return dt

    t_small = run_once("h1", B)
    t_big = run_once("h16", 16 * B)
    assert t_big <= 4.0 * t_small + 2.0, (
        f"media batch cost grew with history: {t_small:.2f}s -> "
        f"{t_big:.2f}s at 16x — the probe is rescanning payloads "
        "instead of using the index")


def test_streaming_quantiles_state_bounded_per_key(
        spark, tmp_path, rocksdb_state):
    """The quantile tracker's state is ≤ k (pri, val) pairs per key
    — at 100k keys × 8 rows the state row count equals the KEY
    count (one state row per key, each holding the bounded sample),
    not the input row count."""
    n_keys, rows_per_key = 100_000, 8
    src = tmp_path / "in"
    (spark.range(n_keys * rows_per_key)
     .select((F.col("id") % n_keys).cast("string").alias("key"),
             F.col("id").alias("id"),
             (F.col("id") % 101).cast("double").alias("value"))
     .write.parquet(str(src)))
    stream = (spark.readStream
              .schema("key string, id long, value double")
              .parquet(str(src)))
    got = _run_stream(
        spark, tmp_path,
        lambda: ST.streaming_quantiles(stream), "ck_q")
    assert got["rows"] == n_keys
    ops = got["progress"]["stateOperators"]
    assert ops[0]["numRowsTotal"] == n_keys
