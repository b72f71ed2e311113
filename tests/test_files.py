"""File-format adapters: CSV / JSON-lines → points, JSONL → documents."""

import json

from siridb_server_spark import SiriEngine
from siridb_server_spark.model import TP_INT
from siridb_server_spark.sources import files as FS


def test_long_csv_roundtrip_through_engine(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text("series,ts,value\n"
                 "cpu,1471254705,1.5\n"
                 "cpu,1471254710,2.5\n"
                 "mem,1471254705,7.0\n")
    pts = FS.read_points_csv(spark, str(p))
    eng = SiriEngine.from_points(spark, pts, precision="s")
    assert eng.query("select * from 'cpu'") == {
        "cpu": [[1471254705, 1.5], [1471254710, 2.5]]}
    assert eng.query("select sum(5) from 'mem'") == {
        "mem": [[1471254705, 7.0]]}


def test_jsonl_points_int_type(spark, tmp_path):
    p = tmp_path / "pts.jsonl"
    p.write_text("\n".join(json.dumps(
        {"series": "s", "ts": 100 + i, "value": str(i)})
        for i in range(3)))
    pts = FS.read_points_jsonl(spark, str(p), tp=TP_INT)
    rows = sorted((r["ts"], r["val_int"], r["tp"])
                  for r in pts.collect())
    assert rows == [(100, 0, 0), (101, 1, 0), (102, 2, 0)]
    assert all(r["val_dbl"] is None for r in pts.collect())


def test_wide_csv_unpivot(spark, tmp_path):
    p = tmp_path / "wide.csv"
    p.write_text("ts,cpu,mem\n"
                 "10,1.0,\n"
                 "20,2.0,5.0\n")
    pts = FS.read_points_wide_csv(spark, str(p))
    rows = sorted((r["series"], r["ts"], r["val_dbl"])
                  for r in pts.collect())
    # null cell (mem@10) is dropped, not a null point
    assert rows == [("cpu", 10, 1.0), ("cpu", 20, 2.0),
                    ("mem", 20, 5.0)]


def test_documents_jsonl_defaults(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        json.dumps({"doc_id": 1, "text": "hello world",
                    "lang": "en", "source": "s1"}) + "\n"
        + json.dumps({"text": "no id here"}) + "\n")
    docs = FS.read_documents_jsonl(spark, str(p))
    rows = {r["text"]: r for r in docs.collect()}
    assert rows["hello world"]["doc_id"] == 1
    assert rows["hello world"]["n_chars"] == 11
    assert rows["no id here"]["doc_id"] is not None  # hash fallback
    # operators consume the shape directly
    from siridb_server_spark.operators.text import length_histogram
    assert length_histogram(docs, width=16).count() >= 1


def test_stream_points_jsonl_into_store(spark, tmp_path):
    """File-source streaming: JSONL files land as micro-batches in
    the partitioned store; the engine reads the result."""
    import json as _json
    import os

    from siridb_server_spark.sources.store import PointsStore

    src = str(tmp_path / "in")
    os.makedirs(src)
    with open(f"{src}/a.jsonl", "w") as f:
        for i in range(3):
            f.write(_json.dumps({"series": "cpu",
                                 "ts": 1471254705 + i,
                                 "value": float(i)}) + "\n")
    pts = FS.stream_points_jsonl(spark, src)
    assert pts.isStreaming
    store = PointsStore(str(tmp_path / "db"), 604800, 259200)
    q = (pts.writeStream.foreachBatch(
            lambda b, _id: store.append_df(b))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = store.read(spark).orderBy("ts").collect()
    assert [(r["series"], r["ts"], r["val_dbl"]) for r in rows] == \
        [("cpu", 1471254705, 0.0), ("cpu", 1471254706, 1.0),
         ("cpu", 1471254707, 2.0)]


def test_malformed_records_dropped_not_poisoning(spark, tmp_path):
    """PERMISSIVE-mode nulls from corrupt lines never enter the
    points model (which declares series/ts non-null)."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"series": "ok", "ts": 10, "value": "1.5"}\n'
        "this is not json at all\n"
        '{"ts": 20, "value": "2.0"}\n'          # missing series
        '{"series": "ok", "value": "3.0"}\n')   # missing ts
    pts = FS.read_points_jsonl(spark, str(p))
    rows = [(r["series"], r["ts"], r["val_dbl"])
            for r in pts.collect()]
    assert rows == [("ok", 10, 1.5)]


def test_non_castable_values_dropped_at_boundary(spark, tmp_path):
    """'abc' under a numeric tp must be dropped, not stored as a
    NULL-valued typed point."""
    from siridb_server_spark.model import TP_DOUBLE
    from siridb_server_spark.sources import files as FS

    p = tmp_path / "pts.csv"
    p.write_text("series,ts,value\ncpu,10,1.5\ncpu,11,abc\ncpu,,2\n")
    df = FS.read_points_csv(spark, str(p), tp=TP_DOUBLE)
    rows = df.collect()
    assert len(rows) == 1
    assert (rows[0]["ts"], rows[0]["val_dbl"]) == (10, 1.5)


def test_jsonl_docs_idless_duplicates_get_unique_ids(spark, tmp_path):
    from siridb_server_spark.sources import files as FS

    p = tmp_path / "docs.jsonl"
    p.write_text('{"text": "same boilerplate"}\n'
                 '{"text": "same boilerplate"}\n'
                 '{"doc_id": 7, "text": "has id"}\n')
    df = FS.read_documents_jsonl(spark, str(p))
    ids = [r["doc_id"] for r in df.collect()]
    assert len(ids) == len(set(ids)) == 3
    assert 7 in ids


def test_webdataset_export_read_roundtrip(spark, tmp_path):
    from siridb_server_spark.operators.curation import \
        export_webdataset
    from siridb_server_spark.sources.files import read_webdataset

    docs = spark.createDataFrame(
        [(i, f"body of {i} with ünïcödé") for i in range(25)],
        ["doc_id", "text"])
    export_webdataset(docs, str(tmp_path), n_shards=4).collect()
    back = read_webdataset(spark, str(tmp_path))
    got = {r["doc_id"]: (r["text"], r["shard"])
           for r in back.collect()}
    assert set(got) == set(range(25))
    for i in range(25):
        assert got[i][0] == f"body of {i} with ünïcödé"
    # shard column matches the exporter's assignment
    from siridb_server_spark.operators.curation import shard_export
    plan = {r["doc_id"]: r["shard"]
            for r in shard_export(docs, n_shards=4).collect()}
    assert {i: got[i][1] for i in got} == plan


def test_audio_meta_flac_mp3_wav_dispatch(spark):
    """Spec-struct audio metadata: FLAC STREAMINFO bit unpacking,
    MP3 frame walk (incl. ID3v2 skip, padding bit, stereo mode),
    WAV reuse, and malformed payloads -> NULLs (never crashes)."""
    from siridb_server_spark.operators import multimodal as MM

    rows = [
        (1, "audio", MM.build_flac_header(1, 96000, 24, 12345678),
         "audio/flac"),
        (2, "audio", MM.build_mp3(5, bitrate_idx=14, rate_idx=1,
                                  mono=False), "audio/mpeg"),
        (3, "audio", MM.build_mp3(3, id3_pad=100), "audio/mpeg"),
        (4, "audio", b"fLaC\x00\x00", "audio/flac"),      # truncated
        (5, "audio", b"\xff\xfb\xf0\x00", "audio/mpeg"),  # bad br=15
        (6, "audio", b"", "application/octet-stream"),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           MM.decode_audio_meta(media).collect()}
    f = got[1]
    assert (f["container"], f["channels"], f["sample_rate"],
            f["bits"], f["n_samples"]) == ("flac", 1, 96000, 24,
                                           12345678)
    # 12345678 / 96000 s = 128601.3125 ms -> half-up 128601
    assert f["duration_ms"] == 128601
    m = got[2]
    assert (m["container"], m["channels"], m["sample_rate"],
            m["n_samples"]) == ("mp3", 2, 48000, 5 * 1152)
    assert m["bits"] is None
    assert got[3]["n_samples"] == 3 * 1152     # ID3 tag skipped
    for bad in (4, 5, 6):
        assert got[bad]["container"] is None, bad


# ------------------------------------------------- Arrow IPC shards

def test_arrow_ipc_documents_roundtrip_and_determinism(
        spark, tmp_path):
    """Docs survive the IPC roundtrip exactly (unicode included),
    and the export is byte-identical under any input partitioning
    (per-shard sha256 equality)."""
    from siridb_server_spark.localdf import arrow_df
    from siridb_server_spark.sources import arrowipc as AI

    rows = [(1, "héllo wörld 世界", "a"),
            (2, "plain", "b"), (3, "", "a"),
            (4, None, "c"), (5, "tab\tnl\n", "b")]
    df = arrow_df(spark, rows,
                  "doc_id long, text string, source string")
    m1 = {r["shard"]: r["sha256"] for r in AI.export_arrow_documents(
        df, str(tmp_path / "d1"), n_shards=3).collect()}
    m2 = {r["shard"]: r["sha256"] for r in AI.export_arrow_documents(
        df.repartition(7), str(tmp_path / "d2"),
        n_shards=3).collect()}
    assert m1 == m2 and len(m1) >= 1

    back = {r["doc_id"]: (r["text"], r["source"]) for r in
            AI.read_arrow_documents(spark,
                                    str(tmp_path / "d1")).collect()}
    assert back[1] == ("héllo wörld 世界", "a")
    assert back[4] == ("", "c")          # NULL text exported as ''
    assert back[5] == ("tab\tnl\n", "b")
    assert len(back) == 5


def test_arrow_ipc_embeddings_roundtrip(spark, tmp_path):
    from siridb_server_spark.sources import arrowipc as AI
    from siridb_server_spark.sources.testdata import load

    emb = load(spark, "/root/testdata/sf0.001", "embeddings") \
        .where("vec_id < 40")
    AI.export_arrow_embeddings(emb, str(tmp_path / "e"),
                               n_shards=4).collect()
    back = AI.read_arrow_embeddings(spark, str(tmp_path / "e"))
    a = sorted((r["vec_id"], r["label"], tuple(r["embedding"]))
               for r in emb.collect())
    b = sorted((r["vec_id"], r["label"], tuple(r["embedding"]))
               for r in back.collect())
    assert a == b and len(a) == 40
