"""TFRecord source/sink (sources/tfrecord.py): CRC-32C against the
public test vectors, Example proto wire round-trips, framing
corruption detection, and the Spark export→read round-trip with
deterministic shard bytes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from siridb_server_spark.sources import tfrecord as TFR
from siridb_server_spark.sources.testdata import load

SF = "/root/testdata/sf0.001"


def test_crc32c_public_vectors():
    # RFC 3720 / iSCSI test vectors
    assert TFR.crc32c(b"123456789") == 0xE3069283
    assert TFR.crc32c(b"") == 0
    assert TFR.crc32c(b"\x00" * 32) == 0x8A9136AA
    assert TFR.crc32c(b"\xff" * 32) == 0x62A8AB43


def test_example_proto_roundtrip_all_kinds():
    ex = TFR.encode_example({
        "doc_id": 42, "neg": -7, "ids": [1, 2, 300],
        "text": "héllo", "raw": b"\x00\xff",
        "emb": [1.5, -2.25], "one": 0.5})
    f = TFR.parse_example(ex)
    assert f["doc_id"] == ("int64", [42])
    assert f["neg"] == ("int64", [-7])           # 10-byte varint
    assert f["ids"] == ("int64", [1, 2, 300])    # packed
    assert f["text"][1][0].decode("utf-8") == "héllo"
    assert f["raw"] == ("bytes", [b"\x00\xff"])
    assert f["emb"] == ("float", [1.5, -2.25])   # packed float32
    assert f["one"] == ("float", [0.5])
    # canonical bytes: dict order doesn't matter
    ex2 = TFR.encode_example({"neg": -7, "one": 0.5, "doc_id": 42,
                              "raw": b"\x00\xff", "emb": [1.5, -2.25],
                              "ids": [1, 2, 300], "text": "héllo"})
    assert ex == ex2


def test_framing_roundtrip_and_corruption():
    recs = [TFR.encode_example({"a": 1}), b"x", b""]
    blob = TFR.pack_records(recs)
    assert TFR.unpack_records(blob, verify_data=True) == recs
    # flip a length-crc byte: always detected
    bad = bytearray(blob)
    bad[8] ^= 1
    with pytest.raises(ValueError, match="length crc"):
        TFR.unpack_records(bytes(bad))
    # flip a data byte: detected only under verify_data
    bad2 = bytearray(blob)
    bad2[13] ^= 1
    with pytest.raises(ValueError, match="crc mismatch"):
        TFR.unpack_records(bytes(bad2), verify_data=True)
    # truncation
    with pytest.raises(ValueError, match="truncated"):
        TFR.unpack_records(blob[:-2])


def test_spark_documents_roundtrip_and_determinism(spark, tmp_path):
    docs = load(spark, SF, "documents")
    man = TFR.export_tfrecord_documents(
        docs, str(tmp_path / "a"), n_shards=8)
    shas = sorted(r["sha256"] for r in man.collect())
    back = TFR.read_tfrecord_documents(spark, str(tmp_path / "a"),
                                       verify_data=True)
    want = docs.select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text"),
        F.coalesce("source", F.lit("")).alias("source"))
    got = back.select("doc_id", "text", "source")
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0
    # byte-identical shards regardless of input partitioning
    man2 = TFR.export_tfrecord_documents(
        docs.repartition(7), str(tmp_path / "b"), n_shards=8)
    assert sorted(r["sha256"] for r in man2.collect()) == shas


def test_spark_embeddings_bit_exact_roundtrip(spark, tmp_path):
    emb = load(spark, SF, "embeddings")
    TFR.export_tfrecord_embeddings(
        emb, str(tmp_path / "e"), n_shards=4).collect()
    back = TFR.read_tfrecord_embeddings(
        spark, str(tmp_path / "e"), verify_data=True)
    want = emb.select("vec_id", "embedding",
                      F.coalesce(F.col("label"), F.lit(-1))
                      .cast("long").alias("label"))
    got = back.select("vec_id", "embedding", "label")
    assert want.exceptAll(got).count() == 0
    assert got.exceptAll(want).count() == 0
