"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, Arrow-batched mapInPandas UDFs,
batch shapes, partition sizing — is real and tested. The actual codec
work (JPEG decode, audio resample, video frame-sample) is STUBBED
behind ``decoders`` because the media libraries are not in this
container: each stub raises NotImplementedError unless
``deterministic_fake=True``, which produces metadata derived only from
the bytes (so tests and the correctness oracle can run).

At 100 TB: binary payloads dominate row size, so these operators use
mapInPandas (streaming Arrow batches, bounded memory via
spark.sql.execution.arrow.maxRecordsPerBatch) rather than collect-style
UDFs, and the recommended layout is one parquet row-group per ~128 MB
with the binary column last.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),  # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
])

DECODED_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("n_frames", T.LongType(), True),
])


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as an opaque payload —
    exercises the binary-column path with the driver's testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_meta(payload: bytes) -> tuple:
    """Deterministic fake decode: metadata derived from the bytes only
    (mirrors what a real decoder would emit; SQL-reproducible)."""
    n = len(payload)
    return n, (n * 7) % 640 + 1, (n * 13) % 480 + 1, n % 97 + 1


def decode_image_meta(media: DataFrame,
                      deterministic_fake: bool = True) -> DataFrame:
    """Extract (width, height, ...) metadata per payload via Arrow-
    batched mapInPandas. Real decoding is stubbed (no PIL/ffmpeg in
    this container)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real image decode requires PIL/libjpeg — not "
                    "available in this container; pass "
                    "deterministic_fake=True")
            metas = [_fake_meta(p if p is not None else b"")
                     for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"].astype("int64"),
                "n_bytes": [m[0] for m in metas],
                "width": [m[1] for m in metas],
                "height": [m[2] for m in metas],
                "n_frames": [m[3] for m in metas],
            })

    return media.mapInPandas(run, schema=DECODED_META_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator shape: payload→payload. STUB — identity
    on bytes plus target-size metadata (a real impl swaps `transform`
    for the decoder+resampler; the Spark plumbing is identical)."""

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["mime"] = "image/resized"
            yield pdf

    return media.mapInPandas(run, schema=MEDIA_SCHEMA) \
        .withColumn("target_w", F.lit(width)) \
        .withColumn("target_h", F.lit(height))


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling shape: one row in → k rows out (flatMap
    semantics via mapInPandas). STUB: emits deterministic frame indices
    derived from payload length."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                n_frames = (len(r["payload"] or b"") % 97 + 1)
                for i in range(0, n_frames, every_n):
                    rows.append((int(r["media_id"]), i))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx"])

    schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
    ])
    return media.mapInPandas(run, schema=schema)
