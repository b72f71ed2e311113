"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, Arrow-batched mapInPandas UDFs,
batch shapes, partition sizing — is real and tested. Decode status is
split by what the container allows: REAL decoders for library-free
container formats (P6 PPM images, RIFF/PCM16 WAV audio — pure
numpy/struct, see ``decode_ppm_meta``/``decode_wav_meta``), STUBS for
compressed codecs (JPEG/MP3/H.264 need native libraries): each stub
raises NotImplementedError unless ``deterministic_fake=True``, which
produces metadata derived only from the bytes (so tests and the
correctness oracle can run).

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


# ---------------------------------------------------------------------
# Real decoders for library-free formats. PPM (P6) and WAV (RIFF/PCM)
# are plain structs — header fields plus a raster/sample array — so
# they decode with numpy alone, no codec library. These upgrade the
# decode path from "stub" to "real for container formats, stubbed for
# compressed codecs (JPEG/MP3/H.264 need native libs)". The Spark
# shape is identical: Arrow-batched mapInPandas, bounded memory.

PPM_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("maxval", T.LongType(), True),
    T.StructField("mean_r", T.DoubleType(), True),
    T.StructField("mean_g", T.DoubleType(), True),
    T.StructField("mean_b", T.DoubleType(), True),
])


def _parse_ppm_raster(payload: bytes):
    """P6 PPM header + raster. Returns (w, h, maxval, HxWx3 uint8
    array) or None if not a valid P6."""
    import numpy as np

    if not payload or not payload.startswith(b"P6"):
        return None
    # tokenize the header: 4 ints/fields, '#' comments run to newline
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(payload):
        c = payload[pos:pos + 1]
        if c.isspace():
            pos += 1
        elif c == b"#":
            nl = payload.find(b"\n", pos)
            pos = len(payload) if nl < 0 else nl + 1
        else:
            end = pos
            while end < len(payload) and \
                    not payload[end:end + 1].isspace():
                end += 1
            tok = payload[pos:end]
            if not tok.isdigit():
                return None
            fields.append(int(tok))
            pos = end
    if len(fields) < 3 or pos >= len(payload):
        return None
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not 0 < maxval < 65536:
        # zero dimensions or an out-of-spec maxval: malformed —
        # treat as invalid, not a crash or a silent misread
        return None
    if maxval > 255:
        # legal P6 with 2-byte big-endian samples
        need = w * h * 6
        raster = payload[pos:pos + need]
        if len(raster) < need:
            return None
        arr16 = np.frombuffer(raster, dtype=">u2").reshape(h, w, 3)
        return (w, h, maxval, arr16)
    need = w * h * 3
    raster = payload[pos:pos + need]
    if len(raster) < need:
        return None
    arr = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    return (w, h, maxval, arr)


def _parse_ppm(payload: bytes):
    """(w, h, maxval, mean_r, mean_g, mean_b) of a P6 payload, or
    None if not a valid P6."""
    parsed = _parse_ppm_raster(payload)
    if parsed is None:
        return None
    w, h, maxval, arr = parsed
    means = arr.reshape(-1, 3).mean(axis=0)
    return (w, h, maxval, round(float(means[0]), 6),
            round(float(means[1]), 6), round(float(means[2]), 6))


def decode_ppm_meta(media: DataFrame) -> DataFrame:
    """REAL image decode for P6 PPM payloads: header dims + per-
    channel mean via one numpy reshape per payload. Non-PPM payloads
    yield NULL metadata (kept, not dropped — the caller filters)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                m = _parse_ppm(p if p is not None else b"")
                rows.append((int(mid),) + (m if m else (None,) * 6))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PPM_META_SCHEMA])

    return media.mapInPandas(run, schema=PPM_META_SCHEMA)


WAV_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("channels", T.LongType(), True),
    T.StructField("sample_rate", T.LongType(), True),
    T.StructField("bits", T.LongType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("duration_s", T.DoubleType(), True),
    T.StructField("rms", T.DoubleType(), True),
])


def _parse_wav_pcm(payload: bytes):
    """RIFF/WAVE chunk walk for PCM16: returns (channels, rate,
    interleaved int16 samples ndarray) or None."""
    import struct

    import numpy as np

    if len(payload) < 44 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (sz,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if fmt is None or data is None or len(fmt) < 16:
        return None
    _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if bits != 16 or channels < 1 or rate < 1:
        return None
    samples = np.frombuffer(
        data[:len(data) - len(data) % (2 * channels)], dtype="<i2")
    return (channels, rate, samples)


def _parse_wav(payload: bytes):
    """RIFF/WAVE with PCM16 'fmt ' + 'data' chunks. Returns
    (channels, rate, bits, n_samples, duration, rms) or None."""
    import numpy as np

    parsed = _parse_wav_pcm(payload)
    if parsed is None:
        return None
    channels, rate, samples = parsed
    n = len(samples) // channels
    rms = float(np.sqrt(np.mean(samples.astype("float64") ** 2))) \
        if len(samples) else 0.0
    return (channels, rate, 16, n, round(n / rate, 6),
            round(rms, 6))


def decode_wav_meta(media: DataFrame) -> DataFrame:
    """REAL audio decode for RIFF/PCM16 WAV payloads: format chunk +
    sample count + RMS amplitude, pure struct/numpy."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                m = _parse_wav(p if p is not None else b"")
                rows.append((int(mid),) + (m if m else (None,) * 6))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_META_SCHEMA])

    return media.mapInPandas(run, schema=WAV_META_SCHEMA)


PPM_RESIZE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.LongType(), True),
    T.StructField("height", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("mean_r", T.DoubleType(), True),
    T.StructField("mean_g", T.DoubleType(), True),
    T.StructField("mean_b", T.DoubleType(), True),
])


def resize_ppm(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """REAL nearest-neighbor resize for P6 PPM payloads (the
    library-free counterpart of the stubbed codec resize): source
    pixel for output (y, x) is (y·h_src // h_out, x·w_src // w_out),
    re-encoded as a new P6 payload. One numpy fancy-index per image,
    Arrow-batched through mapInPandas — the per-image work is
    row-local, so the operator is a pure map at any corpus size.
    Invalid payloads yield NULL metadata (kept, not dropped).
    Output: (media_id, width, height, payload, n_bytes,
    mean_r/g/b of the thumbnail, 6 decimals)."""

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_ppm_raster(p if p is not None else b"")
                if parsed is None:
                    rows.append((int(mid),) + (None,) * 7)
                    continue
                w, h, maxval, img = parsed
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                thumb = img[ys][:, xs]
                payload = (b"P6\n%d %d\n%d\n"
                           % (out_w, out_h, maxval)) + thumb.tobytes()
                means = thumb.reshape(-1, 3).mean(axis=0)
                rows.append((int(mid), out_w, out_h, payload,
                             len(payload),
                             round(float(means[0]), 6),
                             round(float(means[1]), 6),
                             round(float(means[2]), 6)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in PPM_RESIZE_SCHEMA])

    return media.mapInPandas(run, schema=PPM_RESIZE_SCHEMA)


WAV_RESAMPLE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.LongType(), True),
    T.StructField("n_samples", T.LongType(), True),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("rms", T.DoubleType(), True),
])


def resample_wav(media: DataFrame, out_rate: int) -> DataFrame:
    """REAL linear-interpolation resample for RIFF/PCM16 payloads —
    the library-free counterpart of a stubbed codec transcoder.
    Output frame ``i`` sits at source position ``i·rate/out_rate``;
    each channel interpolates ``s0·(1−f) + s1·f`` between the two
    neighbouring source frames (last frame clamps), rounds
    half-to-even back to int16, and re-encodes a valid PCM16 WAV at
    ``out_rate`` (``n_out = n·out_rate // rate`` frames). One
    vectorized numpy pass per clip, Arrow-batched through
    mapInPandas — row-local, a pure map at any corpus size. Invalid
    payloads yield NULLs (kept, not dropped). Output: (media_id,
    sample_rate, n_samples, payload, n_bytes, rms of the resampled
    int16 stream, 6 decimals)."""
    import struct

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                parsed = _parse_wav_pcm(p if p is not None else b"")
                if parsed is None:
                    rows.append((int(mid),) + (None,) * 5)
                    continue
                channels, rate, samples = parsed
                n = len(samples) // channels
                frames = samples[:n * channels] \
                    .reshape(n, channels).astype("float64")
                n_out = (n * out_rate) // rate
                if n == 0 or n_out == 0:
                    rows.append((int(mid),) + (None,) * 5)
                    continue
                pos = np.arange(n_out, dtype="float64") \
                    * rate / out_rate
                i0 = np.floor(pos).astype("int64")
                frac = (pos - i0)[:, None]
                i1 = np.minimum(i0 + 1, n - 1)
                y = frames[i0] * (1.0 - frac) + frames[i1] * frac
                out = np.clip(np.round(y), -32768, 32767) \
                    .astype("<i2")
                data = out.tobytes()
                fmt = struct.pack("<HHIIHH", 1, channels, out_rate,
                                  out_rate * channels * 2,
                                  channels * 2, 16)
                body = b"fmt " + struct.pack("<I", len(fmt)) + fmt \
                    + b"data" + struct.pack("<I", len(data)) + data
                payload = b"RIFF" + struct.pack("<I", 4 + len(body)) \
                    + b"WAVE" + body
                flat = out.astype("float64").ravel()
                rms = round(float(np.sqrt(np.mean(flat ** 2))), 6)
                rows.append((int(mid), out_rate, int(n_out), payload,
                             len(payload), rms))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WAV_RESAMPLE_SCHEMA])

    return media.mapInPandas(run, schema=WAV_RESAMPLE_SCHEMA)
