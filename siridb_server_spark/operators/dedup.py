"""Deduplication operators for training-data pipelines at 100 TB scale.

Four tiers, cheapest first:
- exact (hash-groupBy): one shuffle on md5(text).
- n-gram Jaccard: explode→self-join on shared tokens→pair agg. The
  join key (token) is the classic inverted-index trick: pairs sharing
  no token never materialize.
- MinHash + LSH banding: signature agg (one shuffle), band-bucket
  self-join (only same-bucket candidates materialize), then exact
  verify. This is the scale path: candidate count is tunable via
  (num_hashes, bands).
- SimHash: 64-bit signature via per-bit majority vote, banded join on
  signature chunks, Hamming verify with bit_count(xor).

Everything is JVM-side column expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash; keep the minimum id.
    Output: (content_hash, keep_id, n_copies)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


def _doc_words(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(F.split(F.lower(F.trim(F.col(text_col))),
                                    r"\s+")).alias("w"))
        .where(F.col("w") != "")
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, threshold: float = 0.8,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Word-set Jaccard similarity join (n=1 shingles).

    Inverted-index self-join: only pairs sharing ≥1 token are
    generated; |A∩B| falls out of the pair count, |A∪B| from the
    per-doc sizes (broadcast — it's one row per doc_id).
    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    dw = _doc_words(df, text_col, id_col)
    sizes = dw.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = dw.alias("a")
    b = dw.alias("b")
    inter = (
        a.join(b, (F.col("a.w") == F.col("b.w"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"),
                 F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"),
                      F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"),
                      F.col("n").alias("nb"))
    jac = (F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .where(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def shingles(text_col: str, n: int = 3):
    """n-word shingle array column."""
    w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(w) - n + 1, F.lit(1)))
    return F.array_distinct(F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(w, i, n))))


def minhash_signatures(df: DataFrame, num_hashes: int = 16,
                       shingle_n: int = 3, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """MinHash signatures as ONE array column: explode (shingle, seed)
    pairs → min per (doc, seed) → assemble the ordered signature.
    Deliberately avoids a k-expression aggregate: k min-columns make
    Janino compile a huge generated class (seconds of driver time),
    while this shape is two tiny hash aggregations regardless of k.
    Output: (doc_id, sig array<long>[k])."""
    sh = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(shingles(text_col, shingle_n)).alias("sh"))
        .select("doc_id", "sh",
                F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1)))
                .alias("seed"))
        .select("doc_id", "seed",
                F.xxhash64(F.concat(F.col("seed").cast("string"),
                                    F.lit("|"), F.col("sh")))
                .alias("h"))
    )
    mins = sh.groupBy("doc_id", "seed").agg(F.min("h").alias("m"))
    return (
        mins.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("seed", "m")))
             .alias("sm"))
        .select("doc_id",
                F.transform("sm", lambda s: s["m"]).alias("sig"))
    )


def minhash_lsh_pairs(df: DataFrame, num_hashes: int = 16,
                      bands: int = 4, shingle_n: int = 3,
                      threshold: float = 0.5,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """MinHash+LSH near-dup pairs: band signatures into buckets; only
    same-bucket docs become candidates; verify with the estimated
    Jaccard (fraction of agreeing hash components).
    Output: (id_a, id_b, est_jaccard)."""
    k = num_hashes
    rows_per_band = k // bands
    sig = minhash_signatures(df, k, shingle_n, text_col, id_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.get("sig", i)
                         for i in range(b * rows_per_band,
                                        (b + 1) * rows_per_band)])
            .alias("bh"))
        for b in range(bands)
    ]
    banded = sig.select(
        "doc_id", "sig", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "sig",
             F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    # signatures feed BOTH sides of the self-join: persist so the
    # shingle explode + min aggregation runs once, not twice
    banded = banded.persist()
    a = banded.alias("a")
    b_ = banded.alias("b")
    agree = F.size(F.filter(
        F.zip_with(F.col("a.sig"), F.col("b.sig"),
                   lambda x, y: x == y), lambda m: m))
    cands = (
        a.join(b_, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bh") == F.col("b.bh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                (agree / F.lit(float(k))).alias("est_jaccard"))
        .distinct()
    )
    return cands.where(F.col("est_jaccard") >= threshold) \
        .select("id_a", "id_b", F.round("est_jaccard", 6)
                .alias("est_jaccard"))


def simhash(df: DataFrame, bits: int = 48, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """SimHash signatures: per-bit majority vote over token hashes.
    (doc, word-hash) explodes over bit positions → sign votes →
    signature reassembled via sum(2^bit). Small fixed codegen
    regardless of ``bits`` (a bits-wide aggregate expression list
    would cost seconds of Janino compile time).
    The 48-bit signature fits a BIGINT. Output: (doc_id, simhash)."""
    dw = _doc_words(df, text_col, id_col)
    exploded = (
        dw.select("doc_id", F.xxhash64("w").alias("h"))
        .select("doc_id", "h",
                F.explode(F.sequence(F.lit(0), F.lit(bits - 1)))
                .alias("bit"))
        .select(
            "doc_id", "bit",
            F.expr("CASE WHEN (shiftright(h, bit) & 1) = 1 "
                   "THEN 1 ELSE -1 END").alias("vote"))
    )
    votes = exploded.groupBy("doc_id", "bit").agg(
        F.sum("vote").alias("v"))
    return votes.groupBy("doc_id").agg(
        F.sum(F.expr(
            "CASE WHEN v > 0 THEN shiftleft(CAST(1 AS BIGINT), bit) "
            "ELSE CAST(0 AS BIGINT) END"))
        .cast("long").alias("simhash"))


def simhash_pairs(df: DataFrame, max_hamming: int = 3, bits: int = 48,
                  bands: int = 4, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.
    Banding on signature chunks guarantees recall for distances <
    bands (pigeonhole); verify via bit_count(xor).
    Output: (id_a, id_b, hamming)."""
    sig = simhash(df, bits, text_col, id_col)
    chunk = bits // bands
    banded = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col("simhash"), b * chunk)
                .bitwiseAND(F.lit((1 << chunk) - 1)).alias("key"))
            for b in range(bands)])).alias("bb"))\
        .select("doc_id", "simhash", "bb.band", "bb.key")
    a, b_ = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(b_, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                ham.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
