"""Mergeable distinct-count sketches (HyperLogLog) as PLAIN
DataFrames — the incremental-analytics shape: build per-partition
register tables once, persist them as parquet, merge them with a
groupBy-max, estimate at read time. 100 TB of history is never
rescanned; a day's distincts cost one pass over that day.

Everything up to estimation is integer/string arithmetic derived
from md5 — deliberately: both Spark and DuckDB compute md5
identically, so the register tables are cross-engine reproducible
and the driver's value-hash gate can pin them (sketch_hll_* entries
mirror the construction in SQL verbatim). p=12 keeps the bucket and
the 48-bit suffix HEX-ALIGNED (3 + 12 hex chars), which is what
makes leading-zero counting expressible as string ops on the hex
digest — no log2, no bit intrinsics, nothing engine-specific.

The float estimation step (harmonic mean + the standard HLL
small-range correction) stays OUT of hashed oracles per the
transcendental-ban policy; its accuracy is pytest-verified against
exact countDistinct (tests/test_sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: register-index bits: 2^12 = 4096 registers, rsd ≈ 1.04/√m ≈ 1.6%
P = 12
M = 1 << P
#: max rho: 48 suffix bits all zero → 49
RHO_MAX = 49


def _rho_cols(member):
    """(bucket, rho) columns from md5(member): bucket = first 3 hex
    chars (12 bits), rho = 1 + leading zero bits of the next 12 hex
    chars (48 bits). Pure string/CASE ops — byte-identical in Spark
    and DuckDB."""
    h = F.md5(member.cast("string"))
    bucket = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    sfx = F.substring(h, 4, 12)
    t = F.regexp_replace(sfx, "^0*", "")
    lzhex = F.lit(12) - F.length(t)
    nib = F.conv(F.substring(t, 1, 1), 16, 10).cast("int")
    nib_lz = (F.when(nib >= 8, 0).when(nib >= 4, 1)
              .when(nib >= 2, 2).otherwise(3))
    rho = (F.when(t == "", F.lit(RHO_MAX))
           .otherwise(lzhex * 4 + nib_lz + 1)).cast("int")
    return bucket, rho


def hll_registers(df: DataFrame, key_cols, member_col: str) -> DataFrame:
    """Per-key HLL register table: (key..., bucket, rho) with one
    row per OCCUPIED register (missing buckets mean rho 0). One
    map-side-combinable groupBy-max — the sketch build is a single
    shuffle whose width is ≤ |keys|·4096 rows no matter how many
    member rows went in."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    bucket, rho = _rho_cols(F.col(member_col))
    return (df.where(F.col(member_col).isNotNull())
            .select(*key_cols, bucket.alias("bucket"),
                    rho.alias("rho"))
            .groupBy(*key_cols, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_merge(regs: DataFrame, key_cols) -> DataFrame:
    """Merge register tables (e.g. daily partials → a weekly or
    all-time sketch): registers combine by MAX, which is associative
    and idempotent — re-merging or double-counting a partial cannot
    inflate the estimate. ``regs`` may carry extra columns (day,
    source file); only (key..., bucket, rho) survive."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    return (regs.groupBy(*key_cols, "bucket")
            .agg(F.max("rho").alias("rho")))


def hll_estimate(regs: DataFrame, key_cols) -> DataFrame:
    """Distinct-count estimates from a register table: the standard
    HLL harmonic mean with the linear-counting small-range
    correction (Flajolet et al. 2007). Float math — pytest-verified
    against exact distincts, kept out of hashed oracle contracts.
    Output: (key..., estimate double, n_occupied long)."""
    import math

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    alpha = 0.7213 / (1 + 1.079 / M)
    agg = (regs.groupBy(*key_cols)
           .agg(F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                .alias("_occ_sum"),
                F.count(F.lit(1)).alias("n_occupied")))
    zeros = F.lit(M) - F.col("n_occupied")
    denom = F.col("_occ_sum") + zeros.cast("double")
    raw = F.lit(alpha * M * M) / denom
    lc = F.lit(float(M)) * (F.lit(math.log(M))
                            - F.log(zeros.cast("double")))
    est = F.when((raw <= F.lit(2.5 * M)) & (zeros > 0), lc) \
        .otherwise(raw)
    return agg.select(*key_cols, est.alias("estimate"),
                      "n_occupied")


#: SQL fragment mirroring :func:`hll_registers` for oracle entries —
#: format with member=expr, keys=select-list, table=FROM source
HLL_REGISTERS_SQL = (
    "SELECT {keys}, bucket,"
    " CAST(CASE WHEN t = '' THEN 49 ELSE"
    " (12 - length(t)) * 4 +"
    " (CASE WHEN nib >= 8 THEN 0 WHEN nib >= 4 THEN 1"
    " WHEN nib >= 2 THEN 2 ELSE 3 END) + 1 END AS INT) AS rho"
    " FROM (SELECT {keys}, bucket, t,"
    " CAST(('0x' || CASE WHEN t = '' THEN '0'"
    " ELSE substr(t, 1, 1) END) AS BIGINT) AS nib"
    " FROM (SELECT {keys},"
    " CAST(('0x' || substr(h, 1, 3)) AS BIGINT) AS bucket,"
    " regexp_replace(substr(h, 4, 12), '^0*', '') AS t"
    " FROM (SELECT {keys}, md5({member}) AS h FROM {table}"
    " WHERE {member} IS NOT NULL)))")
