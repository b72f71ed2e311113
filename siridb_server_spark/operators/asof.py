"""As-of (most-recent-at-or-before) join for time-series frames.

Spark has no native ASOF JOIN; the naive encoding — a range
self-join ``l.ts >= r.ts`` with a per-row argmax — explodes to
O(|L|·|R|) candidates per key. This implementation uses the
union + last-value-carry-forward trick instead: tag both inputs,
interleave them in one frame, and let a single window sort per key
carry the latest right-side row forward onto every left row. Cost is
ONE hash shuffle on the key plus a per-partition sort — the same
shape as any windowed aggregate, linear at 100 TB, no candidate
blowup, no broadcast requirement on either side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "ts",
              by: str | None = None, right_cols: list[str] | None = None,
              tolerance: int | None = None,
              suffix: str = "_right") -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``on`` value ≤ the left row's (per ``by`` key) — left-join
    semantics: left rows with no earlier right row keep nulls.

    ``tolerance`` (same unit as ``on``) nulls the match out when the
    right row is older than ``left.on - tolerance`` (pandas
    ``merge_asof`` semantics).

    At equal timestamps the right row matches (``>=``, as in DuckDB's
    ASOF JOIN); duplicate right timestamps within a key must be
    resolved by the caller (e.g. keep the max-seq row) — carry-forward
    takes whichever sorts last, so dedup first for determinism.

    Scale shape: union is free (no shuffle); the only exchange is
    ``hashpartitioning(by)`` feeding one sort; the carried payload is
    exactly ``right_cols``. Skewed keys behave like any skewed
    window — AQE cannot split a window partition, so pre-salt the key
    if one entity dominates.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, by)]
    lcols = [c for c in left.columns]
    # side orders right (0) before left (1) at equal ts → ">=" match
    r = right.select(
        *([F.col(by)] if by else []),
        F.col(on).alias("__ts"), F.lit(0).alias("__side"),
        F.struct(F.col(on).alias("__rts"), *right_cols).alias("__rv"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c != by])
    l_ = left.select(
        *([F.col(by)] if by else []),
        F.col(on).alias("__ts"), F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rv"].dataType).alias("__rv"),
        *[F.col(c) for c in lcols if c != by])
    w = (Window.partitionBy(*([by] if by else []))
         .orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = F.last("__rv", ignorenulls=True).over(w)
    out = (r.unionByName(l_)
           .withColumn("__m", carried)
           .where(F.col("__side") == 1))
    if tolerance is not None:
        out = out.withColumn(
            "__m", F.when(
                F.col("__m.__rts") >= F.col("__ts") - F.lit(tolerance),
                F.col("__m")))
    return out.select(
        *([by] if by else []),
        *[F.col(c) for c in lcols if c != by],
        *[F.col(f"__m.{c}").alias(c + suffix if c in lcols else c)
          for c in right_cols],
        F.col("__m.__rts").alias(on + suffix))
