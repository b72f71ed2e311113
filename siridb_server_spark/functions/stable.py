"""Partition-order-proof floating aggregation.

A double ``F.sum`` folds partial aggregates in partition order, so
its low bits — and therefore ``round(x, k)`` at a round-half
boundary — can differ between local[4] and local[32] runs of the
same query (observed on curation mix_weights, CORRECTNESS_r04).
Summing exact DECIMAL(38,18) terms instead is associative and
commutative: every term is deterministically rounded once (half-up
at 18 fractional digits), the fold is exact, and the final cast back
to double is order-free. DuckDB oracles mirror it verbatim as
``CAST(sum(CAST(x AS DECIMAL(38,18))) AS DOUBLE)``.

Use it for any double sum whose ROUNDED value is part of a
reproducibility contract; plain int sums are already exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: the SQL fragment oracles use to mirror :func:`stable_dsum`
#: (the inner DOUBLE cast makes float32 inputs take the same exact
#: widening step on both engines before the decimal rounding)
STABLE_DSUM_SQL = ("CAST(sum(CAST(CAST({x} AS DOUBLE)"
                   " AS DECIMAL(38,18))) AS DOUBLE)")


def stable_dsum(col: Column) -> Column:
    """Order-insensitive double sum (see module docstring)."""
    return F.sum(col.cast("double").cast("decimal(38,18)")) \
        .cast("double")


#: oracle fragment mirroring :func:`scaled_dsum`; format with x=expr
#: and s=10**scale (both engines evaluate the identical IEEE ops)
SCALED_DSUM_SQL = (
    "(sum(CASE WHEN CAST({x} AS DOUBLE) >= 0.0"
    " THEN CAST(floor(CAST({x} AS DOUBLE) * {s}.0 + 0.5) AS BIGINT)"
    " ELSE -CAST(floor(-CAST({x} AS DOUBLE) * {s}.0 + 0.5) AS BIGINT)"
    " END) / {s}.0)")


def scaled_dsum(col: Column, scale: int = 6) -> Column:
    """Order-insensitive double sum via scaled-long accumulation —
    the FAST path for hot sums whose contract rounds to ≤ ``scale``
    decimals.

    Each term becomes ``floor(|x|·10^scale + 0.5)·sign(x)`` — every
    step (multiply, add, floor) is an exactly-specified IEEE-754
    operation, so Spark and DuckDB produce bit-identical longs (no
    decimal-string-vs-binary rounding-rule gap; this is why it is NOT
    ``F.round``, whose BigDecimal half-up on the shortest repr can
    disagree with a C ``round`` on the binary value). The long sum is
    exact and associative; one division at the end returns a double.

    Versus :func:`stable_dsum` this trades the per-term BigDecimal
    conversion (~3× the whole aggregate's cost on a 600k-row
    lineitem probe) for two constraints the caller must own:
    - terms are quantized at 10^-scale (exact for money/count-like
      inputs with ≤ scale decimals; a deterministic engine-identical
      quantization otherwise — raise ``scale`` until the output
      rounding can't see it);
    - ``Σ |x|·10^scale`` must fit int64 (~9.2e18). With ANSI mode on,
      overflow raises rather than wrapping — fall back to
      :func:`stable_dsum` for unbounded-range sums.
    """
    return F.sum(scaled_term(col, scale)) / F.lit(float(10 ** scale))


def scaled_term(col: Column, scale: int = 6) -> Column:
    """The per-row long term of :func:`scaled_dsum`, exposed for
    two-level folds (partial long sums re-summed after a join stay
    exact and equal to the flat sum by associativity)."""
    s = float(10 ** scale)
    v = col.cast("double") * F.lit(s)
    return (F.when(col.cast("double") >= 0.0,
                   F.floor(v + F.lit(0.5)))
            .otherwise(-F.floor(-v + F.lit(0.5)))
            .cast("long"))
