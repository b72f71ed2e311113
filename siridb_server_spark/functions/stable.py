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


#: oracle fragment mirroring :func:`int_ppm`; format with num=expr,
#: den=expr (DuckDB ``//`` on HUGEINT is exact integral division)
INT_PPM_SQL = ("CAST(((CAST({num} AS HUGEINT) * 2000000 + {den})"
               " // (CAST({den} AS HUGEINT) * 2)) AS BIGINT)")


def int_ppm(num: Column, den: Column) -> Column:
    """Exact parts-per-million ratio of two non-negative integer
    columns, half-up rounded, as BIGINT — with NO floating-point op
    anywhere: ``(2·num·10⁶ + den) div (2·den)`` in DECIMAL(38,0)
    arithmetic is pure integer math, so Spark and a DuckDB oracle
    (``INT_PPM_SQL``, HUGEINT ``//``) produce byte-identical longs
    under any partitioning, libm, or rounding procedure. This is the
    contract type for hashed ratio columns (CORRECTNESS r4–r6 showed
    any rounded-DOUBLE ratio can flip its 6th decimal across
    engines). The DECIMAL(38,0) intermediates don't overflow until
    num ≈ 5e31; the BIGINT RESULT bounds the usable ratio at
    num/den ≲ 9.2e12 (callers pass shares ≤ 1 and capped weights —
    far inside)."""
    n = num.cast("decimal(38,0)")
    d = den.cast("decimal(38,0)")
    return int_div(n * F.lit(2000000) + d, d * F.lit(2))


def int_div(a: Column, b: Column) -> Column:
    """SQL ``a div b`` — exact integral division, BIGINT result
    (``div`` has no PySpark wrapper; resolve it by registry name)."""
    return F.call_function("div", a, b)


#: per-row scaled-long term of :func:`scaled_term` as an oracle SQL
#: fragment; format with x=expr and s=10**scale
SCALED_TERM_SQL = (
    "CASE WHEN CAST({x} AS DOUBLE) >= 0.0"
    " THEN CAST(floor(CAST({x} AS DOUBLE) * {s}.0 + 0.5) AS BIGINT)"
    " ELSE -CAST(floor(-CAST({x} AS DOUBLE) * {s}.0 + 0.5)"
    " AS BIGINT) END")

#: oracle fragment mirroring :func:`int_mean` (operands must be
#: non-negative; DuckDB ``//`` on BIGINT)
INT_MEAN_SQL = "(({sum} * 2 + {n}) // ({n} * 2))"

#: oracle fragment mirroring :func:`int_mean_signed`
INT_MEAN_SIGNED_SQL = (
    "(CASE WHEN {sum} >= 0 THEN (({sum} * 2 + {n}) // ({n} * 2))"
    " ELSE -((-({sum}) * 2 + {n}) // ({n} * 2)) END)")


def int_mean(sum_col: Column, n_col: Column) -> Column:
    """Exact half-up integer mean ``round(sum/n)`` of NON-NEGATIVE
    longs — ``(2·sum + n) div (2·n)``, pure integer math. Pair with
    :func:`scaled_term`-quantized values: quantize each
    transcendental term to a 10^-scale grid the moment it is
    computed, sum the longs (exact, order-free), and emit this mean
    in the same scaled units — no float bit survives into the hashed
    contract, so a 1-ulp JVM-vs-libm ``ln``/``pow`` gap can flip at
    most one quantized TERM (p ≈ ulp/grid ≈ 1e-9) instead of the
    contract's 6th decimal (the round-4→6 driver hash-red class)."""
    return int_div(sum_col * F.lit(2) + n_col, n_col * F.lit(2))


def int_mean_signed(sum_col: Column, n_col: Column) -> Column:
    """:func:`int_mean` for sums that may be negative — half AWAY
    FROM ZERO (matching :func:`scaled_term`'s own quantization), via
    sign-split so trunc-vs-floor integral division can't bite."""
    pos = int_div(sum_col * F.lit(2) + n_col, n_col * F.lit(2))
    neg = -int_div(-sum_col * F.lit(2) + n_col, n_col * F.lit(2))
    return F.when(sum_col >= 0, pos).otherwise(neg)
