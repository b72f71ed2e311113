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
