"""``where`` predicate compiler — series *metadata* filters.

Reference: cexpr engine (src/cexpr/cexpr.c; evaluator for series
siridb_series_cexpr_cb, src/siri/db/series.c:85-112). Operates on the
derived series catalog (name, type, length, start, end, pool,
shard_duration). `~`/`!~` are contains/not-contains
(include/cexpr/cexpr.h:16-17).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..plans import nodes as N


def compile_where(node, colmap: dict | None = None) -> Column:
    cm = colmap or {}

    def col_for(prop: str) -> Column:
        return cm.get(prop, F.col(prop))

    def cond(c: N.WhereCond) -> Column:
        col = col_for(c.prop)
        op, v = c.op, c.value
        if op == "==":
            return col == F.lit(v)
        if op == "!=":
            return col != F.lit(v)
        if op == ">":
            return col > F.lit(v)
        if op == "<":
            return col < F.lit(v)
        if op == ">=":
            return col >= F.lit(v)
        if op == "<=":
            return col <= F.lit(v)
        if op == "~":
            return col.contains(v)
        if op == "!~":
            return ~col.contains(v)
        raise AssertionError(op)

    def walk(n) -> Column:
        if isinstance(n, N.WhereCond):
            return cond(n)
        if isinstance(n, N.WhereBool):
            left, right = walk(n.left), walk(n.right)
            return (left & right) if n.op == "and" else (left | right)
        raise AssertionError(type(n))

    return walk(node)
