"""Let-binding for column expressions.

Catalyst re-evaluates a column EXPRESSION at every reference site.
Codegen's common-subexpression elimination recovers most duplicates
inside one Project, but it explicitly does NOT look inside
higher-order-function lambdas (a lambda body is conditionally /
repeatedly evaluated, so CSE skips it). The consequence: an O(|doc|)
token split referenced per element inside ``F.transform(...)`` —
``element_at(split(text), i)`` per n-gram position, ``slice(split(
text), i, n)`` per shingle window — costs O(|doc|²) per document.
That is invisible at toy sizes and pathological on real documents
(measured 10-25 s single queries at sf0.1 whose linear forms run in
well under a second; at 100 TB it is the difference between a scan
and a non-terminating job).

``let(val, body)`` binds ``val`` once per row as a higher-order
lambda VARIABLE — the transform-over-singleton idiom:
``element_at(transform(array(val), body), 1)`` — so the body can
reference it any number of times (including inside nested lambdas)
at O(1) per reference. Pure expression rewrite: evaluation order and
results are identical, only the duplicate evaluation goes away.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(val: Column, body) -> Column:
    """``body(v)`` with ``v`` bound once to ``val``'s value.

    ``body`` receives the bound lambda variable and returns any
    Column built from it. Works for any input/output types Spark's
    ``transform`` supports (i.e. any — the singleton array is
    ``array<typeof(val)>``)."""
    return F.element_at(F.transform(F.array(val), body), 1)
