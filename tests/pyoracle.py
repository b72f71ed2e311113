"""Independent pure-Python oracle for aggregate semantics — a
from-scratch reimplementation of the reference's documented behavior
(sweep bucketing aggregate.c:1188-1220, GROUP_TS aggregate.c:41-43,
type rules, n-edge cases), used to cross-check the Spark engine on
randomized data (mirrors itest/testing/helpers.py gen_points)."""

from __future__ import annotations

import statistics


def sweep_buckets(pts, g, off=0):
    """pts: ts-sorted [(ts, val)]. Returns [(label, [vals])]."""
    out = []
    cur = None
    for ts, v in pts:
        if cur is None or ts > cur:
            cur = (ts + g - 1) // g * g + off
            out.append((cur, []))
        out[-1][1].append(v)
    return out


def agg(fn, vals, is_int):
    if fn == "count":
        return len(vals)
    if fn == "sum":
        return sum(vals)
    if fn == "mean":
        return sum(vals) / len(vals)
    if fn == "median":
        return float(statistics.median(vals))
    if fn == "median_low":
        return statistics.median_low(vals)
    if fn == "median_high":
        return statistics.median_high(vals)
    if fn == "min":
        return min(vals)
    if fn == "max":
        return max(vals)
    if fn == "variance":
        return statistics.variance(vals) if len(vals) > 1 else 0.0
    if fn == "pvariance":
        return statistics.pvariance(vals)
    if fn == "stddev":
        return (statistics.variance(vals) ** 0.5
                if len(vals) > 1 else 0.0)
    if fn == "first":
        return vals[0]
    if fn == "last":
        return vals[-1]
    if fn == "difference":
        return vals[-1] - vals[0]
    raise AssertionError(fn)


def bucketed(fn, pts, g, off=0, is_int=True):
    return [[label, agg(fn, vals, is_int)]
            for label, vals in sweep_buckets(pts, g, off)]


def to_one(fn, pts, is_int=True):
    vals = [v for _, v in pts]
    label = pts[0][0] if fn == "first" else pts[-1][0]
    return [[label, agg(fn, vals, is_int)]]


def difference_points(pts):
    return [[pts[i][0], pts[i][1] - pts[i - 1][1]]
            for i in range(1, len(pts))]


def derivative_points(pts, timespan=1.0):
    return [[pts[i][0],
             (pts[i][1] - pts[i - 1][1])
             / (pts[i][0] - pts[i - 1][0]) * timespan]
            for i in range(1, len(pts))]


def interval_points(pts):
    return [[pts[i][0], pts[i][0] - pts[i - 1][0]]
            for i in range(1, len(pts))]
