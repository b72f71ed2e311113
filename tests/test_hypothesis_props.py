"""Hypothesis property tests for the pure-Python layers (no Spark —
milliseconds per example): calc arithmetic must match C semantics on
arbitrary operands, and bucket labels must satisfy the right-closed
END-label invariants for every (ts, group, offset)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from siridb_server_spark.errors import ParseError, QueryError
from siridb_server_spark.plans.parser import Parser
from siridb_server_spark.plans.timeexpr import c_div, c_mod


def calc(q: str) -> int:
    return Parser(q, "s", now=1_000_000).parse().stmt.value


@given(a=st.integers(0, 10 ** 12), b=st.integers(0, 10 ** 12))
@settings(max_examples=200, deadline=None)
def test_calc_add_mul_roundtrip(a, b):
    assert calc(f"{a} + {b}") == a + b
    assert calc(f"{a} * 2 + {b}") == a * 2 + b


@given(a=st.integers(-10 ** 9, 10 ** 9),
       b=st.integers(-10 ** 9, 10 ** 9))
@settings(max_examples=200, deadline=None)
def test_c_division_identity(a, b):
    """C identity: a == (a/b)*b + a%b, truncation toward zero."""
    if b == 0:
        import pytest
        with pytest.raises(QueryError):
            c_div(a, b)
        return
    q, r = c_div(a, b), c_mod(a, b)
    assert q * b + r == a
    assert abs(r) < abs(b)
    # truncation toward zero: quotient magnitude never rounds away
    assert abs(q) == abs(a) // abs(b)


@given(ts=st.integers(0, 2 ** 62), g=st.integers(1, 2 ** 40),
       off_frac=st.floats(0, 1))
@settings(max_examples=300, deadline=None)
def test_bucket_label_invariants(ts, g, off_frac):
    """Right-closed END-labeled buckets (aggregate.c:41-43): the
    label is the smallest multiple of g at-or-after ts (+offset)."""
    off = int(off_frac * (g - 1))
    label = (ts + g - 1) // g * g + off
    assert label >= ts
    assert label - ts < g + off
    assert (label - off) % g == 0
    # a point exactly on an unshifted boundary keeps its own label
    if off == 0 and ts % g == 0:
        assert label == ts


@given(s=st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)),
    max_size=40))
@settings(max_examples=300, deadline=None)
def test_arbitrary_input_never_crashes_parser(s):
    """Any unicode input either parses or raises the controlled
    error types — never an unhandled exception."""
    try:
        Parser(s, "s", now=1_000_000).parse()
    except (ParseError, QueryError):
        pass
