"""Grammar-driven fuzz (the reference's strategy:
itest/querygenerator/ walks the pyleri grammar emitting valid
queries, itest/test_grammar.py:62-70 asserts they run). Here a
seeded generator walks OUR statement space; every generated query
must either succeed or raise a controlled QueryError/ParseError —
never a Py4J/Spark exception or Python crash."""

import random

import pytest

from siridb_server_spark import SiriEngine
from siridb_server_spark.errors import ParseError, QueryError

AGGS = ["count", "sum", "mean", "median", "median_low", "median_high",
        "min", "max", "variance", "pvariance", "stddev", "first",
        "last", "difference", "derivative"]
TRANSFORMS = ["difference()", "derivative()", "interval()",
              "timeval()", "filter(> 0)", "filter(== 3)",
              "filter(!= 1.5)", "limit(5, mean)"]
UNITS = ["", "s", "m", "h", "d", "w"]
SETOPS = [",", "|", "&", "-", "^"]


def gen_match(rng):
    atoms = ["'s-1'", '"s-2"', "/s-.*/", "/S-.*/i", "*", "all",
             "`grp`", "`tg`"]
    n = rng.randint(1, 4)
    out = rng.choice(atoms)
    for _ in range(n - 1):
        out += f" {rng.choice(SETOPS)} {rng.choice(atoms)}"
    if rng.random() < 0.3:
        out = f"({out})"
    return out


def gen_bucket(rng):
    if rng.random() < 0.4:
        return ""
    val = rng.randint(1, 500)
    return f"{val}{rng.choice(UNITS)}"


def gen_pipeline(rng):
    f = rng.choice(AGGS)
    head = f"{f}({gen_bucket(rng)})"
    parts = [head]
    for _ in range(rng.randint(0, 2)):
        parts.append(rng.choice(TRANSFORMS))
    return " => ".join(parts)


def gen_select(rng):
    q = f"select {gen_pipeline(rng)}"
    if rng.random() < 0.2:
        q += f" prefix 'p{rng.randint(0, 9)}-'"
    q += f" from {gen_match(rng)}"
    r = rng.random()
    if r < 0.2:
        q += f" after {rng.randint(1, 2_000_000)}"
    elif r < 0.4:
        a = rng.randint(1, 1_000_000)
        q += f" between {a} and {a + rng.randint(1, 1_000_000)}"
    elif r < 0.5:
        q += f" before now - {rng.randint(1, 100)}d"
    if rng.random() < 0.25:
        q += f" where length > {rng.randint(0, 5)}"
    if rng.random() < 0.2:
        q += f" merge as 'm' using {rng.choice(AGGS)}(1h)"
    if rng.random() < 0.15:
        q += f" head {rng.randint(1, 10)}"
    return q


def gen_meta(rng):
    ent = rng.choice(["series", "groups", "tags", "users", "pools",
                      "shards", "servers"])
    stmt = rng.choice(["list", "count"])
    q = f"{stmt} {ent}"
    if ent == "series" and rng.random() < 0.5:
        q += f" {gen_match(rng)}"
    if rng.random() < 0.3 and ent == "series":
        q += f" where length >= {rng.randint(0, 3)}"
    if stmt == "list" and rng.random() < 0.3:
        q += f" limit {rng.randint(1, 50)}"
    return q


def gen_calc(rng):
    ops = ["+", "-", "*", "%"]
    q = str(rng.randint(0, 10_000))
    for _ in range(rng.randint(1, 3)):
        q += f" {rng.choice(ops)} {rng.randint(1, 500)}"
    return q


@pytest.fixture(scope="module")
def eng(spark):
    e = SiriEngine(spark, precision="s")
    e.insert({
        "s-1": [[i * 37, float(i)] for i in range(1, 30)],
        "s-2": [[i * 53, i * 2] for i in range(1, 20)],
        "S-3": [[100, "log line"], [200, "another"]],
    })
    e.query("create group `grp` for /s-.*/")
    e.query("alter series 's-1' tag `tg`")
    return e


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_select(eng, seed):
    rng = random.Random(seed)
    for i in range(25):
        q = gen_select(rng)
        try:
            res = eng.query(q)
            assert isinstance(res, dict), q
        except (QueryError, ParseError) as e:
            # controlled failures only, with a real message
            assert str(e), q


@pytest.mark.parametrize("seed", range(3))
def test_fuzz_meta_calc(eng, seed):
    rng = random.Random(1000 + seed)
    for i in range(30):
        q = gen_meta(rng) if i % 2 else gen_calc(rng)
        try:
            res = eng.query(q)
            assert isinstance(res, dict), q
        except (QueryError, ParseError) as e:
            assert str(e), q


def test_error_format_and_expectation_lists():
    """Parse errors follow the reference's shape — 'Query error at
    position N. Expecting A, B or C' (QUERY_send_invalid_error,
    query.c:459-559) — with grammar-ordered expectation lists at the
    statement start, aggregate position, f_limit choice, and where
    properties."""
    from siridb_server_spark.plans.parser import parse

    cases = {
        "foobar": ("position 0", "timeit, select, list, count, alter,"
                   " create, drop, grant, revoke, show, integer,"
                   " date/time_string, now, (, help or"
                   " end_of_statement"),
        "select bogus(1h) from /.*/": (
            "position 7", "*, all, offset, limit, mean, sum, median,"
            " median_low, median_high, min, max, count, variance,"
            " pvariance, stddev, first, last, timeval, interval,"
            " difference, derivative, filter or points"),
        "select limit(2, timeval) from 'a'": (
            "position 16", "mean, median, median_high, median_low,"
            " sum, min, max, count, variance, pvariance, stddev,"
            " first or last"),
        "list series where bogus > 1": (
            "position 18", "length, pool, name, start, end,"
            " shard_duration, type or ("),
        # set-operator continuations after a COMPLETE series match
        # (series_setopr, grammar.py:433-463: Tokens rendered via
        # their spaced string before the keyword alternative, like
        # the reference renders '+ - * % /')
        "select * from 'a' xyz": (
            "position 18", ", |, union, -, difference, &,"
            " intersection, ^, symmetric_difference, where, after,"
            " between, before, tail, head, merge or"
            " end_of_statement"),
        "select * from ('a' xyz": (
            "position 19", ", |, union, -, difference, &,"
            " intersection, ^, symmetric_difference or )"),
        "list series 'a' xyz": (
            "position 16", ", |, union, -, difference, &,"
            " intersection, ^, symmetric_difference, where, limit"
            " or end_of_statement"),
        # '=>' / ',' continuations after a complete aggregate list
        # (aggregate_functions List separator, then the still-open
        # prefix/suffix optionals, then select_aggregates' ',' and
        # k_from — grammar.py:577-607)
        "select mean(1h) xyz from 'a'": (
            "position 16", "=>, prefix, suffix, , or from"),
        "select mean(1h) prefix 'p' xyz from 'a'": (
            "position 27", "suffix, , or from"),
        "select mean(1h) suffix 's' xyz from 'a'": (
            "position 27", ", or from"),
        "select * from 'a' merge as 'm' using mean(1h) xyz": (
            "position 46", "=> or end_of_statement"),
    }
    for q, (pos, expecting) in cases.items():
        with pytest.raises((ParseError, QueryError)) as e:
            parse(q)
        msg = str(e.value)
        assert msg.startswith("Query error at "), (q, msg)
        assert pos in msg and f"Expecting {expecting}" in msg, (q, msg)


def test_fuzz_garbage_errors_keep_reference_shape():
    """Every parse error raised on corrupted input keeps the
    reference's error shape — never a traceback or bare assert."""
    import re as _re

    from siridb_server_spark.plans.parser import parse

    rng = random.Random(1234)
    shape = _re.compile(
        r"^Query error at position \d+\. Expecting .+")
    seeds = [
        "select mean(1h) from /.*/", "list series where length > 2",
        "count shards", "alter database set drop_threshold 0.5",
        "create group `g` for /x.*/", "grant full to user 'iris'",
    ]
    checked = 0
    for _ in range(400):
        q = rng.choice(seeds)
        # corrupt: truncate, splice garbage, or shuffle a word
        r = rng.random()
        if r < 0.4:
            q = q[:rng.randint(0, len(q) - 1)]
        elif r < 0.7:
            i = rng.randint(0, len(q))
            q = q[:i] + rng.choice(["$", "~~", "qq ", ")("]) + q[i:]
        else:
            words = q.split()
            rng.shuffle(words)
            q = " ".join(words)
        try:
            parse(q)
        except ParseError as e:
            assert shape.match(str(e)), (q, str(e))
            checked += 1
        except QueryError:
            pass  # semantic errors have their own reference texts
    assert checked > 50  # the corruptions really exercised the shape


def test_fuzz_statement_tails_merge_expectations():
    """Fuzzed trailing junk after ANY complete statement yields a
    merged expectation list that ends with end_of_statement when the
    statement could have ended there — covering the select, list,
    count, and show tails closed in round 4."""
    from siridb_server_spark.plans.parser import parse

    rng = random.Random(99)
    complete = [
        "select sum(1h) from 'a'",
        "select mean(1d) from /.*/ where length > 0",
        "list series", "list series name, length",
        "list users", "list shards sid",
        "count series", "count series length 'a'",
        "count shards size", "count groups",
        "show", "show pool", "show pool, uptime",
    ]
    junk = ["zz", "$", "frobnicate", "123abc", "~"]
    for _ in range(200):
        q = f"{rng.choice(complete)} {rng.choice(junk)}"
        with pytest.raises((ParseError, QueryError)) as e:
            parse(q)
        msg = str(e.value)
        assert "Expecting" in msg, (q, msg)
        assert msg.endswith("end_of_statement") or \
            "end_of_statement" in msg or msg.endswith("who_am_i"), \
            (q, msg)
