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
