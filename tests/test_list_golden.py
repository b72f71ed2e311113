"""list-series set-algebra sweep transliterated from
/root/reference/itest/test_list.py:47-97 — every {-,|,&,^} pair and
triple over regex atoms must run and return exactly the set a
pure-Python evaluator predicts."""

import re

import pytest

from siridb_server_spark import SiriEngine

NAMES = ["aaa", "abc", "axe", "bar", "baz", "bmw", "cat", "cow",
         "mercedes-benz", "opel astra"]


@pytest.fixture(scope="module")
def eng(spark):
    e = SiriEngine(spark, precision="s")
    e.insert({n: [[1471254705, 1.0]] for n in NAMES})
    return e


def py_eval(expr_parts):
    """Left-to-right set evaluation over (op, regex) chains."""
    acc = {n for n in NAMES if re.match(expr_parts[0], n)}
    i = 1
    while i < len(expr_parts):
        op, rx = expr_parts[i], expr_parts[i + 1]
        s = {n for n in NAMES if re.match(rx, n)}
        if op == "-":
            acc = acc - s
        elif op == "|":
            acc = acc | s
        elif op == "&":
            acc = acc & s
        elif op == "^":
            acc = acc ^ s
        i += 2
    return acc


def q_names(eng, q):
    res = eng.query(q)
    return {row[0] for row in res["series"]}


def test_list_set_algebra_sweep(eng):
    ops = ["-", "|", "&", "^"]
    atoms = [("/.*/", r".*"), ("/a.*/", r"a.*"), ("/b.*/", r"b.*")]
    # pairs: /.*/ OP X for every op and atom (itest lines 47-56)
    for op in ops:
        for qa, ra in atoms:
            q = f"list series /.*/ {op} {qa}"
            assert q_names(eng, q) == py_eval([r".*", op, ra]), q
    # triples: /.*/ OP1 /a.*/ OP2 Y (itest lines 58-97)
    for op1 in ops:
        for op2 in ops:
            for qb, rb in (("/b.*/", r"b.*"), ("/.*/", r".*")):
                q = f"list series /.*/ {op1} /a.*/ {op2} {qb}"
                expect = py_eval([r".*", op1, r"a.*", op2, rb])
                assert q_names(eng, q) == expect, q


def test_list_limit_alter_guard(eng):
    """itest/test_list.py:99-105: lowering list_limit re-bounds the
    limit guard with the reference's message."""
    eng.query("alter database set list_limit 5000")
    with pytest.raises(Exception, match=(
            "Limit must be a value between 1 and 5000 "
            "but received: 6000")):
        eng.query("list series limit 6000")
    eng.query("alter database set list_limit 10000")
