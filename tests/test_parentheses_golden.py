"""Set-algebra goldens transliterated from
/root/reference/itest/test_parentheses.py (ns precision — validates
int64-exact timestamps end to end)."""

import pytest

from siridb_server_spark import QueryError, SiriEngine

DATA = {
    'series-001': [
        [1471254705000000005, 1.5],
        [1471254705000000007, -3.5],
        [1471254705000000010, -7.3]],
    'series-002': [
        [1471254705000000005, 5],
        [1471254705000000008, -3],
        [1471254705000000010, -7]],
    'series-003': [
        [1471254705000000005, 10.5],
        [1471254705000000007, -8.5],
        [1471254705000000010, -2.7]],
    'series-004': [
        [1471254705000000005, 6],
        [1471254705000000008, -8],
        [1471254705000000010, -9]],
    'linux-001': [
        [1471254705000000005, 7.3],
        [1471254705000000007, -6.4],
        [1471254705000000010, -9.8]],
    'linux-002': [
        [1471254705000000005, 2],
        [1471254705000000008, -7],
        [1471254705000000010, -9]],
    'linux-003': [
        [1471254705000000005, 2.9],
        [1471254705000000007, -5.7],
        [1471254705000000010, -0.3]],
    'linux-004': [
        [1471254705000000005, 3],
        [1471254705000000008, -9],
        [1471254705000000010, -8]],
    'windows-001': [
        [1471254705000000005, 9.3],
        [1471254705000000007, -3.3],
        [1471254705000000010, -1.6]],
    'windows-002': [
        [1471254705000000005, 4],
        [1471254705000000008, -8],
        [1471254705000000010, -2]],
    'windows-003': [
        [1471254705000000005, 4.3],
        [1471254705000000007, -7.9],
        [1471254705000000010, -1.2]],
    'windows-004': [
        [1471254705000000005, 2],
        [1471254705000000008, -5],
        [1471254705000000010, -7]],
}


@pytest.fixture(scope="module")
def eng(spark):
    e = SiriEngine(spark, precision="ns")
    assert e.insert(DATA) == {
        "success_msg": "Successfully inserted 36 point(s)."}
    return e


def names(result):
    return sorted(r[0] for r in result["series"])


def test_all_minus_union(eng):
    r = eng.query(
        'list series all - ("series-001" | "series-002" | /windows.*/)')
    assert r["columns"] == ["name"]
    assert names(r) == sorted([
        'series-003', 'series-004', 'linux-001', 'linux-002',
        'linux-003', 'linux-004'])


def test_nested_intersection(eng):
    r = eng.query(
        'list series all - ('
        '"series-001" | "series-002" | (/windows.*/ & /.*001/))')
    assert names(r) == sorted([
        'series-003', 'series-004', 'linux-001', 'linux-002',
        'linux-003', 'linux-004', 'windows-002', 'windows-003',
        'windows-004'])


def test_nested_difference(eng):
    r = eng.query(
        'list series all - ('
        '"series-001" | "series-002" | (/windows.*/ - /.*001/))')
    assert names(r) == sorted([
        'series-003', 'series-004', 'linux-001', 'linux-002',
        'linux-003', 'linux-004', 'windows-001'])


def test_group_minus_regex(eng):
    r = eng.query(
        'list series ("series-001" | "series-002" | /windows.*/)'
        ' - /.*003/')
    assert names(r) == sorted([
        'series-001', 'series-002', 'windows-001', 'windows-002',
        'windows-004'])


def test_symmetric_difference(eng):
    r = eng.query('list series all - (/series.*/ ^ /.*001/)')
    assert names(r) == sorted([
        'series-001', 'linux-002', 'linux-003', 'linux-004',
        'windows-002', 'windows-003', 'windows-004'])


def test_empty_result(eng):
    r = eng.query('list series (/.*001/ & /linux.*/) - /.*001/')
    assert r == {'columns': ['name'], 'series': []}


def test_intersection_of_unions(eng):
    r = eng.query('list series /.*001/ & (/series.*/ | /linux.*/)')
    assert names(r) == sorted(['series-001', 'linux-001'])


def test_deep_parens_ok(eng):
    r = eng.query('list series /.*001/ & ((((/series.*/ | /linux.*/))))')
    assert names(r) == sorted(['series-001', 'linux-001'])


def test_union_intersect_union(eng):
    r = eng.query(
        'list series (/.*001/ | /.*002/) & (/series.*/ | /linux.*/)')
    assert names(r) == sorted([
        'series-001', 'series-002', 'linux-001', 'linux-002'])


def test_recursion_limit(eng):
    with pytest.raises(
            QueryError,
            match='Memory allocation error or maximum recursion depth'):
        eng.query('list series /.*/ - {}/linux.*/{}'.format(
            '(' * 500, ')' * 500))


def test_list_limit_guard(eng):
    eng.query('alter database set list_limit 5000')
    try:
        with pytest.raises(
                QueryError,
                match='Limit must be a value between 1 and 5000 '
                      'but received: 6000'):
            eng.query('list series limit 6000')
    finally:
        eng.query('alter database set list_limit 10000')


def test_ns_select_roundtrip(eng):
    # int64-exact ns timestamps survive select end-to-end
    got = eng.query('select max() from "series-002"')
    assert got == {'series-002': [[1471254705000000010, 5]]}


def test_expecting_token_list_golden(eng):
    """Reference golden (itest/test_parentheses.py:274-279): the
    expectation list at a missing series atom."""
    import re

    import pytest

    from siridb_server_spark.errors import ParseError
    with pytest.raises(ParseError, match=re.escape(
            "Query error at position 29. Expecting *, all, "
            "single_quote_str, double_quote_str or (")):
        eng.query("list series /.*/ - " + "(" * 10 + ")" * 10)
