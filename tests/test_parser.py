"""Parser/time-expression unit tests (no Spark needed)."""

import pytest

from siridb_server_spark.errors import ParseError, QueryError
from siridb_server_spark.plans import nodes as N
from siridb_server_spark.plans.parser import Parser
from siridb_server_spark.plans.timeexpr import c_div, c_mod


def parse(q, precision="s", now=1_000_000):
    return Parser(q, precision, now=now).parse()


def test_calc_precedence():
    assert parse("2 + 3 * 4").stmt.value == 14
    assert parse("(2 + 3) * 4").stmt.value == 20
    assert parse("10 / 3").stmt.value == 3
    assert parse("-10 / 3").stmt.value == -3  # C truncation toward zero
    assert parse("-7 % 3").stmt.value == -1


def test_time_units():
    assert parse("1h + 30m").stmt.value == 5400
    assert parse("2w", precision="ms").stmt.value == 2 * 604800 * 1000
    assert parse("now - 100").stmt.value == 1_000_000 - 100
    assert parse("1s", precision="ns").stmt.value == 10 ** 9


def test_iso_dates():
    # 2024-01-01T00:00:00Z
    assert parse("'2024-01-01'").stmt.value == 1704067200
    assert parse("'2024'").stmt.value == 1704067200 - 0  # same instant
    assert parse("'2024-01-01 00:00:10'").stmt.value == 1704067210
    assert parse("'2024-01-01'", precision="ms").stmt.value == \
        1704067200000


def test_select_structure():
    q = parse("select sum(1h) => filter(>5) from /a.*/ after now - 1d "
              "merge as 'm' using mean(2h)")
    s = q.stmt
    assert isinstance(s, N.SelectStmt)
    assert len(s.pipelines) == 1
    funcs = s.pipelines[0].funcs
    assert isinstance(funcs[0], N.AggFunc)
    assert funcs[0].name == "sum" and funcs[0].group_by == 3600
    assert isinstance(funcs[1], N.FilterFunc)
    assert s.timerange == ("after", 1_000_000 - 86400)
    assert s.merge.name == "m"
    assert s.merge.using[0].name == "mean"


def test_offset_binding():
    q = parse("select count(10) => offset(3) from 'a'")
    f = q.stmt.pipelines[0].funcs[0]
    assert f.offset == 3
    with pytest.raises(QueryError,
                       match="Offset must be used after an aggregation"):
        parse("select offset(3) from 'a'")
    with pytest.raises(QueryError,
                       match="Offset must be used after an aggregation"):
        parse("select difference() => offset(3) from 'a'")


def test_offset_mod_group():
    q = parse("select count(10) => offset(23) from 'a'")
    assert q.stmt.pipelines[0].funcs[0].offset == 3


def test_string_concat_quotes():
    q = parse('select * from "ab""cd"')
    assert q.stmt.match.name == "abcd"


def test_regex_ci():
    q = parse("select * from /AbC.*/i")
    assert q.stmt.match.case_insensitive is True


def test_filter_default_eq():
    f = parse("select filter(5) from 'a'").stmt.pipelines[0].funcs[0]
    assert f.op == "==" and f.value_tp == "int" and f.value == 5
    f = parse("select filter(5.5) from 'a'").stmt.pipelines[0].funcs[0]
    assert f.value_tp == "double"
    f = parse("select filter(>=-inf) from 'a'").stmt.pipelines[0].funcs[0]
    assert f.value_tp == "ninf"


def test_timeit_prefix():
    assert parse("timeit count series").timeit is True


def test_comment():
    q = parse("count series  # trailing comment")
    assert isinstance(q.stmt, N.CountStmt)


def test_grant_revoke():
    g = parse('grant read, write to user "u"').stmt
    assert g.access == ["read", "write"] and g.user == "u"
    r = parse('revoke full from user "u"').stmt
    assert r.access == ["full"]


def test_parse_error_position():
    with pytest.raises(ParseError, match="Query error at position"):
        parse("select sum(1h) from")


def test_c_division_semantics():
    assert c_div(7, 2) == 3
    assert c_div(-7, 2) == -3
    assert c_mod(-7, 3) == -1
    assert c_mod(7, -3) == 1
    with pytest.raises(QueryError):
        c_div(1, 0)


def test_between_values():
    s = parse("select * from 'a' between 10 and 20").stmt
    assert s.timerange == ("between", 10, 20)


def test_head_tail():
    assert parse("select * from 'a' head 5").stmt.timerange == ("head", 5)
    assert parse("select * from 'a' tail 7").stmt.timerange == ("tail", 7)


def test_multi_pipeline_presuf():
    s = parse('select min(1h) prefix "a-", max(1h) suffix "-b" '
              "from 'x'").stmt
    assert s.pipelines[0].prefix == "a-"
    assert s.pipelines[1].suffix == "-b"


def test_derivative_args():
    f = parse("select derivative(1, 1h) from 'a'").stmt \
        .pipelines[0].funcs[0]
    assert f.group_by == 3600
    assert f.timespan == pytest.approx(1 / 3600)
    f = parse("select derivative() from 'a'").stmt.pipelines[0].funcs[0]
    assert f.group_by is None and f.timespan == 1.0


def test_limit_parse():
    f = parse("select limit(5, median_low) from 'a'").stmt \
        .pipelines[0].funcs[0]
    assert f.limit == 5 and f.agg == "median_low"


def test_limit_rejects_timeval_interval():
    """f_limit's Choice admits only the 13 aggregates — timeval()/
    interval() are a parse error, not a crash (ref
    grammar/grammar.py:555-574)."""
    from siridb_server_spark.plans.parser import parse
    for fn in ("timeval", "interval"):
        with pytest.raises((ParseError, QueryError)):
            parse(f"select limit(2, {fn}) from 'a'")


def test_select_tail_merged_expectations():
    """Trailing garbage after a select lists every still-open
    optional branch in grammar order (select_stmt,
    ref grammar/grammar.py:818-831)."""
    cases = {
        "select sum(5) from 'a' x":
            ", |, union, -, difference, &, intersection, ^,"
            " symmetric_difference,"
            " where, after, between, before, tail, head, merge"
            " or end_of_statement",
        "select sum(5) from 'a' where length > 0 x":
            "+ - * % /, and, or, after, between, before, tail, head,"
            " merge or end_of_statement",
        "select sum(5) from 'a' head 1 x":
            "+ - * % /, merge or end_of_statement",
        "select sum(5) from 'a' after 1477000000 x":
            "+ - * % /, merge or end_of_statement",
        "select sum(5) from 'a' merge as 'm' x":
            "using or end_of_statement",
        "select sum(5) from 'a' merge as 'm' using mean(5) x":
            "=> or end_of_statement",
    }
    for q, exp in cases.items():
        with pytest.raises((ParseError, QueryError)) as ei:
            parse(q)
        assert str(ei.value).endswith("Expecting " + exp), (q, str(ei.value))


def test_list_count_tail_merged_expectations():
    """Trailing garbage after list/count merges every still-open
    optional branch in grammar order, like the select tail."""
    cases = {
        "list series xx":
            "name, type, length, start, end, shard_duration, pool, "
            "*, all, single_quote_str, double_quote_str, (, where, "
            "limit or end_of_statement",
        "list series name xx":
            "*, all, single_quote_str, double_quote_str, (, where, "
            "limit or end_of_statement",
        "list series 'a' xx":
            ", |, union, -, difference, &, intersection, ^,"
            " symmetric_difference,"
            " where, limit or end_of_statement",
        "list series where length > 0 xx":
            "+ - * % /, and, or, limit or end_of_statement",
        "list series limit 5 xx":
            "+ - * % / or end_of_statement",
        "list users name xx":
            "where, limit or end_of_statement",
        "list users limit 2 xx":
            "+ - * % / or end_of_statement",
        "count series xx":
            "length, *, all, single_quote_str, double_quote_str, (, "
            "where or end_of_statement",
        "count series 'a' xx":
            ", |, union, -, difference, &, intersection, ^,"
            " symmetric_difference, where or end_of_statement",
        "count series length 'a' xx":
            ", |, union, -, difference, &, intersection, ^,"
            " symmetric_difference, where or end_of_statement",
        "count shards xx":
            "size, where or end_of_statement",
        "count shards size xx":
            "where or end_of_statement",
        "count users xx":
            "where or end_of_statement",
        "count users where name == 'iris' xx":
            "and, or or end_of_statement",
    }
    for q, exp in cases.items():
        with pytest.raises((ParseError, QueryError)) as ei:
            parse(q)
        assert str(ei.value).endswith("Expecting " + exp), (q, str(ei.value))


def test_head_tail_bounds():
    """ref listener.c exit_head_expr/exit_tail_expr: N in
    [1, MAX_HEADTAIL], message parity."""
    for q, msg in [
        ("select * from 'a' head 0",
         "Head must be a value between 1 and 1000000, got 0"),
        ("select * from 'a' tail 1000001",
         "Tail must be a value between 1 and 1000000, got 1000001"),
    ]:
        with pytest.raises(QueryError) as ei:
            parse(q)
        assert str(ei.value) == msg
    # boundary values parse fine
    parse("select * from 'a' head 1")
    parse("select * from 'a' tail 1000000")


def test_show_tail_expectations():
    """show_stmt = k_show List(Choice(fields)) — trailing junk lists
    the field set (grammar.py:833-871); after a parsed field the List
    can only continue with ',' or end."""
    with pytest.raises((ParseError, QueryError)) as ei:
        parse("show pool xx")
    assert str(ei.value).endswith("Expecting , or end_of_statement")
    with pytest.raises((ParseError, QueryError)) as ei:
        parse("show xx")
    msg = str(ei.value)
    assert "active_handles" in msg and msg.endswith(
        "who_am_i or end_of_statement")
    with pytest.raises((ParseError, QueryError)) as ei:
        parse("show pool,")
    assert "active_handles" in str(ei.value)
    assert str(ei.value).endswith("or who_am_i")
    # valid forms still parse
    assert parse("show").stmt.fields == []
    assert parse("show pool, uptime").stmt.fields == ["pool", "uptime"]


def test_time_expr_mid_token_expectations():
    """Expectation lists at positions INSIDE a time/int expression:
    the expression Prio's FIRST set at a factor position (token
    names per query.c:500-516), the arithmetic-Tokens continuation
    after a complete sub-expression, and the merged and-branch in
    'between'."""
    cases = {
        "select mean(1h) from 'a' after ":
            "date/time_string, now, single_quote_str, "
            "double_quote_str, integer or (",
        "select mean(1h) from 'a' after 3 + ":
            "date/time_string, now, single_quote_str, "
            "double_quote_str, integer or (",
        "select mean(1h) from 'a' after (3 x":
            "+ - * % / or ')'",
        "select sum(5) from 'a' between 3 4":
            "+ - * % / or and",
        "list series limit ":
            "integer or (",
        "5 x":
            "+ - * % / or end_of_statement",
    }
    for q, exp in cases.items():
        with pytest.raises((ParseError, QueryError)) as ei:
            parse(q)
        assert str(ei.value).endswith("Expecting " + exp), \
            (q, str(ei.value))
