"""Tag lifecycle golden, transliterated from the reference's
itest/test_tags.py (single-server portions): tagging through
regex/set-algebra/where-filtered matches, untag, count follow-through
on drop series, drop tag, and tag rename. Fixture DATA and every
expected message/count are the reference's own (implementation-
independent golden truths)."""

import math

import pytest

from siridb_server_spark import SiriEngine

DATA = {
    "series-001 float": [[1471254705, 1.5], [1471254707, -3.5],
                         [1471254710, -7.3]],
    "series-001 integer": [[1471254705, 5], [1471254708, -3],
                           [1471254710, -7]],
    "series-002 float": [[1471254705, 3.5], [1471254707, -2.5],
                         [1471254710, -8.3]],
    "series-002 integer": [[1471254705, 4], [1471254708, -1],
                           [1471254710, -8]],
    "aggr": [[1447249033, 531], [1447249337, 534]],
    "huge": [[1471254705, 9223372036854775807],
             [1471254706, 9223372036854775806]],
    "equal ts": [[1471254705, 0], [1471254705, 1]],
    "variance": [[1471254705, 2.75], [1471254706, 1.75]],
    "pvariance": [[1471254705, 0.0], [1471254706, 0.25]],
    "filter": [[1471254705, 5], [1471254710, -3]],
    "one": [[1471254710, 1]],
    "log": [[1471254710, "log line one"], [1471254712, "log line two"]],
    "special": [[1471254705, 0.1], [1471254706, math.nan],
                [1471254707, math.inf], [1471254708, -math.inf]],
}


@pytest.fixture(scope="module")
def eng(spark):
    e = SiriEngine(spark, precision="s")
    e.insert(DATA)
    return e


def _tags(e):
    return sorted(e.query("list tags name, series")["tags"])


def test_tag_lifecycle_golden(eng):
    q = eng.query
    assert q("alter series /series.*/ tag `SERIES`") == {
        "success_msg": "Successfully tagged 4 series."}
    assert q("alter series /.*/ tag `ALL`") == {
        "success_msg": "Successfully tagged 13 series."}
    assert q("alter series /empty/ tag `EMPTY`") == {
        "success_msg": "Successfully tagged 0 series."}
    assert q("alter series `ALL` - `SERIES` tag `OTHER`") == {
        "success_msg": "Successfully tagged 9 series."}
    assert q("alter series /series-00(1|2) integer/"
             " tag `SERIES_INT`") == {
        "success_msg": "Successfully tagged 2 series."}
    assert q("alter series 'one' untag `OTHER`") == {
        "success_msg": "Successfully untagged 1 series."}
    assert q("alter series /series-00(1|2) float/"
             " tag `SERIES_FLOAT`") == {
        "success_msg": "Successfully tagged 2 series."}
    assert q("alter series 'huge' untag `OTHER`") == {
        "success_msg": "Successfully untagged 1 series."}
    assert q("alter series 'one', 'huge', 'log' tag `SPECIAL`") == {
        "success_msg": "Successfully tagged 3 series."}
    q("alter series 'variance', 'pvariance' untag `OTHER`")
    q("alter series `ALL` where type == float tag `F`")
    q("alter series `ALL` tag `I`")
    q("alter series `ALL` where type != integer untag `I`")

    assert _tags(eng) == [
        ["ALL", 13], ["EMPTY", 0], ["F", 5], ["I", 7],
        ["OTHER", 5], ["SERIES", 4], ["SERIES_FLOAT", 2],
        ["SERIES_INT", 2], ["SPECIAL", 3]]

    for series in ("huge", "log", "series-001 integer", "one"):
        q(f"drop series '{series}' set ignore_threshold true")

    assert _tags(eng) == [
        ["ALL", 9], ["EMPTY", 0], ["F", 5], ["I", 4],
        ["OTHER", 4], ["SERIES", 3], ["SERIES_FLOAT", 2],
        ["SERIES_INT", 1], ["SPECIAL", 0]]

    for tag in ("ALL", "EMPTY", "OTHER", "SERIES", "SERIES_FLOAT",
                "SERIES_INT", "SPECIAL"):
        q(f"drop tag `{tag}`")

    assert _tags(eng) == [["F", 5], ["I", 4]]

    # alter success reports the POST-update name
    # (listener.c:2047-2048 formats tag->name after set_name)
    assert q("alter tag `F` set name 'Float'") == {
        "success_msg": "Successfully updated tag 'Float'."}
    assert _tags(eng) == [["Float", 5], ["I", 4]]
