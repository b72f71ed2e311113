"""Insert validation goldens (semantics from
/root/reference/itest/test_insert.py and src/siri/db/insert.c:93-126)."""

import pytest

from siridb_server_spark import InsertError, SiriEngine


@pytest.fixture()
def eng(spark):
    return SiriEngine(spark, precision="s")


def test_both_insert_shapes(eng):
    assert eng.insert({"m": [[1, 1], [2, 2]]})["success_msg"] == \
        "Successfully inserted 2 point(s)."
    assert eng.insert([{"name": "m2", "points": [[1, 5.5]]}]) == {
        "success_msg": "Successfully inserted 1 point(s)."}


@pytest.mark.parametrize("payload", [
    [{}],                                # missing name/points
    {"None": [[1, None]]},               # null value
    {"no points": []},                   # empty points
    {"no points": [[]]},                 # empty point
    {"invalid ts": [[0.5, 6]]},          # float timestamp
    {"invalid ts": [[-1, 6]]},           # negative timestamp
    {"": [[1, 0]]},                      # empty series name
    {"b": [[1, True]]},                  # bool value unsupported
])
def test_invalid_payloads(eng, payload):
    with pytest.raises(InsertError):
        eng.insert(payload)


def test_list_shape_empty_name(eng):
    with pytest.raises(InsertError):
        eng.insert([{"name": "", "points": [[1, 0]]}])


def test_wrong_type_second_insert(eng):
    eng.insert({"t": [[1, 1]]})
    with pytest.raises(InsertError, match="Wrong type"):
        eng.insert({"t": [[2, "str"]]})
    with pytest.raises(InsertError, match="Wrong type"):
        eng.insert({"t": [[2, 2.5]]})
    # same type appends fine, out of order, duplicates kept
    eng.insert({"t": [[1, 7], [0, 5]]})
    assert eng.query("select * from 't'") == {
        "t": [[0, 5], [1, 1], [1, 7]]}


def test_series_name_too_long(eng):
    with pytest.raises(InsertError):
        eng.insert({"x" * 65535: [[1, 1]]})
