"""User-management golden, transliterated from the reference's
itest/test_user.py (single-server portions): validation messages,
grant/revoke access strings, rename rules, who_am_i, and ACL denial
messages — every expected string is the reference's own."""

import pytest

from siridb_server_spark import SiriEngine
from siridb_server_spark.errors import InsertError, QueryError


@pytest.fixture(scope="module")
def eng(spark):
    return SiriEngine(spark, precision="s")


def _err(eng, q, match):
    with pytest.raises(QueryError) as ei:
        eng.query(q)
    assert match in str(ei.value), str(ei.value)


def test_user_lifecycle_golden(eng):
    q = eng.query
    assert q("list users ")["users"] == [["iris", "full"]]

    with pytest.raises(QueryError):
        q('create user "sasientje" ')
    _err(eng, 'create user "s" set password "123456" ',
         "User name should be at least 2 characters.")
    _err(eng, 'create user "  " set password "123456" ',
         "User name contains illegal characters")
    _err(eng, 'create user "aa" set password "123" ',
         "Password should be at least 4 characters.")

    assert q('create user "sasientje" set password "blabla" ') == {
        "success_msg": "Successfully created user 'sasientje'."}
    assert q("list users where access < modify ")["users"] == [
        ["sasientje", "no access"]]
    assert q('grant modify to user "sasientje" ') == {
        "success_msg":
        "Successfully granted permissions to user 'sasientje'."}
    assert q("list users where access < full ")["users"] == [
        ["sasientje", "modify"]]
    assert q('revoke write from user "sasientje" ') == {
        "success_msg":
        "Successfully revoked permissions from user 'sasientje'."}
    q('grant show, count to user "sasientje"')
    assert q("list users where access < modify ")["users"] == [
        ["sasientje", "alter, count, drop and show"]]

    q('create user "pee" set password "hihihaha" ')
    assert q('list users where name ~ "p"')["users"] == [
        ["pee", "no access"]]

    _err(eng, 'alter user "sasientje" set password "dag" ',
         "Password should be at least 4 characters.")
    q('alter user "sasientje" set password "dagdag"')

    # authenticated session parity: who_am_i + ACL denials carry the
    # reference's exact messages
    prev = eng.session_user
    eng.session_user = "sasientje"
    try:
        who = q("show who_am_i ")
        assert who["data"][0]["value"] == "sasientje"
        with pytest.raises((InsertError, QueryError)) as ei:
            eng.insert({"no access test": [[1, 1.0]]})
        assert str(ei.value) == ("Access denied. User 'sasientje'"
                                 " has no 'insert' privileges.")
    finally:
        eng.session_user = prev

    assert q('drop user "sasientje" ') == {
        "success_msg": "Successfully dropped user 'sasientje'."}
    assert q("count users")["users"] == 2
    assert q('count users where name == "pee"')["users"] == 1

    _err(eng, 'alter user "pee" set name "p" ',
         "User name should be at least 2 characters.")
    _err(eng, 'alter user "pee" set name " p " ',
         "User name contains illegal characters")
    _err(eng, 'alter user "pee" set name "iris" ',
         "User 'iris' already exists.")
    _err(eng, 'alter user "Pee" set name "PPP" ',
         "Cannot find user: 'Pee'")
    assert q('alter user "pee" set name "Pee"') == {
        "success_msg": "Successfully updated user 'Pee'."}
    assert q('list users where name == "Pee" ')["users"] == [
        ["Pee", "no access"]]
