"""End-to-end HTTP transport tests: real POSTs over a socket against
the stdlib server, porting the single-database cases of the
reference's itest/test_http_api.py (status codes, auth, error
payloads, the 't' precision option, /get-version)."""

import json
import urllib.error
import urllib.request

import pytest

from siridb_server_spark import SiriEngine, __version__
from siridb_server_spark.sources.http import ApiServer


@pytest.fixture(scope="module")
def served(spark):
    eng = SiriEngine(spark, precision="s")
    eng.insert({"data": [[1579521271, 10], [1579521573, 20]]})
    srv = ApiServer(eng).start()
    yield srv
    srv.stop()


def _post(srv, path, payload, auth=("iris", "siri"),
          content_type="application/json", raw=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=raw if raw is not None else json.dumps(payload).encode(),
        method="POST")
    req.add_header("Content-Type", content_type)
    if auth:
        import base64
        tok = base64.b64encode(f"{auth[0]}:{auth[1]}".encode()).decode()
        req.add_header("Authorization", f"Basic {tok}")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_insert_empty_body_is_400(served):
    status, _ = _post(served, "/insert/sparksiri", None, raw=b"")
    assert status == 400


def test_insert_and_query_roundtrip(served):
    status, out = _post(served, "/insert/sparksiri",
                        {"data2": [[1579521271, 1.5]]})
    assert status == 200
    assert out == {"success_msg": "Successfully inserted 1 point(s)."}
    status, out = _post(served, "/query/sparksiri",
                        {"q": 'select * from "data"'})
    assert status == 200
    assert out == {"data": [[1579521271, 10], [1579521573, 20]]}


def test_query_precision_option(served):
    # ref itest: {'q': ..., 't': 'ms'} scales result timestamps
    status, out = _post(served, "/query/sparksiri",
                        {"q": 'select * from "data"', "t": "ms"})
    assert status == 200
    assert out == {"data": [[1579521271000, 10], [1579521573000, 20]]}
    status, out = _post(served, "/query/sparksiri",
                        {"q": 'select * from "data"', "t": "century"})
    assert status == 400 and "error_msg" in out


def test_auth_and_routing_status_codes(served):
    assert _post(served, "/query/sparksiri", {"q": "show"},
                 auth=("iris", "wrong"))[0] == 401
    assert _post(served, "/query/sparksiri", {"q": "show"},
                 auth=None)[0] == 401
    assert _post(served, "/query/nosuchdb", {"q": "show"})[0] == 404
    assert _post(served, "/nosuchroute/sparksiri", {})[0] == 404
    assert _post(served, "/query/sparksiri", {"q": "show"},
                 content_type="text/plain")[0] == 415
    status, out = _post(served, "/query/sparksiri",
                        {"q": "select oops from nothing"})
    assert status == 400 and "error_msg" in out


def test_get_version(served):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{served.port}/get-version") as r:
        assert r.status == 200
        v = json.loads(r.read())
    assert isinstance(v, list) and v[0] == __version__
    # GET on an unknown path
    try:
        urllib.request.urlopen(
            f"http://127.0.0.1:{served.port}/insert/sparksiri")
        raised = None
    except urllib.error.HTTPError as e:
        raised = e.code
    assert raised == 404


def test_precision_option_scopes_by_statement_kind(served):
    # 't' must scale select points and calc values ONLY — never list
    # rows, even when their first column is an integer
    # (ref listener.c:6712, 6795 for points; 2148-2157 for calc)
    status, out = _post(served, "/query/sparksiri",
                        {"q": "list series length, start, end",
                         "t": "ms"})
    assert status == 200
    assert out["columns"] == ["length", "start", "end"]
    rows = out["series"]
    assert rows and all(len(r) == 3 for r in rows)
    # starts are raw seconds-precision epochs, NOT ms-scaled
    assert any(r[1] == 1579521271 for r in rows)
    # calc: an int literal on a seconds db converts s → ms
    status, out = _post(served, "/query/sparksiri",
                        {"q": "1579521271", "t": "ms"})
    assert status == 200
    assert out["calc"] == 1579521271000


def test_malformed_content_length_is_400_and_closes(served):
    import socket
    with socket.create_connection(("127.0.0.1", served.port),
                                  timeout=5) as s:
        s.sendall(b"POST /query/sparksiri HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Type: application/json\r\n"
                  b"Content-Length: banana\r\n\r\n")
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
    assert b"400" in data.split(b"\r\n", 1)[0]
    assert b"Connection: close" in data or b"connection: close" in data


def test_timeit_with_precision_option(served):
    """'timeit select ... ' + 't': the __timeit__ entry (list of
    dicts) must pass through unconverted while point lists scale."""
    status, out = _post(served, "/query/sparksiri",
                        {"q": 'timeit select * from "data"',
                         "t": "ms"})
    assert status == 200
    assert "__timeit__" in out
    assert isinstance(out["__timeit__"][0], dict)
    assert out["data"][0][0] == 1579521271000


SA = ("sa", "siri")


def test_service_api_auth_and_gets(served):
    """Service routes authenticate against SERVICE accounts (default
    sa/siri, service/account.c:16-17), not database users."""
    st, _ = _post(served, "/get-accounts", {}, auth=("iris", "siri"))
    assert st == 401
    st, out = _post(served, "/get-accounts", {}, auth=SA)
    assert (st, out) == (200, ["sa"])
    st, out = _post(served, "/get-databases", {}, auth=SA)
    assert (st, out) == (200, ["sparksiri"])
    st, out = _post(served, "/get-version", {}, auth=SA)
    assert st == 200 and isinstance(out, list) and len(out) == 1


def test_service_api_account_lifecycle(served):
    """new-account / change-password / drop-account accept+reject
    paths with the reference's verbatim validation messages
    (service/account.c:123-141, request.c drop guard)."""
    st, out = _post(served, "/new-account",
                    {"account": "x", "password": "longenough"},
                    auth=SA)
    assert st == 400 and out["error_msg"] == \
        "service account name should have at least 2 characters"
    st, out = _post(served, "/new-account",
                    {"account": "ops", "password": "p"}, auth=SA)
    assert st == 400 and out["error_msg"] == \
        "service account password should have at least 2 characters"
    st, out = _post(served, "/new-account",
                    {"account": "ops", "password": "secret"}, auth=SA)
    assert st == 200
    st, out = _post(served, "/new-account",
                    {"account": "ops", "password": "secret"}, auth=SA)
    assert st == 400 and out["error_msg"] == \
        "service account 'ops' already exists"
    # the new account authenticates
    st, out = _post(served, "/get-accounts", {},
                    auth=("ops", "secret"))
    assert (st, out) == (200, ["ops", "sa"])
    st, out = _post(served, "/change-password",
                    {"account": "nobody", "password": "xx"}, auth=SA)
    assert st == 400 and out["error_msg"] == \
        "cannot find service account 'nobody'"
    st, _ = _post(served, "/change-password",
                  {"account": "ops", "password": "rotated"}, auth=SA)
    assert st == 200
    assert _post(served, "/get-accounts", {},
                 auth=("ops", "secret"))[0] == 401
    st, _ = _post(served, "/drop-account", {"account": "ops"},
                  auth=SA)
    assert st == 200
    st, out = _post(served, "/drop-account", {"account": "sa"},
                    auth=SA)
    assert st == 400 and out["error_msg"] == (
        "at least one service account is required, "
        "cannot drop the last service account")


def test_service_api_database_paths(served):
    """new-database runs the reference's dbname/precision validation
    (request.c:200 regex, :640 precision message) and answers
    at-capacity for a valid new name (single logical database);
    pool/replica mutations reject as N/A-by-design."""
    st, out = _post(served, "/new-database", {"dbname": "9bad"},
                    auth=SA)
    assert st == 400 and out["error_msg"] == \
        "invalid database name: '9bad'"
    st, out = _post(served, "/new-database",
                    {"dbname": "okname", "time_precision": "xx"},
                    auth=SA)
    assert st == 400 and out["error_msg"] == \
        "invalid time precision: 'xx' (expecting s, ms, us or ns)"
    st, out = _post(served, "/new-database", {"dbname": "sparksiri"},
                    auth=SA)
    assert st == 400 and out["error_msg"] == \
        "database name already exists: 'sparksiri'"
    st, out = _post(served, "/new-database",
                    {"dbname": "okname", "time_precision": "ms"},
                    auth=SA)
    assert st == 400 and out["error_msg"] == \
        "maximum number of databases is reached (1)"
    st, out = _post(served, "/drop-database", {"dbname": "nosuch"},
                    auth=SA)
    assert st == 400 and out["error_msg"] == \
        "cannot find database: 'nosuch'"
    st, out = _post(served, "/new-pool", {}, auth=SA)
    assert st == 400 and "not supported" in out["error_msg"]


def test_http_query_fast_path_zero_jobs(spark, tmp_path):
    """HTTP /query inherits the driver-side catalog fast path on a
    store-backed engine: after warmup, `count series` answers with
    ZERO Spark jobs (HTTP framing adds ~ms on top of the sub-ms
    engine answer; the guard here is jobs, the latency envelope is
    asserted on the leaner qpack path in test_clserver)."""
    from siridb_server_spark import SiriEngine

    eng = SiriEngine.open(spark, str(tmp_path / "db"), precision="s")
    eng.insert({"h-a": [[10, 1]], "h-b": [[20, 2.0]]})
    srv = ApiServer(eng).start()
    try:
        status, out = _post(srv, "/query/sparksiri",
                            {"q": "count series"})
        assert (status, out) == (200, {"series": 2})
        before = len(spark.sparkContext.statusTracker()
                     .getJobIdsForGroup(None))
        for _ in range(5):
            status, out = _post(srv, "/query/sparksiri",
                                {"q": "count series"})
            assert (status, out) == (200, {"series": 2})
        after = len(spark.sparkContext.statusTracker()
                    .getJobIdsForGroup(None))
        assert after == before, "HTTP query path took a Spark job"
    finally:
        srv.stop()
