"""qpack codec: byte-level parity with the reference's packing rules
(qpack.h:20-67, qpack.c QP_PREPARE_RAW / qp_add_int64 / qp_add_double),
round-trip totality via hypothesis, and the HTTP content negotiation
(api.c:351-368: application/[x-]qpack in, same content type out)."""

import json
import struct
import urllib.error
import urllib.request

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from siridb_server_spark import SiriEngine
from siridb_server_spark.sources.http import ApiServer
from siridb_server_spark.sources.qpack import (
    QpackError,
    packb,
    unpackb,
)


# ------------------------------------------------------- byte parity
@pytest.mark.parametrize("value,encoded", [
    (0, b"\x00"),
    (5, b"\x05"),
    (63, b"\x3f"),
    (-1, b"\x40"),                      # 63 - (-1)
    (-60, b"\x7b"),                     # 63 + 60 = 123
    (-61, b"\xe8" + struct.pack("<b", -61)),   # falls to INT8
    (64, b"\xe8" + struct.pack("<b", 64)),
    (1000, b"\xe9" + struct.pack("<h", 1000)),
    (1 << 20, b"\xea" + struct.pack("<i", 1 << 20)),
    (1 << 40, b"\xeb" + struct.pack("<q", 1 << 40)),
    (0.0, b"\x7e"),
    (1.0, b"\x7f"),
    (-1.0, b"\x7d"),
    (2.5, b"\xec" + struct.pack("<d", 2.5)),
    ("", b"\x80"),
    ("ab", b"\x82ab"),
    ("x" * 99, bytes([128 + 99]) + b"x" * 99),
    ("x" * 100, b"\xe4\x64" + b"x" * 100),
    (True, b"\xf9"),
    (False, b"\xfa"),
    (None, b"\xfb"),
    ([], b"\xed"),
    ([1, 2], b"\xef\x01\x02"),
    ({"a": 1}, b"\xf4\x81a\x01"),
])
def test_pack_bytes_match_reference_rules(value, encoded):
    assert packb(value) == encoded
    assert unpackb(encoded) == value


def test_large_containers_use_open_close_frames():
    b = packb(list(range(6)))
    assert b[0] == 0xFC and b[-1] == 0xFE
    assert unpackb(b) == list(range(6))
    m = {str(i): i for i in range(6)}
    b = packb(m)
    assert b[0] == 0xFD and b[-1] == 0xFF
    assert unpackb(b) == m


def test_unclosed_open_container_ends_at_buffer_end():
    # reference unpacker treats QP_END as an implicit close
    assert unpackb(b"\xfc\x01\x02") == [1, 2]


def test_non_utf8_raw_decodes_to_bytes():
    assert unpackb(packb(b"\xff\xfe")) == b"\xff\xfe"


@pytest.mark.parametrize("bad", [
    b"", b"\xfe", b"\xec\x00\x00",        # empty / bare close / short
    b"\x85ab",                            # truncated raw
    b"\xfd\x81a",                         # map key without value
    b"\x01\x02",                          # trailing bytes
])
def test_malformed_buffers_raise(bad):
    with pytest.raises(QpackError):
        unpackb(bad)


_scalars = (st.none() | st.booleans()
            | st.integers(min_value=-(1 << 63),
                          max_value=(1 << 63) - 1)
            | st.floats(allow_nan=False)
            | st.text(max_size=120)
            | st.binary(max_size=120).filter(
                lambda b: not _utf8able(b)))


def _utf8able(b: bytes) -> bool:
    try:
        b.decode("utf-8")
        return True
    except UnicodeDecodeError:
        return False


@settings(max_examples=150, deadline=None)
@given(st.recursive(
    _scalars,
    lambda children: (st.lists(children, max_size=8)
                      | st.dictionaries(st.text(max_size=20),
                                        children, max_size=8)),
    max_leaves=25))
def test_roundtrip_property(value):
    assert unpackb(packb(value)) == value


# --------------------------------------------------- HTTP negotiation
@pytest.fixture(scope="module")
def served(spark):
    eng = SiriEngine(spark, precision="s")
    eng.insert({"qdata": [[1579521271, 10], [1579521573, 20]]})
    srv = ApiServer(eng).start()
    yield srv
    srv.stop()


def _post(srv, path, raw, content_type, auth=("iris", "siri")):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", data=raw, method="POST")
    req.add_header("Content-Type", content_type)
    if auth:
        import base64
        tok = base64.b64encode(
            f"{auth[0]}:{auth[1]}".encode()).decode()
        req.add_header("Authorization", f"Basic {tok}")
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_qpack_query_roundtrip(served):
    status, ct, body = _post(
        served, "/query/sparksiri",
        packb({"q": 'select * from "qdata"'}), "application/qpack")
    assert status == 200
    assert ct == "application/qpack"
    assert unpackb(body) == {
        "qdata": [[1579521271, 10], [1579521573, 20]]}


def test_x_qpack_alias_accepted(served):
    status, ct, _ = _post(
        served, "/query/sparksiri",
        packb({"q": "show time_precision"}), "application/x-qpack")
    assert status == 200
    assert ct == "application/qpack"


def test_qpack_insert_then_json_query_sees_it(served):
    status, ct, body = _post(
        served, "/insert/sparksiri",
        packb({"qdata2": [[1579521271, 1.5]]}), "application/qpack")
    assert status == 200
    assert unpackb(body) == {
        "success_msg": "Successfully inserted 1 point(s)."}
    status, ct, body = _post(
        served, "/query/sparksiri",
        json.dumps({"q": 'select * from "qdata2"'}).encode(),
        "application/json")
    assert status == 200
    assert ct == "application/json"
    assert json.loads(body) == {"qdata2": [[1579521271, 1.5]]}


def test_garbage_qpack_body_is_400(served):
    status, ct, _ = _post(served, "/query/sparksiri",
                          b"\xfe\xff\x00", "application/qpack")
    assert status == 400
    assert ct == "application/qpack"


def test_unknown_content_type_is_415(served):
    status, _, _ = _post(served, "/query/sparksiri",
                         b"q=1", "text/csv")
    assert status == 415
