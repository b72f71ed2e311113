"""HTTP API surface, transport-free.

The reference serves POST /query/<db> and POST /insert/<db> with
JSON bodies (src/siri/api.c:233-241, JSON→qpack conversion at
:651-728, status codes E400..E503, error payloads as
{"error_msg": ...} — api.c:915-925). This module implements the
same request contract as a plain function so any WSGI/ASGI server
(or test) can mount it; the container has no HTTP stack, and the
transport is not where the semantics live.

`handle_request` returns (status_code, payload): payload is a dict
(JSON-ready) or a plain string for bare errors.
"""

from __future__ import annotations

import json

from .. import access as ACL
from ..errors import InsertError, ParseError, QueryError

DBNAME = "sparksiri"


def _auth(engine, user: str | None, password: str | None):
    if user is None:
        return None
    u = engine.users.get(user)
    if u is None or u["password"] != password:
        return None
    return user


def handle_request(engine, method: str, path: str, body,
                   user: str | None = None,
                   password: str | None = None,
                   content_type: str = "application/json"):
    parts = [p for p in path.split("/") if p]
    if len(parts) != 2 or parts[0] not in ("query", "insert"):
        return 404, "NOT FOUND"
    route, db = parts
    if method.upper() != "POST":
        return 405, "METHOD NOT ALLOWED"
    if db != DBNAME:
        return 404, "NOT FOUND"
    authed = _auth(engine, user, password)
    if authed is None:
        return 401, "UNAUTHORIZED"
    # the reference accepts application/json and application/[x-]qpack
    # and answers in the request's content type (api.c:351-368,
    # :671-728); same negotiation here
    if "qpack" in content_type:
        if isinstance(body, (bytes, bytearray)):
            from . import qpack
            try:
                body = qpack.unpackb(bytes(body))
            except (ValueError, TypeError):
                return 400, "BAD REQUEST"
    elif "json" in content_type:
        if isinstance(body, (bytes, str)):
            try:
                body = json.loads(body)
            except (ValueError, TypeError):
                return 400, "BAD REQUEST"
    else:
        return 415, "UNSUPPORTED MEDIA TYPE"

    have = engine.users[authed]["access"]
    needed = ACL.SELECT if route == "query" else ACL.INSERT
    # the reference pre-checks only the insert bit at the HTTP layer
    # (api.c:662) and lets the query path do per-statement checks;
    # we do both through the engine's dispatcher
    if route == "insert" and have & needed != needed:
        return 403, "FORBIDDEN"

    prev = engine.session_user
    engine.session_user = authed
    try:
        if route == "query":
            if not isinstance(body, dict) or "q" not in body:
                return 400, "BAD REQUEST"
            try:
                stmt, res = engine.query_kinded(body["q"])
                # optional 't': convert result timestamps to the
                # requested precision (ref api.c + itest
                # test_http_api.py: {'q': ..., 't': 'ms'}). The
                # reference converts select point timestamps
                # (listener.c:6712, 6795) and calc values
                # (listener.c:2148-2157, query.c:573-580) — never
                # list/show/count rows, so branch on the statement
                # kind, not the result shape.
                t = body.get("t")
                if t is not None:
                    from ..plans import nodes as N
                    from ..plans import timeexpr as TE
                    if t not in TE.PRECISIONS:
                        return 400, {"error_msg":
                                     f"invalid time precision: '{t}'"}
                    tf, ef = TE.factor(t), engine.factor
                    if tf != ef and isinstance(res, dict):
                        if isinstance(stmt, N.SelectStmt):
                            # '__timeit__' rides alongside series
                            # lists (a list of dicts) — convert only
                            # real point lists
                            res = {
                                k: [[p[0] * tf // ef, p[1]] for p in v]
                                if isinstance(v, list)
                                and not k.startswith("__") else v
                                for k, v in res.items()}
                        elif isinstance(stmt, N.CalcStmt) and \
                                isinstance(res.get("calc"), int):
                            res = dict(res)
                            res["calc"] = res["calc"] * tf // ef
                return 200, res
            except (QueryError, ParseError) as e:
                return 400, {"error_msg": str(e)}
        try:
            return 200, engine.insert(body)
        except (InsertError, QueryError) as e:
            return 400, {"error_msg": str(e)}
    finally:
        engine.session_user = prev
