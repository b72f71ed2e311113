"""Time / integer expression folding.

The reference constant-folds all time and integer expressions at parse
time (ref /root/reference/src/siri/db/query.c:852-969) using a tiny
infix evaluator with C precedence (* % / over + -, unary minus,
truncating integer division — /root/reference/src/expr/expr.c).
`now` is captured ONCE per query (query.c:592-594); unit literals like
`3d`/`2w` scale seconds by the database time-precision factor
(/root/reference/src/siri/db/time.c:27,34-53); quoted ISO-8601 dates
are parsed in the database timezone (query.c:916-945).
"""

from __future__ import annotations

import datetime
import re
import time as _time

from ..errors import QueryError

#: s | ms | us | ns (ref include/siri/db/time.h:8-15)
PRECISIONS = ("s", "ms", "us", "ns")

_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def factor(precision: str) -> int:
    """1000^index (ref src/siri/db/time.c:27)."""
    return 1000 ** PRECISIONS.index(precision)


def unit_value(num: int, unit: str, precision: str) -> int:
    return num * _UNIT_SECONDS[unit] * factor(precision)


def now_ts(precision: str) -> int:
    return int(_time.time() * factor(precision))


_ISO_RE = re.compile(
    r"^(\d{4})(?:-(\d{2}))?(?:-(\d{2}))?"
    r"(?:[T ](\d{2})(?::(\d{2}))?(?::(\d{2}))?)?(Z)?$"
)


def parse_iso8601(s: str, precision: str, tzinfo=None) -> int:
    """Parse an ISO-8601-ish date string → native-precision timestamp.

    Mirrors iso8601_parse_date usage (ref query.c:916-945): partial dates
    allowed (year, year-month, ...), interpreted in the database timezone
    (UTC unless configured).
    """
    m = _ISO_RE.match(s.strip())
    if not m:
        raise QueryError(f"Could not parse date '{s}'")
    y, mo, d, h, mi, sec, z = m.groups()
    tz = datetime.timezone.utc if (z or tzinfo is None) else tzinfo
    try:
        dt = datetime.datetime(
            int(y), int(mo or 1), int(d or 1),
            int(h or 0), int(mi or 0), int(sec or 0), tzinfo=tz,
        )
    except ValueError as e:
        raise QueryError(f"Could not parse date '{s}'") from e
    return int(dt.timestamp()) * factor(precision)


def c_div(a: int, b: int) -> int:
    """C integer division: truncation toward zero (expr.c:75-78)."""
    if b == 0:
        raise QueryError("Division by zero error.")
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def c_mod(a: int, b: int) -> int:
    """C modulo: sign follows the dividend (expr.c:69-73)."""
    if b == 0:
        raise QueryError("Modulo by zero error.")
    return a - c_div(a, b) * b
