"""Error types with message parity to the reference.

The reference surfaces user errors as query-error strings (see
/root/reference/src/siri/db/query.c:459-559 and the verbatim messages
asserted in /root/reference/itest/test_select.py:420-502). We raise
``QueryError`` with the same text.
"""


class SiriError(Exception):
    """Base class for engine errors."""


class QueryError(SiriError):
    """A user/query error (parse error, semantic error, guard tripped)."""


class InsertError(SiriError):
    """Invalid insert payload (ref: src/siri/db/insert.c:93-126)."""


class ParseError(QueryError):
    """Syntax error. Message mirrors 'Query error at position N...'."""
