"""Access-control bits, profiles, and statement mapping.

Reference parity: bit constants and profile compositions from
include/siri/db/access.h:8-42; string round-trip formatting from
src/siri/db/access.c:34-92 (comma list with " and " before the last
item, "no access" for 0); the denial message from
src/siri/db/user.c:197-218.
"""

from __future__ import annotations

SHOW = 1
COUNT = 2
LIST = 4
SELECT = 8
INSERT = 16
CREATE = 32
ALTER = 64
DROP = 128
GRANT = 256
REVOKE = 512

PROFILE_READ = SHOW | COUNT | LIST | SELECT
PROFILE_WRITE = PROFILE_READ | INSERT | CREATE
PROFILE_MODIFY = PROFILE_WRITE | ALTER | DROP
PROFILE_FULL = PROFILE_MODIFY | GRANT | REVOKE

# profiles first, biggest masks first (greedy to-string decomposition)
_MAP = [
    ("full", PROFILE_FULL),
    ("modify", PROFILE_MODIFY),
    ("write", PROFILE_WRITE),
    ("read", PROFILE_READ),
    ("alter", ALTER),
    ("count", COUNT),
    ("create", CREATE),
    ("drop", DROP),
    ("grant", GRANT),
    ("insert", INSERT),
    ("list", LIST),
    ("revoke", REVOKE),
    ("select", SELECT),
    ("show", SHOW),
]
_BY_NAME = dict(_MAP)


def access_from_name(name: str) -> int:
    return _BY_NAME.get(name, 0)


def access_from_names(names) -> int:
    bits = 0
    for n in names:
        bits |= access_from_name(n)
    return bits


def access_to_str(bits: int) -> str:
    parts = []
    for repr_, bit in _MAP:
        if bits & bit == bit:
            bits -= bit
            parts.append(repr_)
    if not parts:
        return "no access"
    if len(parts) == 1:
        return parts[0]
    return ", ".join(parts[:-1]) + " and " + parts[-1]


def check_access(username: str, have: int, needed: int):
    """Raise on missing privilege (ref user.c:197-218 message)."""
    from .errors import QueryError

    if have & needed == needed:
        return
    raise QueryError(
        f"Access denied. User '{username}' has no "
        f"'{access_to_str(needed)}' privileges.")
