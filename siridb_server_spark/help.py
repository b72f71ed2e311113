"""Built-in help corpus.

Topic inventory mirrors the reference's help set (help/*.md file
names; dynamic keyword wiring in grammar/grammar.py:937-945). The
text is original, written for THIS engine; `help` with no topic
lists every topic, unknown topics raise the lookup error.
"""

from __future__ import annotations

TOPICS: dict[str, str] = {
    "help": "Usage: help <topic>. Topics: {topics}",
    "access": (
        "Access profiles: read (show, count, list, select), "
        "write (read + insert, create), modify (write + alter, drop), "
        "full (modify + grant, revoke). Individual bits can be "
        "granted or revoked by name, e.g. `grant count, list to "
        "user 'u'`."),
    "alter": (
        "alter database | group | server | servers | user | series — "
        "change engine settings, group expressions, user passwords "
        "or names, and series tags. See `help alter database` etc."),
    "alter database": (
        "alter database set drop_threshold <float 0..1> | "
        "set list_limit <n> | set select_points_limit <n> | "
        "set timezone '<tz>' | set expiration_num <time> | "
        "set expiration_log <time> | set tee <pipe|false>. "
        "Expiration drops points older than now minus the value."),
    "alter group": (
        "alter group `name` set expression /regex/ — replace the "
        "group's regular expression. Membership is re-evaluated "
        "lazily on the next query that uses the group."),
    "alter server": (
        "alter server '<name>' set log_level <level> | set "
        "backup_mode true|false. Single-node engine: recorded but "
        "Spark owns physical distribution."),
    "alter servers": (
        "alter servers [where <cond>] set log_level <level> — bulk "
        "form of `alter server`."),
    "alter user": (
        "alter user '<name>' set password '<pw>' | set name "
        "'<new>' — change a user's password or rename the user."),
    "count": (
        "count series|groups|tags|users|pools|servers|shards "
        "[match] [where <cond>] — count entities. Also: count "
        "series length (total points) and count shards size."),
    "count groups": "count groups [where <cond>] — number of groups.",
    "count pools": "count pools — number of pools.",
    "count series": (
        "count series [match] [where <cond>] — number of matching "
        "series. `count series length ...` sums their point counts."),
    "count servers": "count servers [where <cond>] — number of servers.",
    "count shards": (
        "count shards [where <cond>] — number of shards; `count "
        "shards size` returns total bytes."),
    "count users": "count users [where <cond>] — number of users.",
    "create": (
        "create group `name` for /regex/ — saved regex selection; "
        "create user '<name>' set password '<pw>' — new account "
        "with no access until granted."),
    "create group": (
        "create group `name` for /regex/ [i] — series whose names "
        "match belong to the group; membership follows inserts "
        "automatically."),
    "create user": (
        "create user '<name>' set password '<pw>' — password must "
        "be at least 4 characters; grant access separately."),
    "drop": (
        "drop series [match] [where] | drop shards [where] | drop "
        "group `g` | drop user 'u' — bulk drops honor the "
        "drop_threshold guard unless `set ignore_threshold true`."),
    "drop group": "drop group `name` — delete the saved group.",
    "drop series": (
        "drop series [match] [where <cond>] [set ignore_threshold "
        "true] — delete matching series and their points. Refused "
        "when dropping more than drop_threshold of the database."),
    "drop server": "drop server '<name>' — remove a server (no-op here).",
    "drop shards": (
        "drop shards [where <cond>] [set ignore_threshold true] — "
        "delete whole time-range shards (sid/start/end/size props)."),
    "drop user": "drop user '<name>' — delete the account.",
    "functions": (
        "Pipeline functions: count sum mean median median_low "
        "median_high min max variance pvariance stddev first last "
        "difference derivative filter limit timeval interval "
        "offset. Bucketed forms take a time span, e.g. sum(1h); "
        "buckets are right-closed and labeled by their end. Chain "
        "with =>, e.g. `select filter(> 0) => difference() ...`."),
    "grant": (
        "grant <access>[, ...] to user '<name>' — add privileges; "
        "see `help access` for profiles and bits."),
    "list": (
        "list series|groups|tags|users|pools|servers|shards "
        "[columns] [match] [where <cond>] [limit <n>] — project "
        "catalog columns; default limit applies (list_limit)."),
    "list groups": "list groups [name, expression, series] [where].",
    "list pools": "list pools [pool, servers, series] [where].",
    "list series": (
        "list series [name, type, length, start, end, pool, "
        "shard_duration] [match] [where <cond>] [limit <n>]."),
    "list servers": "list servers [name, status, version, ...] [where].",
    "list shards": "list shards [sid, start, end, size, ...] [where].",
    "list users": "list users [name, access] [where <cond>].",
    "noaccess": (
        "Your session user lacks the privilege for that statement. "
        "An administrator can `grant` it; see `help access`."),
    "revoke": (
        "revoke <access>[, ...] from user '<name>' — remove "
        "privileges (profile names remove all their bits)."),
    "select": (
        "select <pipeline>[ prefix 'p'][ suffix 's'][, ...] from "
        "<match> [between .. and .. | after .. | before ..] "
        "[where <cond>] [merge as 'name' [using <pipeline>]] "
        "[head N | tail N]. Time values accept integers, unit "
        "literals (5m, 2h, 1d, 1w), ISO dates and `now`."),
    "show": (
        "show [field, ...] — engine status fields (dbname, "
        "time_precision, uptime, version, who_am_i, ...)."),
    "timeit": (
        "timeit <query> — run the query and prepend a __timeit__ "
        "entry with server timing to the result."),
    "timezones": (
        "Database timezone applies to ISO date strings in queries; "
        "set with `alter database set timezone '<area/city>'`. "
        "NAIVE (default) treats dates as UTC."),
}


def help_text(topic: str | None) -> str:
    key = (topic or "help").strip().lower()
    if key in ("", "help"):
        names = ", ".join(sorted(k for k in TOPICS if k != "help"))
        return TOPICS["help"].format(topics=names)
    if key in TOPICS:
        return TOPICS[key]
    raise KeyError(key)
