"""AST node types for the query language.

Rule names mirror the reference grammar (/root/reference/grammar/grammar.py)
so the reference's grammar-driven tests stay portable: select_stmt,
series_match, aggregate_functions, where_series, merge_as, ...
"""

from __future__ import annotations

from dataclasses import dataclass, field


# ---------------------------------------------------------------- series match
@dataclass
class SeriesName:
    name: str


@dataclass
class SeriesRegex:
    pattern: str  # raw pattern without slashes
    case_insensitive: bool = False


@dataclass
class GroupTagMatch:
    name: str


@dataclass
class SeriesAll:
    pass


@dataclass
class SeriesSetOp:
    """Left-to-right set algebra (ref grammar.py:449-464; no precedence)."""

    op: str  # 'union' | 'difference' | 'intersection' | 'symmetric_difference'
    left: object
    right: object


# ------------------------------------------------------------------- pipeline
@dataclass
class AggFunc:
    """A bucketed-or-whole-window aggregate (ref aggregate.c:516-554)."""

    name: str  # count sum mean median median_low median_high min max
    #            variance pvariance stddev first last
    group_by: int | None = None  # bucket width; None = to-one collapse
    offset: int = 0


@dataclass
class DifferenceFunc:
    group_by: int | None = None
    offset: int = 0


@dataclass
class DerivativeFunc:
    timespan: float = 1.0  # ref aggregate.c:380-409 (timespan /= group_by)
    group_by: int | None = None
    offset: int = 0


@dataclass
class FilterFunc:
    """filter([op] value) (ref aggregate.c:596-675)."""

    op: str  # '<' '>' '==' '!=' '<=' '>=' '~' '!~'
    value_tp: str  # 'int' | 'double' | 'string' | 'regex' | 'nan' | 'inf' | 'ninf'
    value: object


@dataclass
class LimitFunc:
    """limit(N, fn): adaptive downsample (ref aggregate.c:677-694)."""

    limit: int
    agg: str


@dataclass
class TimevalFunc:
    pass


@dataclass
class IntervalFunc:
    pass


@dataclass
class AllPointsFunc:
    """'*' / 'all' / deprecated 'points' — identity."""


@dataclass
class Pipeline:
    funcs: list = field(default_factory=list)
    prefix: str | None = None
    suffix: str | None = None


@dataclass
class MergeAs:
    name: str
    using: list | None = None  # pipeline funcs


# ---------------------------------------------------------------------- where
@dataclass
class WhereCond:
    prop: str
    op: str
    value: object


@dataclass
class WhereBool:
    op: str  # 'and' | 'or'
    left: object
    right: object


# ----------------------------------------------------------------- statements
@dataclass
class SelectStmt:
    pipelines: list  # list[Pipeline]
    match: object  # series match tree
    where: object | None = None
    # time range: one of ('after', t) ('before', t) ('between', a, b)
    # ('head', n) ('tail', n)
    timerange: tuple | None = None
    merge: MergeAs | None = None


@dataclass
class ListStmt:
    entity: str  # series|groups|tags|users|pools|servers|shards
    columns: list | None = None
    match: object | None = None
    where: object | None = None
    limit: int | None = None


@dataclass
class CountStmt:
    entity: str
    variant: str | None = None  # 'length' (series) | 'size' (shards) | None
    match: object | None = None
    where: object | None = None


@dataclass
class ShowStmt:
    fields: list = field(default_factory=list)


@dataclass
class CalcStmt:
    value: int


@dataclass
class CreateGroup:
    name: str
    pattern: str
    case_insensitive: bool = False


@dataclass
class CreateUser:
    name: str
    password: str


@dataclass
class DropStmt:
    entity: str  # series|group|tag|user|server|shards
    name: str | None = None
    match: object | None = None
    where: object | None = None
    ignore_threshold: bool = False


@dataclass
class AlterDatabase:
    key: str
    value: object
    ignore_threshold: bool = False


@dataclass
class AlterSeries:
    match: object
    where: object | None
    action: str  # 'tag' | 'untag'
    tag: str = ""


@dataclass
class AlterGroup:
    name: str
    key: str  # 'expression' | 'name'
    value: object = None
    case_insensitive: bool = False


@dataclass
class AlterTag:
    name: str
    new_name: str


@dataclass
class AlterUser:
    name: str
    key: str  # 'password' | 'name'
    value: str = ""


@dataclass
class AlterServer:
    name: str
    key: str  # 'log_level' | 'backup_mode' | 'address' | 'port'
    value: object = None


@dataclass
class AlterServers:
    where: object = None
    level: str = ""


@dataclass
class GrantStmt:
    access: list
    user: str
    password: str | None = None


@dataclass
class RevokeStmt:
    access: list
    user: str


@dataclass
class HelpStmt:
    topic: str = ""


@dataclass
class Query:
    """Top-level: optional timeit + one statement (ref grammar START)."""

    stmt: object
    timeit: bool = False
