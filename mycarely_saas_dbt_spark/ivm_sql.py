"""SQL front door for the IVM engine API (r14 — VERDICT r13 item 7):

    CREATE MATERIALIZED VIEW <name>
    [OPTIONS (base_key '<col>' [, bucket_expr '<sql>'] [, bucket_col '<col>']
              [, emit_changes true|false])]
    AS SELECT <group cols + aggregates> FROM <base> GROUP BY <group cols>

parsed into an :class:`~mycarely_saas_dbt_spark.ivm.MVDefinition` — the
dbt user's declarative path to the maintainer. The aggregate kinds map
directly: COUNT(*) / COUNT(col) -> count, SUM / MIN / MAX / AVG ->
sum/min/max/avg, COUNT(DISTINCT col) -> count_distinct. Aggregates
REQUIRE an ``AS alias`` (the MV's output column); bare group-by columns
pass through by name.

Deliberate REFUSALS (fast-fail with the reason — the maintainer only
guarantees exactness for shapes its algebra covers): joins or multiple
FROM relations, WHERE / HAVING / ORDER BY / LIMIT / window functions,
subqueries, expressions as group keys, DISTINCT inside non-COUNT
aggregates, aggregates the algebra lacks (e.g. MEDIAN), and duplicate
aliases. A user whose view needs aggregate-over-join declares the join
as a :class:`JoinViewDefinition` (emit_changes=True) and points the
CREATE MATERIALIZED VIEW at the maintained join view — the composition
`tests/test_ivm.py::test_aggregate_over_join_composition` pins.
"""

from __future__ import annotations

import re

from .incremental import IncrementalRunner
from .ivm import MaterializedViewMaintainer, MVAggregate, MVDefinition

_HEAD = re.compile(
    r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+(?P<name>[A-Za-z_]\w*)\s+"
    r"(?:OPTIONS\s*\((?P<opts>[^)]*)\)\s+)?"
    r"AS\s+SELECT\s+(?P<select>.*?)\s+FROM\s+(?P<from>.*?)"
    r"\s+GROUP\s+BY\s+(?P<group>.*?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPT = re.compile(r"([A-Za-z_]\w*)\s*=?\s*'([^']*)'|([A-Za-z_]\w*)\s*=?\s*(true|false)", re.IGNORECASE)
_AGG = re.compile(
    r"^(?P<fn>COUNT|SUM|MIN|MAX|AVG)\s*\(\s*(?P<distinct>DISTINCT\s+)?"
    r"(?P<arg>\*|[A-Za-z_]\w*)\s*\)\s+AS\s+(?P<alias>[A-Za-z_]\w*)$",
    re.IGNORECASE,
)
_IDENT = re.compile(r"^[A-Za-z_]\w*$")
_REFUSE_TOKENS = [
    (re.compile(r"\bJOIN\b", re.IGNORECASE), "joins"),
    (re.compile(r"\bWHERE\b", re.IGNORECASE), "WHERE"),
    (re.compile(r"\bHAVING\b", re.IGNORECASE), "HAVING"),
    # OVER before ORDER BY: a window's inner ORDER BY should name the
    # actual unsupported construct
    (re.compile(r"\bOVER\s*\(", re.IGNORECASE), "window functions"),
    (re.compile(r"\bORDER\s+BY\b", re.IGNORECASE), "ORDER BY"),
    (re.compile(r"\bLIMIT\b", re.IGNORECASE), "LIMIT"),
    (re.compile(r"\bUNION\b", re.IGNORECASE), "UNION"),
]


def _split_top_level(s: str) -> list[str]:
    """Split a select list on commas outside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def parse_create_materialized_view(sql: str) -> MVDefinition:
    """Parse one CREATE MATERIALIZED VIEW statement into an
    MVDefinition. Raises ValueError with the specific unsupported
    construct for anything outside the maintainable shape."""
    m = _HEAD.match(sql)
    if m is None:
        raise ValueError(
            "not a CREATE MATERIALIZED VIEW ... AS SELECT ... FROM ... "
            "GROUP BY ... statement"
        )
    body = sql[m.start("select"):]
    for pat, what in _REFUSE_TOKENS:
        if pat.search(body):
            raise ValueError(
                f"unsupported construct for a maintained view: {what} — "
                "declare a JoinViewDefinition (emit_changes=True) and "
                "aggregate over the maintained join view instead"
                if what == "joins"
                else f"unsupported construct for a maintained view: {what}"
            )
    frm = m.group("from").strip()
    if not _IDENT.match(frm):
        raise ValueError(
            f"FROM must name exactly one base table, got {frm!r} "
            "(subqueries/joins are not maintainable)"
        )
    opts: dict[str, str] = {}
    if m.group("opts"):
        for om in _OPT.finditer(m.group("opts")):
            if om.group(1) is not None:
                opts[om.group(1).lower()] = om.group(2)
            else:
                opts[om.group(3).lower()] = om.group(4).lower()
    if "base_key" not in opts:
        raise ValueError(
            "OPTIONS (base_key '<col>') is required — the base's change "
            "feed nets on its unique key"
        )
    group_cols = []
    for g in _split_top_level(m.group("group")):
        if not _IDENT.match(g):
            raise ValueError(
                f"GROUP BY must list bare columns, got expression {g!r} — "
                "materialize the expression as a base column first"
            )
        group_cols.append(g)
    aggs: list[MVAggregate] = []
    out_group: list[str] = []
    for item in _split_top_level(m.group("select")):
        if _IDENT.match(item):
            if item not in group_cols:
                raise ValueError(
                    f"non-aggregate select column {item!r} is not in "
                    "GROUP BY"
                )
            out_group.append(item)
            continue
        am = _AGG.match(item)
        if am is None:
            if re.match(r"^(COUNT|SUM|MIN|MAX|AVG)\s*\(", item, re.IGNORECASE) \
               and not re.search(r"\bAS\s+\w+\s*$", item, re.IGNORECASE):
                raise ValueError(
                    f"aggregate {item!r} needs an AS alias (the MV output "
                    "column name)"
                )
            raise ValueError(
                f"unsupported select item {item!r} — supported: bare group "
                "columns, COUNT(*|col), COUNT(DISTINCT col), "
                "SUM/MIN/MAX/AVG(col), each AS alias"
            )
        fn = am.group("fn").upper()
        arg = am.group("arg")
        alias = am.group("alias")
        if am.group("distinct"):
            if fn != "COUNT":
                raise ValueError(
                    f"{fn}(DISTINCT ...) is not maintainable — only "
                    "COUNT(DISTINCT col) has a support-count algebra"
                )
            if arg == "*":
                raise ValueError("COUNT(DISTINCT *) is not valid SQL")
            aggs.append(MVAggregate("count_distinct", arg, alias))
        elif fn == "COUNT":
            # COUNT(col) == COUNT(*) under the engine's documented
            # non-NULL source contract (ivm.py module docstring)
            aggs.append(MVAggregate("count", None, alias))
        else:
            if arg == "*":
                raise ValueError(f"{fn}(*) is not valid SQL")
            aggs.append(MVAggregate(fn.lower(), arg, alias))
    if not aggs:
        raise ValueError("a materialized view needs at least one aggregate")
    if set(out_group) != set(group_cols):
        missing = set(group_cols) - set(out_group)
        raise ValueError(
            f"GROUP BY columns {sorted(missing)} missing from the SELECT "
            "list — the MV stores its group keys as output columns"
        )
    return MVDefinition(
        m.group("name"), frm, opts["base_key"], group_cols, aggs,
        bucket_expr=opts.get("bucket_expr", ""),
        bucket_col=opts.get("bucket_col", "__mvb"),
        emit_changes=str(opts.get("emit_changes", "false")).lower() == "true",
    )


def create_materialized_view(
    runner: IncrementalRunner, sql: str
) -> MaterializedViewMaintainer:
    """Parse + bind: returns the maintainer for the declared view (the
    base must already be a committed change-data table)."""
    return MaterializedViewMaintainer(
        runner, parse_create_materialized_view(sql)
    )
