"""SQL front door for the IVM API (ivm_sql.py — VERDICT r13 item 7):
CREATE MATERIALIZED VIEW parses into an MVDefinition with a direct
aggregate-kind mapping; everything outside the maintainable shape
refuses with the specific construct named. The end-to-end
declare/refresh/read path is pinned by the `sql_create_mv` driver
entry's DuckDB oracle (same fixture + oracle as mv_incremental_refresh
— the SQL path must not change semantics)."""

from __future__ import annotations

import pytest

from mycarely_saas_dbt_spark.ivm_sql import parse_create_materialized_view


GOOD = """
CREATE MATERIALIZED VIEW mv_daily
OPTIONS (base_key 'k', bucket_expr 'g % 8', bucket_col 'gb',
         emit_changes true)
AS SELECT g, h, COUNT(*) AS n, SUM(x) AS sum_x, MIN(x) AS min_x,
          MAX(x) AS max_x, AVG(x) AS avg_x, COUNT(DISTINCT u) AS uniq_u
FROM base_tbl
GROUP BY g, h
"""


def test_parse_full_statement():
    d = parse_create_materialized_view(GOOD)
    assert d.name == "mv_daily"
    assert d.base == "base_tbl"
    assert d.base_key == "k"
    assert d.group_by == ["g", "h"]
    assert d.bucket_expr == "g % 8" and d.bucket_col == "gb"
    assert d.emit_changes is True
    kinds = {a.alias: (a.kind, a.col) for a in d.aggregates}
    assert kinds == {
        "n": ("count", None),
        "sum_x": ("sum", "x"),
        "min_x": ("min", "x"),
        "max_x": ("max", "x"),
        "avg_x": ("avg", "x"),
        "uniq_u": ("count_distinct", "u"),
    }


@pytest.mark.parametrize(
    ("sql", "match"),
    [
        ("SELECT 1", "not a CREATE MATERIALIZED VIEW"),
        (
            "CREATE MATERIALIZED VIEW v AS SELECT g, COUNT(*) AS n "
            "FROM a JOIN b ON a.g = b.g GROUP BY g",
            "joins",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, COUNT(*) AS n FROM t WHERE g > 1 GROUP BY g",
            "WHERE",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, COUNT(*) AS n FROM t GROUP BY g HAVING n > 1",
            "HAVING",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, COUNT(*) AS n FROM t GROUP BY g ORDER BY g",
            "ORDER BY",
        ),
        (
            "CREATE MATERIALIZED VIEW v AS SELECT g, COUNT(*) AS n "
            "FROM t GROUP BY g",
            "base_key",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, COUNT(*) AS n FROM (SELECT * FROM t) GROUP BY g",
            "exactly one base table",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, SUM(DISTINCT x) AS s FROM t GROUP BY g",
            "support-count algebra",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, MEDIAN(x) AS m FROM t GROUP BY g",
            "unsupported select item",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, COUNT(*) FROM t GROUP BY g",
            "AS alias",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, h, COUNT(*) AS n FROM t GROUP BY g",
            "not in GROUP BY",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT COUNT(*) AS n FROM t GROUP BY g",
            "missing from the SELECT",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, COUNT(*) AS n FROM t GROUP BY g % 2",
            "bare columns",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g, ROW_NUMBER() OVER (ORDER BY g) AS r FROM t GROUP BY g",
            "window functions",
        ),
        (
            "CREATE MATERIALIZED VIEW v OPTIONS (base_key 'k') AS "
            "SELECT g FROM t GROUP BY g",
            "at least one aggregate",
        ),
    ],
)
def test_refusals(sql, match):
    with pytest.raises(ValueError, match=match):
        parse_create_materialized_view(sql)


def test_count_col_and_semicolon_and_case_insensitive():
    d = parse_create_materialized_view(
        "create materialized view V options (BASE_KEY 'id') as "
        "select d, count(v) as n_v from t group by d;"
    )
    assert d.name == "V" and d.base_key == "id"
    assert d.aggregates[0].kind == "count"
