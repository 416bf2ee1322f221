"""Redshift/dbt dialect shim re-expressed as native Catalyst expressions.

Every helper returns a built-in Column expression (no Python UDFs), so the
whole pipeline stays inside whole-stage codegen and predicate pushdown.

Reference behaviors covered (citations into /root/reference):
  * variadic NVL            — models/traffic_daily_agg.sql:57-63 (Redshift NVL
                              is a COALESCE alias accepting 2+ args; Spark SQL
                              ``nvl`` is strictly 2-arg, hence this shim)
  * NOT ILIKE with NULL-drop — models/traffic_pages_agg.sql:16-18 (UA scrub;
                              NULL useragent yields NULL predicate => row
                              dropped — deliberate, keep; SURVEY.md B6)
  * dbt_utils.generate_surrogate_key — models/traffic_daily_agg.sql:133,
                              models/lead_activities_agg.sql:153-155; dbt_utils
                              1.1.1 compiles to
                              md5(coalesce(cast(c as varchar),
                              '_dbt_utils_surrogate_key_null_') || '-' || ...)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SURROGATE_KEY_NULL = "_dbt_utils_surrogate_key_null_"

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def nvl(*cols: ColumnOrName) -> Column:
    """Variadic NVL (Redshift semantics): first non-NULL argument.

    Redshift's NVL accepts 2+ arguments (used with 3-4 args in
    models/traffic_daily_agg.sql:57-63); Spark's ``nvl`` is 2-arg only, so we
    map straight onto COALESCE, which is what Redshift does internally.
    """
    if len(cols) < 2:
        raise ValueError("nvl requires at least 2 arguments")
    return F.coalesce(*[_col(c) for c in cols])


def not_ilike(col: ColumnOrName, pattern: str) -> Column:
    """``col NOT ILIKE pattern`` with SQL 3-valued logic.

    NULL input => NULL predicate => row dropped by a WHERE. This matches the
    reference's bot-scrub (models/traffic_pages_agg.sql:16-18) and must NOT be
    "fixed" into a null-safe variant (SURVEY.md §2.12 B6).
    """
    return ~_col(col).ilike(pattern)


def surrogate_key(*cols: ColumnOrName) -> Column:
    """Byte-compatible dbt_utils.generate_surrogate_key (dbt_utils 1.1.1).

    md5 of the '-'-joined, null-sentineled, string-cast field list. Dates cast
    to 'yyyy-MM-dd' and integers to plain digits in both Spark and DuckDB, so
    keys byte-match across engines as long as no raw float enters the key
    (none does in the reference: traffic_daily uses strings+date,
    lead_activities uses ints+strings+date).
    """
    parts = [
        F.coalesce(_col(c).cast("string"), F.lit(SURROGATE_KEY_NULL)) for c in cols
    ]
    return F.md5(F.concat_ws("-", *parts))


def surrogate_key_sql(cols: list[str]) -> str:
    """The same surrogate key as ANSI SQL (valid in Spark SQL and DuckDB)."""
    parts = ", ".join(
        f"COALESCE(CAST({c} AS STRING), '{SURROGATE_KEY_NULL}')" for c in cols
    )
    return f"MD5(CONCAT_WS('-', {parts}))"


def to_date(col: ColumnOrName) -> Column:
    """``x::DATE`` / ``DATE(x)`` (models/traffic_pages_agg.sql:9)."""
    return _col(col).cast("date")


def epoch_seconds(col: ColumnOrName) -> Column:
    """Floored epoch seconds of a TIMESTAMP **or** TIMESTAMP_NTZ column.

    The driver testdata has shipped ``events.ts`` as both parquet
    TIMESTAMP(NANOS) (read as TIMESTAMP via the registry repair) and
    timestamp[us] (read as TIMESTAMP_NTZ); a bare ``cast("long")`` is a
    DATATYPE_MISMATCH on NTZ in Spark 4. Casting through TIMESTAMP first is
    a no-op for TIMESTAMP and reinterprets NTZ under the session time zone —
    pinned to UTC in session.py — so naive micros == UTC epoch, matching
    DuckDB's ``FLOOR(epoch(ts))`` on naive timestamps. The final
    timestamp→long cast floor-divides micros, i.e. floors.
    """
    return _col(col).cast("timestamp").cast("long")
