"""Registry of (Spark query, DuckDB oracle) pairs for the driver contract.

Every implemented operator from SURVEY.md §2 (plus the extended
LLM-pipeline surface) registers here: ``build_queries()`` returns
name -> (spark, sf_dir) -> DataFrame, ``build_oracle_sql()`` the matching
ANSI SQL DuckDB runs over the same parquet. Names/aliases match exactly —
the driver sorts columns by name and hashes values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

ENTRY_SF_DIR = "/root/testdata/sf0.001"

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


def build_queries() -> dict[str, QueryFn]:
    _populate()
    return dict(_QUERIES)


def build_oracle_sql() -> dict[str, str]:
    _populate()
    return dict(_ORACLES)


_POPULATED = False


def _populate() -> None:
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True

    from mycarely_saas_dbt_spark.plans import traffic_pages, traffic_daily, lead_activities

    register(
        "traffic_pages_agg",
        lambda spark, sf: traffic_pages.traffic_pages_agg(spark, sf),
        traffic_pages.oracle_sql(),
    )
    register(
        "traffic_daily_agg",
        lambda spark, sf: traffic_daily.traffic_daily_agg(spark, sf),
        traffic_daily.oracle_sql(),
    )
    register(
        "lead_activities_agg",
        lambda spark, sf: lead_activities.lead_activities_agg(spark, sf),
        lead_activities.oracle_sql(),
    )

    # Operator-level micro-queries (SURVEY §2) + extensions register lazily
    # from their own modules.
    from mycarely_saas_dbt_spark import microqueries  # noqa: F401

    microqueries.register_all(register)
