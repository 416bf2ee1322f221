"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``mycarely_saas_dbt_spark``; this module only
adapts it to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mycarely_saas_dbt_spark.entry import (  # noqa: E402
    ENTRY_SF_DIR,
    build_queries,
    build_oracle_sql,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (traffic_pages_agg) on /root/testdata/sf0.001."""
    from mycarely_saas_dbt_spark.plans.traffic_pages import traffic_pages_agg

    return traffic_pages_agg(spark, ENTRY_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
