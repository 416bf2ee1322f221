"""Bucketed-table co-located joins: pre-shuffled physical layout so fact⋈fact
joins run with ZERO exchanges.

At 100 TB the dominant cost of a fact-to-fact join (orders⋈lineitem) is the
shuffle of both sides. Bucketing writes each table pre-hash-partitioned (and
sorted) by the join key into a fixed bucket count: a later join on that key
reads bucket i against bucket i directly — no Exchange on either side, and
with sortBy no Sort either. The same layout makes groupBy on the bucket key
exchange-free. This is the static counterpart of a co-partitioned lakehouse
layout (Delta/Iceberg bucket transforms); the trade-off is that the bucket
count is fixed at write time.

The contract query writes both tables bucketed into a throwaway database,
joins + aggregates ON THE BUCKET KEY, and `tests/test_bucketing.py` asserts
the physical plan contains a SortMergeJoin and ZERO shuffle exchanges.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.sources.registry import register_sources

N_BUCKETS = 8


def write_bucketed(df: DataFrame, key: str, table: str, n: int = N_BUCKETS) -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(n, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join_plan(spark: SparkSession, sf_dir: str, db: str) -> DataFrame:
    """orders⋈lineitem on the bucket key, revenue per order — every stage
    (join AND aggregate) stays on the bucketed distribution."""
    register_sources(spark, sf_dir)
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")
    write_bucketed(
        spark.table("orders").select("o_orderkey", "o_totalprice"),
        "o_orderkey",
        f"{db}.orders_b",
    )
    write_bucketed(
        spark.table("lineitem").select("l_orderkey", "l_extendedprice", "l_discount"),
        "l_orderkey",
        f"{db}.lineitem_b",
    )
    ob = spark.table(f"{db}.orders_b")
    lb = spark.table(f"{db}.lineitem_b")
    # money math in DECIMAL: per-order sums of price*(1-disc) in double land
    # on half-cent ties whose rounding depends on summation order — exact
    # decimal arithmetic makes the result engine- and order-independent
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        ob.join(lb.hint("merge"), ob.o_orderkey == lb.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("lineitem_revenue"))
    )


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    db = f"bucketdemo_{uuid.uuid4().hex[:8]}"
    out = bucketed_join_plan(spark, sf_dir, db)
    try:
        from mycarely_saas_dbt_spark.util import materialize

        return materialize(out)
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


O_BUCKETED_JOIN = """
SELECT o.o_orderkey, o.o_totalprice,
       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2))
                         - CAST(l.l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
           AS lineitem_revenue
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey, o.o_totalprice
"""


def register_queries(register) -> None:
    register("bucketed_colocated_join", q_bucketed_join, O_BUCKETED_JOIN)
