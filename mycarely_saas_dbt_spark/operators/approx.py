"""Approximate / sketch aggregation operators — the 100 TB substitutes for
exact COUNT DISTINCT and exact percentiles (SURVEY §2.4 A2 note, §7 M5).

Differential-testing approach: an approximate value can never hash-match a
DuckDB oracle, so each query outputs (a) the DETERMINISTIC exact columns and
(b) the approximation's accuracy contract as a boolean (`within_tol`).
Spark computes the flag from its own approx vs exact values; the oracle
asserts the contract by emitting literal TRUE next to the same exact
columns. A regression that pushes the estimator outside its documented
error bound therefore fails the hash compare — the contract IS the test.

Scale notes (100 TB):
  * approx_count_distinct (HyperLogLog++) — fixed-size state (~1.5 KB at 5%
    rsd) vs the exact rewrite's per-value shuffle; the difference between a
    single map-side pass and an Expand + two-phase distinct at fact-table
    cardinality.
  * hll_sketch_agg / hll_union_agg (Apache DataSketches) — RE-AGGREGATABLE:
    persist one sketch per (day, dim) partition, answer any rollup (month,
    quarter, all-time uniques) by unioning sketches, never rescanning the
    fact table. This is the idiomatic warehouse pattern for distinct-count
    cubes.
  * approx_percentile (KLL-style) — bounded-memory quantiles; exact
    `percentile` materializes every value per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.sources.registry import register_sources

REL_TOL = 0.05


def _within(approx, exact):
    """Accuracy-contract flag, total over the whole domain: exact == 0 would
    make the relative error NULL (0/0 or x/0), flipping the oracle's literal
    TRUE into a hash mismatch on an empty group — treat it as within-bound
    iff the approximation also says zero."""
    return F.when(exact == 0, approx == 0).otherwise(
        (F.abs(approx - exact) / exact) <= REL_TOL
    )


def q_approx_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day unique users: exact countDistinct next to HLL++
    approx_count_distinct; output carries the exact value and the 5%%
    accuracy-contract flag."""
    register_sources(spark, sf_dir)
    ev = spark.table("events")
    day = F.col("ts").cast("date").alias("day")
    return (
        ev.groupBy(day)
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        )
        .select(
            "day",
            "exact_users",
            _within(F.col("approx_users"), F.col("exact_users")).alias("within_tol"),
        )
    )


O_APPROX_DISTINCT_DAILY = """
SELECT CAST(ts AS DATE) AS day,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_tol
FROM events
GROUP BY CAST(ts AS DATE)
"""


def q_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count cube: one DataSketches HLL sketch per
    day, unioned into a single monthly estimate — the fact table is scanned
    once and every coarser rollup is sketch algebra. Output: exact monthly
    uniques, number of daily sketches merged, accuracy flag."""
    register_sources(spark, sf_dir)
    ev = spark.table("events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk")
    )
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_month_users"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_month_users"))
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_days",
        "exact_month_users",
        _within(F.col("approx_month_users"), F.col("exact_month_users")).alias(
            "within_tol"
        ),
    )


O_HLL_SKETCH_ROLLUP = """
SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(DISTINCT user_id) AS exact_month_users,
       TRUE AS within_tol
FROM events
"""


def q_approx_percentile_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory quantiles: approx_percentile vs exact interpolated
    percentile per return flag, with the accuracy contract as output.
    The exact p50 itself is NOT emitted: interpolated medians of prices
    land on half-cent ties ((a+b)/2 = x.xx5) where Spark's and DuckDB's
    interpolation formulas differ in the last bit and ROUND flips — the
    deterministic percentile VALUE check lives in percentile_qty (integral
    quantities interpolate exactly); here the contract is the bound."""
    register_sources(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx_p50"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            _within(F.col("approx_p50"), F.col("exact_p50")).alias("within_tol"),
        )
    )


O_APPROX_PERCENTILE_TOL = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       TRUE AS within_tol
FROM lineitem
GROUP BY l_returnflag
"""


PAIRS = [
    ("approx_distinct_daily", q_approx_distinct_daily, O_APPROX_DISTINCT_DAILY),
    ("hll_sketch_rollup", q_hll_sketch_rollup, O_HLL_SKETCH_ROLLUP),
    ("approx_percentile_tol", q_approx_percentile_tol, O_APPROX_PERCENTILE_TOL),
]


def register_queries(register) -> None:
    for name, fn, oracle in PAIRS:
        register(name, fn, oracle)
