"""util.global_rank — scale-safe global ROW_NUMBER (range-partition +
local rank + broadcast offsets; VERDICT r8 item 1's building block)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_global_rank_matches_unpartitioned_window(spark):
    from mycarely_saas_dbt_spark.util import global_rank

    df = spark.range(5000).select(
        (F.col("id") * 7919 % 211).alias("k"),
        ((F.col("id") * 104729) % 89).alias("k2"),
        F.col("id").alias("uid"),
    )
    order = [F.col("k").desc(), F.col("k2").asc(), F.col("uid").asc()]
    got = global_rank(df, order, rank_col="r")
    ref = df.withColumn(
        "r_ref", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
    bad = (
        got.join(ref.select("uid", "r_ref"), "uid")
        .filter(F.col("r") != F.col("r_ref"))
        .count()
    )
    assert bad == 0
    assert got.count() == 5000
    assert got.agg(F.min("r"), F.max("r")).first() == (1, 5000)


def test_global_rank_no_corpus_wide_window(spark):
    """The only unpartitioned Window in the plan runs over per-partition
    COUNTS (metadata scale), never over the input relation: the input-
    scale Window must be partitioned (__pid)."""
    from mycarely_saas_dbt_spark.util import global_rank

    df = spark.range(1000).select(F.col("id").alias("uid"))
    out = global_rank(df, [F.col("uid").asc()], rank_col="r")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the ranking window is partitioned; the offsets aggregate feeds a
    # broadcast exchange (tiny side), and no cartesian appears
    assert "__pid" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
