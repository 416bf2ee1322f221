"""Physical-plan guarantees for partitioned layouts: a filter on the
partition column must become a PartitionFilter (directory pruning), and
data-column predicates must reach the parquet reader as PushedFilters."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, SF_DIR)
    path = str(tmp_path / f"orders_part_{uuid.uuid4().hex[:6]}")
    spark.table("orders").write.mode("overwrite").partitionBy(
        "o_orderstatus"
    ).parquet(path)

    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    plan = _plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    # partition predicate must NOT be evaluated against row data
    assert "DataFilters: []" in plan, plan


def test_data_filter_pushed_to_scan(spark):
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, SF_DIR)
    df = spark.table("lineitem").filter(F.col("l_quantity") < 5.0).select(
        "l_orderkey", "l_quantity"
    )
    plan = _plan(df)
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "LessThan(l_quantity,5.0)" in pushed, plan
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_extendedprice" not in read_schema, read_schema  # column pruning


def test_rel_pruned_numeric_path_value_vs_string_bounds():
    """ADVICE r7 (low): hive value 'bucket=9' with STRING bounds ('9','10')
    must not be pruned lexicographically ('9' > '1' prefix). Both sides
    parse numerically -> 9 is inside [9, 10] -> keep."""
    from mycarely_saas_dbt_spark.incremental import _rel_pruned

    assert _rel_pruned("bucket=9", {"bucket": ("9", "10")}) is False
    # genuinely out-of-range numeric still prunes
    assert _rel_pruned("bucket=9", {"bucket": ("10", "20")}) is True
    # numeric path value vs non-numeric bound: skip rel pruning (keep)
    assert _rel_pruned("bucket=9", {"bucket": ("a", "b")}) is False
    # plain string/ISO bounds unchanged
    assert _rel_pruned("day=2024-05-01", {"day": ("2024-01-01", "2024-02-01")}) is True
    assert _rel_pruned("day=2024-01-15", {"day": ("2024-01-01", "2024-02-01")}) is False
