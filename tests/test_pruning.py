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


def test_generated_partition_column_computed_and_prunes_from_base(
    spark, tmp_path
):
    """Delta generated columns (r8): `day = CAST(ts AS DATE)` is computed
    at write when the build omits it, committed into the manifest meta,
    and a prune on the BASE column (ts) statically prunes the generated
    day partitions — the caller never names the layout column."""
    import datetime as dt

    from pyspark.sql import functions as F

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, SF_DIR)

    def build(sp, sfd, wm):
        return (
            sp.table("events")
            .select("event_id", F.col("ts").cast("timestamp").alias("ts"))
        )

    spec = ModelSpec(
        "gen_t", "event_id", "ts", build,
        partition_by=["day"],
        generated_columns={"day": "CAST(ts AS DATE)"},
    )
    runner = IncrementalRunner(spark, str(tmp_path / "t"))
    runner.run(spec, SF_DIR)

    out = runner.read_target("gen_t")
    assert "day" in out.columns
    assert out.filter(F.col("day") != F.col("ts").cast("date")).count() == 0
    m = runner.current_manifest("gen_t")
    assert m["meta"]["generated_columns"]["day"]["kind"] == "cast_date"
    n_parts = len(m["partitions"])
    assert n_parts > 1

    lo, hi = runner.read_target("gen_t").agg(
        F.min("ts"), F.max("ts")
    ).first()
    mid = lo + (hi - lo) / 2
    pruned = runner.resolved_files("gen_t", prune={"ts": (str(lo), str(mid))})
    full = runner.resolved_files("gen_t")
    assert 0 < len(pruned) < len(full), (len(pruned), len(full))
    # translation equals an explicit prune on the generated column
    explicit = runner.resolved_files(
        "gen_t", prune={"day": (lo.date(), mid.date())}
    )
    assert set(pruned) <= set(explicit) or set(explicit) <= set(pruned)


def test_generated_column_provided_values_validated(spark, tmp_path):
    """A build that PROVIDES the generated column with wrong values must
    abort before commit (Delta's validation rule); correct provided
    values pass. Unsupported expressions refuse at parse time."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec

    runner = IncrementalRunner(spark, str(tmp_path / "t"))

    def mk(day_expr):
        def build(sp, sfd, wm):
            return sp.range(10).select(
                F.col("id").alias("k"),
                F.to_timestamp(F.lit("2024-01-05 10:00:00")).alias("ts"),
                F.expr(day_expr).alias("day"),
            )

        return build

    spec_ok = ModelSpec(
        "gen_v", "k", "ts", mk("DATE '2024-01-05'"),
        partition_by=["day"], generated_columns={"day": "CAST(ts AS DATE)"},
    )
    runner.run(spec_ok, SF_DIR)
    assert runner.read_target("gen_v").count() == 10

    import dataclasses

    spec_bad = dataclasses.replace(
        spec_ok, name="gen_bad", build=mk("DATE '1999-01-01'")
    )
    with _pytest.raises(RuntimeError, match="CHECK constraint violated"):
        runner.run(spec_bad, SF_DIR)

    spec_unsup = dataclasses.replace(
        spec_ok, name="gen_unsup",
        generated_columns={"day": "ts + INTERVAL 1 DAY"},
    )
    with _pytest.raises(RuntimeError, match="unsupported generated-column"):
        runner.run(spec_unsup, SF_DIR)


def test_generated_columns_run_preserves_live_meta(spark, tmp_path):
    """ADVICE r8 (low): run() with generated_columns must OVERLAY the
    definitions onto the live manifest meta, not replace it — a txn
    idempotency ledger committed by merge_txn on the same table has to
    survive a subsequent incremental run, or replayed micro-batches
    would be re-applied."""
    from pyspark.sql import functions as F

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec

    def build(sp, sfd, wm):
        return sp.range(10).select(
            F.col("id").alias("k"),
            F.to_timestamp(F.lit("2024-01-05 10:00:00")).alias("ts"),
        )

    spec = ModelSpec(
        "gen_meta_t", "k", "ts", build,
        partition_by=["day"], generated_columns={"day": "CAST(ts AS DATE)"},
    )
    runner = IncrementalRunner(spark, str(tmp_path / "t"))
    runner.run(spec, SF_DIR)

    batch = spark.range(3).select(
        F.col("id").alias("k"),
        F.to_timestamp(F.lit("2024-01-06 10:00:00")).alias("ts"),
        F.lit("2024-01-06").cast("date").alias("day"),
    )
    runner.merge_txn(spec, batch, app_id="hopX", txn_version=7)
    assert runner.txn_last_version("gen_meta_t", "hopX") == 7

    # incremental run on the same table: the ledger must survive
    runner.run(spec, SF_DIR)
    assert runner.txn_last_version("gen_meta_t", "hopX") == 7
    m = runner.current_manifest("gen_meta_t")
    assert m["meta"]["generated_columns"]["day"]["kind"] == "cast_date"
