"""The generalized IVM engine API (mycarely_saas_dbt_spark/ivm.py):
contract refusals fast-fail, and a small end-to-end proves the
maintained view equals the batch GROUP BY after mixed waves plus a
replay no-op. The five-aggregate composition at driver scale is pinned
by the `mv_incremental_refresh` entry's DuckDB oracle."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def target_root(tmp_path):
    p = str(tmp_path / "target")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _defn(**kw):
    from mycarely_saas_dbt_spark.ivm import MVAggregate, MVDefinition

    base = dict(
        name="mv_t", base="ivm_b", base_key="k", group_by=["g"],
        aggregates=[
            MVAggregate("count", None, "n"),
            MVAggregate("sum", "x", "sum_x"),
        ],
        bucket_expr="g % 4", bucket_col="gb",
    )
    base.update(kw)
    return MVDefinition(**base)


def _base_spec(n=100, partition_by=("gb",), change_data=True):
    from mycarely_saas_dbt_spark.incremental import ModelSpec

    def b(sp, sfd, wm):
        rows = sp.range(n).select(
            F.col("id").alias("k"),
            (F.col("id") % 10).alias("g"),
            ((F.col("id") * 7) % 101).alias("x"),
            ((F.col("id") * 3) % 5).alias("u"),
            ((F.col("id") % 10) % 4).alias("gb"),
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    return ModelSpec(
        "ivm_b", "k", "k", b, partition_by=list(partition_by),
        change_data=change_data,
    )


def test_definition_validation():
    from mycarely_saas_dbt_spark.ivm import MVAggregate

    with pytest.raises(ValueError, match="unsupported aggregate kinds"):
        _defn(aggregates=[MVAggregate("avg", "x", "a")])
    with pytest.raises(ValueError, match="duplicate aggregate aliases"):
        _defn(
            aggregates=[
                MVAggregate("count", None, "n"),
                MVAggregate("sum", "x", "n"),
            ]
        )


def test_refuses_uncommitted_and_unpartitioned_base(spark, target_root):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.ivm import MaterializedViewMaintainer

    r = IncrementalRunner(spark, target_root)
    with pytest.raises(RuntimeError, match="not committed"):
        MaterializedViewMaintainer(r, _defn())
    r.run(_base_spec(partition_by=()), SF_DIR)
    with pytest.raises(RuntimeError, match="unpartitioned"):
        MaterializedViewMaintainer(r, _defn())


def test_refuses_base_without_change_files_past_v1(spark, target_root):
    """v1 bootstrap stamps no cdc descriptor (served as snapshot
    inserts), so the check is version-aware: accepted at v1, refused
    once a mutating commit proves the base never opted in."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.ivm import MaterializedViewMaintainer

    r = IncrementalRunner(spark, target_root)
    spec = _base_spec(change_data=False)
    r.run(spec, SF_DIR)
    MaterializedViewMaintainer(r, _defn())  # v1: accepted
    r.update_where(spec, "k = 3", {"x": "x + 1"})
    with pytest.raises(RuntimeError, match="writes no change files"):
        MaterializedViewMaintainer(r, _defn())


def test_maintained_view_equals_batch_group_by(spark, target_root):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.ivm import (
        MaterializedViewMaintainer,
        MVAggregate,
    )
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        register_manifest_cdf_source,
    )

    register_manifest_cdf_source(spark)
    r = IncrementalRunner(spark, target_root)
    r.RETENTION_SECONDS = 3600.0
    spec = _base_spec()
    r.run(spec, SF_DIR)
    mv = _defn(
        aggregates=[
            MVAggregate("count", None, "n"),
            MVAggregate("sum", "x", "sum_x"),
            MVAggregate("min", "x", "min_x"),
            MVAggregate("max", "x", "max_x"),
            MVAggregate("count_distinct", "u", "uniq_u"),
        ]
    )
    m = MaterializedViewMaintainer(r, mv)
    m.refresh(spark)
    r.update_where(spec, "k % 7 = 2", {"x": "x + 500", "u": "(u + 1) % 5"})
    r.delete_where(spec, "k % 11 = 3")
    m.refresh(spark)
    r.delete_where(spec, "g = 4")  # whole-group tombstone
    m.refresh(spark)
    v = r.current_manifest("mv_t")["version"]
    m.refresh(spark)  # replay: no-op
    assert r.current_manifest("mv_t")["version"] == v

    expected = (
        r.read_target("ivm_b")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sum_x"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.count_distinct("u").cast("bigint").alias("uniq_u"),
        )
    )
    got = m.read()
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    # every probe stayed inside the committed bucket set
    for rels, committed, _ in m.path_log[1:]:
        assert set(rels) <= set(committed), (rels, committed)


def test_join_view_refusals(spark, target_root):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.ivm import (
        JoinViewDefinition,
        JoinViewMaintainer,
    )

    r = IncrementalRunner(spark, target_root)
    jv = JoinViewDefinition(
        "jv_t", "ivm_b", "k", "jv_dim", "g",
        fact_cols=["x"], dim_cols=["label"],
        fact_bucket_expr="g % 4", fact_bucket_col="gb",
    )
    with pytest.raises(RuntimeError, match="not committed"):
        JoinViewMaintainer(r, jv)
    r.run(_base_spec(partition_by=()), SF_DIR)  # fact, unpartitioned
    from mycarely_saas_dbt_spark.incremental import ModelSpec

    dim_spec = ModelSpec(
        "jv_dim", "g", "g",
        lambda sp, sfd, wm: sp.range(10).select(
            F.col("id").alias("g"),
            F.concat(F.lit("L"), F.col("id")).alias("label"),
        ),
        change_data=True,
    )
    r.run(dim_spec, SF_DIR)
    with pytest.raises(RuntimeError, match="unpartitioned"):
        JoinViewMaintainer(r, jv)


def test_join_view_equals_batch_join(spark, target_root):
    """The maintained fact ⋈ dim view equals the batch join after dim
    churn, a key-moving fact update, deletes on both sides, and a
    replay no-op — inner-join dangling rows tombstone and return."""
    from mycarely_saas_dbt_spark.incremental import (
        IncrementalRunner,
        ModelSpec,
    )
    from mycarely_saas_dbt_spark.ivm import (
        JoinViewDefinition,
        JoinViewMaintainer,
    )
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        register_manifest_cdf_source,
    )

    register_manifest_cdf_source(spark)
    r = IncrementalRunner(spark, target_root)
    r.RETENTION_SECONDS = 3600.0
    fact_spec = _base_spec()
    dim_spec = ModelSpec(
        "jv_dim", "g", "g",
        lambda sp, sfd, wm: sp.range(10).select(
            F.col("id").alias("g"),
            F.concat(F.lit("L"), F.col("id")).alias("label"),
        ),
        change_data=True,
    )
    r.run(fact_spec, SF_DIR)
    r.run(dim_spec, SF_DIR)
    jv = JoinViewDefinition(
        "jv_t", "ivm_b", "k", "jv_dim", "g",
        fact_cols=["x"], dim_cols=["label"],
        fact_bucket_expr="g % 4", fact_bucket_col="gb",
        view_bucket_expr="k % 4", view_bucket_col="kb",
    )
    m = JoinViewMaintainer(r, jv)
    m.refresh(spark)
    r.update_where(dim_spec, "g % 3 = 1", {"label": "concat(label, '_v2')"})
    m.refresh(spark)  # dim-only: pruned probe
    r.update_where(
        fact_spec, "k % 7 = 2",
        {"x": "x + 500", "g": "(g + 1) % 10", "gb": "((g + 1) % 10) % 4"},
    )
    r.delete_where(fact_spec, "k % 11 = 3")
    r.delete_where(dim_spec, "g = 5")  # dangling fact rows tombstone
    m.refresh(spark)
    v = r.current_manifest("jv_t")["version"]
    m.refresh(spark)  # replay: no-op
    assert r.current_manifest("jv_t")["version"] == v

    expected = r.read_target("ivm_b").join(
        r.read_target("jv_dim"), "g", "inner"
    ).select("k", "g", "x", "label")
    got = m.read()
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0
    # the dim-only wave's probe stayed inside its bucket set
    dim_only = [t for t in m.path_log if t[2] is not None]
    assert dim_only and all(ok for _, _, ok in dim_only), m.path_log
