"""Row-level DML (copy-on-write DELETE/UPDATE), RESTORE, and shallow CLONE
— the Delta-parity table operations over the manifest commit protocol.

The scale contract under test: DML rewrites ONLY the files that contain
matching rows (untouched files carry forward in the manifest BY NAME),
RESTORE is metadata-only, and a shallow clone copies zero data bytes.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def target_root(tmp_path):
    p = str(tmp_path / "target")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _orders_spec(name="dml_target", partition_by=("o_orderstatus",), nfiles=4):
    from mycarely_saas_dbt_spark.incremental import ModelSpec
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    def build(sp, sfd, wm):
        register_sources(sp, sfd)
        df = sp.table("orders").select(
            "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus"
        )
        # several files per partition dir so partial-file rewrites are
        # observable
        return df.repartition(nfiles, "o_orderkey")

    return ModelSpec(
        name,
        "o_orderkey",
        "o_orderkey",
        build,
        partition_by=list(partition_by),
    )


def _rows(df, *cols):
    key = cols or df.columns
    return sorted(tuple(r) for r in df.select(*key).collect())


def _runner(spark, root):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    return IncrementalRunner(spark, root)


def test_delete_where_rewrites_only_touched_files(spark, target_root):
    runner = _runner(spark, target_root)
    spec = _orders_spec()
    runner.run(spec, SF_DIR)
    before = runner.read_target(spec.name)
    keys = [r[0] for r in before.select("o_orderkey").orderBy("o_orderkey").head(3)]
    m1 = runner.current_manifest(spec.name)
    n_files = sum(len(v) for v in m1["partitions"].values())

    res = runner.delete_where(spec, f"o_orderkey IN ({','.join(map(str, keys))})")
    assert res["rows_matched"] == len(keys)
    assert 0 < res["files_rewritten"] <= min(len(keys), n_files)
    assert res["files_rewritten"] < n_files  # untouched files survived

    after = runner.read_target(spec.name)
    assert _rows(after) == _rows(before.filter(~F.col("o_orderkey").isin(keys)))

    # untouched files carry forward BY NAME — the copy-on-write contract
    m2 = runner.current_manifest(spec.name)
    old = {(rel, f) for rel, fl in m1["partitions"].items() for f in fl}
    new = {(rel, f) for rel, fl in m2["partitions"].items() for f in fl}
    assert len(old & new) == n_files - res["files_rewritten"]

    # the pre-delete snapshot stays time-travelable
    assert _rows(runner.read_target(spec.name, version=m1["version"])) == _rows(before)


def test_delete_null_condition_keeps_rows(spark, target_root):
    """SQL three-valued logic: DELETE WHERE cond drops only cond=TRUE rows;
    NULL-condition rows survive."""
    runner = _runner(spark, target_root)
    spec = _orders_spec(partition_by=())
    runner.run(spec, SF_DIR)
    n = runner.read_target(spec.name).count()
    # NULLIF makes the comparison NULL for every key%2=0 row
    res = runner.delete_where(
        spec, "NULLIF(o_orderkey % 2, 0) = CASE WHEN o_orderkey % 3 = 0 THEN 1 END"
    )
    expected_deleted = (
        runner.read_target(spec.name, version=1)
        .filter("o_orderkey % 2 = 1 AND o_orderkey % 3 = 0")
        .count()
    )
    assert res["rows_matched"] == expected_deleted
    assert runner.read_target(spec.name).count() == n - expected_deleted


def test_delete_prune_narrows_candidate_files(spark, target_root):
    """Manifest-stats pruning bounds the FIND job's scan before any file
    is opened: with a range-clustered layout most files never join the
    candidate set."""
    from mycarely_saas_dbt_spark.incremental import ModelSpec
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    def build(sp, sfd, wm):
        register_sources(sp, sfd)
        return (
            sp.table("orders")
            .select("o_orderkey", "o_totalprice", "o_orderdate")
            .repartitionByRange(8, "o_orderkey")
        )

    spec = ModelSpec("dml_pruned", "o_orderkey", "o_orderkey", build)
    runner = _runner(spark, target_root)
    runner.run(spec, SF_DIR)
    n_files = sum(
        len(v) for v in runner.current_manifest(spec.name)["partitions"].values()
    )
    hi = runner.read_target(spec.name).agg(F.max("o_orderkey")).first()[0]
    res = runner.delete_where(
        spec,
        f"o_orderkey >= {hi - 5}",
        prune={"o_orderkey": (hi - 5, None)},
    )
    assert res["files_scanned"] < n_files
    assert res["files_rewritten"] >= 1
    assert runner.read_target(spec.name).agg(F.max("o_orderkey")).first()[0] < hi - 5


def test_update_where_set_exprs(spark, target_root):
    runner = _runner(spark, target_root)
    spec = _orders_spec()
    runner.run(spec, SF_DIR)
    before = runner.read_target(spec.name)
    cond = "o_totalprice > 150000"
    n_match = before.filter(cond).count()
    res = runner.update_where(
        spec,
        cond,
        {"o_totalprice": "o_totalprice * 2", "o_custkey": "o_custkey + 1000000"},
    )
    assert res["rows_matched"] == n_match
    expected = before.select(
        "o_orderkey",
        F.when(F.expr(cond), F.col("o_custkey") + 1000000)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        F.when(F.expr(cond), F.col("o_totalprice") * 2)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        "o_orderdate",
        "o_orderstatus",
    )
    after = runner.read_target(spec.name)
    assert after.dtypes == before.dtypes  # schema must not drift
    assert _rows(after) == _rows(expected)


def test_update_unknown_column_raises(spark, target_root):
    runner = _runner(spark, target_root)
    spec = _orders_spec()
    runner.run(spec, SF_DIR)
    with pytest.raises(RuntimeError, match="unknown columns"):
        runner.update_where(spec, "o_orderkey = 1", {"nope": "1"})


def test_update_partition_column_moves_rows(spark, target_root):
    """Delta allows SET on a partition column: rewritten rows land in their
    new partition dirs and the manifest moves the entries."""
    runner = _runner(spark, target_root)
    spec = _orders_spec()
    runner.run(spec, SF_DIR)
    before = runner.read_target(spec.name)
    n_o = before.filter("o_orderstatus = 'O'").count()
    n_x = before.filter("o_orderstatus = 'X'").count()
    assert n_x == 0 and n_o > 0
    res = runner.update_where(
        spec, "o_orderstatus = 'O'", {"o_orderstatus": "'X'"}
    )
    assert res["rows_matched"] == n_o
    after = runner.read_target(spec.name)
    assert after.filter("o_orderstatus = 'O'").count() == 0
    assert after.filter("o_orderstatus = 'X'").count() == n_o
    m = runner.current_manifest(spec.name)
    assert not any(rel.startswith("o_orderstatus=O") for rel in m["partitions"])
    assert any(rel.startswith("o_orderstatus=X") for rel in m["partitions"])


def test_restore_is_metadata_only(spark, target_root):
    runner = _runner(spark, target_root)
    spec = _orders_spec()
    runner.run(spec, SF_DIR)
    v1 = runner.current_manifest(spec.name)
    before = _rows(runner.read_target(spec.name))
    runner.delete_where(spec, "o_orderkey % 2 = 0")
    assert len(_rows(runner.read_target(spec.name))) < len(before)

    res = runner.restore(spec.name, v1["version"])
    assert res == {"restored_to": v1["version"], "version": v1["version"] + 2}
    m3 = runner.current_manifest(spec.name)
    # metadata-only: the restored version's file set IS v1's, by name
    assert m3["partitions"] == v1["partitions"]
    assert _rows(runner.read_target(spec.name)) == before


def test_restore_beyond_retention_raises(spark, target_root):
    runner = _runner(spark, target_root)
    runner.VACUUM_GRACE_SECONDS = 0.0
    runner.RETAIN_VERSIONS = 1
    spec = _orders_spec(partition_by=())
    runner.run(spec, SF_DIR)
    runner.delete_where(spec, "o_orderkey % 2 = 0")  # vacuums v1's files
    with pytest.raises(RuntimeError, match="no committed version 1"):
        runner.restore(spec.name, 1)


def test_clone_shallow_zero_copy_and_cow(spark, target_root):
    runner = _runner(spark, target_root)
    spec = _orders_spec()
    runner.run(spec, SF_DIR)
    src_rows = _rows(runner.read_target(spec.name))

    info = runner.clone_shallow(spec.name, "dml_clone")
    assert info["files"] == sum(
        len(v) for v in runner.current_manifest(spec.name)["partitions"].values()
    )
    # zero data bytes copied: the clone dir holds ONLY the manifest
    clone_dir = runner.target_path("dml_clone")
    data_files = [
        f
        for dp, _, fs in os.walk(clone_dir)
        for f in fs
        if not dp.endswith("_manifest")
    ]
    assert data_files == []
    assert _rows(runner.read_target("dml_clone")) == src_rows

    # copy-on-write: DML on the clone rewrites into the CLONE's dir and
    # never touches the source
    import dataclasses

    clone_spec = dataclasses.replace(spec, name="dml_clone")
    res = runner.delete_where(clone_spec, "o_orderstatus = 'F' AND o_orderkey % 2 = 0")
    assert res["rows_matched"] > 0
    assert _rows(runner.read_target(spec.name)) == src_rows  # source intact
    got = _rows(runner.read_target("dml_clone"))
    assert got == [t for t in src_rows if not (t[4] == "F" and t[0] % 2 == 0)]
    m = runner.current_manifest("dml_clone")
    # untouched partitions still point at the source (absolute entries);
    # rewritten ones are native
    for rel, fl in m["partitions"].items():
        if rel.startswith("o_orderstatus=F"):
            assert all(not os.path.isabs(f) for f in fl)
        else:
            assert all(os.path.isabs(f) for f in fl)


def test_clone_shallow_at_version(spark, target_root):
    runner = _runner(spark, target_root)
    spec = _orders_spec(partition_by=())
    runner.run(spec, SF_DIR)
    v1_rows = _rows(runner.read_target(spec.name))
    runner.delete_where(spec, "o_orderkey % 3 = 0")
    runner.clone_shallow(spec.name, "clone_v1", version=1)
    assert _rows(runner.read_target("clone_v1")) == v1_rows
    with pytest.raises(RuntimeError, match="already exists"):
        runner.clone_shallow(spec.name, "clone_v1")
