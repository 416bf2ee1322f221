"""Pending-deletion-vector × writer-kind matrix (VERDICT r8 item 6).

The blanket writer freeze is loosened where provably safe for KEY-based
vectors; every cell below either WORKS or REFUSES for a documented
reason:

| writer                                  | pending DV behavior          |
|-----------------------------------------|------------------------------|
| incremental merge, keys disjoint        | works; vector rides forward  |
| incremental merge, re-inserts DV key    | refuses (ambiguous re-insert)|
| merge_txn (same path)                   | same two cells               |
| MERGE INTO insert-only, keys disjoint   | works; 0 files rewritten     |
| MERGE INTO insert-only, re-uses DV key  | refuses                      |
| MERGE INTO matched / by-source clauses  | refuses (raw-snapshot CoW)   |
| row-level DELETE/UPDATE (cow)           | refuses (raw-snapshot CoW)   |
| shallow clone                           | refuses (would share vector) |
| backfill                                | refuses (range rebuild would |
|                                         | resurrect deleted rows)      |
| full refresh (CTAS)                     | absorbs: authoritative       |
|                                         | rebuild drops the vector     |
| incremental full-rewrite (unpartitioned)| absorbs: rewrite reads       |
|                                         | through the vector           |
| compact                                 | absorbs (pre-existing)       |
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, day string, v long")


def _boot(spark, root, name, partitioned=True):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec

    def build(sp, sfd, wm):
        return _mk(
            sp, [(i, "d1" if i % 2 == 0 else "d2", i * 10) for i in range(40)]
        )

    spec = ModelSpec(
        name, "k", "k", build, partition_by=["day"] if partitioned else []
    )
    runner = IncrementalRunner(spark, root)
    runner.run(spec, SF_DIR)
    # DV-delete keys 3, 13, 23, 33
    res = runner.delete_where(spec, "k % 10 = 3", mode="dv")
    assert res["files_rewritten"] == 0 and res["rows_matched"] == 4
    return runner, spec


def test_incremental_merge_disjoint_keys_allowed_vector_survives(
    spark, tmp_path
):
    runner, spec = _boot(spark, str(tmp_path / "t"), "m1")
    batch = _mk(spark, [(100, "d1", 1), (101, "d2", 2)])
    r = runner.merge_txn(spec, batch, app_id="a", txn_version=1)
    assert not r.get("skipped")
    m = runner.current_manifest("m1")
    assert (m.get("dv") or {}).get("files"), "vector must ride forward"
    out = runner.read_target("m1")
    assert out.filter("k % 10 = 3").count() == 0, "deleted keys stay dead"
    assert out.filter("k >= 100").count() == 2
    assert out.count() == 40 - 4 + 2


def test_incremental_merge_reinserted_key_refuses(spark, tmp_path):
    runner, spec = _boot(spark, str(tmp_path / "t"), "m2")
    batch = _mk(spark, [(3, "d2", 999), (100, "d1", 1)])
    with pytest.raises(RuntimeError, match="re-inserts key"):
        runner.merge_txn(spec, batch, app_id="a", txn_version=1)
    # nothing committed; ledger untouched
    assert runner.txn_last_version("m2", "a") is None
    assert runner.read_target("m2").count() == 36


def test_merge_into_insert_only_disjoint_allowed_zero_rewrites(
    spark, tmp_path
):
    runner, spec = _boot(spark, str(tmp_path / "t"), "m3")
    src = _mk(spark, [(200, "d1", 5), (201, "d2", 6)])
    res = runner.merge_into(
        spec, src, on="t.k = s.k", not_matched=[("insert", None, None)]
    )
    assert res["files_rewritten"] == 0
    assert res["rows_inserted"] == 2
    m = runner.current_manifest("m3")
    assert (m.get("dv") or {}).get("files"), "vector must ride forward"
    out = runner.read_target("m3")
    assert out.filter("k % 10 = 3").count() == 0
    assert out.count() == 36 + 2


def test_merge_into_insert_only_dead_key_refuses(spark, tmp_path):
    runner, spec = _boot(spark, str(tmp_path / "t"), "m4")
    # key 13 is DV'd: the source row matches only a DEAD row, so the
    # read-through anti-join treats it as new — and the re-used key is
    # then refused rather than inserted-and-killed-at-read
    src = _mk(spark, [(13, "d2", 999)])
    with pytest.raises(RuntimeError, match="re-uses key"):
        runner.merge_into(
            spec, src, on="t.k = s.k", not_matched=[("insert", None, None)]
        )
    assert runner.read_target("m4").count() == 36


def test_merge_into_matched_and_by_source_still_refuse(spark, tmp_path):
    runner, spec = _boot(spark, str(tmp_path / "t"), "m5")
    src = _mk(spark, [(0, "d1", 999)])
    with pytest.raises(RuntimeError, match="pending deletion vector"):
        runner.merge_into(
            spec,
            src,
            on="t.k = s.k",
            matched=[("update", None, {"v": "s.v"})],
        )
    with pytest.raises(RuntimeError, match="pending deletion vector"):
        runner.merge_into(
            spec,
            src,
            on="t.k = s.k",
            not_matched_by_source=[("delete", "t.k > 1000", None)],
        )


def test_row_level_dml_still_refuses(spark, tmp_path):
    runner, spec = _boot(spark, str(tmp_path / "t"), "m6")
    with pytest.raises(RuntimeError, match="pending deletion vector"):
        runner.delete_where(spec, "k = 0")
    with pytest.raises(RuntimeError, match="pending deletion vector"):
        runner.update_where(spec, "k = 0", {"v": "v + 1"})


def test_full_refresh_absorbs_vector(spark, tmp_path):
    runner, spec = _boot(spark, str(tmp_path / "t"), "m7")
    runner.run(spec, SF_DIR, full_refresh=True)
    m = runner.current_manifest("m7")
    assert not (m.get("dv") or {}).get("files")
    # authoritative rebuild: the build fn's rows are the table
    assert runner.read_target("m7").count() == 40


def test_unpartitioned_incremental_rewrite_absorbs_vector(spark, tmp_path):
    """The full-rewrite incremental path reads the target THROUGH the
    vector and commits a fresh file set: the vector is absorbed in the
    same commit (deleted rows stay gone, the manifest drops `dv`)."""
    import dataclasses

    runner, spec = _boot(spark, str(tmp_path / "t"), "m8", partitioned=False)

    def build2(sp, sfd, wm):
        return _mk(sp, [(300, "d1", 1)])

    spec2 = dataclasses.replace(spec, build=build2)
    runner.run(spec2, SF_DIR)
    m = runner.current_manifest("m8")
    assert not (m.get("dv") or {}).get("files"), "full rewrite absorbs"
    out = runner.read_target("m8")
    assert out.filter("k % 10 = 3").count() == 0
    assert out.count() == 36 + 1
