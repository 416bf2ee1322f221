"""Manifest CHECKPOINT segments (the Delta parquet-checkpoint / Iceberg
manifest-file move): above MYCARELY_MANIFEST_INLINE_MAX total add-file
entries the version JSON externalizes each partition rel's (files, stats)
into a content-addressed parquet segment and stores only refs.

What 100 TB actually requires, proven at toy scale here:
  * a commit touching k of N partitions writes k new segments and carries
    the other N-k REFS forward verbatim (O(batch) commit, not O(table));
  * a partition-pruned read hydrates ONLY surviving rels' segments;
  * time travel / table_changes / RESTORE / DML / vacuum all keep working,
    and RESTORE stays metadata-only (zero new segments);
  * unreferenced segments are garbage-collected with the version files
    that referenced them.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

D0 = dt.date(2024, 1, 1)


@pytest.fixture()
def target_root(tmp_path):
    p = str(tmp_path / "target")
    yield p
    shutil.rmtree(p, ignore_errors=True)


@pytest.fixture()
def seg_env(monkeypatch):
    """Force checkpointing from the first commit (threshold 0)."""
    monkeypatch.setenv("MYCARELY_MANIFEST_INLINE_MAX", "0")


def _spec(build):
    from mycarely_saas_dbt_spark.incremental import ModelSpec

    return ModelSpec("t", "id", "day", build, partition_by=["day"])


def _b_full(sp, sfd, wm):
    # 200 rows over 8 day-partitions; id -> day is deterministic (id % 8),
    # so unique_key embeds the partition column (the pruned-merge contract)
    return sp.range(200).select(
        F.col("id"),
        F.date_add(F.lit(D0), (F.col("id") % 8).cast("int")).alias("day"),
        (F.col("id") * 2).alias("n"),
    )


def _b_one_day(sp, sfd, wm):
    # 40 rows, ALL in the day=2024-01-04 partition (id % 8 == 3):
    # 25 overwrite batch-1 ids, 15 are new
    return sp.range(40).select(
        (F.col("id") * 8 + 3).alias("id"),
        F.lit(dt.date(2024, 1, 4)).alias("day"),
        (F.lit(1000) + F.col("id")).alias("n"),
    )


def _raw_json(runner, name, version):
    p = os.path.join(runner._manifest_dir(name), f"v{version:06d}.json")
    with open(p) as fh:
        return json.load(fh)


def _segdir(runner, name):
    return os.path.join(runner._manifest_dir(name), "segments")


def _run_two_batches(spark, target_root):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = IncrementalRunner(spark, target_root)
    runner.run(_spec(_b_full), SF_DIR)
    s2 = runner.run(_spec(_b_one_day), SF_DIR)
    assert s2["mode"] == "incremental-pruned"
    return runner


def test_commit_is_o_touched_not_o_table(spark, target_root, seg_env):
    """v2 (one partition rewritten) reuses 7 of v1's 8 segment refs
    verbatim, writes exactly one new live segment, and its version JSON
    inlines NO file lists."""
    runner = _run_two_batches(spark, target_root)

    j1, j2 = _raw_json(runner, "t", 1), _raw_json(runner, "t", 2)
    for j in (j1, j2):
        assert j["partitions"] == {}  # nothing inline
        assert len(j["segments"]) == 8
    touched = "day=2024-01-04"
    for rel in j1["segments"]:
        if rel == touched:
            assert j1["segments"][rel]["f"] != j2["segments"][rel]["f"]
        else:
            # ref equality == content equality: untouched rels rode forward
            assert j1["segments"][rel] == j2["segments"][rel]
    live2 = {r["f"] for r in j2["segments"].values()}
    new_in_v2 = live2 - {r["f"] for r in j1["segments"].values()}
    assert len(new_in_v2) == 1  # exactly the rewritten partition's segment


def test_checkpointed_merge_result_is_correct(spark, target_root, seg_env):
    """Same upsert semantics as the inline protocol: batch-2 rows replace
    their ids, other partitions untouched."""
    runner = _run_two_batches(spark, target_root)
    out = runner.read_target("t").collect()
    by_id = {r["id"]: r for r in out}
    assert len(by_id) == 200 - 25 + 40  # 25 of b1's day-3 ids overwritten
    assert by_id[3]["n"] == 1000  # overwritten (id = 0*8+3)
    assert by_id[3 + 8 * 30]["n"] == 1030  # new id past batch 1
    assert by_id[4]["n"] == 8  # untouched partition keeps batch-1 value
    # schema/dtypes survive the checkpoint round-trip
    assert dict(runner.read_target("t").dtypes)["day"] == "date"


def test_pruned_read_hydrates_only_surviving_segments(
    spark, target_root, seg_env, monkeypatch
):
    """A day-bounded read must LOAD only the matching rels' segments —
    partition-value pruning happens on the rel string before any segment
    parquet is opened."""
    from mycarely_saas_dbt_spark import incremental as inc

    runner = _run_two_batches(spark, target_root)
    manifest = runner.current_manifest("t")

    calls = []
    real = inc._read_segment.__wrapped__  # bypass the lru cache

    def counting(path):
        calls.append(os.path.basename(path))
        return real(path)

    monkeypatch.setattr(inc, "_read_segment", counting)
    day = dt.date(2024, 1, 4)
    files = runner.resolved_files(
        "t", manifest=manifest, prune={"day": (day, day)}
    )
    assert files and all("day=2024-01-04" in f for f in files)
    # one rel survives; its parts + stats hydrations hit the SAME segment
    assert len(set(calls)) == 1, calls


def test_time_travel_and_table_changes(spark, target_root, seg_env):
    runner = _run_two_batches(spark, target_root)
    v1 = runner.read_target("t", version=1)
    assert v1.count() == 200
    ch = runner.table_changes("t", "id", 1, 2)
    kinds = {r["_change_type"] for r in ch.collect()}
    assert kinds <= {"insert", "update_postimage", "delete"}
    # only the rewritten partition's rows appear in the feed
    assert [r["day"] for r in ch.select("day").distinct().collect()] == [
        dt.date(2024, 1, 4)
    ]
    assert ch.filter("_change_type = 'insert'").count() == 15


def test_restore_is_metadata_only(spark, target_root, seg_env):
    """RESTORE to v1 commits v3 whose segment refs ARE v1's — no new
    segment file is written however large the table."""
    runner = _run_two_batches(spark, target_root)
    j1 = _raw_json(runner, "t", 1)  # before restore: vacuum reclaims v1's JSON
    before = set(os.listdir(_segdir(runner, "t")))
    runner.restore("t", 1)
    assert set(os.listdir(_segdir(runner, "t"))) == before
    assert _raw_json(runner, "t", 3)["segments"] == j1["segments"]
    assert runner.read_target("t").count() == 200


def test_dml_on_checkpointed_table(spark, target_root, seg_env):
    """Row-level DELETE hydrates/rewrites only the hit partition; the
    other rels' refs ride forward."""
    runner = _run_two_batches(spark, target_root)
    j2 = _raw_json(runner, "t", 2)
    res = runner.delete_where(
        _spec(_b_full), "day = DATE '2024-01-02'",
        prune={"day": (dt.date(2024, 1, 2), dt.date(2024, 1, 2))},
    )
    assert res["rows_matched"] == 25
    j3 = _raw_json(runner, "t", 3)
    assert "day=2024-01-02" not in j3["segments"]  # partition emptied
    for rel in j3["segments"]:
        assert j3["segments"][rel] == j2["segments"][rel]
    assert runner.read_target("t").filter("day = '2024-01-02'").count() == 0


def test_vacuum_gcs_dead_segments(spark, target_root, seg_env):
    """Versions past the retention floor lose their JSONs AND their
    now-unreferenced segments; every ref in surviving JSONs stays on
    disk."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = _run_two_batches(spark, target_root)
    runner.VACUUM_GRACE_SECONDS = 0.0
    # two more commits push v1 past RETAIN_VERSIONS=2
    runner.run(_spec(_b_one_day), SF_DIR)
    runner.run(_spec(_b_one_day), SF_DIR)
    assert runner.list_versions("t") == [3, 4]
    on_disk = set(os.listdir(_segdir(runner, "t")))
    referenced = {
        r["f"]
        for v in (3, 4)
        for r in _raw_json(runner, "t", v)["segments"].values()
    }
    assert referenced <= on_disk
    assert on_disk == referenced  # nothing dead survives


def test_inline_format_unchanged_below_threshold(spark, target_root):
    """Without the env override, small tables keep the exact inline JSON
    format (backward compatibility with every pre-checkpoint manifest)."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = IncrementalRunner(spark, target_root)
    runner.run(_spec(_b_full), SF_DIR)
    j = _raw_json(runner, "t", 1)
    assert "segments" not in j
    assert len(j["partitions"]) == 8
    assert all(isinstance(fl, list) for fl in j["partitions"].values())


def test_inline_to_checkpoint_transition(spark, target_root, monkeypatch):
    """A table that GROWS past the threshold flips to segments on the next
    commit and stays readable across the boundary (the one O(table)
    checkpointing commit, exactly like Delta's periodic checkpoint)."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = IncrementalRunner(spark, target_root)
    runner.run(_spec(_b_full), SF_DIR)  # inline
    assert "segments" not in _raw_json(runner, "t", 1)
    monkeypatch.setenv("MYCARELY_MANIFEST_INLINE_MAX", "0")
    runner.run(_spec(_b_one_day), SF_DIR)  # checkpointed
    j2 = _raw_json(runner, "t", 2)
    assert len(j2["segments"]) == 8 and j2["partitions"] == {}
    assert runner.read_target("t").count() == 215  # 200 - 25 replaced + 40
    # and v1 (inline) still time-travels
    assert runner.read_target("t", version=1).count() == 200


def test_segment_dedupe_hit_refreshes_mtime(tmp_path):
    """ADVICE r7 (medium): a content-addressed dedupe hit must refresh the
    segment's mtime, or a commit about to reference an OLD unreferenced
    segment races the vacuum's mtime grace and commits a dangling ref."""
    import os
    import time

    from mycarely_saas_dbt_spark.incremental import _write_segment

    segdir = str(tmp_path)
    files = [f"part-{i}.parquet" for i in range(4)]
    stats = [None] * 4
    ref1 = _write_segment(segdir, files, stats)
    path = os.path.join(segdir, ref1["f"])
    os.utime(path, (1_000_000, 1_000_000))  # age it far past any grace
    ref2 = _write_segment(segdir, files, stats)
    assert ref2 == ref1
    assert os.path.getmtime(path) > time.time() - 60
