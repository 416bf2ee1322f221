"""Incremental OPTIMIZE (r9): compact only fragmented partitions; the
rest of the manifest rides forward by name."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, day date, v long")


def _boot(spark, root):
    import os

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec

    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    runner = IncrementalRunner(spark, root)
    spec = lambda b: ModelSpec("t", "k", "day", b, partition_by=["day"])  # noqa: E731
    # wave 1: one file per day partition
    runner.run(
        spec(
            lambda sp, sfd, wm: _mk(
                sp, [(i, d1 if i < 20 else d2, i) for i in range(40)]
            ).coalesce(1)
        ),
        "x",
    )
    # wave 2: merge touches ONLY day-2, rewriting it FRAGMENTED (this
    # suite's premise is a partition needing compaction; the r14
    # rebalance-clustered write would land one file, so pin the raw
    # layout for this wave only)
    prev = os.environ.get("MYCARELY_WRITE_REBALANCE")
    os.environ["MYCARELY_WRITE_REBALANCE"] = "0"
    try:
        runner.run(
            spec(
                lambda sp, sfd, wm: _mk(
                    sp, [(100 + i, d2, i) for i in range(20)]
                )
            ),
            "x",
        )
    finally:
        # restore (not pop) so a value pre-set by the outer environment
        # or a sibling test survives (ADVICE r14)
        if prev is None:
            os.environ.pop("MYCARELY_WRITE_REBALANCE", None)
        else:
            os.environ["MYCARELY_WRITE_REBALANCE"] = prev
    return runner, spec(None), d1, d2


def test_optimize_rewrites_only_fragmented_partitions(spark, tmp_path):
    runner, spec, d1, d2 = _boot(spark, str(tmp_path / "t"))
    m0 = runner.current_manifest("t")
    fl_d1 = list(m0["partitions"]["day=2024-01-01"])
    assert len(fl_d1) == 1
    assert len(m0["partitions"]["day=2024-01-02"]) > 1
    n0 = runner.read_target("t").count()

    res = runner.optimize_incremental("t", target_file_mb=128)
    assert res["partitions_rewritten"] == 1
    m1 = runner.current_manifest("t")
    # untouched partition: file list BYTE-IDENTICAL
    assert list(m1["partitions"]["day=2024-01-01"]) == fl_d1
    assert len(m1["partitions"]["day=2024-01-02"]) == 1
    assert runner.read_target("t").count() == n0

    # idempotent: nothing fragmented -> metadata-only no-op
    res2 = runner.optimize_incremental("t", target_file_mb=128)
    assert res2["partitions_rewritten"] == 0
    assert runner.current_manifest("t")["version"] == m1["version"]


def test_optimize_reads_through_pending_vector(spark, tmp_path):
    runner, spec, d1, d2 = _boot(spark, str(tmp_path / "t"))
    res = runner.delete_where(spec, "k % 2 = 1", mode="dv")
    assert res["files_rewritten"] == 0
    n_live = runner.read_target("t").count()

    out = runner.optimize_incremental("t", target_file_mb=128)
    assert out["partitions_rewritten"] == 1
    m = runner.current_manifest("t")
    # the vector rides forward (untouched partitions still need it) and
    # the rewritten partition physically absorbed its share
    assert (m.get("dv") or {}).get("files")
    back = runner.read_target("t")
    assert back.count() == n_live
    assert back.filter("k % 2 = 1").count() == 0
