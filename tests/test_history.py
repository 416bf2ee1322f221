"""Commit provenance (``DESCRIBE HISTORY`` analogue) and ``timestampAsOf``
time travel.

Contracts under test:
  * every manifest commit is stamped with a wall-clock ``ts`` and the
    USER-level operation recorded at the public API boundary (thread-local
    scope — shared writers stay parameter-free, compound operations label
    the OUTERMOST intent, like Delta's commitInfo);
  * stamps are FORCE-set at the commit chokepoint, so manifests built by
    copying an older version (RESTORE, CLONE, commit_meta) describe their
    OWN commit, never the one they copied;
  * ``history()`` is metadata-only (version JSONs / segment refs, no data
    file opened) and newest-first;
  * ``read_target(timestamp_as_of=)`` resolves Delta's rule — the latest
    retained commit at or before the timestamp — and refuses timestamps
    that precede every retained commit.
"""

from __future__ import annotations

import shutil
import time

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture()
def target_root(tmp_path):
    p = str(tmp_path / "target")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _spec(name="hist_t"):
    from mycarely_saas_dbt_spark.incremental import ModelSpec

    def build(sp, sfd, wm):
        rows = sp.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    return ModelSpec(name, "k", "k", build)


def _runner(spark, root, retain=10):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    r = IncrementalRunner(spark, root)
    r.RETAIN_VERSIONS = retain  # keep full history for the assertions
    return r


def test_history_records_ops_newest_first(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec()
    assert r.history("hist_t") == []  # no table yet
    r.run(spec, SF_DIR)
    r.update_where(spec, "k % 10 = 3", {"v": "v + 100"})
    r.delete_where(spec, "k % 9 = 4")
    h = r.history("hist_t")
    assert [rec["version"] for rec in h] == [3, 2, 1]
    assert [rec["op"] for rec in h] == ["DELETE", "UPDATE", "WRITE"]
    ts = [rec["ts"] for rec in h]
    assert all(t is not None for t in ts)
    assert ts[0] >= ts[1] >= ts[2]
    assert all(rec["n_files"] > 0 for rec in h)
    assert not any(rec["has_dv"] for rec in h)


def test_timestamp_as_of_resolves_delta_rule(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec()
    r.run(spec, SF_DIR)
    t1 = time.time()
    time.sleep(0.02)  # commits stamp sub-ms apart; separate them
    r.delete_where(spec, "k >= 50")
    # at-or-before t1 -> v1 snapshot, byte-identical to version=1
    old = r.read_target("hist_t", timestamp_as_of=t1)
    assert old.count() == 100
    v1 = r.read_target("hist_t", version=1)
    assert sorted(old.collect()) == sorted(v1.collect())
    # far future clamps to the current snapshot
    now = r.read_target("hist_t", timestamp_as_of=time.time() + 3600)
    assert now.count() == 50
    # before the first retained commit: refuse, never serve a wrong snapshot
    with pytest.raises(RuntimeError, match="at or before timestamp"):
        r.read_target("hist_t", timestamp_as_of=t1 - 3600)
    with pytest.raises(ValueError, match="not both"):
        r.read_target("hist_t", version=1, timestamp_as_of=t1)


def test_copied_manifests_stamp_their_own_commit(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec()
    r.run(spec, SF_DIR)
    r.delete_where(spec, "k >= 80")
    before = time.time()
    r.restore("hist_t", 1)
    h = r.history("hist_t")
    assert h[0]["op"] == "RESTORE"
    assert h[0]["ts"] >= before  # fresh stamp, not v1's copied one
    r.clone_shallow("hist_t", "hist_clone")
    hc = r.history("hist_clone")
    assert [rec["op"] for rec in hc] == ["CLONE"]
    # metadata-only commit labels itself too
    r.commit_meta("hist_t", {**(r.current_manifest("hist_t")["meta"] or {})}
                  if r.current_manifest("hist_t").get("meta") else {})
    assert r.history("hist_t")[0]["op"] == "SET TBLPROPERTIES"


def test_compound_op_labels_outermost_intent(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec()
    r.run(spec, SF_DIR)
    r.compact("hist_t")  # internally commits through shared writers
    assert r.history("hist_t")[0]["op"] == "OPTIMIZE"
    r.merge_txn(
        spec,
        spark.range(3).select(
            F.col("id").alias("k"), F.lit(999).alias("v")
        ),
        app_id="hist_app",
        txn_version=1,
    )
    h = r.history("hist_t")
    assert h[0]["op"] == "STREAMING UPDATE"
    assert h[0]["txn"] == {"hist_app": 1}


# ---------------------------------------------------------------------------
# r12 — AGE-based retention (Delta's retentionDuration shape): commits
# younger than RETENTION_SECONDS are retained beyond the RETAIN_VERSIONS
# count floor, from the provenance ts alone (metadata-only decision).
# ---------------------------------------------------------------------------


def test_age_retention_keeps_young_versions_beyond_count(spark, target_root):
    r = _runner(spark, target_root, retain=1)
    r.RETENTION_SECONDS = 3600.0
    r.VACUUM_GRACE_SECONDS = 0.0
    spec = _spec()
    r.run(spec, SF_DIR)                                    # v1
    r.update_where(spec, "k % 10 = 3", {"v": "v + 100"})   # v2
    r.update_where(spec, "k % 10 = 4", {"v": "v + 7"})     # v3
    r.delete_where(spec, "k = 99")                         # v4
    # with count-only retain=1 only v4 would survive; the age window
    # keeps every commit: full history + deep time travel both work
    assert [h["version"] for h in r.history("hist_t")] == [4, 3, 2, 1]
    assert r.read_target("hist_t", version=1).count() == 100
    assert r.read_target("hist_t", version=3).count() == 100
    assert r.read_target("hist_t").count() == 99
    # timestampAsOf reaches across the whole retained age window
    t1 = r.history("hist_t")[-1]["ts"]
    assert r.version_at_timestamp("hist_t", t1) == 1


def test_age_retention_expired_falls_back_to_count_floor(spark, target_root):
    r = _runner(spark, target_root, retain=2)
    r.RETENTION_SECONDS = 0.0  # every commit is immediately "too old"
    r.VACUUM_GRACE_SECONDS = 0.0
    spec = _spec()
    r.run(spec, SF_DIR)                                    # v1
    r.update_where(spec, "k % 10 = 3", {"v": "v + 100"})   # v2
    r.update_where(spec, "k % 10 = 4", {"v": "v + 7"})     # v3
    # the count floor is unconditional: last 2 versions stay readable
    assert [h["version"] for h in r.history("hist_t")] == [3, 2]
    assert r.read_target("hist_t", version=2).count() == 100
    with pytest.raises(RuntimeError, match="no committed version 1"):
        r.read_target("hist_t", version=1)


def test_age_retention_covers_streaming_lag_by_config(spark, target_root):
    """A CDF consumer that lags several commits catches up through ONE
    availableNow-style range because age retention (not a hand-bumped
    RETAIN_VERSIONS) keeps the intermediate versions' change files."""
    from mycarely_saas_dbt_spark.incremental import ModelSpec

    def build(sp, sfd, wm):
        rows = sp.range(50).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    spec = ModelSpec("lag_t", "k", "k", build, change_data=True)
    r = _runner(spark, target_root, retain=2)
    r.RETENTION_SECONDS = 3600.0
    r.VACUUM_GRACE_SECONDS = 0.0
    r.run(spec, SF_DIR)                                    # v1
    r.update_where(spec, "k % 10 = 3", {"v": "v + 100"})   # v2
    r.update_where(spec, "k % 10 = 3", {"v": "v + 1"})     # v3
    r.delete_where(spec, "k = 7")                          # v4
    ch = r.table_changes("lag_t", "k", 1, preimages=True)
    got = sorted((x["k"], x["v"], x["_change_type"]) for x in ch.collect())
    want = sorted(
        [(k, k % 7, "update_preimage") for k in range(3, 50, 10)]
        + [(k, k % 7 + 101, "update_postimage") for k in range(3, 50, 10)]
        + [(7, 0, "delete")]
    )
    assert got == want


def test_table_changes_timestamp_bounds(spark, target_root):
    """Delta's batch-CDF startingTimestamp/endingTimestamp: starting
    anchors at the latest retained commit STRICTLY BEFORE the stamp (so
    commits at-or-after it are all included), ending resolves
    at-or-before; both from provenance metadata alone."""
    import time as _time

    from mycarely_saas_dbt_spark.incremental import ModelSpec

    def build(sp, sfd, wm):
        rows = sp.range(40).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    spec = ModelSpec("ts_cdf", "k", "k", build, change_data=True)
    r = _runner(spark, target_root)
    r.run(spec, SF_DIR)                                    # v1
    _time.sleep(0.02)
    t_mid = time.time()
    _time.sleep(0.02)
    r.update_where(spec, "k % 10 = 3", {"v": "v + 100"})   # v2
    _time.sleep(0.02)
    t_after_v2 = time.time()
    _time.sleep(0.02)
    r.delete_where(spec, "k = 8")                          # v3
    # starting at t_mid anchors at v1 -> v2+v3 changes included
    got = sorted(
        (x["k"], x["v"], x["_change_type"])
        for x in r.table_changes(
            "ts_cdf", "k", starting_timestamp=t_mid
        ).collect()
    )
    want = sorted(
        [(k, k % 7 + 100, "update_postimage") for k in range(3, 40, 10)]
        + [(8, 1, "delete")]
    )
    assert got == want
    # ending at t_after_v2 stops at v2 — the delete is out
    got2 = sorted(
        (x["k"], x["_change_type"])
        for x in r.table_changes(
            "ts_cdf", "k",
            starting_timestamp=t_mid, ending_timestamp=t_after_v2,
        ).collect()
    )
    assert got2 == sorted((k, "update_postimage") for k in range(3, 40, 10))
    # a timestamp at-or-before the oldest retained commit cannot anchor
    with pytest.raises(RuntimeError, match="cannot anchor"):
        r.table_changes("ts_cdf", "k", starting_timestamp=0.0)
    with pytest.raises(ValueError, match="not both"):
        r.table_changes("ts_cdf", "k", 1, starting_timestamp=t_mid)


def test_table_changes_timestamp_exceeds_latest_raises(spark, target_root):
    """ADVICE r12: a startingTimestamp NEWER than every retained commit
    must RAISE (Delta's timestampGreaterThanLatestCommit), not return a
    silently empty feed — an empty result would read as "no changes"
    when the truth is "you asked about the future"."""
    from mycarely_saas_dbt_spark.incremental import ModelSpec

    def build(sp, sfd, wm):
        rows = sp.range(10).select(
            F.col("id").alias("k"), (F.col("id") % 3).alias("v")
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    spec = ModelSpec("ts_fut", "k", "k", build, change_data=True)
    r = _runner(spark, target_root)
    r.run(spec, SF_DIR)                                    # v1
    r.update_where(spec, "k = 3", {"v": "v + 100"})        # v2
    with pytest.raises(RuntimeError, match="newer than the latest commit"):
        r.table_changes("ts_fut", "k", starting_timestamp=time.time() + 3600)
    # the at-boundary refusal names the remedy: widen retention
    with pytest.raises(RuntimeError, match="widen retention"):
        r.table_changes("ts_fut", "k", starting_timestamp=0.0)


def test_restore_to_timestamp(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec()
    r.run(spec, SF_DIR)                                    # v1
    time.sleep(0.02)
    t1 = time.time()
    time.sleep(0.02)
    r.update_where(spec, "k % 10 = 3", {"v": "v + 100"})   # v2
    r.restore("hist_t", timestamp_as_of=t1)                # back to v1
    assert r.read_target("hist_t").filter(F.col("v") >= 100).count() == 0
    assert r.history("hist_t")[0]["op"] == "RESTORE"
    with pytest.raises(ValueError, match="not both"):
        r.restore("hist_t", 1, timestamp_as_of=t1)
