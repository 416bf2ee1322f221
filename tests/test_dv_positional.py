"""POSITION-based deletion vectors (r10 — VERDICT r9 item 7): the
sidecar records (file, row-ordinal, key) of each deleted PHYSICAL row,
so re-inserting a deleted key is unambiguous and every writer in the
r8 matrix's REFUSAL cells proceeds — with the same read-through
guarantees the key mode gives. The change feed across a positional-DV
commit requires change_data (a key-based snapshot diff cannot represent
delete-then-reinsert) and refuses otherwise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, day string, v long")


def _boot(spark, root, name, **spec_kw):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec

    def build(sp, sfd, wm):
        return _mk(
            sp, [(i, "d1" if i % 2 == 0 else "d2", i * 10) for i in range(40)]
        )

    spec = ModelSpec(name, "k", "k", build, partition_by=["day"], **spec_kw)
    runner = IncrementalRunner(spark, root)
    runner.run(spec, SF_DIR)
    res = runner.delete_where(spec, "k % 10 = 3", mode="dv_pos")
    assert res["files_rewritten"] == 0 and res["rows_matched"] == 4
    assert runner.current_manifest(name)["dv"]["positional"] is True
    return runner, spec


def test_reinserted_key_works_and_other_deletes_survive(spark, tmp_path):
    """The r8 matrix's 'incremental merge re-inserts DV key' refusal
    cell flips to WORKING: the new row lives (new file — no position can
    name it), the other deleted rows stay dead by (file, ordinal)."""
    runner, spec = _boot(spark, str(tmp_path / "t"), "p1")
    r = runner.merge_txn(
        spec, _mk(spark, [(3, "d2", 999), (100, "d1", 1)]),
        app_id="a", txn_version=1,
    )
    assert not r.get("skipped")
    out = runner.read_target("p1")
    assert [tuple(x) for x in out.filter("k = 3").collect()] == [(3, "d2", 999)]
    assert out.filter("k IN (13, 23, 33)").count() == 0
    assert out.count() == 36 + 2
    assert runner.current_manifest("p1")["dv"]["positional"]


def test_merge_into_matched_by_source_and_reused_insert_work(spark, tmp_path):
    """Three more refusal cells flip: matched UPDATE, by-source DELETE,
    and insert-only re-using a deleted key all proceed reading through
    the positional vector."""
    runner, spec = _boot(spark, str(tmp_path / "t"), "p2")
    runner.merge_into(
        spec, _mk(spark, [(0, "d1", 555)]),
        on="t.k = s.k", matched=[("update", None, {"v": "s.v"})],
    )
    out = runner.read_target("p2")
    assert out.filter("k = 0").first()["v"] == 555
    assert out.filter("k % 10 = 3").count() == 0 and out.count() == 36

    # insert-only re-use of a dead key: lands as a NEW live row
    runner.merge_into(
        spec, _mk(spark, [(13, "d2", 777)]),
        on="t.k = s.k", not_matched=[("insert", None, None)],
    )
    out = runner.read_target("p2")
    assert out.filter("k = 13").first()["v"] == 777
    assert out.count() == 37

    # by-source delete sees only LIVE target rows
    runner.merge_into(
        spec, _mk(spark, [(0, "d1", 0)]),
        on="t.k = s.k", not_matched_by_source=[("delete", "t.k = 2", None)],
    )
    out = runner.read_target("p2")
    assert out.filter("k = 2").count() == 0 and out.count() == 36


def test_row_level_dml_works_and_absorbs_its_share(spark, tmp_path):
    runner, spec = _boot(spark, str(tmp_path / "t"), "p3")
    runner.update_where(spec, "k = 0", {"v": "v + 7"})
    out = runner.read_target("p3")
    assert out.filter("k = 0").first()["v"] == 7
    assert out.filter("k % 10 = 3").count() == 0 and out.count() == 36
    runner.delete_where(spec, "k = 2")  # cow delete under pending vector
    out = runner.read_target("p3")
    assert out.count() == 35


def test_backfill_in_range_rebuild_keeps_out_of_range_deletes(
    spark, tmp_path
):
    """Backfill flips too: replaced partitions are authoritative; the
    carried vector keeps out-of-range files' deletes."""
    import datetime as dt

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec

    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)

    def build(sp, sfd, wm):
        return sp.createDataFrame(
            [(i, d1 if i % 2 == 0 else d2, i * 10) for i in range(40)],
            "k long, day date, v long",
        )

    spec = ModelSpec("p4", "k", "k", build, partition_by=["day"])
    runner = IncrementalRunner(spark, str(tmp_path / "t"))
    runner.run(spec, SF_DIR)
    runner.delete_where(spec, "k % 10 = 3", mode="dv_pos")
    runner.backfill(spec, SF_DIR, d1, d1)  # rebuild ONLY the d1 partition
    out = runner.read_target("p4")
    # d1 rebuilt authoritative (k=...even... no even k ends in 3, so d1
    # unaffected by deletes); d2's deletes (3, 13, 23, 33) survive
    assert out.filter("k IN (3, 13, 23, 33)").count() == 0
    assert out.count() == 36


def test_absorb_positional_rewrites_named_files_then_clears(spark, tmp_path):
    runner, spec = _boot(spark, str(tmp_path / "t"), "p5")
    res = runner.absorb_deletion_vectors(spec)
    assert res["rows_deleted"] == 4 and res["files_rewritten"] > 0
    m = runner.current_manifest("p5")
    assert not (m.get("dv") or {}).get("files")
    out = runner.read_target("p5")
    assert out.filter("k % 10 = 3").count() == 0 and out.count() == 36
    # re-running is a no-op
    assert runner.absorb_deletion_vectors(spec)["rows_deleted"] == 0


def test_feed_refuses_without_change_data_and_works_with_it(
    spark, tmp_path, monkeypatch
):
    """Composition rule: positional DV + change feed requires
    change_data. Without it both the batch and streaming feeds refuse;
    with it the delete's change rows serve the feed exactly — including
    the delete-then-reinsert net (an update, which no key-based DV leg
    could represent)."""
    import dataclasses

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        ManifestCDFStreamReader,
    )

    monkeypatch.setattr(IncrementalRunner, "RETAIN_VERSIONS", 10)
    # ---- without change_data: refuse
    runner, spec = _boot(spark, str(tmp_path / "a"), "p6")
    with pytest.raises(RuntimeError, match="requires change_data"):
        runner.table_changes("p6", "k", 1, 2).collect()
    r = ManifestCDFStreamReader(
        {"root": str(tmp_path / "a"), "model": "p6", "key": "k"}
    )
    with pytest.raises(RuntimeError, match="requires change_data"):
        r.partitions({"version": 1}, {"version": 2})

    # ---- with change_data: exact feed incl. delete-then-reinsert
    runner2, spec2 = _boot(
        spark, str(tmp_path / "b"), "p7", change_data=True, cdc_buckets=3
    )
    runner2.merge_txn(
        spec2, _mk(spark, [(3, "d2", 999)]), app_id="a", txn_version=1
    )  # v3: re-insert a key deleted at v2
    ch = {
        (r["k"], r["_change_type"]): r["v"]
        for r in runner2.table_changes("p7", "k", 1, 3).collect()
    }
    # net over (v1, v3]: k=3 deleted (image 30) then re-inserted (999)
    # -> UPDATE; 13/23/33 -> plain deletes
    assert ch[(3, "update_postimage")] == 999
    assert ch[(13, "delete")] == 130
    assert (3, "delete") not in ch
    r2 = ManifestCDFStreamReader(
        {"root": str(tmp_path / "b"), "model": "p7", "key": "k"}
    )
    rows = sorted(
        tuple(b.to_pylist()[i].values())
        for p in r2.partitions({"version": 1}, {"version": 3})
        for b in r2.read(p)
        for i in range(b.num_rows)
    )
    want = sorted(
        tuple(row)
        for row in runner2.table_changes("p7", "k", 1, 3).collect()
    )
    assert rows == want


def test_streaming_fallback_reads_through_unchanged_positional_vector(
    spark, tmp_path, monkeypatch
):
    """A NON-change-data commit after a positional delete (dv unchanged
    across the batch): the rel-diff fallback must read both snapshots
    through the (file, ordinal) map — a reader that ignored positions
    would emit spurious deletes for the rewritten partition's dead
    rows."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        ManifestCDFStreamReader,
    )

    monkeypatch.setattr(IncrementalRunner, "RETAIN_VERSIONS", 10)
    runner, spec = _boot(spark, str(tmp_path / "t"), "p8")  # v1 boot, v2 DV
    runner.merge_txn(
        spec, _mk(spark, [(100, "d1", 1)]), app_id="a", txn_version=1
    )  # v3: plain append into d1 (rewrites d1's partition)
    r = ManifestCDFStreamReader(
        {"root": str(tmp_path / "t"), "model": "p8", "key": "k"}
    )
    rows = sorted(
        tuple(b.to_pylist()[i].values())
        for p in r.partitions({"version": 2}, {"version": 3})
        for b in r.read(p)
        for i in range(b.num_rows)
    )
    assert rows == [(100, "d1", 1, "insert")], rows


def test_rebase_carries_cdc_and_refuses_concurrent_dv_change(
    spark, tmp_path, monkeypatch
):
    """r10 rebase hardening: (a) a partition-scoped writer racing a
    DISJOINT commit keeps its own change-data descriptor through the
    rebase (previously any extra manifest field was silently dropped);
    (b) a deletion-vector commit landing between a writer's read and its
    commit REFUSES — the staged rewrite was produced without that
    vector's deletes, so neither side's vector can be carried blindly."""
    import dataclasses

    import pytest

    from mycarely_saas_dbt_spark import incremental as inc

    def mkspec(name, build, **kw):
        return inc.ModelSpec(
            name, "k", "k", build, partition_by=["day"], **kw
        )

    def rows(lo, hi, day):
        def build(sp, sfd, wm):
            return _mk(sp, [(i, day, i * 10) for i in range(lo, hi)])

        return build

    # --- (a) cdc survives the rebase
    root = str(tmp_path / "a")
    ra, rb = inc.IncrementalRunner(spark, root), inc.IncrementalRunner(
        spark, root
    )
    boot = mkspec("t", rows(0, 4, "d1"), change_data=True, cdc_buckets=2)
    ra.run(boot, SF_DIR)  # v1 bootstrap (d1)
    ra.run(
        dataclasses.replace(boot, build=rows(100, 104, "d2")), SF_DIR
    )  # v2: d2

    orig = rb._commit_manifest
    fired = {}

    def inject(name, manifest, **kw):
        if not fired:
            fired["x"] = 1
            # A lands a DISJOINT d2 merge after B's read, before B's commit
            ra.run(
                dataclasses.replace(boot, build=rows(104, 108, "d2")), SF_DIR
            )
        return orig(name, manifest, **kw)

    monkeypatch.setattr(rb, "_commit_manifest", inject)
    rb.run(dataclasses.replace(boot, build=rows(4, 8, "d1")), SF_DIR)
    cur = rb.current_manifest("t")
    assert cur["version"] == 4  # both landed
    cdc = cur.get("cdc")
    assert cdc and cdc.get("files"), "rebased commit lost its cdc descriptor"
    # B's change rows are intact: the feed reports exactly B's inserts
    ch = rb.table_changes("t", "k", 3, 4).collect()
    assert sorted(r["k"] for r in ch) == [4, 5, 6, 7]
    assert all(r["_change_type"] == "insert" for r in ch)

    # --- (b) concurrent DV change refuses the rebase
    root2 = str(tmp_path / "b")
    rc, rd = inc.IncrementalRunner(spark, root2), inc.IncrementalRunner(
        spark, root2
    )
    boot2 = mkspec("u", rows(0, 8, "d1"))
    rc.run(boot2, SF_DIR)
    rc.run(dataclasses.replace(boot2, build=rows(100, 104, "d2")), SF_DIR)

    orig2 = rd._commit_manifest
    fired2 = {}

    def inject2(name, manifest, **kw):
        if not fired2:
            fired2["x"] = 1
            rc.delete_where(boot2, "k = 0", mode="dv_pos")  # DV lands mid-race
        return orig2(name, manifest, **kw)

    monkeypatch.setattr(rd, "_commit_manifest", inject2)
    with pytest.raises(RuntimeError, match="deletion-vector"):
        rd.run(dataclasses.replace(boot2, build=rows(104, 108, "d2")), SF_DIR)


def test_streaming_fallback_drops_dead_ordinals_in_diffed_rel(
    spark, tmp_path, monkeypatch
):
    """ADVICE r10: the untested leg — a DIFFED rel whose OLD-side files
    actually CARRY tombstoned ordinals. _boot's victims (k%10=3, all
    odd) live in d2; a later non-change-data merge into d2 rewrites that
    partition (new files absorb, old files stay dirty), dv unchanged
    across the batch. The rel diff must read the OLD side through the
    (file, ordinal) map — a reader that skipped it (or whose sidecar
    path normalization failed to match load()'s plain os paths) would
    resurrect the dead rows as spurious deletes."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        ManifestCDFStreamReader,
    )

    monkeypatch.setattr(IncrementalRunner, "RETAIN_VERSIONS", 10)
    runner, spec = _boot(spark, str(tmp_path / "t"), "p9")  # v1 boot, v2 DV
    runner.merge_txn(
        spec, _mk(spark, [(101, "d2", 1)]), app_id="a", txn_version=1
    )  # v3: merge into d2 — the partition holding the dead ordinals
    r = ManifestCDFStreamReader(
        {"root": str(tmp_path / "t"), "model": "p9", "key": "k"}
    )
    rows = sorted(
        tuple(b.to_pylist()[i].values())
        for p in r.partitions({"version": 2}, {"version": 3})
        for b in r.read(p)
        for i in range(b.num_rows)
    )
    assert rows == [(101, "d2", 1, "insert")], rows


def test_strip_scheme_matches_fs_path_on_all_uri_forms():
    """The sidecar 'file' column is Spark's _metadata.file_path verbatim;
    the streaming reader's normalization must agree with the batch
    reader's (IncrementalRunner._fs_path) on every Hadoop path spelling
    — file:/x, file:///x, percent-encoded — or positional tombstones
    silently stop applying on one path (ADVICE r10)."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.sources.pydatasource import _strip_scheme

    for u in [
        "/plain/path/part-0.parquet",
        "file:/root/t/day=d2/part-0.parquet",
        "file:///root/t/day=d2/part-0.parquet",
        "file:/root/t/day=d%202/part-0.parquet",
        "file:///root/t/day=d%202/part-0.parquet",
    ]:
        assert _strip_scheme(u) == IncrementalRunner._fs_path(u), u
