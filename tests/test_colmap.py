"""Column mapping (``ALTER TABLE ... RENAME COLUMN`` without rewriting
data) — Delta's columnMapping in name mode over the manifest protocol.

Contracts under test:
  * rename is a metadata-only commit: every data file carries forward BY
    NAME; readers translate at the one scan chokepoint (physical schema
    in, logical aliases out);
  * stats stay keyed by physical names and pruning translates bounds, so
    file skipping on the renamed column keeps working;
  * partition/file-scoped writers REFUSE while the mapping pends (they
    would mix physical names across files); compact() absorbs it and
    unfreezes them; renaming back to the physical name drops the map;
  * shallow clones carry the mapping (same physical files); time travel
    to a pre-rename version serves the old logical schema;
  * CHANGE-DATA tables rename freely (r12): both feed paths compose the
    rename chain from commit provenance and net era-named change files
    onto the range-end schema; dropped-era bytes are never read (the
    resurrection fence at the feed level); only the snapshot-diff
    fallback keeps the rename refusals (it genuinely cannot represent
    one — Delta's name-mode restriction).
"""

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


def _spec(name="cm_t", partition_by=None, **kw):
    from mycarely_saas_dbt_spark.incremental import ModelSpec

    def build(sp, sfd, wm):
        rows = sp.range(100).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("v"),
            (F.col("id") % 4).alias("p"),
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    return ModelSpec(
        name, "k", "k", build, partition_by=partition_by or [], **kw
    )


def _runner(spark, root):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    r = IncrementalRunner(spark, root)
    r.RETAIN_VERSIONS = 10
    return r


def test_rename_is_metadata_only_and_reads_translate(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec()
    r.run(spec, SF_DIR)
    m1 = r.current_manifest("cm_t")
    r.rename_column("cm_t", "v", "val")
    m2 = r.current_manifest("cm_t")
    # zero data movement: identical file entries, BY NAME
    assert dict(m2["partitions"]) == dict(m1["partitions"])
    assert [n for n, _ in m2["dtypes"]] == ["k", "val", "p"]
    assert m2["colmap"] == {"val": "v"}
    assert r.history("cm_t")[0]["op"] == "RENAME COLUMN"
    df = r.read_target("cm_t")
    assert df.columns == ["k", "val", "p"]
    assert df.filter(F.col("val") == 3).count() == 14  # 3,10,...,94
    # time travel to the pre-rename version serves the OLD logical schema
    assert r.read_target("cm_t", version=1).columns == ["k", "v", "p"]


def test_prune_translates_bounds_to_physical_stats(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec()

    def build(sp, sfd, wm):
        # several files with disjoint k ranges so stats pruning bites
        return (
            sp.range(100)
            .select(
                F.col("id").alias("k"), (F.col("id") % 7).alias("v"),
                (F.col("id") % 4).alias("p"),
            )
            .repartitionByRange(4, "k")
            .sortWithinPartitions("k")
        )

    import dataclasses

    r.run(dataclasses.replace(spec, build=build), SF_DIR)
    all_files = r.resolved_files("cm_t")
    pruned_before = r.resolved_files("cm_t", prune={"k": (0, 10)})
    assert len(pruned_before) < len(all_files)
    r.rename_column("cm_t", "k", "key")
    pruned_after = r.resolved_files("cm_t", prune={"key": (0, 10)})
    assert sorted(pruned_after) == sorted(pruned_before)


def test_writers_refuse_then_compact_absorbs(spark, target_root):
    import dataclasses

    r = _runner(spark, target_root)
    spec = _spec(partition_by=["p"])
    r.run(spec, SF_DIR)
    r.rename_column("cm_t", "v", "val")
    with pytest.raises(RuntimeError, match="column mapping is pending"):
        r.update_where(spec, "k % 10 = 3", {"val": "val + 100"})
    with pytest.raises(RuntimeError, match="column mapping is pending"):
        r.delete_where(spec, "k % 9 = 4")
    with pytest.raises(RuntimeError, match="column mapping is pending"):
        r.run(spec, SF_DIR)  # partition-scoped incremental merge
    with pytest.raises(RuntimeError, match="column mapping is pending"):
        r.delete_where(spec, "k % 9 = 4", mode="dv")
    r.compact("cm_t")  # full rewrite materializes logical names
    m = r.current_manifest("cm_t")
    assert "colmap" not in m
    assert r.history("cm_t")[0]["op"] == "OPTIMIZE"
    # unfrozen: DML works against the renamed column
    r.update_where(spec, "k % 10 = 3", {"val": "val + 100"})
    assert (
        r.read_target("cm_t").filter(F.col("val") >= 100).count() == 10
    )


def test_rename_back_drops_mapping(spark, target_root):
    r = _runner(spark, target_root)
    r.run(_spec(), SF_DIR)
    r.rename_column("cm_t", "v", "val")
    r.rename_column("cm_t", "val", "v")
    m = r.current_manifest("cm_t")
    assert "colmap" not in m
    assert [n for n, _ in m["dtypes"]] == ["k", "v", "p"]
    # unmapped again: writers are free without any absorb
    r.update_where(_spec(), "k = 1", {"v": "v + 1"})


def test_clone_carries_mapping(spark, target_root):
    r = _runner(spark, target_root)
    r.run(_spec(), SF_DIR)
    r.rename_column("cm_t", "v", "val")
    r.clone_shallow("cm_t", "cm_clone")
    df = r.read_target("cm_clone")
    assert df.columns == ["k", "val", "p"]
    assert df.count() == 100


def test_rename_refusals(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec(partition_by=["p"])
    r.run(spec, SF_DIR)
    with pytest.raises(RuntimeError, match="partition column"):
        r.rename_column("cm_t", "p", "bucket")
    with pytest.raises(RuntimeError, match="unknown column"):
        r.rename_column("cm_t", "nope", "x")
    with pytest.raises(RuntimeError, match="already exists"):
        r.rename_column("cm_t", "v", "k")
    # r12: change-data tables rename freely — the feed readers compose
    # the rename chain from provenance; the rename commit itself stamps
    # an EMPTY change descriptor (it changes no row), keeping the
    # change-file fast path available across it
    cd = _spec(name="cm_cd", change_data=True)
    r.run(cd, SF_DIR)
    r.delete_where(cd, "k = 5")
    r.rename_column("cm_cd", "v", "val")
    m = r.current_manifest("cm_cd")
    assert m["colmap"] == {"val": "v"}
    assert m["cdc"] == {"key": "k", "buckets": 256, "files": []}


def test_feeds_and_streams_refuse_over_mapping(spark, target_root):
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        ManifestCDFStreamReader,
    )

    r = _runner(spark, target_root)
    r.run(_spec(), SF_DIR)
    r.rename_column("cm_t", "v", "val")
    with pytest.raises(RuntimeError, match="column-mapped table"):
        r.table_changes("cm_t", "k", 1)
    with pytest.raises(RuntimeError, match="column-mapped table"):
        ManifestCDFStreamReader(
            {"root": target_root, "model": "cm_t", "key": "k"}
        )


def test_drop_column_is_metadata_only_and_writers_stay_free(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec(partition_by=["p"])
    r.run(spec, SF_DIR)
    m1 = r.current_manifest("cm_t")
    r.drop_column("cm_t", "v")
    m2 = r.current_manifest("cm_t")
    assert dict(m2["partitions"]) == dict(m1["partitions"])  # zero rewrite
    assert [n for n, _ in m2["dtypes"]] == ["k", "p"]
    assert m2["dropped"] == ["v"]
    assert r.history("cm_t")[0]["op"] == "DROP COLUMN"
    df = r.read_target("cm_t")
    assert df.columns == ["k", "p"]
    assert df.count() == 100
    # writers stay FREE after a drop (unlike rename): a row-level DELETE
    # works, and the dropped list rides the partial rewrite forward
    r.delete_where(spec, "k % 9 = 4")  # 11 keys: 4, 13, ..., 94
    assert r.current_manifest("cm_t")["dropped"] == ["v"]
    assert r.read_target("cm_t").count() == 89


def test_drop_then_readd_refuses_until_rewrite(spark, target_root):
    import dataclasses

    r = _runner(spark, target_root)
    spec = _spec(partition_by=["p"])
    r.run(spec, SF_DIR)
    r.drop_column("cm_t", "v")
    # the model still emits `v`: the incremental merge must refuse —
    # old files hold stale bytes under that name
    with pytest.raises(RuntimeError, match="resurrect"):
        r.run(spec, SF_DIR)

    def build_no_v(sp, sfd, wm):
        rows = sp.range(150).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("p")
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    slim = dataclasses.replace(spec, build=build_no_v)
    r.run(slim, SF_DIR)  # v-free merge is fine
    assert r.read_target("cm_t").count() == 150
    r.compact("cm_t")  # full rewrite purges the stale bytes
    assert "dropped" not in r.current_manifest("cm_t")

    def build_v2(sp, sfd, wm):
        rows = sp.range(200).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("p"),
            F.lit(9).alias("v"),
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    readd = dataclasses.replace(
        spec, build=build_v2, on_schema_change="append_new_columns"
    )
    r.run(readd, SF_DIR)  # re-add is legal AFTER the rewrite
    df = r.read_target("cm_t")
    # pre-re-add rows NULL-fill v; no stale bytes resurrect
    assert df.filter(F.col("v").isNull()).count() == 150
    assert df.filter(F.col("v") == 9).count() == 50


def test_drop_refusals_and_renamed_drop(spark, target_root):
    r = _runner(spark, target_root)
    spec = _spec(partition_by=["p"])
    r.run(spec, SF_DIR)
    with pytest.raises(RuntimeError, match="partition column"):
        r.drop_column("cm_t", "p")
    with pytest.raises(RuntimeError, match="unknown column"):
        r.drop_column("cm_t", "nope")
    # dropping a RENAMED column records the PHYSICAL name and retires
    # the mapping entry with it
    r.rename_column("cm_t", "v", "val")
    r.drop_column("cm_t", "val")
    m = r.current_manifest("cm_t")
    assert m["dropped"] == ["v"]
    assert "colmap" not in m
    assert r.read_target("cm_t").columns == ["k", "p"]


def test_clone_carries_dropped_fence(spark, target_root):
    r = _runner(spark, target_root)
    r.run(_spec(), SF_DIR)
    r.drop_column("cm_t", "v")
    r.clone_shallow("cm_t", "cm_clone")
    m = r.current_manifest("cm_clone")
    assert m["dropped"] == ["v"]  # same physical files, same hazard
    assert r.read_target("cm_clone").columns == ["k", "p"]


def test_unpartitioned_merge_absorbs_mapping(spark, target_root):
    """run() on an UNPARTITIONED column-mapped table is allowed: the
    unpartitioned merge dispatches to the full-rewrite writer, whose
    fresh manifest absorbs the mapping — all files re-land under logical
    names. (The partition-scoped merge still refuses.)"""
    import dataclasses

    r = _runner(spark, target_root)
    spec = _spec()  # unpartitioned
    r.run(spec, SF_DIR)
    r.rename_column("cm_t", "v", "val")

    def build2(sp, sfd, wm):
        rows = sp.range(150).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("val"),
            (F.col("id") % 4).alias("p"),
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    r.run(dataclasses.replace(spec, build=build2), SF_DIR)
    m = r.current_manifest("cm_t")
    assert "colmap" not in m  # absorbed by the full rewrite
    df = r.read_target("cm_t")
    assert df.columns == ["k", "val", "p"]
    assert df.count() == 150
    # and DML is free again without any explicit compact
    r.update_where(dataclasses.replace(spec, build=build2), "k = 1",
                   {"val": "val + 100"})


def test_feed_refuses_range_crossing_a_rename(spark, target_root):
    """A rename INSIDE the feed range with clean endpoints (rename then
    absorb) must still refuse: pre-rename snapshots would diff under the
    new logical dtypes and fabricate changes."""
    r = _runner(spark, target_root)
    spec = _spec()
    r.run(spec, SF_DIR)           # v1 (physical names)
    r.rename_column("cm_t", "v", "val")  # v2 (colmap)
    r.compact("cm_t")             # v3 (absorbed — endpoint clean)
    with pytest.raises(RuntimeError, match="crosses a column rename"):
        r.table_changes("cm_t", "k", 1)
    # a post-rename range is fine
    assert r.table_changes("cm_t", "k", 3) is not None


def test_add_column_is_metadata_only(spark, target_root):
    import dataclasses

    r = _runner(spark, target_root)
    spec = _spec(partition_by=["p"])
    r.run(spec, SF_DIR)
    m1 = r.current_manifest("cm_t")
    r.add_column("cm_t", "w", "bigint")
    m2 = r.current_manifest("cm_t")
    assert dict(m2["partitions"]) == dict(m1["partitions"])  # zero rewrite
    assert [n for n, _ in m2["dtypes"]] == ["k", "v", "p", "w"]
    assert r.history("cm_t")[0]["op"] == "ADD COLUMN"
    df = r.read_target("cm_t")
    assert df.columns == ["k", "v", "p", "w"]
    assert df.filter(F.col("w").isNull()).count() == 100  # NULL-filled
    with pytest.raises(RuntimeError, match="already exists"):
        r.add_column("cm_t", "v", "bigint")
    # the dropped fence blocks metadata re-adds too
    r.drop_column("cm_t", "v")
    with pytest.raises(RuntimeError, match="resurrect"):
        r.add_column("cm_t", "v", "bigint")

    # a later merge whose batch carries w lands real values; history
    # rows stay NULL — the schema-evolution read contract
    def build_w(sp, sfd, wm):
        rows = sp.range(120).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("p"),
            (F.col("id") * 2).alias("w"),
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    r.run(dataclasses.replace(spec, build=build_w), SF_DIR)
    df = r.read_target("cm_t")
    assert df.filter(F.col("w") == 238).count() == 1  # k=119 inserted
    assert df.filter(F.col("w").isNull()).count() == 100


def test_stream_bootstrap_allowed_after_absorbed_rename(spark, target_root):
    """A FRESH stream on a renamed-then-absorbed table must NOT refuse:
    the bootstrap batch plans snapshot-insert legs from the END manifest
    only, so the interior rename cannot misalign anything. A DIFF range
    crossing the rename still refuses."""
    import pytest

    from mycarely_saas_dbt_spark.sources.pydatasource import (
        ManifestCDFStreamReader,
    )

    r = _runner(spark, target_root)
    r.run(_spec(), SF_DIR)               # v1
    r.rename_column("cm_t", "v", "val")  # v2
    r.compact("cm_t")                    # v3 absorbed
    rd = ManifestCDFStreamReader(
        {"root": target_root, "model": "cm_t", "key": "k"}
    )
    legs = rd.partitions({"version": 0}, {"version": 3})  # bootstrap: OK
    assert legs
    with pytest.raises(RuntimeError, match="crossed a column rename"):
        rd.partitions({"version": 1}, {"version": 3})  # diff range: refuse


def test_cdf_reader_boot_is_one_manifest_snapshot(spark, target_root, monkeypatch):
    """ADVICE r12: the CDF reader's boot version and declared dtypes must
    come from ONE manifest read — two separate reads let a rename commit
    land in between, leaving dtypes one version newer than _init_version
    and permanently tripping the stale-schema restart check. Pinned by
    counting _manifest_current_version calls during __init__."""
    from mycarely_saas_dbt_spark.sources import pydatasource as pds

    r = _runner(spark, target_root)
    r.run(_spec(change_data=True), SF_DIR)  # v1
    calls = []
    orig = pds._manifest_current_version

    def counting(root, model):
        calls.append((root, model))
        return orig(root, model)

    monkeypatch.setattr(pds, "_manifest_current_version", counting)
    rd = pds.ManifestCDFStreamReader(
        {"root": target_root, "model": "cm_t", "key": "k"}
    )
    assert len(calls) == 1, calls
    assert rd._init_version == rd._boot_version == 1
    assert [n for n, _ in rd.dtypes] == ["k", "v", "p"]


# ---------------------------------------------------------------------------
# r12 — column mapping composed with CHANGE-DATA tables: the feed readers
# reconstruct the rename chain from commit provenance (_rename_ops) and
# read each version's change files under its own era schema, aliased to
# the range-end names. The snapshot-diff fallback keeps its refusals.
# ---------------------------------------------------------------------------


def _cd_history(r, name="cd"):
    """v1 boot (k 0..99: v=k%7, p=k%4) -> v2 update (era names) ->
    v3 RENAME v->val (empty cdc) -> v4 merge of inserts 100..104 (the
    unpartitioned full rewrite absorbs the mapping, new-name change
    files). Returns the spec under the POST-rename naming."""
    import dataclasses

    spec = _spec(name=name, change_data=True)
    r.run(spec, SF_DIR)                                   # v1
    r.update_where(spec, "k % 10 = 0", {"v": "v + 100"})  # v2
    r.rename_column(name, "v", "val")                     # v3

    def b2(sp, sfd, wm):
        rows = sp.range(100, 105).select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("val"),
            (F.col("id") % 4).alias("p"),
        )
        if wm is not None:
            rows = rows.filter(F.col("k") > F.lit(wm))
        return rows

    r.run(dataclasses.replace(spec, build=b2), SF_DIR)    # v4 (absorbs)
    assert "colmap" not in r.current_manifest(name)
    return spec


def test_batch_feed_nets_across_rename_on_change_data(spark, target_root):
    r = _runner(spark, target_root)
    _cd_history(r)
    # endpoint under a PENDING mapping: output carries the new names
    ch = r.table_changes("cd", "k", 1, 3, preimages=True)
    assert set(ch.columns) == {"k", "val", "p", "_change_type"}
    got = sorted(
        (x["k"], x["val"], x["_change_type"]) for x in ch.collect()
    )
    want = sorted(
        [(k, k % 7, "update_preimage") for k in range(0, 100, 10)]
        + [(k, k % 7 + 100, "update_postimage") for k in range(0, 100, 10)]
    )
    assert got == want
    # full range ACROSS the rename (era v2 files carry `v`, era v4
    # files carry `val`): one netted feed under the end names
    ch = r.table_changes("cd", "k", 1, 4, preimages=True)
    got = sorted(
        (x["k"], x["val"], x["p"], x["_change_type"]) for x in ch.collect()
    )
    want = sorted(
        [(k, k % 7, k % 4, "update_preimage") for k in range(0, 100, 10)]
        + [
            (k, k % 7 + 100, k % 4, "update_postimage")
            for k in range(0, 100, 10)
        ]
        + [(k, k % 7, k % 4, "insert") for k in range(100, 105)]
    )
    assert got == want


def test_streaming_feed_nets_across_rename_on_change_data(spark, target_root):
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        ManifestCDFStreamReader,
        _CdfChangeBucket,
    )

    r = _runner(spark, target_root)
    _cd_history(r)
    rd = ManifestCDFStreamReader(
        {"root": target_root, "model": "cd", "key": "k", "preimages": "true"}
    )
    legs = rd.partitions({"version": 1}, {"version": 4})
    assert all(isinstance(p, _CdfChangeBucket) for p in legs)
    got = sorted(
        tuple(b.to_pylist()[i].values())
        for p in legs
        for b in rd.read(p)
        for i in range(b.num_rows)
    )
    want = sorted(
        tuple(row)
        for row in r.table_changes("cd", "k", 1, 4, preimages=True).collect()
    )
    assert got == want
    # a batch ending BEFORE the rename (admission-controlled catch-up)
    # still emits under the DECLARED (post-rename) schema: the planner
    # walks the chain past the batch end up to the stream-start version
    legs = rd.partitions({"version": 1}, {"version": 2})
    got = sorted(
        (d["k"], d["val"], d["_change_type"])
        for p in legs
        for b in rd.read(p)
        for d in b.to_pylist()
    )
    want = sorted(
        [(k, k % 7, "update_preimage") for k in range(0, 100, 10)]
        + [(k, k % 7 + 100, "update_postimage") for k in range(0, 100, 10)]
    )
    assert got == want


def test_stream_bootstrap_under_pending_colmap(spark, target_root):
    """A fresh CDF stream on a change-data table with a PENDING mapping
    bootstraps by aliasing physical->logical from the end manifest."""
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        ManifestCDFStreamReader,
        _CdfSnapshotInsert,
    )

    r = _runner(spark, target_root)
    spec = _spec(name="cd", change_data=True)
    r.run(spec, SF_DIR)                                   # v1
    r.update_where(spec, "k % 10 = 0", {"v": "v + 100"})  # v2
    r.rename_column("cd", "v", "val")                     # v3 pending
    rd = ManifestCDFStreamReader(
        {"root": target_root, "model": "cd", "key": "k"}
    )
    legs = rd.partitions({"version": 0}, {"version": 3})
    assert legs and all(isinstance(p, _CdfSnapshotInsert) for p in legs)
    got = sorted(
        (d["k"], d["val"], d["_change_type"])
        for p in legs
        for b in rd.read(p)
        for d in b.to_pylist()
    )
    want = sorted(
        (k, k % 7 + (100 if k % 10 == 0 else 0), "insert")
        for k in range(100)
    )
    assert got == want


def test_rename_after_stream_start_requires_restart(spark, target_root):
    """A rename landing AFTER the stream started makes the declared
    schema stale — the change-file planner raises a restart error
    instead of emitting misaligned rows (Delta's schema-change rule)."""
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        ManifestCDFStreamReader,
    )

    r = _runner(spark, target_root)
    spec = _spec(name="cd", change_data=True)
    r.run(spec, SF_DIR)                                   # v1
    r.update_where(spec, "k % 10 = 0", {"v": "v + 100"})  # v2
    rd = ManifestCDFStreamReader(
        {"root": target_root, "model": "cd", "key": "k"}
    )  # declared schema: (k, v, p) @ v2
    r.rename_column("cd", "v", "val")                     # v3
    with pytest.raises(RuntimeError, match="restart the stream"):
        rd.partitions({"version": 1}, {"version": 3})


def test_feed_dropped_era_column_never_resurrects(spark, target_root):
    """The resurrection fence at the FEED level: change files written
    before a DROP carry the dropped column's bytes; after compact clears
    the fence and the name is re-added, a feed crossing the whole
    history must emit NULL for the era images — never the stale bytes."""
    r = _runner(spark, target_root)
    spec = _spec(name="cd", change_data=True)
    r.run(spec, SF_DIR)                                   # v1
    r.update_where(spec, "k % 10 = 0", {"v": "v + 100"})  # v2: files carry p
    r.drop_column("cd", "p")                              # v3 (fence)
    r.compact("cd")                                       # v4 (clears fence)
    r.add_column("cd", "p", "bigint")                     # v5 (re-add)
    r.update_where(spec, "k % 10 = 5", {"v": "v + 7"})    # v6
    ch = r.table_changes("cd", "k", 1, 6, preimages=True)
    rows = ch.collect()
    assert rows and all(x["p"] is None for x in rows)
    got = sorted((x["k"], x["v"], x["_change_type"]) for x in rows)
    want = sorted(
        [(k, k % 7, "update_preimage") for k in range(0, 100, 10)]
        + [(k, k % 7 + 100, "update_postimage") for k in range(0, 100, 10)]
        + [(k, k % 7, "update_preimage") for k in range(5, 100, 10)]
        + [(k, k % 7 + 7, "update_postimage") for k in range(5, 100, 10)]
    )
    assert got == want


def test_run_with_stale_spec_after_rename_fails_fast(spark, target_root):
    """VERDICT r11 item 7: rename_column records table state only — a
    run()/merge against a target whose committed dtypes no longer
    contain the spec's unique_key must fail with a rename-aware
    message, not an unresolved-column error deep in the merge."""
    r = _runner(spark, target_root)
    spec = _spec()
    r.run(spec, SF_DIR)
    r.rename_column("cm_t", "k", "kk")
    with pytest.raises(RuntimeError, match="was the column renamed"):
        r.run(spec, SF_DIR)


def test_rename_ops_reconstruction_unit():
    """_rename_ops classifies manifest transitions from dtypes +
    provenance alone: renames and drops become ops, additions are
    name-neutral, and an unclassifiable transition returns None."""
    from mycarely_saas_dbt_spark.incremental import _rename_ops

    def m(names, op=None):
        d = {"dtypes": [[n, "bigint"] for n in names]}
        if op:
            d["op"] = op
        return d

    # rename then add then drop
    mans = [
        (1, m(["k", "v", "p"])),
        (2, m(["k", "val", "p"], "RENAME COLUMN")),
        (3, m(["k", "val", "p", "w"], "ADD COLUMN")),
        (4, m(["k", "val", "w"], "DROP COLUMN")),
    ]
    assert _rename_ops(mans) == [
        (2, "rename", "v", "val"),
        (4, "drop", "p", None),
    ]
    # no-op transitions and evolution additions without provenance
    assert _rename_ops([(1, m(["k", "v"])), (2, m(["k", "v"]))]) == []
    assert _rename_ops([(1, m(["k"])), (2, m(["k", "w"]))]) == []
    # an unexplained disappearance cannot be classified
    assert _rename_ops([(1, m(["k", "v"])), (2, m(["k"]))]) is None
    # a multi-column swap under a RENAME op cannot be classified either
    assert (
        _rename_ops(
            [(1, m(["k", "a", "b"])), (2, m(["k", "x", "y"], "RENAME COLUMN"))]
        )
        is None
    )


def test_feed_column_sources_unit():
    """_feed_column_sources composes the chain at versions > v, kills
    dropped columns (no stale-byte source), and leaves later-added
    columns unsourced (reader NULL-fills)."""
    from mycarely_saas_dbt_spark.incremental import _feed_column_sources

    ops = [
        (3, "rename", "v", "val"),   # v -> val at version 3
        (5, "drop", "p", None),      # p dies at version 5
        (7, "rename", "val", "amt"), # val -> amt at version 7
    ]
    out = ["k", "amt", "q"]  # q added after v2; p re-added never sources
    # era v2 files carry (k, v, p): v chains to amt; p is dead; q absent
    assert _feed_column_sources(["k", "v", "p"], 2, ops, out) == {
        "k": "k", "amt": "v",
    }
    # era v4 files carry (k, val, p): only the second rename applies
    assert _feed_column_sources(["k", "val", "p"], 4, ops, out) == {
        "k": "k", "amt": "val",
    }
    # era v8 files are already in the end naming
    assert _feed_column_sources(["k", "amt", "q"], 8, ops, out) == {
        "k": "k", "amt": "amt", "q": "q",
    }
