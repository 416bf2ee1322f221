"""Multi-clause MERGE INTO (Delta/Iceberg MERGE) — copy-on-write, first-
match-wins clause ordering, cardinality violation, file-level surgery.

Differential oracle: every scenario is replayed as plain relational SQL in
DuckDB over the same inputs (FULL JOIN + CASE ladder), so clause-resolution
bugs flip row values, and the manifest assertions prove only match-bearing
files were rewritten."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

COLS = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate", "o_orderstatus"]


@pytest.fixture()
def target_root(tmp_path):
    p = str(tmp_path / "target")
    yield p
    shutil.rmtree(p, ignore_errors=True)


def _boot_spec(name="m_orders"):
    from mycarely_saas_dbt_spark.incremental import ModelSpec
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    def boot(sp, sfd, wm):
        register_sources(sp, sfd)
        return sp.table("orders").select(*COLS).repartition(6, "o_orderkey")

    return ModelSpec(
        name, "o_orderkey", "o_orderkey", boot, partition_by=["o_orderstatus"]
    )


def _source(spark):
    """Deterministic source: every 5th order (updated totalprice), every
    35th (delete victims via condition), plus 50 brand-new keys."""
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, SF_DIR)
    upd = (
        spark.table("orders")
        .filter("o_orderkey % 5 = 0")
        .select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_totalprice") + 10.0).alias("p"),
            F.col("o_custkey").alias("c"),
        )
    )
    new = spark.range(50).select(
        (F.col("id") + 90_000_000).alias("k"),
        (F.col("id") * 1.5 + 1.0).alias("p"),
        F.lit(7).cast("long").alias("c"),
    )
    return upd.unionByName(new)


O_SOURCE = """
SELECT o_orderkey AS k, o_totalprice + 10.0 AS p, o_custkey AS c
FROM orders WHERE o_orderkey % 5 = 0
UNION ALL
SELECT i + 90000000, i * 1.5 + 1.0, 7 FROM UNNEST(range(0, 50)) AS u(i)
"""


def _run_merge(spark, target_root):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = IncrementalRunner(spark, target_root)
    spec = _boot_spec()
    runner.run(spec, SF_DIR)
    res = runner.merge_into(
        spec,
        _source(spark),
        on="t.o_orderkey = s.k",
        matched=[
            ("delete", "s.k % 35 = 0"),
            ("update", "s.p > 100000", {"o_totalprice": "s.p"}),
            ("update", None, {"o_totalprice": "s.p + 0.5", "o_custkey": "0 - s.c"}),
        ],
        not_matched=[
            ("insert", "s.k % 2 = 0", {
                "o_orderkey": "s.k",
                "o_custkey": "s.c",
                "o_totalprice": "s.p",
                "o_orderdate": "DATE '2030-01-01'",
                "o_orderstatus": "'N'",
            }),
        ],
    )
    return runner, spec, res


ORACLE = f"""
WITH src AS ({O_SOURCE}),
tgt AS (SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderstatus FROM orders)
SELECT
  CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderkey ELSE s.k END AS o_orderkey,
  CASE WHEN t.o_orderkey IS NOT NULL AND s.k IS NOT NULL
            AND NOT (s.k % 35 = 0) AND NOT (s.p > 100000) THEN 0 - s.c
       WHEN t.o_orderkey IS NOT NULL THEN t.o_custkey
       ELSE s.c END AS o_custkey,
  CASE WHEN t.o_orderkey IS NOT NULL AND s.k IS NOT NULL AND NOT (s.k % 35 = 0)
            THEN CASE WHEN s.p > 100000 THEN s.p ELSE s.p + 0.5 END
       WHEN t.o_orderkey IS NOT NULL THEN t.o_totalprice
       ELSE s.p END AS o_totalprice,
  CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderdate
       ELSE DATE '2030-01-01' END AS o_orderdate,
  CASE WHEN t.o_orderkey IS NOT NULL THEN t.o_orderstatus ELSE 'N' END AS o_orderstatus
FROM tgt t FULL JOIN src s ON t.o_orderkey = s.k
WHERE NOT (t.o_orderkey IS NOT NULL AND s.k IS NOT NULL AND s.k % 35 = 0)
  AND NOT (t.o_orderkey IS NULL AND NOT (s.k % 2 = 0))
ORDER BY o_orderkey
"""


def test_merge_matches_sql_oracle(spark, duck, target_root):
    from tests.conftest import assert_df_matches_oracle

    runner, spec, res = _run_merge(spark, target_root)
    out = runner.read_target("m_orders").orderBy("o_orderkey")
    assert_df_matches_oracle(out, duck, ORACLE)
    assert res["rows_inserted"] == 25  # the 50 new keys are alternating parity
    assert res["rows_deleted"] > 0 and res["rows_updated"] > 0


def test_merge_rewrites_only_matching_files(spark, target_root):
    """Files with no ON-match carry forward BY NAME in the manifest: a
    3-key source touches at most 3 hash buckets; the other files of the
    ~18-file target ride forward verbatim."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = IncrementalRunner(spark, target_root)
    spec = _boot_spec()
    runner.run(spec, SF_DIR)
    src = (
        spark.table("orders")
        .filter("o_orderkey % 5000 = 1")
        .select(F.col("o_orderkey").alias("k"), F.lit(9.0).alias("p"))
    )
    res = runner.merge_into(
        spec,
        src,
        on="t.o_orderkey = s.k",
        matched=[("update", None, {"o_totalprice": "s.p"})],
    )
    assert 0 < res["files_rewritten"] <= 3
    assert res["rows_updated"] == 3
    m1 = runner._manifest_at("m_orders", 1)
    m2 = runner.current_manifest("m_orders")
    old_files = {(r, f) for r, fl in m1["partitions"].items() for f in fl}
    new_files = {(r, f) for r, fl in m2["partitions"].items() for f in fl}
    carried = old_files & new_files
    added = new_files - old_files
    assert added, "merge wrote no new files"
    # touched entries delisted, exactly the replacements added
    assert len(new_files) == len(old_files) - res["files_rewritten"] + len(added)
    assert len(carried) == len(old_files) - res["files_rewritten"]
    assert carried, "expected carried-forward files"
    assert runner.read_target("m_orders").count() > 0


def test_merge_not_matched_by_source(spark, duck, target_root):
    """WHEN NOT MATCHED BY SOURCE DELETE with a condition — target rows
    absent from the source and failing no condition survive."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from tests.conftest import assert_df_matches_oracle

    runner = IncrementalRunner(spark, target_root)
    spec = _boot_spec("m2")
    runner.run(spec, SF_DIR)
    src = spark.range(10).select((F.col("id") * 100 + 1).alias("k"))
    runner.merge_into(
        spec,
        src,
        on="t.o_orderkey = s.k",
        matched=[("update", None, {"o_totalprice": "t.o_totalprice * 2"})],
        not_matched_by_source=[("delete", "t.o_orderkey % 11 = 0")],
    )
    out = runner.read_target("m2").orderBy("o_orderkey")
    oracle = """
WITH src AS (SELECT i * 100 + 1 AS k FROM UNNEST(range(0, 10)) AS u(i))
SELECT o_orderkey, o_custkey,
       CASE WHEN o_orderkey IN (SELECT k FROM src)
            THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
       o_orderdate, o_orderstatus
FROM orders
WHERE NOT (o_orderkey NOT IN (SELECT k FROM src) AND o_orderkey % 11 = 0)
ORDER BY o_orderkey
"""
    assert_df_matches_oracle(out, duck, oracle)


def test_merge_cardinality_violation_raises(spark, target_root):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = IncrementalRunner(spark, target_root)
    spec = _boot_spec("m3")
    runner.run(spec, SF_DIR)
    dup = spark.createDataFrame([(1, 10.0), (1, 20.0)], "k long, p double")
    with pytest.raises(Exception, match="cardinality violation"):
        runner.merge_into(
            spec,
            dup,
            on="t.o_orderkey = s.k",
            matched=[("update", None, {"o_totalprice": "s.p"})],
        )


def test_merge_insert_only_into_new_partition(spark, target_root):
    """No ON matches at all: zero files rewritten, inserts land in their
    own partition, every pre-existing file carries forward by name."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = IncrementalRunner(spark, target_root)
    spec = _boot_spec("m4")
    runner.run(spec, SF_DIR)
    m1 = runner.current_manifest("m4")
    src = spark.range(5).select(
        (F.col("id") + 95_000_000).alias("k"), F.lit(1.0).alias("p")
    )
    res = runner.merge_into(
        spec,
        src,
        on="t.o_orderkey = s.k",
        matched=[("update", None, {"o_totalprice": "s.p"})],
        not_matched=[("insert", None, {
            "o_orderkey": "s.k", "o_custkey": "1", "o_totalprice": "s.p",
            "o_orderdate": "DATE '2031-01-01'", "o_orderstatus": "'Z'",
        })],
    )
    assert res["files_rewritten"] == 0
    assert res["rows_inserted"] == 5 and res["rows_deleted"] == 0
    m2 = runner.current_manifest("m4")
    for rel in m1["partitions"]:
        assert list(m1["partitions"][rel]) == list(m2["partitions"][rel])
    assert "o_orderstatus=Z" in set(m2["partitions"])
    assert (
        runner.read_target("m4").filter("o_orderstatus = 'Z'").count() == 5
    )


def test_merge_insert_only_tolerates_duplicate_source_matches(
    spark, target_root
):
    """ADVICE r7 (high): insert-only merge with multiple source rows
    matching ONE target key must neither raise nor duplicate the matched
    target row (Delta's insert-only rule) — and must rewrite ZERO files
    (the insert-only fast path). Duplicate NON-matching source rows both
    insert (Delta inserts every not-matched source row)."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = IncrementalRunner(spark, target_root)
    spec = _boot_spec("m_insonly")
    runner.run(spec, SF_DIR)
    n0 = runner.read_target("m_insonly").count()
    src = spark.createDataFrame(
        [(1, 100.0, 5), (1, 200.0, 5), (90_000_001, 1.0, 7),
         (90_000_002, 2.0, 7), (90_000_002, 3.0, 7)],
        "k long, p double, c long",
    )
    res = runner.merge_into(
        spec,
        src,
        on="t.o_orderkey = s.k",
        not_matched=[("insert", None, {
            "o_orderkey": "s.k",
            "o_custkey": "s.c",
            "o_totalprice": "s.p",
            "o_orderdate": "DATE '2030-01-01'",
            "o_orderstatus": "'N'",
        })],
    )
    assert res["files_rewritten"] == 0, "insert-only merge must not rewrite"
    assert res["rows_inserted"] == 3
    out = runner.read_target("m_insonly")
    assert out.count() == n0 + 3
    # the matched key appears exactly once, with its ORIGINAL price
    m = out.filter("o_orderkey = 1").collect()
    assert len(m) == 1 and abs(m[0]["o_totalprice"] - 100.0) > 1e-9
    assert out.filter("o_orderkey = 90000002").count() == 2


def test_merge_by_source_only_tolerates_duplicate_source_matches(
    spark, duck, target_root
):
    """ADVICE r7 (high) second shape: by-source-only merges join the full
    candidate target, so duplicate source matches fanned matched rows out
    as multiple 'keep' copies. Exactly one copy must survive."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from tests.conftest import assert_df_matches_oracle

    runner = IncrementalRunner(spark, target_root)
    spec = _boot_spec("m_bysrc")
    runner.run(spec, SF_DIR)
    src = spark.createDataFrame([(1,), (1,), (1,)], "k long")
    res = runner.merge_into(
        spec,
        src,
        on="t.o_orderkey = s.k",
        not_matched_by_source=[("delete", "t.o_orderkey % 7 = 3")],
    )
    out = runner.read_target("m_bysrc").orderBy("o_orderkey")
    assert out.filter("o_orderkey = 1").count() == 1
    oracle = """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderstatus
FROM orders
WHERE NOT (o_orderkey <> 1 AND o_orderkey % 7 = 3)
ORDER BY o_orderkey
"""
    assert_df_matches_oracle(out, duck, oracle)
    assert res["rows_inserted"] == 0 and res["rows_updated"] == 0


def test_merge_into_rebases_onto_disjoint_racing_commit(
    spark, target_root, monkeypatch
):
    """VERDICT r7 item 6a: a partition-scoped merge_into racing a
    DISJOINT-footprint commit must rebase like _merge does — both
    writers' rows land, nothing is lost or duplicated."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, SF_DIR)
    runner_a = IncrementalRunner(spark, target_root)
    runner_b = IncrementalRunner(spark, target_root)
    spec = _boot_spec("m_race")
    runner_a.run(spec, SF_DIR)
    v1 = runner_a.current_manifest("m_race")["version"]

    statuses = sorted(
        r[0]
        for r in spark.table("orders").select("o_orderstatus").distinct().collect()
    )
    st_a, st_b = statuses[0], statuses[-1]
    assert st_a != st_b

    def src_for(status, bump):
        return (
            spark.table("orders")
            .filter(F.col("o_orderstatus") == status)
            .filter("o_orderkey % 50 = 1")
            .select(
                F.col("o_orderkey").alias("k"),
                (F.col("o_totalprice") + bump).alias("p"),
            )
        )

    def merge(runner, status, bump):
        return runner.merge_into(
            spec,
            src_for(status, bump),
            on="t.o_orderkey = s.k",
            matched=[("update", None, {"o_totalprice": "s.p"})],
            prune={"o_orderstatus": (status, status)},
        )

    orig_commit = runner_b._commit_manifest
    fired = {"done": False}

    def inject(name, manifest, **kw):
        if not fired["done"]:
            fired["done"] = True
            merge(runner_a, st_a, 10_000.0)  # A lands after B's read
        return orig_commit(name, manifest, **kw)

    monkeypatch.setattr(runner_b, "_commit_manifest", inject)
    merge(runner_b, st_b, 20_000.0)

    final = runner_b.current_manifest("m_race")
    assert final["version"] == v1 + 2  # both merge commits landed
    out = runner_b.read_target("m_race")
    bumped_a = out.filter(
        (F.col("o_orderstatus") == st_a) & (F.col("o_orderkey") % 50 == 1)
    )
    bumped_b = out.filter(
        (F.col("o_orderstatus") == st_b) & (F.col("o_orderkey") % 50 == 1)
    )
    assert bumped_a.count() > 0 and bumped_b.count() > 0
    assert bumped_a.filter("o_totalprice < 10000").count() == 0
    assert bumped_b.filter("o_totalprice < 20000").count() == 0
    # key uniqueness survived the rebase
    assert (
        out.groupBy("o_orderkey").count().filter("count > 1").count() == 0
    )


def test_merge_into_overlapping_race_refuses(spark, target_root, monkeypatch):
    """The complement of the rebase: a racing commit whose footprint
    OVERLAPS the merge's touched partitions must refuse, not clobber."""
    import pytest as _pytest

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, SF_DIR)
    runner_a = IncrementalRunner(spark, target_root)
    runner_b = IncrementalRunner(spark, target_root)
    spec = _boot_spec("m_race2")
    runner_a.run(spec, SF_DIR)

    status = (
        spark.table("orders").select("o_orderstatus").distinct().first()[0]
    )

    def src(bump):
        return (
            spark.table("orders")
            .filter(F.col("o_orderstatus") == status)
            .filter("o_orderkey % 50 = 1")
            .select(
                F.col("o_orderkey").alias("k"),
                (F.col("o_totalprice") + bump).alias("p"),
            )
        )

    def merge(runner, bump):
        return runner.merge_into(
            spec,
            src(bump),
            on="t.o_orderkey = s.k",
            matched=[("update", None, {"o_totalprice": "s.p"})],
            prune={"o_orderstatus": (status, status)},
        )

    orig_prices = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in runner_a.read_target("m_race2")
        .filter(
            (F.col("o_orderstatus") == status) & (F.col("o_orderkey") % 50 == 1)
        )
        .collect()
    }
    assert orig_prices

    orig_commit = runner_b._commit_manifest
    fired = {"done": False}

    def inject(name, manifest, **kw):
        if not fired["done"]:
            fired["done"] = True
            merge(runner_a, 10_000.0)  # SAME partition lands first
        return orig_commit(name, manifest, **kw)

    monkeypatch.setattr(runner_b, "_commit_manifest", inject)
    with _pytest.raises(RuntimeError, match="concurrent commit|overlapping"):
        merge(runner_b, 20_000.0)
    # A's +10000 survived intact; B's +20000 never half-landed
    out = runner_b.read_target("m_race2")
    hot = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in out.filter(
            (F.col("o_orderstatus") == status) & (F.col("o_orderkey") % 50 == 1)
        ).collect()
    }
    assert hot.keys() == orig_prices.keys()
    for k, p in hot.items():
        assert abs(p - (orig_prices[k] + 10_000.0)) < 1e-6


def test_merge_into_schema_evolution_modes(spark, target_root):
    """VERDICT r7 item 6b: on_schema_change applies when the merge source
    carries new columns. fail -> raises; ignore (default) -> new column
    dropped; append_new_columns -> target gains it, existing rows
    NULL-backfill, and a reader sees old+new files schema-merged."""
    import dataclasses

    import pytest as _pytest

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner

    runner = IncrementalRunner(spark, target_root)
    spec = _boot_spec("m_evo")
    runner.run(spec, SF_DIR)
    src = spark.createDataFrame(
        [(1, 11.0, "eu-west"), (90_000_001, 1.0, "us-east")],
        "k long, p double, region string",
    )
    clauses = dict(
        on="t.o_orderkey = s.k",
        matched=[("update", None, {"o_totalprice": "s.p", "region": "s.region"})],
        not_matched=[("insert", None, {
            "o_orderkey": "s.k",
            "o_custkey": "0",
            "o_totalprice": "s.p",
            "o_orderdate": "DATE '2030-01-01'",
            "o_orderstatus": "'N'",
            "region": "s.region",
        })],
    )

    with _pytest.raises(RuntimeError, match="on_schema_change='fail'"):
        runner.merge_into(
            dataclasses.replace(spec, on_schema_change="fail"), src, **clauses
        )

    with _pytest.raises(NotImplementedError, match="sync_all_columns"):
        runner.merge_into(
            dataclasses.replace(spec, on_schema_change="sync_all_columns"),
            src,
            **clauses,
        )

    # ignore (default): merge applies, region never lands
    runner.merge_into(spec, src, **clauses)
    out = runner.read_target("m_evo")
    assert "region" not in out.columns
    assert abs(out.filter("o_orderkey = 1").first()["o_totalprice"] - 11.0) < 1e-9

    # append_new_columns: column lands, NULL-backfilled elsewhere
    res = runner.merge_into(
        dataclasses.replace(spec, on_schema_change="append_new_columns"),
        src,
        **clauses,
    )
    # both source keys now exist (the ignore-merge inserted 90000001)
    assert res["rows_updated"] == 2
    out = runner.read_target("m_evo")
    assert "region" in out.columns
    assert out.filter("o_orderkey = 1").first()["region"] == "eu-west"
    assert out.filter("o_orderkey = 90000001").first()["region"] == "us-east"
    # untouched rows (old files, never rewritten) NULL-fill via the
    # committed dtypes — the metadata-only ALTER ADD COLUMN shape
    assert out.filter("region IS NULL").count() == out.count() - 2
    # a later merge on the evolved table keeps working
    src2 = spark.createDataFrame([(3, 33.0, "ap-south")],
                                 "k long, p double, region string")
    runner.merge_into(
        dataclasses.replace(spec, on_schema_change="append_new_columns"),
        src2,
        **clauses,
    )
    out = runner.read_target("m_evo")
    assert out.filter("o_orderkey = 3").first()["region"] == "ap-south"
    assert out.filter("o_orderkey = 1").first()["region"] == "eu-west"


def test_streaming_maintainer_races_disjoint_writer(
    spark, target_root, monkeypatch
):
    """VERDICT r12 item 5: the disjoint-footprint rebase proven with a
    LIVE streaming maintainer — a CDF-fed foreachBatch index sink
    (merge_txn) racing an unrelated-partition writer on the SAME index
    target. Both commits must land (the maintainer rebases onto the
    racer's disjoint commit) and the index must still match the
    fresh-build oracle over the live base."""
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        register_manifest_cdf_source,
    )
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, SF_DIR)
    register_manifest_cdf_source(spark)
    runner = IncrementalRunner(spark, target_root)   # the maintainer
    racer = IncrementalRunner(spark, target_root)    # unrelated writer

    base_spec = ModelSpec(
        "rcb", "doc_id", "doc_id",
        lambda sp, sfd, wm: sp.table("documents").select(
            "doc_id", "text", (F.col("doc_id") % 8).alias("pb")
        ),
        partition_by=["pb"], change_data=True,
    )
    idx_spec = ModelSpec(
        "rci", "doc_id", "doc_id", None,
        partition_by=["sb"], tombstone_col="__del",
    )

    def sig_rows(df):
        # a cheap derived "signature" — the race is about the COMMIT
        # path, not the signature math (the minhash sink shares it)
        return df.select(
            "doc_id", F.length("text").alias("sig"),
            (F.col("doc_id") % 4).alias("sb"), F.lit(False).alias("__del"),
        )

    def hop():
        stream = (
            spark.readStream.format("mycarely_manifest_cdf")
            .option("root", target_root)
            .option("model", "rcb")
            .option("key", "doc_id")
            .load()
        )

        def sink(batch_df, bid):
            rows = batch_df.persist()
            try:
                if not rows.count():
                    return
                live = rows.filter(F.col("_change_type") != "delete")
                runner.merge_txn(
                    idx_spec, sig_rows(live), app_id="rci_hop",
                    txn_version=bid,
                )
            finally:
                rows.unpersist()

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{target_root}/_ckpt_rci")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    runner.run(base_spec, SF_DIR)
    hop()                                    # index bootstrap (all buckets)
    v0 = runner.current_manifest("rci")["version"]
    # narrow maintenance wave: touches ONLY index bucket sb=1
    runner.update_where(
        base_spec, "doc_id % 4 = 1", {"text": "concat(text, ' x')"}
    )
    orig = runner._commit_manifest
    fired = {"done": False}

    def inject(name, manifest, **kw):
        if name == "rci" and not fired["done"]:
            fired["done"] = True
            # the unrelated-partition writer lands AFTER the maintainer
            # read its base manifest: a backfill rewriting bucket sb=3
            # (identical recomputed values — content-idempotent)
            racer.merge_txn(
                idx_spec,
                sig_rows(racer.read_target("rcb").filter("doc_id % 4 = 3")),
                app_id="rci_racer", txn_version=1,
            )
        return orig(name, manifest, **kw)

    monkeypatch.setattr(runner, "_commit_manifest", inject)
    hop()                                    # maintenance races the backfill
    final = runner.current_manifest("rci")
    assert fired["done"] and final["version"] == v0 + 2  # BOTH landed
    idx = runner.read_target("rci").select("doc_id", "sig", "sb")
    fresh = sig_rows(runner.read_target("rcb")).select("doc_id", "sig", "sb")
    assert idx.count() == fresh.count()
    assert idx.exceptAll(fresh).count() == 0
