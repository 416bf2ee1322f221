"""Z-order clustering must actually buy multi-column data skipping.

Metric under test: the number of files a min/max-stats pruner must read
for range predicates on EITHER dimension. A one-column sort is optimal
for predicates on its sort column but its files all span the full range
of the other column (zero skipping there); the z-sorted layout must
(a) still skip files on x-predicates, (b) skip files on y-predicates
where the linear layout reads everything, and (c) win on the combined
workload. Verified against the real parquet footers via pyarrow — the
same statistics a lake's file pruner consults."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

N_FILES = 8


def _bboxes(files, xcol, ycol):
    out = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}

        def stat(col, fn):
            vals = [
                getattr(meta.row_group(g).column(idx[col]).statistics, fn)
                for g in range(meta.num_row_groups)
            ]
            return min(vals) if fn == "min" else max(vals)

        out.append(
            (stat(xcol, "min"), stat(xcol, "max"), stat(ycol, "min"), stat(ycol, "max"))
        )
    return out


def _files_touched(bboxes, xr=None, yr=None):
    n = 0
    for xmin, xmax, ymin, ymax in bboxes:
        if xr is not None and (xmax < xr[0] or xmin > xr[1]):
            continue
        if yr is not None and (ymax < yr[0] or ymin > yr[1]):
            continue
        n += 1
    return n


def test_zorder_layout_skips_files_on_both_dimensions(spark, tmp_path):
    from mycarely_saas_dbt_spark.sources.registry import register_sources
    from mycarely_saas_dbt_spark.sources.zorder import zorder_write

    register_sources(spark, "/root/testdata/sf0.01")
    ev = spark.table("events").select(
        "user_id", F.dayofyear("ts").cast("long").alias("day"), "event_id"
    )

    zpath = str(tmp_path / "zsorted")
    lpath = str(tmp_path / "linear")
    zorder_write(ev, zpath, "user_id", "day", n_files=N_FILES)
    # one-column clustering baseline: same file count, sorted by user_id
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    zb = _bboxes(glob.glob(f"{zpath}/*.parquet"), "user_id", "day")
    lb = _bboxes(glob.glob(f"{lpath}/*.parquet"), "user_id", "day")
    assert len(zb) == N_FILES and len(lb) == N_FILES

    # narrow range predicates on each dimension (~1/8 of each domain)
    xq, yq = (10, 28), (3, 6)
    z_x, z_y = _files_touched(zb, xr=xq), _files_touched(zb, yr=yq)
    l_x, l_y = _files_touched(lb, xr=xq), _files_touched(lb, yr=yq)

    # the linear layout cannot skip anything on the unsorted dimension
    assert l_y == N_FILES, (l_y, lb)
    # z-order must skip on BOTH dimensions...
    assert z_x < N_FILES, (z_x, zb)
    assert z_y < N_FILES, (z_y, zb)
    # ...and win the combined one-predicate workload
    assert z_x + z_y < l_x + l_y, (z_x, z_y, l_x, l_y)

    # layout change must not lose rows
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(lpath).count()
        == ev.count()
    )


def test_compact_cluster_by_rewrites_model_target_for_skipping(spark, tmp_path):
    """Maintenance path: `compact(..., cluster_by=[x, y])` must re-cluster
    an existing incremental model target in place (manifest-committed,
    content-identical) so that parquet footer stats afterwards skip files
    on BOTH clustered columns — OPTIMIZE ZORDER over a live target."""
    import os

    from mycarely_saas_dbt_spark.incremental import IncrementalRunner, ModelSpec
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, "/root/testdata/sf0.01")

    def build(sp, sfd, wm):
        return sp.table("events").select(
            "user_id",
            F.dayofyear("ts").cast("long").alias("day"),
            "event_id",
        )

    spec = ModelSpec("evz", "event_id", "day", build)
    runner = IncrementalRunner(spark, str(tmp_path))
    runner.run(spec, "/root/testdata/sf0.01")
    before = runner.read_target("evz")
    n_before = before.count()
    sum_before = before.agg(F.sum("event_id"), F.sum("user_id")).first()

    # tiny target_file_mb forces a multi-file rewrite so skipping is testable
    stats = runner.compact(
        "evz", target_file_mb=0.006, cluster_by=["user_id", "day"]
    )
    assert stats["cluster_by"] == ["user_id", "day"]
    n_files = stats["files"]
    assert n_files >= 4, stats

    m = runner.current_manifest("evz")
    path = runner.target_path("evz")
    live = [os.path.join(path, rel, f) if rel else os.path.join(path, f)
            for rel, fl in m["partitions"].items() for f in fl]
    assert len(live) == n_files
    bb = _bboxes(live, "user_id", "day")

    xlo = min(b[0] for b in bb); xhi = max(b[1] for b in bb)
    ylo = min(b[2] for b in bb); yhi = max(b[3] for b in bb)
    xq = (xlo, xlo + max(1, (xhi - xlo) // 8))
    yq = (ylo, ylo + max(1, (yhi - ylo) // 8))
    assert _files_touched(bb, xr=xq) < n_files, (bb, xq)
    assert _files_touched(bb, yr=yq) < n_files, (bb, yq)

    # content identical after the rewrite
    after = runner.read_target("evz")
    assert after.count() == n_before
    assert after.agg(F.sum("event_id"), F.sum("user_id")).first() == sum_before
