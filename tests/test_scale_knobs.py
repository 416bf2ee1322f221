"""The two runtime knobs SURVEY §4 leans on for 100 TB sizing, proven
live rather than asserted in prose:

* ``spark.sql.files.maxPartitionBytes`` — scan parallelism: smaller
  split targets must yield more scan partitions over the same files
  (how executor count is matched to input volume).
* AQE partition coalescing — post-shuffle parallelism: with
  ``spark.sql.adaptive.coalescePartitions`` on (the session default), a
  small shuffle must coalesce to far fewer partitions than the static
  ``spark.sql.shuffle.partitions`` — the runtime re-plan that keeps
  small stages from paying 32-task overhead and big stages from
  hand-tuning.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_max_partition_bytes_controls_scan_parallelism(spark):
    path = f"{SF_DIR}/events.parquet"
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        coarse = spark.read.parquet(path).rdd.getNumPartitions()
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
        fine = spark.read.parquet(path).rdd.getNumPartitions()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert fine > coarse, (fine, coarse)
    # the ~220KB sf0.01 file must split into several 64KB-target slices
    assert fine >= 3, fine


def test_aqe_coalesces_small_shuffles(spark):
    static = int(spark.conf.get("spark.sql.shuffle.partitions"))
    agg = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg.collect()  # AQE decides partition count at runtime
    got = agg.rdd.getNumPartitions()
    assert got < static, (got, static)
