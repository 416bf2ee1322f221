"""Unit coverage for the engine utilities' caching contracts."""

from __future__ import annotations


def test_bounded_persist_unpersists_previous_generation(spark):
    from mycarely_saas_dbt_spark.util import bounded_persist

    a = spark.range(10)
    pa = bounded_persist(a, "test:frame")
    pa.count()
    assert pa.storageLevel.useMemory or pa.storageLevel.useDisk

    pb = bounded_persist(spark.range(20), "test:frame")
    # the previous generation under the same key must be released
    assert not (pa.storageLevel.useMemory or pa.storageLevel.useDisk)
    pb.count()
    assert pb.storageLevel.useMemory or pb.storageLevel.useDisk
    # different keys do not evict each other
    pc = bounded_persist(spark.range(5), "test:other")
    pc.count()
    assert pb.storageLevel.useMemory or pb.storageLevel.useDisk
    pb.unpersist(), pc.unpersist()


def test_fanout_scan_spreads_narrow_scans_and_noops_on_wide(spark):
    """fanout_scan must repartition a single-split scan up to the session
    parallelism, and be a strict no-op (same plan object) on an input
    that already has enough splits."""
    from mycarely_saas_dbt_spark.util import fanout_scan

    narrow = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert narrow.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    spread = fanout_scan(narrow)
    assert (
        spread.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    )
    assert spread.count() == narrow.count()

    wide = narrow.repartition(spark.sparkContext.defaultParallelism)
    assert fanout_scan(wide) is wide  # no extra exchange on a healthy scan
