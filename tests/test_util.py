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
