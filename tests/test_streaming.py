"""Streaming variant: drain the file source with availableNow and compare
against the batch aggregation (exact for counts, rsd-bounded for the HLL
unique-visitor sketch)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_traffic_pages_stream_matches_batch(spark, tmp_path):
    from mycarely_saas_dbt_spark.plans.traffic_pages import filtered_page_views
    from mycarely_saas_dbt_spark.sources.registry import register_sources
    from mycarely_saas_dbt_spark.streaming.traffic_stream import (
        traffic_pages_stream,
    )

    target = str(tmp_path / "tp_stream")
    q = traffic_pages_stream(spark, SF_SMALL, target)
    q.awaitTermination(120)

    got = spark.read.parquet(target)

    register_sources(spark, SF_SMALL)
    expected = (
        filtered_page_views(spark.table("atomic_events"))
        .groupBy(
            F.col("collector_tstamp").cast("date").alias("date"),
            F.col("app_id").alias("company_domain"),
            "page_urlpath",
        )
        .agg(
            F.count(F.lit(1)).alias("total_visits"),
            F.countDistinct("domain_userid").alias("unique_visits"),
        )
    )

    g = got.toPandas().set_index(["date", "company_domain", "page_urlpath"]).sort_index()
    e = (
        expected.toPandas()
        .set_index(["date", "company_domain", "page_urlpath"])
        .sort_index()
    )
    assert len(g) == len(e)
    assert (g["total_visits"] == e["total_visits"]).all()
    # HLL sketch: small groups are near-exact; allow a loose global bound
    rel_err = (
        (g["unique_visits_approx"] - e["unique_visits"]).abs()
        / e["unique_visits"].clip(lower=1)
    )
    assert rel_err.mean() < 0.05, rel_err.describe()

    shutil.rmtree(target, ignore_errors=True)
    shutil.rmtree(f"{target}.checkpoint", ignore_errors=True)
