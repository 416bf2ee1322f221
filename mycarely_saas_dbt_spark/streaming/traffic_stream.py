"""Structured Streaming variant of the traffic aggregations (SURVEY §2.8,
§7 M5 — extension work, not reference parity).

The reference's "streaming" is the incremental micro-batch pattern with no
late-data handling. This module is the native-streaming upgrade:

  * ``readStream`` over the events source (file source here; Kafka on a
    real deployment — same plan from the first transformation on);
  * the identical Snowplow derivation + bot scrub as the batch path
    (one definition, two runtimes);
  * tumbling 1-day event-time windows via ``F.window`` with
    ``withWatermark`` for bounded state + late-data tolerance (the batch
    pattern silently drops late rows; here they are merged for up to
    ``allowed_lateness``);
  * ``approx_count_distinct`` for unique visitors — exact COUNT(DISTINCT)
    is unsupported in streaming aggs, and at 100 TB the HLL sketch is what
    you would run anyway (configurable rsd);
  * ``foreachBatch`` MERGE into the parquet target by grain key — the same
    delete+insert upsert as the incremental runner, so each micro-batch
    revises previously emitted days in place.

Run with ``trigger(availableNow=True)`` for a drain-the-source batch test,
or no trigger for continuous micro-batches.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.plans.traffic_pages import filtered_page_views
from mycarely_saas_dbt_spark.sources.registry import load_table
from mycarely_saas_dbt_spark.sources.synthetic import atomic_events_sql

GRAIN = ["date", "company_domain", "page_urlpath"]


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the raw events, with the same ns->µs repair
    and Snowplow derivation as the batch registry."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = load_table(spark, sf_dir, "events").schema  # post-repair schema
    # the file stream source watches a DIRECTORY; glob-filter to the events
    # table within the sf dir
    raw = (
        spark.readStream.schema(
            spark.read.parquet(path).schema  # on-disk schema (ts as long)
        )
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("`ts` div 1000")))
    )
    assert raw.schema["ts"].dataType == schema["ts"].dataType
    raw.createOrReplaceTempView("events_stream_raw")
    return spark.sql(atomic_events_sql("events_stream_raw"))


def traffic_pages_stream(
    spark: SparkSession,
    sf_dir: str,
    target: str,
    *,
    allowed_lateness: str = "1 day",
    rsd: float = 0.02,
):
    """Streaming daily per-page traffic with upsert sink.

    Returns the StreamingQuery (caller awaits termination). Target layout
    matches the batch model grain: (date, company_domain, page_urlpath,
    total_visits, unique_visits_approx).
    """
    ev = filtered_page_views(events_stream(spark, sf_dir))
    agg = (
        ev.withWatermark("collector_tstamp", allowed_lateness)
        .groupBy(
            F.window("collector_tstamp", "1 day").alias("w"),
            F.col("app_id").alias("company_domain"),
            "page_urlpath",
        )
        .agg(
            F.count(F.lit(1)).alias("total_visits"),
            F.approx_count_distinct("domain_userid", rsd).alias(
                "unique_visits_approx"
            ),
        )
        .select(
            F.col("w.start").cast("date").alias("date"),
            "company_domain",
            "page_urlpath",
            "total_visits",
            "unique_visits_approx",
        )
    )

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch MERGE: delete+insert by grain key (Delta MERGE on a
        real lakehouse; anti-join + atomic swap here)."""
        sp = batch_df.sparkSession
        if os.path.isdir(target):
            old = sp.read.parquet(target)
            merged = old.join(
                batch_df.select(*GRAIN).distinct(), GRAIN, "left_anti"
            ).unionByName(batch_df)
        else:
            merged = batch_df
        tmp = f"{target}.tmp-{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        import shutil, uuid

        bak = f"{target}.bak-{uuid.uuid4().hex[:6]}"
        if os.path.isdir(target):
            os.rename(target, bak)
        os.rename(tmp, target)
        if os.path.isdir(bak):
            shutil.rmtree(bak)

    return (
        agg.writeStream.outputMode("update")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", f"{target}.checkpoint")
        .trigger(availableNow=True)
        .start()
    )
