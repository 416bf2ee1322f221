"""Multi-format source/sink connectors: CSV, JSON-lines, and ORC, with
partitioned writes and partition-pruned reads.

The reference reads warehouse-native tables only (SURVEY §2.1 — "file
formats/connectors: none in-repo"); a standalone engine needs real file
connectors. Each query round-trips driver parquet through another format
(explicit schema on read — never inferSchema in production) and aggregates
the read-back data; the oracle runs the same aggregate over the original
parquet, so the differential test proves the round-trip is lossless.

Scale notes (100 TB):
  * writes are `partitionBy(dim)` — the layout that makes downstream
    predicate-driven partition pruning possible (the read-back filters one
    partition value; .explain shows PartitionFilters, and only that
    directory is listed).
  * explicit StructType on read: schema inference scans the data twice and
    is nondeterministic across files — always declare.
  * CSV/JSON are row formats: fine as ingest/interchange, wrong as the
    analytical store — the pipelines land everything in columnar parquet.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.sources.registry import register_sources


def _roundtrip(
    spark: SparkSession,
    sf_dir: str,
    fmt: str,
    *,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """orders → <fmt> partitioned by o_orderstatus → read back with the
    explicit schema → partition-pruned aggregate. Returns a materialized
    (small) result so the temp dir can be deleted."""
    register_sources(spark, sf_dir)
    src = spark.table("orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        "o_orderpriority",
    )
    root = tempfile.mkdtemp(prefix=f"mycarely_fmt_{fmt}_")
    try:
        w = src.write.mode("overwrite").partitionBy("o_orderstatus")
        r = spark.read
        for k, v in (options or {}).items():
            w = w.option(k, v)
            r = r.option(k, v)
        w.format(fmt).save(root)

        back = r.format(fmt).schema(
            "o_orderkey bigint, o_custkey bigint, o_totalprice double,"
            " o_orderdate date, o_orderpriority string, o_orderstatus string"
        ).load(root)
        out = (
            back.filter(F.col("o_orderstatus") == "F")  # partition pruning
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
                F.min("o_orderdate").alias("first_date"),
                F.max("o_orderdate").alias("last_date"),
            )
        )
        from mycarely_saas_dbt_spark.util import materialize

        return materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS sum_price,
       MIN(CAST(o_orderdate AS DATE)) AS first_date,
       MAX(CAST(o_orderdate AS DATE)) AS last_date
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


def q_csv(spark, sf_dir):
    return _roundtrip(spark, sf_dir, "csv", options={"header": "true"})


def q_json(spark, sf_dir):
    return _roundtrip(spark, sf_dir, "json")


def q_orc(spark, sf_dir):
    return _roundtrip(spark, sf_dir, "orc")


PAIRS = [
    ("format_csv_roundtrip", q_csv, ORACLE),
    ("format_json_roundtrip", q_json, ORACLE),
    ("format_orc_roundtrip", q_orc, ORACLE),
]


def register_queries(register) -> None:
    for name, fn, oracle in PAIRS:
        register(name, fn, oracle)
