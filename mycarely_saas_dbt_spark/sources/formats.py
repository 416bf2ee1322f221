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


CORRUPT_EVERY = 7  # every 7th line is deterministically mangled


def q_csv_permissive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record-tolerant ingestion: a CSV where every
    CORRUPT_EVERY-th data line is mangled (non-numeric key field), read in
    PERMISSIVE mode with columnNameOfCorruptRecord — bad lines land in the
    rescue column instead of failing the job or silently vanishing. At
    100 TB ingest you ALWAYS run permissive + rescue-column (or
    badRecordsPath) and route rejects to quarantine; FAILFAST is for CI.
    Output: good/corrupt counts and the good-row key sum — the oracle
    derives the same split arithmetically from the corruption rule."""
    register_sources(spark, sf_dir)
    src = spark.table("orders").select("o_orderkey", "o_totalprice")
    root = tempfile.mkdtemp(prefix="mycarely_fmt_perm_")
    try:
        src.coalesce(1).write.mode("overwrite").option("header", "false").csv(
            f"{root}/clean"
        )
        import os

        part = [
            f for f in os.listdir(f"{root}/clean") if f.endswith(".csv")
        ][0]
        with open(f"{root}/clean/{part}") as fh:
            lines = fh.read().splitlines()
        # deterministic mangling keyed on the ROW CONTENT (line order in the
        # file is arbitrary): corrupt rows whose o_orderkey % CORRUPT_EVERY == 0
        mangled = [
            f"corrupted#{ln}" if int(ln.split(",")[0]) % CORRUPT_EVERY == 0 else ln
            for ln in lines
        ]
        os.makedirs(f"{root}/dirty", exist_ok=True)
        with open(f"{root}/dirty/data.csv", "w") as fh:
            fh.write("\n".join(mangled))

        back = (
            spark.read.schema(
                "o_orderkey bigint, o_totalprice double, _corrupt string"
            )
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt")
            .csv(f"{root}/dirty")
        )
        out = back.agg(
            F.count(F.when(F.col("_corrupt").isNull(), 1)).alias("n_good"),
            F.count(F.col("_corrupt")).alias("n_corrupt"),
            F.sum(F.when(F.col("_corrupt").isNull(), F.col("o_orderkey"))).alias(
                "good_key_sum"
            ),
        )
        from mycarely_saas_dbt_spark.util import materialize

        return materialize(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


O_CSV_PERMISSIVE = f"""
SELECT CAST(SUM(CASE WHEN o_orderkey % {CORRUPT_EVERY} != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
       CAST(SUM(CASE WHEN o_orderkey % {CORRUPT_EVERY} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN o_orderkey % {CORRUPT_EVERY} != 0 THEN o_orderkey END) AS BIGINT) AS good_key_sum
FROM orders
"""


def register_queries(register) -> None:
    for name, fn, oracle in PAIRS:
        register(name, fn, oracle)
    register("format_csv_permissive", q_csv_permissive, O_CSV_PERMISSIVE)
