"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same configs are the
ones we would set on a real cluster (AQE on, UTC session time zone so
timestamp->date casts are calendar-stable and match the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mycarely-saas-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    sp = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # AQE: runtime partition coalescing, skew-join splitting, and
        # broadcast conversion — the knobs that matter at 100 TB.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(sp))
        # Calendar-stable timestamp semantics (parity with the DuckDB oracle).
        .config("spark.sql.session.timeZone", "UTC")
        # Defensive: round-1 driver testdata stored events.ts as parquet
        # TIMESTAMP(NANOS) (rejected by Spark's reader without this conf);
        # round-2+ testdata is timestamp[us]. Keeping the conf costs nothing
        # and keeps the engine robust to either encoding — the registry
        # repairs ns-as-long columns conditionally (registry.load_table).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for any pandas_udf path (extensions only; parity needs none).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Spark 4.1 Python Data Source filter pushdown (off by default):
        # lets sources/pydatasource.py accept row-range predicates so
        # pruned rows are never generated
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
