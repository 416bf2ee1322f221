"""Small engine utilities shared by the contract harnesses."""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Detach a result from inputs that are about to be deleted (temp
    incremental targets, throwaway bucket databases) WITHOUT pulling it
    through the driver.

    The previous pattern — ``spark.createDataFrame(df.collect(), schema)``
    — materializes the entire result in driver memory, which is fine for a
    sf0.01 contract check and an OOM at any real scale. A parquet
    round-trip keeps the copy distributed: executors write, executors read,
    the driver only brokers metadata. The temp dir lives until process exit
    (the returned DataFrame reads from it lazily) and is cleaned by atexit.
    """
    path = tempfile.mkdtemp(prefix="mycarely_mat_")
    atexit.register(shutil.rmtree, path, True)
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)
