"""Small engine utilities shared by the contract harnesses."""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections import deque

from pyspark.sql import DataFrame

# Rotating window of materialize() temp dirs. The driver/bench/pytest
# consume each materialized result immediately (hash/compare, then move to
# the next query), so a bounded window caps disk usage over a 141-query
# session instead of accumulating one copy per call until process exit.
# Contract: the returned DataFrame stays readable for at least the next
# _MAT_KEEP materialize() calls — consume promptly.
_MAT_KEEP = 16
_MAT_DIRS: deque[str] = deque()


def _prune_mat_dirs() -> None:
    while len(_MAT_DIRS) > _MAT_KEEP:
        shutil.rmtree(_MAT_DIRS.popleft(), ignore_errors=True)


@atexit.register
def _cleanup_mat_dirs() -> None:
    while _MAT_DIRS:
        shutil.rmtree(_MAT_DIRS.popleft(), ignore_errors=True)


def materialize(df: DataFrame) -> DataFrame:
    """Detach a result from inputs that are about to be deleted (temp
    incremental targets, throwaway bucket databases) WITHOUT pulling it
    through the driver.

    The previous pattern — ``spark.createDataFrame(df.collect(), schema)``
    — materializes the entire result in driver memory, which is fine for a
    sf0.01 contract check and an OOM at any real scale. A parquet
    round-trip keeps the copy distributed: executors write, executors read,
    the driver only brokers metadata. Temp dirs are pruned on a rotating
    window (oldest beyond _MAT_KEEP deleted) and fully cleaned at exit.
    """
    path = tempfile.mkdtemp(prefix="mycarely_mat_")
    df.write.mode("overwrite").parquet(path)
    out = df.sparkSession.read.parquet(path)
    _MAT_DIRS.append(path)
    _prune_mat_dirs()
    return out
