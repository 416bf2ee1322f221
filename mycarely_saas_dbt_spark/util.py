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
# _MAT_KEEP materialize() calls — consume promptly. Sized at 64 so even a
# consumer that batches a few dozen results before comparing (bench's
# multi-run loops, a future aggregate-then-compare harness) stays inside
# the window; a 64-result window of sf0.01 outputs is a few hundred MB.
_MAT_KEEP = 64
_MAT_DIRS: deque[str] = deque()


# Per-call-site bounded persist: operators whose plan reuses an expensive
# intermediate (exploded shingles/fingerprints, candidate pairs) persist
# it; without cleanup, every registered-query invocation leaks its cached
# blocks for the life of the session (160-query driver sweep). Keyed per
# frame ("minhash:shingles"): the NEXT invocation under the same key
# unpersists the previous frame — bounded at one live generation per
# frame, while the current invocation's (lazy) plan stays cached until
# its consumer runs.
_PERSIST_REGISTRY: dict[str, DataFrame] = {}


def bounded_persist(df: DataFrame, site: str) -> DataFrame:
    prev = _PERSIST_REGISTRY.pop(site, None)
    if prev is not None:
        try:
            prev.unpersist()
        except Exception:
            pass
    _PERSIST_REGISTRY[site] = df
    return df.persist()


def fanout_scan(df: DataFrame) -> DataFrame:
    """Spread a narrow scan across the executor cores before an
    explode/UDF-heavy stage.

    Small single-file parquet inputs (one row group) arrive as ONE input
    partition, so an explode or Arrow stage directly above the scan runs
    single-threaded no matter how many cores the session has — at sf0.1
    this made shingling 3.5x slower than the same work on 32 splits. On a
    real 100 TB lake the scan already has thousands of splits and this is
    a metadata-only no-op (the condition below is false); the repartition
    only fires when the input has fewer splits than half the cores, so we
    never add a shuffle to a well-partitioned source.

    Currently applied at NO call site: the r6 paired interleaved A/B
    (scripts/ab_fanout.py) measured the protective repartition as a net
    loss or wash everywhere at sf0.1 — the r5 blanket application made
    three pure-Catalyst tokenize paths SLOWER (the added exchange cost
    more than the parallelism bought). The function, its unit test, and
    the MYCARELY_FANOUT=0 kill switch remain as the
    measurement record: a future site must re-adopt it explicitly AND
    show a paired A/B win (the harness only measures sites that call
    it).
    """
    import os

    if os.environ.get("MYCARELY_FANOUT", "1") == "0":
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df


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
