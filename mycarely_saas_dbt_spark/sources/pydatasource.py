"""Custom Python Data Source (Spark 4 `pyspark.sql.datasource` API).

The modern extension surface for sources Spark has no connector for —
implemented here as a deterministic synthetic billing-ledger GENERATOR
so the cross-engine oracle can predict every row arithmetically (the
same trick as the WAV decode entry): row i has

    account_id   = i % 97
    amount_cents = (i * i) % 10_000
    day          = DATE '2024-01-01' + (i % 90)

Real API coverage, not a toy shim:

* ``partitions()`` splits the row space into ranges — Spark schedules
  one task per ``InputPartition``, so the source is read in parallel
  exactly like a file-based scan's splits.
* ``pushFilters()`` (Spark 4.1) accepts range/equality predicates on
  ``row_id`` and narrows the generated ranges BEFORE partition
  planning — rows outside the bounds are never produced at all (the
  generator's equivalent of predicate pushdown into a parquet scan);
  unsupported filters are returned to Spark to evaluate on top.

Scale notes: a generator source has no files to prune, so pushed
row-range bounds ARE its partition pruning; each partition yields rows
lazily (tuples, Arrow-batched by the worker), driver state is the
option dict only.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

LEDGER_SCHEMA = "row_id bigint, account_id bigint, amount_cents bigint, day date"
DEFAULT_ROWS = 10_000
DEFAULT_PARTS = 8


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class LedgerReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", DEFAULT_ROWS))
        self.n_parts = int(options.get("n_parts", DEFAULT_PARTS))
        self.lo, self.hi = 0, self.n_rows  # [lo, hi) after pushdown

    def pushFilters(self, filters):
        for f in filters:
            if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual,
                              LessThan, LessThanOrEqual)) and f.attribute == ("row_id",):
                v = f.value
                if isinstance(f, EqualTo):
                    self.lo, self.hi = max(self.lo, v), min(self.hi, v + 1)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, v + 1)
                elif isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, v)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, v)
                else:
                    self.hi = min(self.hi, v + 1)
                # accepted: do NOT yield it back — rows outside the bound
                # are never generated (checked by test_pyds_pushdown)
            else:
                yield f  # unsupported: Spark evaluates it post-scan

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = max(1, min(self.n_parts, hi - lo or 1))
        step = max(1, -(-(hi - lo) // n))
        return [_Range(s, min(s + step, hi)) for s in range(lo, hi, step)] or [
            _Range(0, 0)
        ]

    def read(self, part: _Range):
        # Arrow RecordBatch output (the API's vectorized variant): one
        # numpy pass per partition instead of a Python tuple per row —
        # the same ~100x batch-vs-row economics as pandas UDFs, and the
        # only sane shape for a source feeding a 1000-executor scan.
        import numpy as np
        import pyarrow as pa

        i = np.arange(part.start, part.end, dtype=np.int64)
        days = (i % 90).astype("timedelta64[D]") + np.datetime64("2024-01-01")
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(i),
                pa.array(i % 97),
                pa.array((i * i) % 10_000),
                pa.array(days.astype("datetime64[D]")),
            ],
            names=["row_id", "account_id", "amount_cents", "day"],
        )


class LedgerDataSource(DataSource):
    @classmethod
    def name(cls):
        return "mycarely_ledger"

    def schema(self):
        return LEDGER_SCHEMA

    def reader(self, schema):
        return LedgerReader(self.options)


def register_ledger_source(spark) -> None:
    spark.dataSource.register(LedgerDataSource)


def q_pyds_ledger_rollup(spark, sf_dir: str):
    """Read the custom Python data source in parallel partitions and roll
    up per account — the oracle re-derives the generator arithmetically
    (UNNEST(range(n))), so a partition-boundary bug (dropped/duplicated
    range edge) flips the hash."""
    from pyspark.sql import functions as F

    register_ledger_source(spark)
    df = (
        spark.read.format("mycarely_ledger")
        .option("n_rows", DEFAULT_ROWS)
        .option("n_parts", DEFAULT_PARTS)
        .load()
    )
    return (
        df.groupBy("account_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("amount_cents").cast("long").alias("total_cents"),
            F.max("day").alias("last_day"),
        )
    )


O_PYDS_ROLLUP = f"""
WITH g AS (
    SELECT i AS row_id, i % 97 AS account_id,
           (i * i) % 10000 AS amount_cents,
           DATE '2024-01-01' + CAST(i % 90 AS INT) AS day
    FROM UNNEST(range(0, {DEFAULT_ROWS})) AS u(i)
)
SELECT account_id, COUNT(*) AS n_rows,
       CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
       MAX(day) AS last_day
FROM g GROUP BY account_id
"""


def q_pyds_pushdown_slice(spark, sf_dir: str):
    """The same source under a row_id range predicate — the filter is
    ACCEPTED by pushFilters (rows outside [2000, 3000) are never
    generated; test_pyds_pushdown pins the narrowed partition planning),
    and the result must still match the oracle's post-filter arithmetic."""
    from pyspark.sql import functions as F

    register_ledger_source(spark)
    df = (
        spark.read.format("mycarely_ledger")
        .option("n_rows", DEFAULT_ROWS)
        .load()
        .filter((F.col("row_id") >= 2000) & (F.col("row_id") < 3000))
    )
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("amount_cents").cast("long").alias("total_cents"),
        F.min("row_id").alias("first_row"),
        F.max("row_id").alias("last_row"),
    )


O_PYDS_PUSHDOWN = """
WITH g AS (
    SELECT i AS row_id, (i * i) % 10000 AS amount_cents
    FROM UNNEST(range(2000, 3000)) AS u(i)
)
SELECT COUNT(*) AS n_rows, CAST(SUM(amount_cents) AS BIGINT) AS total_cents,
       MIN(row_id) AS first_row, MAX(row_id) AS last_row
FROM g
"""


def q_pyds_incremental_rollup(spark, sf_dir: str):
    """The extension surface composing with the ENGINE, not just a SELECT
    (VERDICT r6 item 7): the Python data source feeds a two-batch
    incremental model — scan → aggregate → manifest-committed target,
    watermark read back from the target's manifest stats, second batch
    merged by unique_key. The modeler translates the date watermark into
    the source's pushable row_id domain (bucket b covers row_id
    [b*250, (b+1)*250)), so the incremental re-scan is narrowed INSIDE
    ``pushFilters`` — rows before the watermark are never generated at
    all, the generator-source equivalent of watermark-pruned file
    skipping."""
    import datetime as dt
    import tempfile

    from pyspark.sql import functions as F

    from ..incremental import IncrementalRunner, ModelSpec

    register_ledger_source(spark)
    epoch = dt.date(2024, 1, 1)

    def build(n_rows: int):
        def b(sp, sfd, wm):
            src = (
                sp.read.format("mycarely_ledger")
                .option("n_rows", n_rows)
                .load()
            )
            if wm is not None:
                src = src.filter(
                    F.col("row_id") >= ((wm - epoch).days + 1) * 250
                )
            return (
                src.withColumn(
                    "bucket_day",
                    F.date_add(
                        F.lit(epoch), F.floor(F.col("row_id") / 250).cast("int")
                    ),
                )
                .groupBy("bucket_day")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.sum("amount_cents").cast("long").alias("sum_cents"),
                )
            )

        return b

    def spec(n_rows: int) -> ModelSpec:
        return ModelSpec(
            "pyds_ledger_rollup", "bucket_day", "bucket_day", build(n_rows)
        )

    root = tempfile.mkdtemp(prefix="mycarely_q_pyds_inc_")
    runner = IncrementalRunner(spark, root)
    runner.run(spec(6000), sf_dir)  # batch 1: CTAS, buckets 0-23
    runner.run(spec(DEFAULT_ROWS), sf_dir)  # batch 2: merge buckets 24-39
    return runner.read_target("pyds_ledger_rollup").orderBy("bucket_day")


O_PYDS_INCREMENTAL = f"""
WITH g AS (
    SELECT i AS row_id, (i * i) % 10000 AS amount_cents
    FROM UNNEST(range(0, {DEFAULT_ROWS})) AS u(i)
)
SELECT DATE '2024-01-01' + CAST(row_id // 250 AS INT) AS bucket_day,
       COUNT(*) AS n_rows,
       CAST(SUM(amount_cents) AS BIGINT) AS sum_cents
FROM g GROUP BY 1 ORDER BY 1
"""


def register_queries(register) -> None:
    register("pyds_ledger_rollup", q_pyds_ledger_rollup, O_PYDS_ROLLUP)
    register("pyds_pushdown_slice", q_pyds_pushdown_slice, O_PYDS_PUSHDOWN)
    register(
        "pyds_incremental_rollup", q_pyds_incremental_rollup, O_PYDS_INCREMENTAL
    )
