"""Python Data Source (Spark 4 pyspark.sql.datasource): partition planning
and filter pushdown contracts for the ledger generator source."""

from __future__ import annotations

from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, LessThan

from tests.conftest import SF_DIR


def test_pyds_pushdown_narrows_generated_ranges():
    """Accepted row_id bounds must shrink the generated range BEFORE
    partition planning (rows outside are never produced); unsupported
    filters must be handed back to Spark."""
    from mycarely_saas_dbt_spark.sources.pydatasource import LedgerReader

    reader = LedgerReader({"n_rows": "10000"})
    unsupported = list(
        reader.pushFilters(
            [
                GreaterThanOrEqual(("row_id",), 2000),
                LessThan(("row_id",), 3000),
                EqualTo(("account_id",), 5),  # not ours — Spark's problem
            ]
        )
    )
    assert reader.lo == 2000 and reader.hi == 3000
    assert len(unsupported) == 1 and isinstance(unsupported[0], EqualTo)
    parts = reader.partitions()
    assert sum(p.end - p.start for p in parts) == 1000
    assert min(p.start for p in parts) == 2000
    assert max(p.end for p in parts) == 3000


def test_pyds_parallel_partitions_and_row_identity(spark):
    """The scan parallelism equals the planned partition count and the
    full-table read reproduces the generator exactly (edge rows included
    — a partition-boundary off-by-one would drop/duplicate them)."""
    from mycarely_saas_dbt_spark.sources.pydatasource import (
        register_ledger_source,
    )

    register_ledger_source(spark)
    df = (
        spark.read.format("mycarely_ledger")
        .option("n_rows", 1000)
        .option("n_parts", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = {r["row_id"]: r for r in df.collect()}
    assert len(rows) == 1000
    for probe in (0, 249, 250, 999):  # partition edges for 4x250
        r = rows[probe]
        assert r["account_id"] == probe % 97
        assert r["amount_cents"] == (probe * probe) % 10_000
