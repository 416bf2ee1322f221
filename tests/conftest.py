from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.01"
SF_SMALL = "/root/testdata/sf0.001"

DRIVER_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from mycarely_saas_dbt_spark.session import get_spark

    spark = get_spark(app_name="pytest")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in DRIVER_TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


def assert_df_matches_oracle(spark_df, duck_con, sql, *, check_schema=True):
    """Mimic the driver's compare: row count + (loose) schema + order-
    insensitive value comparison with columns sorted by name."""
    sdf = spark_df.toPandas()
    ddf = duck_con.execute(sql).fetchdf()
    assert len(sdf) == len(ddf), f"row count {len(sdf)} != {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns), (
        f"columns {sorted(sdf.columns)} != {sorted(ddf.columns)}"
    )
    cols = sorted(sdf.columns)

    def norm(df):
        df = df[cols].copy()
        mask = df.isna()
        out = df.astype(str)
        out[mask] = "<NULL>"
        return out.sort_values(cols, ignore_index=True)

    s, d = norm(sdf), norm(ddf)
    if not s.equals(d):
        diff = (s != d).any(axis=1)
        raise AssertionError(
            "value mismatch; first spark rows:\n"
            + s[diff].head(5).to_string()
            + "\nfirst oracle rows:\n"
            + d[diff].head(5).to_string()
        )
