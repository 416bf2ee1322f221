"""Dialect shim edge cases (SURVEY §2.12 B6, §7 'what's hard' #1):
surrogate-key byte-parity across engines on NULL/empty/unicode/date/int
edges, and NULL-rejecting predicate semantics.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest

from mycarely_saas_dbt_spark.functions.dialect import (
    SURROGATE_KEY_NULL,
    surrogate_key,
    surrogate_key_sql,
)


EDGE_ROWS = [
    # (s1, s2, i1, d1)
    ("plain", "x", 1, dt.date(2024, 1, 1)),
    (None, "x", 1, dt.date(2024, 1, 1)),          # NULL -> sentinel
    ("", "x", 1, dt.date(2024, 1, 1)),            # empty string != NULL
    ("-", "-", 0, dt.date(1900, 1, 1)),           # separator collision input
    ("a-b", "c", -5, dt.date(1999, 12, 31)),      # negative int formatting
    ("ünïcødé", "雪", 2**31, dt.date(2024, 2, 29)),  # unicode + leap day
    (SURROGATE_KEY_NULL, None, None, None),       # sentinel-as-value vs NULL
    ("UPPER", "MiXeD", 7, dt.date(2024, 12, 31)),
]


@pytest.fixture(scope="module")
def edge_df(tmp_path_factory):
    p = tmp_path_factory.mktemp("edges") / "edges.parquet"
    pdf = pd.DataFrame(
        EDGE_ROWS, columns=["s1", "s2", "i1", "d1"]
    ).astype({"i1": "Int64"})
    pdf.to_parquet(p)
    return str(p)


def test_surrogate_key_byte_parity(spark, edge_df):
    """Spark md5 concat == DuckDB md5 concat, byte for byte, across NULL /
    empty / unicode / negative-int / date inputs."""
    sdf = spark.read.parquet(edge_df)
    got = [
        r.key
        for r in sdf.select(
            surrogate_key("s1", "s2", "i1", "d1").alias("key")
        ).collect()
    ]
    con = duckdb.connect()
    sql = surrogate_key_sql(["s1", "s2", "i1", "d1"])
    want = [
        r[0]
        for r in con.execute(f"SELECT {sql} FROM '{edge_df}'").fetchall()
    ]
    assert got == want


def test_null_vs_sentinel_keys_differ(spark, edge_df):
    """A NULL field and a literal sentinel string must produce the same key
    (dbt_utils semantics — a known, documented collision), while NULL vs
    empty string must differ."""
    sdf = spark.read.parquet(edge_df)
    keys = {
        (r.s1,): r.key
        for r in sdf.select(
            "s1", surrogate_key("s1").alias("key")
        ).collect()
    }
    assert keys[(None,)] == keys[(SURROGATE_KEY_NULL,)]  # documented collision
    assert keys[(None,)] != keys[("",)]


def test_not_ilike_null_semantics(spark):
    """NOT ILIKE drops NULL rows; != drops NULL rows (3-valued logic)."""
    from pyspark.sql import functions as F

    from mycarely_saas_dbt_spark.functions.dialect import not_ilike

    df = spark.createDataFrame(
        [("Mozilla",), ("GoogleBot",), (None,)], ["ua"]
    )
    kept = [r.ua for r in df.filter(not_ilike("ua", "%bot%")).collect()]
    assert kept == ["Mozilla"]  # NULL dropped, case-insensitive match dropped

    df2 = spark.createDataFrame([("internal",), ("paid",), (None,)], ["m"])
    kept2 = [r.m for r in df2.filter(F.col("m") != "internal").collect()]
    assert kept2 == ["paid"]  # NULL dropped by !=


def test_variadic_nvl(spark):
    from pyspark.sql import functions as F

    from mycarely_saas_dbt_spark.functions.dialect import nvl

    df = spark.createDataFrame(
        [(None, None, "c"), (None, "b", "c"), ("a", None, None), (None, None, None)],
        ["x", "y", "z"],
    )
    got = [r.v for r in df.select(nvl("x", "y", "z", F.lit("fb")).alias("v")).collect()]
    assert got == ["c", "b", "a", "fb"]
    with pytest.raises(ValueError):
        nvl("x")


# --------------------------------------------------------------------------
# property-based parity (SURVEY §5.2 — hypothesis for null-handling edges)
# --------------------------------------------------------------------------

from hypothesis import given, settings, HealthCheck
from hypothesis import strategies as st

_text = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)  # no lone surrogates
        ),
        max_size=24,
    ),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(st.tuples(_text, _text, st.integers(-(2**62), 2**62) | st.none()), min_size=1, max_size=16))
def test_surrogate_key_parity_property(spark, tmp_path_factory, rows):
    """For ANY (nullable text, nullable text, nullable int) rows, the Spark
    surrogate key byte-matches DuckDB's rendering of the same macro."""
    p = str(tmp_path_factory.mktemp("hyp") / "rows.parquet")
    pdf = pd.DataFrame(rows, columns=["a", "b", "i"]).astype({"i": "Int64"})
    pdf.to_parquet(p)
    got = [
        r.key
        for r in spark.read.parquet(p)
        .select(surrogate_key("a", "b", "i").alias("key"))
        .collect()
    ]
    con = duckdb.connect()
    sql = surrogate_key_sql(["a", "b", "i"])
    want = [r[0] for r in con.execute(f"SELECT {sql} FROM '{p}'").fetchall()]
    assert got == want
