"""Cross-engine determinism for dialect.epoch_seconds — the helper every
time-based operator leans on after the round-2 testdata moved events.ts to
TIMESTAMP_NTZ. Spark (UTC session tz) and DuckDB (naive) must floor to the
same epoch second for any microsecond timestamp, and the helper must accept
both TIMESTAMP and TIMESTAMP_NTZ inputs."""

from __future__ import annotations

import datetime as dt
import random

import pandas as pd

from mycarely_saas_dbt_spark.functions.dialect import epoch_seconds


def _sample_timestamps(n: int = 1000) -> list[dt.datetime]:
    rng = random.Random(20260813)
    base = dt.datetime(1995, 1, 1)
    out = []
    for _ in range(n):
        out.append(
            base
            + dt.timedelta(
                days=rng.randint(0, 11000),
                seconds=rng.randint(0, 86399),
                microseconds=rng.randint(0, 999999),
            )
        )
    # boundary cases: exact second, exact midnight, .999999
    out += [
        dt.datetime(2024, 1, 15, 0, 0, 0),
        dt.datetime(2024, 1, 15, 23, 59, 59, 999999),
        dt.datetime(1970, 1, 1, 0, 0, 0, 1),
    ]
    return out


def test_epoch_seconds_matches_duckdb_on_both_timestamp_types(spark, duck):
    ts = _sample_timestamps()
    pdf = pd.DataFrame({"ts": pd.Series(ts, dtype="datetime64[us]")})

    duck.register("ts_sample", pdf)
    expected = [
        r[0]
        for r in duck.execute(
            "SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) FROM ts_sample ORDER BY ts"
        ).fetchall()
    ]

    # NTZ path (what the round-2+ driver testdata produces)
    ntz = spark.createDataFrame(pdf, schema="ts timestamp_ntz")
    got_ntz = [
        r[0]
        for r in ntz.select(epoch_seconds("ts").alias("s"))
        .orderBy("s")
        .collect()
    ]
    # TIMESTAMP path (round-1 encoding, post-repair)
    tz = spark.createDataFrame(pdf, schema="ts timestamp")
    got_tz = [
        r[0]
        for r in tz.select(epoch_seconds("ts").alias("s")).orderBy("s").collect()
    ]

    assert got_ntz == sorted(expected)
    assert got_tz == sorted(expected)
