"""Mimic the driver's verify loop against __spark_entry__.py.

Runs: (t1) entry(spark) smoke at sf0.001; (t2) every queries() entry vs its
oracle_sql() via DuckDB at sf0.01 — row count + column set + order-insensitive
value compare (columns sorted by name, nulls normalized).

Usage: python scripts/driver_check.py [--sf-dir /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

DRIVER_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def compare(sdf, ddf) -> str | None:
    if len(sdf) != len(ddf):
        return f"row count spark={len(sdf)} oracle={len(ddf)}"
    if sorted(sdf.columns) != sorted(ddf.columns):
        return f"columns spark={sorted(sdf.columns)} oracle={sorted(ddf.columns)}"
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
        return (
            f"value mismatch on {int(diff.sum())} rows\nspark:\n"
            + s[diff].head(3).to_string()
            + "\noracle:\n"
            + d[diff].head(3).to_string()
        )
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from mycarely_saas_dbt_spark.session import get_spark

    spark = get_spark(app_name="driver-check")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    edf = e.entry(spark)
    n = edf.count()
    print(f"t1 smoke: entry() -> {n} rows, schema: {edf.schema.simpleString()[:200]}")
    assert n > 0

    con = duckdb.connect()
    for t in DRIVER_TABLES:
        p = f"{args.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names or list(qs)
    failures = 0
    for name in names:
        t1 = time.time()
        sdf = qs[name](spark, args.sf_dir).toPandas()
        if name not in oracles:
            print(f"t2 {name}: {len(sdf)} rows (rows-only check, no oracle) "
                  f"[{time.time()-t1:.1f}s]")
            continue
        ddf = con.execute(oracles[name]).fetchdf()
        err = compare(sdf, ddf)
        status = "OK" if err is None else "FAIL"
        print(f"t2 {name}: {len(sdf)} rows vs oracle {len(ddf)} -> {status} "
              f"[{time.time()-t1:.1f}s]")
        if err:
            failures += 1
            print(err)
    print(f"total {time.time()-t0:.1f}s, {failures} failures / {len(names)} queries")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
