"""Z-order (Morton space-filling curve) clustering for multi-column
data skipping.

A parquet lake prunes files/row-groups by min/max statistics. Sorting by
ONE column gives tight stats on that column only; normalizing each
clustering column onto a common grid and interleaving the grid
coordinates' bits (the Morton code), then sorting by the interleaved
value, gives every file a small axis-aligned bounding box in BOTH
dimensions — so range predicates on EITHER column skip files. This is
the layout trick behind lakehouse OPTIMIZE ZORDER (which likewise maps
each column to bounded range-ids before interleaving — raw values with
lopsided bit-widths would let the wider column dominate the curve),
expressed with plain integer Catalyst arithmetic (no UDF) and verified
against real parquet footers in tests/test_zorder.py.

Scale note: the grid normalization needs each column's bounds — two
scalar aggregates (or approx quantile boundaries for equal-frequency
grids), the same driver-side-scalar pattern as the incremental
watermark; the z-value itself is a narrow per-row expression and the
clustered write is one range-partitioned sort — the same single
global-sort cost as any one-column clustering, but buying pruning on N
dimensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.sources.registry import register_sources

GRID_BITS = 6          # per-dimension grid resolution (64 cells)
GRID = 1 << GRID_BITS


def morton2(x: F.Column, y: F.Column, bits: int = GRID_BITS) -> F.Column:
    """Interleave the low ``bits`` of x (even positions) and y (odd):
    classic 2-D Morton code, as a pure integer Catalyst expression
    (sum of shifted bit masks — stays inside whole-stage codegen)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _morton_sql(x: str, y: str, bits: int = GRID_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"(({x} >> {i}) & 1) * {1 << (2 * i)}")
        terms.append(f"(({y} >> {i}) & 1) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"


def _grid(col: F.Column, lo: int, hi: int) -> F.Column:
    """Map [lo, hi] onto the 0..GRID-1 grid with exact integer scaling."""
    span = max(hi - lo + 1, 1)
    return F.floor((col.cast("long") - F.lit(lo)) * GRID / F.lit(span)).cast("long")


def _grid_sql(col: str, lo: int, hi: int) -> str:
    span = max(hi - lo + 1, 1)
    return f"CAST(FLOOR(({col} - {lo}) * {GRID} / {span}) AS BIGINT)"


def zorder_write(df: DataFrame, path: str, x: str, y: str, n_files: int = 8) -> None:
    """Cluster ``df`` into ``n_files`` files by the Morton code of the
    grid-normalized (x, y): range-partition on z so files hold contiguous
    z-ranges, then sort within each file so row groups inherit tight
    stats too."""
    (xlo, xhi), (ylo, yhi) = (
        df.agg(F.min(x), F.max(x)).first(),
        df.agg(F.min(y), F.max(y)).first(),
    )
    z = morton2(_grid(F.col(x), xlo, xhi), _grid(F.col(y), ylo, yhi))
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def q_zorder_morton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton codes over the event log's grid-normalized
    (user_id, day-of-year) — the z-value computation hash-checked against
    the identical integer arithmetic in SQL (grid bounds come from the
    same scalar aggregates both engines run); per-z-range row counts
    summarize the curve."""
    register_sources(spark, sf_dir)
    ev = spark.table("events")
    xlo, xhi = ev.agg(F.min("user_id"), F.max("user_id")).first()
    d = F.dayofyear("ts").cast("long")
    ylo, yhi = ev.agg(F.min(d), F.max(d)).first()
    z = morton2(_grid(F.col("user_id"), xlo, xhi), _grid(d, ylo, yhi))
    return (
        ev.select(z.alias("zval"))
        .groupBy(F.floor(F.col("zval") / 256).cast("long").alias("z_range"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
    )


O_ZORDER_MORTON = f"""
WITH bounds AS (
    SELECT MIN(user_id) AS xlo, MAX(user_id) AS xhi,
           MIN(CAST(dayofyear(ts) AS BIGINT)) AS ylo,
           MAX(CAST(dayofyear(ts) AS BIGINT)) AS yhi
    FROM events
),
z AS (
    SELECT {_morton_sql(
        f"CAST(FLOOR((user_id - b.xlo) * {GRID} / (b.xhi - b.xlo + 1)) AS BIGINT)",
        f"CAST(FLOOR((CAST(dayofyear(ts) AS BIGINT) - b.ylo) * {GRID} / (b.yhi - b.ylo + 1)) AS BIGINT)",
    )} AS zval
    FROM events, bounds b
)
SELECT CAST(FLOOR(zval / 256) AS BIGINT) AS z_range,
       COUNT(*) AS n_rows,
       MIN(zval) AS z_min,
       MAX(zval) AS z_max
FROM z GROUP BY 1
"""


def register_queries(register) -> None:
    register("zorder_morton", q_zorder_morton, O_ZORDER_MORTON)
