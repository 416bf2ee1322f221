"""Advanced join operators beyond the reference's equi-join surface:
as-of join, banded range join, and skew-mitigation (salted aggregation /
salted join) with provable output parity.

The reference (SURVEY §2.3) delegates physical join choice to Redshift and
only uses equi left joins; a training-data / event-analytics engine also
needs temporal joins and explicit skew handling. Everything here is built-in
Catalyst expressions, and every query's oracle is the *naive* relational
formulation — so the scalable rewrite is proven output-identical.

Scale notes (100 TB):
  * as-of join: the naive formulation is an inequality join + argmax, which
    Spark would execute as a sort-merge with an exploding range residual (or
    worse, broadcast-nested-loop). The union + last(ignorenulls) carry-
    forward used here is ONE hash exchange on the key and a per-partition
    sort — the merge-sort as-of algorithm, linear in input size, and the
    standard way to scale point-in-time joins (feature stores, tick data).
  * banded range self-join: equi key + bounded time band. Catalyst plans the
    equi part as the join key and keeps the band as a residual filter on
    each key group — no cross product, one shuffle on the key.
  * salting: a deterministic salt (key, row_id % N) splits hot keys across N
    reducers. For aggregation: partial agg on (key, salt) then final agg on
    key (two small shuffles instead of one stalled reducer). For joins: the
    small side is exploded N ways so every salted partition finds its match.
    AQE skew handling does this adaptively; the explicit form is for when
    the skew is known and stable (bot traffic, null-ish sentinel keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mycarely_saas_dbt_spark.functions.dialect import epoch_seconds
from mycarely_saas_dbt_spark.sources.registry import oracle_query, register_sources

__all__ = ["asof_join", "register_queries"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """Backward (inclusive) as-of join: for each left row, attach `payload`
    from the latest right row with right_time <= left_time and equal `on`.

    Merge-sort formulation: tag + union both inputs, one window partitioned
    by the key and ordered by (time, side) — right rows sort before left
    rows at equal time, so an exact-time match is visible — then carry the
    right payload forward with last(ignorenulls). One shuffle on `on`.
    """
    lt = left.withColumn("__t", F.col(left_time)).withColumn("__side", F.lit(1))
    for c in payload:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rt = right.withColumn("__t", F.col(right_time)).withColumn("__side", F.lit(0))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    cols = [on, "__t", "__side", *payload] + [
        c for c in left.columns if c not in {on, left_time}
    ]
    merged = lt.select(*cols).unionByName(rt.select(*cols))

    w = (
        Window.partitionBy(on)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return merged.filter(F.col("__side") == 1).drop("__side")


def q_asof_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each campaign event gets the most recent
    ad-spend figure on or before its date (backward as-of by campaign).
    Oracle: DuckDB's native ASOF LEFT JOIN over the same inputs."""
    register_sources(spark, sf_dir)
    ev = (
        spark.table("atomic_events")
        .filter(F.col("mkt_campaign").isNotNull())
        .select(
            "event_id",
            F.lower("mkt_campaign").alias("campaign"),
            F.col("collector_tstamp").cast("date").alias("event_date"),
        )
    )
    sp = (
        spark.table("campaign_spends")
        .filter(F.col("spend").isNotNull())
        .groupBy(F.col("campaign_name").alias("campaign"), "spend_date")
        .agg(F.sum("spend").alias("spend"))
    )
    out = asof_join(
        ev,
        sp,
        on="campaign",
        left_time="event_date",
        right_time="spend_date",
        payload=["spend_date", "spend"],
    )
    return out.select(
        "event_id", "campaign", F.col("__t").alias("event_date"), "spend_date", "spend"
    )


O_ASOF_SPEND = oracle_query(
    """
, e AS (
    SELECT event_id, lower(mkt_campaign) AS campaign,
           CAST(collector_tstamp AS DATE) AS event_date
    FROM atomic_events WHERE mkt_campaign IS NOT NULL
),
s AS (
    SELECT campaign_name AS campaign, spend_date, SUM(spend) AS spend
    FROM campaign_spends WHERE spend IS NOT NULL
    GROUP BY campaign_name, spend_date
)
SELECT e.event_id, e.campaign, e.event_date, s.spend_date, s.spend
FROM e ASOF LEFT JOIN s
  ON e.campaign = s.campaign AND e.event_date >= s.spend_date
""",
    "atomic_events",
    "campaign_spends",
)


def q_asof_spend_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME backward as-of join as ``q_asof_spend`` — hash-checked
    against the identical DuckDB ASOF LEFT JOIN oracle — expressed through
    Spark's COGROUPED-MAP API (``groupBy().cogroup().applyInPandas``), the
    one Arrow escape hatch the engine hadn't exercised: both sides shuffle
    once on the key, each key's two Arrow frames meet in one pandas
    function (``pd.merge_asof``, the vectorized per-group merge). Use this
    shape when per-key alignment logic outgrows what a window can express
    (interpolation, custom gap rules); the window formulation in
    ``asof_join`` remains the pure-JVM default."""
    import pandas as pd

    register_sources(spark, sf_dir)
    ev = (
        spark.table("atomic_events")
        .filter(F.col("mkt_campaign").isNotNull())
        .select(
            "event_id",
            F.lower("mkt_campaign").alias("campaign"),
            F.col("collector_tstamp").cast("date").alias("event_date"),
        )
    )
    sp = (
        spark.table("campaign_spends")
        .filter(F.col("spend").isNotNull())
        .groupBy(F.col("campaign_name").alias("campaign"), "spend_date")
        .agg(F.sum("spend").alias("spend"))
    )

    schema = (
        "event_id string, campaign string, event_date date, "
        "spend_date date, spend double"
    )

    def merge(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
        if left.empty:  # spend-only campaigns contribute no output rows
            return pd.DataFrame(
                {c: pd.Series(dtype="object") for c in
                 ["event_id", "campaign", "event_date", "spend_date", "spend"]}
            )
        l = left.assign(__t=pd.to_datetime(left["event_date"])).sort_values(
            ["__t", "event_id"], kind="mergesort"
        )
        if right.empty:
            out = l.assign(spend_date=None, spend=None)
        else:
            r = right.assign(
                __rt=pd.to_datetime(right["spend_date"])
            ).sort_values("__rt", kind="mergesort")[["__rt", "spend_date", "spend"]]
            out = pd.merge_asof(l, r, left_on="__t", right_on="__rt")
        return out[["event_id", "campaign", "event_date", "spend_date", "spend"]]

    return (
        ev.groupBy("campaign")
        .cogroup(sp.groupBy("campaign"))
        .applyInPandas(merge, schema)
    )


RANGE_BAND_S = 300


def q_range_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range self-join: per user, count ordered event pairs at most
    RANGE_BAND_S seconds apart. Equi key (user_id) + time-band residual —
    one shuffle, no cross product."""
    register_sources(spark, sf_dir)
    ev = spark.table("events").select(
        "user_id", "event_id", epoch_seconds("ts").alias("ts_s")
    )
    a, b = ev.alias("a"), ev.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("b.ts_s") > F.col("a.ts_s"))
            & (F.col("b.ts_s") <= F.col("a.ts_s") + RANGE_BAND_S),
        )
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


O_RANGE_PAIRS = f"""
SELECT a.user_id, COUNT(*) AS n_pairs
FROM (SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s FROM events) a
JOIN (SELECT user_id, event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s FROM events) b
  ON a.user_id = b.user_id
 AND b.ts_s > a.ts_s AND b.ts_s <= a.ts_s + {RANGE_BAND_S}
GROUP BY a.user_id
"""


N_SALT = 8


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed aggregation with explicit salting: partial agg on
    (key, row_id % N_SALT), final agg on key. `event_type` has only a
    handful of values — the worst-case skew for a single-stage shuffle.
    Oracle: the plain one-stage GROUP BY (provable equivalence)."""
    register_sources(spark, sf_dir)
    ev = spark.table("events")
    partial = (
        ev.withColumn("salt", F.col("event_id") % N_SALT)
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("value").alias("pv"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.round(F.sum("pv"), 2).alias("sum_value"),
    )


O_SALTED_AGG = """
SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY event_type
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed fact⋈dim join with explicit salting: the fact side salts its
    hot key, the dim side is exploded N_SALT ways so every salted partition
    finds its match. Oracle: the plain unsalted join + aggregate."""
    register_sources(spark, sf_dir)
    ev = spark.table("events")
    dim = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("dim_users"))
    )
    salted_dim = dim.select(
        "event_type",
        "dim_users",
        F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))).alias("salt"),
    )
    return (
        ev.withColumn("salt", (F.col("event_id") % N_SALT).cast("int"))
        .join(salted_dim, ["event_type", "salt"])
        .groupBy("event_type", "dim_users")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


O_SALTED_JOIN = """
WITH dim AS (
    SELECT event_type, COUNT(DISTINCT user_id) AS dim_users
    FROM events GROUP BY event_type
)
SELECT e.event_type, d.dim_users, COUNT(*) AS n_events
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type, d.dim_users
"""


RJ_BIN_DAYS = 32       # bin width; fan-out per interval = len/bin + 1 <= 6
RJ_N_PROMOS = 24
RJ_PROMO_STEP = 97     # < RJ_PROMO_LEN, so adjacent windows OVERLAP —
RJ_PROMO_LEN = 150     # a date can match two promos (the many-to-many case)


def q_interval_bin_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join with NO equi key — the shape Spark plans as
    a BroadcastNestedLoopJoin (every point against every interval: dead
    at 100 TB even with a small interval side, because the range
    predicate can't hash). The binned rewrite (the Databricks range-join
    optimization in plain DataFrame ops): each interval EXPLODES into
    the fixed-width date bins it covers (bounded fan-out:
    len/bin + 1 rows), each point computes its single bin, the join
    becomes a hash join on bin and the exact BETWEEN rides as the
    residual. Overlapping windows make it many-to-many, so a wrong
    dedup or a bin off-by-one flips the hash. Plan-gated: no
    BroadcastNestedLoopJoin, no CartesianProduct."""
    register_sources(spark, sf_dir)
    epoch = F.lit("1992-01-01").cast("date")
    promos = spark.range(RJ_N_PROMOS).select(
        F.col("id").alias("promo_id"),
        F.date_add(epoch, (F.col("id") * RJ_PROMO_STEP).cast("int")).alias("d0"),
        F.date_add(
            epoch, (F.col("id") * RJ_PROMO_STEP + RJ_PROMO_LEN).cast("int")
        ).alias("d1"),
    )
    binned = promos.select(
        "promo_id",
        "d0",
        "d1",
        F.explode(
            F.sequence(
                F.floor(F.datediff("d0", epoch) / RJ_BIN_DAYS),
                F.floor(F.datediff("d1", epoch) / RJ_BIN_DAYS),
            )
        ).alias("bin"),
    )
    o = spark.table("orders").select(
        "o_orderkey",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("od"),
    ).withColumn("bin", F.floor(F.datediff("od", epoch) / RJ_BIN_DAYS))
    return (
        o.join(F.broadcast(binned), "bin")
        .filter((F.col("od") >= F.col("d0")) & (F.col("od") <= F.col("d1")))
        .groupBy("promo_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .orderBy("promo_id")
    )


O_INTERVAL_BIN_JOIN = f"""
WITH promos AS (
    SELECT i AS promo_id,
           DATE '1992-01-01' + CAST(i * {RJ_PROMO_STEP} AS INT) AS d0,
           DATE '1992-01-01' + CAST(i * {RJ_PROMO_STEP} + {RJ_PROMO_LEN} AS INT) AS d1
    FROM UNNEST(range(0, {RJ_N_PROMOS})) AS t(i)
)
SELECT p.promo_id, COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM orders o JOIN promos p
  ON CAST(o.o_orderdate AS DATE) BETWEEN p.d0 AND p.d1
GROUP BY p.promo_id
ORDER BY p.promo_id
"""


PAIRS = [
    ("asof_join_spend", q_asof_spend, O_ASOF_SPEND),
    ("asof_join_spend_cogroup", q_asof_spend_cogroup, O_ASOF_SPEND),
    ("range_join_pairs", q_range_pairs, O_RANGE_PAIRS),
    ("skew_salted_agg", q_salted_agg, O_SALTED_AGG),
    ("skew_salted_join", q_salted_join, O_SALTED_JOIN),
    ("interval_bin_join", q_interval_bin_join, O_INTERVAL_BIN_JOIN),
]


def register_queries(register) -> None:
    for name, fn, oracle in PAIRS:
        register(name, fn, oracle)
