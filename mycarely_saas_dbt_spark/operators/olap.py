"""General OLAP operator extensions: window analytics, multi-dimensional
aggregation (ROLLUP / CUBE / GROUPING SETS), pivot, top-k, sessionization,
and exact percentiles.

The reference's operator surface (SURVEY §2) stops at ranking windows and
plain GROUP BY; a user migrating real analytics workloads onto this engine
needs the rest of the standard OLAP vocabulary. Everything here is built-in
Catalyst expressions — no UDFs — and each query ships a DuckDB oracle.

Scale notes (100 TB):
  * windowed analytics partition by a key (customer / user) — the shuffle is
    one hash exchange on that key and each partition sorts locally; no global
    sort anywhere except top-k, which Spark executes as TakeOrderedAndProject
    (per-partition heap + driver merge of k rows, never a full sort).
  * ROLLUP/CUBE expand via Catalyst's Expand operator — one shuffle, rows
    duplicated per grouping set map-side with partial aggregation, so the
    exchange carries pre-combined rows.
  * sessionization is the lag/cumsum formulation (deterministic, oracle-
    checkable). In production-streaming form the same semantics are
    F.session_window(ts, gap) / applyInPandasWithState — see
    streaming/traffic_stream.py for the streaming scaffolding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.functions.dialect import epoch_seconds
from mycarely_saas_dbt_spark.sources.registry import register_sources


def _src(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    register_sources(spark, sf_dir)
    return spark.table(name)


# --------------------------------------------------------------------------
# window analytics
# --------------------------------------------------------------------------

def q_win_lag_lead(spark, sf_dir):
    """LAG/LEAD over a per-customer order timeline + day gap to the previous
    order. One hash exchange on o_custkey, local sort per partition."""
    o = _src(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_custkey",
        "o_orderkey",
        d.alias("order_date"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.datediff(d, F.lag(d).over(w)).cast("bigint").alias("days_since_prev"),
    )


O_WIN_LAG_LEAD = """
SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice,
       LAG(o_totalprice) OVER w AS prev_price,
       LEAD(o_totalprice) OVER w AS next_price,
       date_diff('day', LAG(CAST(o_orderdate AS DATE)) OVER w,
                 CAST(o_orderdate AS DATE)) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_win_running(spark, sf_dir):
    """Cumulative sum + 3-row moving sum per customer (explicit ROWS
    frames). Moving SUM, not AVG: a 2-row frame's avg of 2-decimal prices
    lands exactly on .xx5 where double representation tips Spark and DuckDB
    to different sides of ROUND — sums of 2-decimal values round stably."""
    o = _src(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wmov = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("order_seq"),
        F.round(F.sum("o_totalprice").over(wcum), 2).alias("cum_spend"),
        F.round(F.sum("o_totalprice").over(wmov), 2).alias("mov_sum3"),
        F.count(F.lit(1)).over(wmov).alias("n_in_frame"),
    )


O_WIN_RUNNING = """
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER w AS order_seq,
       ROUND(SUM(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend,
       ROUND(SUM(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mov_sum3,
       COUNT(*) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS n_in_frame
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_win_rank_ntile(spark, sf_dir):
    """RANK / DENSE_RANK / NTILE / PERCENT_RANK over urgent orders. The
    ORDER BY carries a unique tiebreak (o_orderkey) so NTILE assignment is
    deterministic. Global window — fine at report cardinality; at 100 TB
    rank within partitions or top-k instead (see q_topk_orders)."""
    o = _src(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


O_WIN_RANK_NTILE = """
SELECT o_orderkey, o_totalprice,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk,
       NTILE(4) OVER w AS quartile,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
FROM orders
WHERE o_orderpriority = '1-URGENT'
WINDOW w AS (ORDER BY o_totalprice DESC, o_orderkey)
"""


# --------------------------------------------------------------------------
# multi-dimensional aggregation
# --------------------------------------------------------------------------

def q_agg_rollup(spark, sf_dir):
    """ROLLUP(l_returnflag, l_linestatus): detail + subtotal + grand total in
    one pass (Expand + single shuffle, partials map-side combined)."""
    li = _src(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
    )


O_AGG_ROLLUP = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
       COUNT(*) AS n,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def q_agg_cube(spark, sf_dir):
    """CUBE(o_orderstatus, o_orderpriority): all 4 grouping sets."""
    o = _src(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


O_AGG_CUBE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


# one SQL string, two engines — Spark SQL and DuckDB parse it identically
GROUPING_SETS_SQL = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       ROUND(SUM(l_extendedprice), 2) AS sum_price
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q_agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS via the SQL front-end (the engine-portable
    string doubles as the oracle)."""
    register_sources(spark, sf_dir)
    return spark.sql(GROUPING_SETS_SQL)


# --------------------------------------------------------------------------
# pivot / top-k / histogram / percentiles
# --------------------------------------------------------------------------

def q_pivot_returnflag(spark, sf_dir):
    """groupBy().pivot() with an explicit value list (no extra distinct job;
    one shuffle). Oracle is the conditional-aggregation rewrite."""
    li = _src(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )


O_PIVOT_RETURNFLAG = """
SELECT l_linestatus,
       ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
       ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
FROM lineitem
GROUP BY l_linestatus
"""


def q_topk_orders(spark, sf_dir):
    """Top-15 orders by price (unique tiebreak). Spark plans this as
    TakeOrderedAndProject: per-partition heaps, k rows to the driver — the
    only safe 'ORDER BY' at 100 TB."""
    o = _src(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
    )


O_TOPK_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 15
"""


def q_hist_totalprice(spark, sf_dir):
    """Fixed-width histogram via integer binning — a groupBy on a derived
    key (map-side combinable; bins ≪ rows so the shuffle is tiny)."""
    o = _src(spark, sf_dir, "orders")
    return (
        o.withColumn("bucket", F.floor(F.col("o_totalprice") / F.lit(50000.0)).cast("bigint"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


O_HIST_TOTALPRICE = """
SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket, COUNT(*) AS n
FROM orders
GROUP BY 1
"""


def q_percentile_qty(spark, sf_dir):
    """Exact interpolated percentiles of l_quantity per return flag
    (Spark `percentile` ≡ DuckDB `quantile_cont`). At 100 TB switch to
    approx_percentile — exact percentile shuffles every value per group."""
    li = _src(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.75)"), 4).alias("p75"),
        F.round(F.expr("percentile(l_quantity, 0.95)"), 4).alias("p95"),
    )


O_PERCENTILE_QTY = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.25), 4) AS p25,
       ROUND(quantile_cont(l_quantity, 0.50), 4) AS p50,
       ROUND(quantile_cont(l_quantity, 0.75), 4) AS p75,
       ROUND(quantile_cont(l_quantity, 0.95), 4) AS p95
FROM lineitem
GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# sessionization
# --------------------------------------------------------------------------

SESSION_GAP_S = 1800


def q_sessionize_events(spark, sf_dir):
    """Gap-based sessionization of the event log (30-min inactivity gap):
    lag → new-session flag → running sum = session id → per-session rollup.

    Deterministic lag/cumsum formulation so the oracle can replicate it
    exactly. Streaming/100 TB equivalents of the same semantics:
    F.session_window(ts, '30 minutes') (native merging session windows,
    single shuffle) or applyInPandasWithState for custom state; batch shape
    here costs one exchange on user_id then a cheap (user_id, seq) groupBy.
    """
    ev = _src(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts_s = epoch_seconds("ts")
    prev_s = F.lag(ts_s).over(w)
    new_sess = F.when(
        prev_s.isNull() | ((ts_s - prev_s) > SESSION_GAP_S), 1
    ).otherwise(0)
    return (
        ev.withColumn("session_seq", F.sum(new_sess).over(wcum))
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_s).alias("start_s"),
            F.max(ts_s).alias("end_s"),
            (F.max(ts_s) - F.min(ts_s)).alias("duration_s"),
        )
    )


O_SESSIONIZE_EVENTS = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                 - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
-- the cumsum window must order by the SAME key as the lag window
-- (full-precision ts, event_id) — ordering one window by floored ts_s
-- risks a data-dependent mismatch when two events share a floored second
sessions AS (
  SELECT user_id, event_id, ts_s,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events,
       MIN(ts_s) AS start_s,
       MAX(ts_s) AS end_s,
       MAX(ts_s) - MIN(ts_s) AS duration_s
FROM sessions
GROUP BY user_id, session_seq
"""


def q_sessionize_session_window(spark, sf_dir):
    """The same 30-min-gap sessionization as q_sessionize_events, but via
    the native F.session_window aggregation — ONE shuffle on (user_id,
    merged window), no per-user sort, partial merges map-side. This is the
    batch scale path (the lag/cumsum formulation sorts every user's
    partition); boundary parity with the strict-> gap rule is exact on
    floored seconds (session_window merges iff ts <= prev + gap — see
    streaming/traffic_stream.py sessionize_stream).

    Output matches the streaming_sessionize contract: (user_id, start_s,
    end_s, n_events, duration_s); session_window.end carries +gap, so
    end_s subtracts it back.
    """
    ev = _src(spark, sf_dir, "events")
    tss = F.timestamp_seconds(epoch_seconds("ts"))
    return (
        ev.select("user_id", tss.alias("tss"))
        .groupBy(F.session_window("tss", f"{SESSION_GAP_S} seconds"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").cast("long").alias("start_s"),
            (F.col("session_window.end").cast("long") - SESSION_GAP_S).alias("end_s"),
            "n_events",
        )
        .withColumn("duration_s", F.col("end_s") - F.col("start_s"))
    )


O_SESSIONIZE_SW = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_s,
         CASE WHEN LAG(ts) OVER w IS NULL
              OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                 - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > {SESSION_GAP_S}
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts_s,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM flagged
)
SELECT user_id,
       MIN(ts_s) AS start_s,
       MAX(ts_s) AS end_s,
       COUNT(*) AS n_events,
       MAX(ts_s) - MIN(ts_s) AS duration_s
FROM sessions
GROUP BY user_id, session_seq
"""


# --------------------------------------------------------------------------
# product-analytics suite: funnel, retention cohorts, linear interpolation
# --------------------------------------------------------------------------

def q_order_stats(spark, sf_dir):
    """Exact order statistics with engine-portable tie rules: discrete
    median (the ceil(n/2)-th smallest ACTUAL value — no interpolation, so
    no float-tie hazards) via a row_number pick, and the modal value with
    an explicit (count DESC, value ASC) tiebreak — DuckDB's mode() leaves
    ties unspecified, so both sides spell the argmax out."""
    li = _src(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).withColumn("rn", F.row_number().over(w))
    counts = ranked.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    p50 = (
        ranked.join(counts, "l_returnflag")
        .filter(F.col("rn") == F.ceil(F.col("n") / 2))
        .select("l_returnflag", F.col("l_extendedprice").alias("p50_disc"), "n")
    )
    mode = (
        li.groupBy("l_returnflag", "l_quantity")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("l_returnflag")
        .agg(
            F.max_by(
                "l_quantity",
                F.struct(F.col("c"), (-F.col("l_quantity")).alias("nq")),
            ).alias("mode_qty")
        )
    )
    return p50.join(mode, "l_returnflag").select(
        "l_returnflag", "n", "p50_disc", "mode_qty"
    )


O_ORDER_STATS = """
WITH ranked AS (
    SELECT l_returnflag, l_extendedprice,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag
                              ORDER BY l_extendedprice) AS rn,
           COUNT(*) OVER (PARTITION BY l_returnflag) AS n
    FROM lineitem
),
p50 AS (
    SELECT l_returnflag, n, l_extendedprice AS p50_disc
    FROM ranked WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
),
m AS (
    SELECT l_returnflag, l_quantity AS mode_qty,
           ROW_NUMBER() OVER (PARTITION BY l_returnflag
                              ORDER BY COUNT(*) DESC, l_quantity ASC) AS mr
    FROM lineitem GROUP BY l_returnflag, l_quantity
)
SELECT p.l_returnflag, CAST(p.n AS BIGINT) AS n, p.p50_disc, m.mode_qty
FROM p50 p JOIN m ON p.l_returnflag = m.l_returnflag AND m.mr = 1
"""


def q_win_cumulative_distinct(spark, sf_dir):
    """Cumulative DISTINCT count over time — COUNT(DISTINCT) is not
    window-able directly (per-row distinct state explodes), so use the
    classic rewrite: flag each user's FIRST day (one groupBy), count new
    users per day, running-sum the counts. Two cheap shuffles total,
    instead of a quadratic per-day distinct rescan."""
    ev = _src(spark, sf_dir, "events")
    day = F.col("ts").cast("date").alias("day")
    first_day = (
        ev.select("user_id", day)
        .groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("new_users"))
    )
    all_days = (
        ev.select(day).groupBy("day").agg(F.count(F.lit(1)).alias("n_events"))
    )
    g = all_days.join(first_day, "day", "left").withColumn(
        "new_users", F.coalesce("new_users", F.lit(0))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return g.select(
        "day",
        "n_events",
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_distinct_users"),
    )


O_WIN_CUM_DISTINCT = """
WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
first AS (
    SELECT day, COUNT(*) AS new_users
    FROM (SELECT user_id, MIN(day) AS day FROM ev GROUP BY user_id)
    GROUP BY day
),
days AS (SELECT day, COUNT(*) AS n_events FROM ev GROUP BY day)
SELECT d.day, d.n_events,
       CAST(COALESCE(f.new_users, 0) AS BIGINT) AS new_users,
       CAST(SUM(COALESCE(f.new_users, 0)) OVER (
           ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS cum_distinct_users
FROM days d LEFT JOIN first f ON d.day = f.day
"""


def q_stats_moments(spark, sf_dir):
    """corr / covariance / stddev per event_type WITHOUT float-order
    nondeterminism: raw moments (n, Σx, Σy, Σxy, Σx², Σy²) are accumulated
    as EXACT integers (cents × day-index), then the textbook formulas run
    on those exact sums in double — both engines compute identical
    doubles from identical integers, so even corr hash-matches. The
    shuffle profile is a plain one-pass groupBy with map-side partials —
    this is also how you get corr on 100 TB without a second pass."""
    ev = _src(spark, sf_dir, "events")
    x = F.floor(F.col("value") * 100).cast("long")               # cents
    y = F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01")).cast("long")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (n - 1)
    vx = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / (n - 1)
    vy = (F.col("syy") - F.col("sy") * F.col("sy") / n) / (n - 1)
    return m.select(
        "event_type",
        "n",
        cov.alias("cov_xy"),
        F.sqrt(vx).alias("stddev_x"),
        F.sqrt(vy).alias("stddev_y"),
        (cov / F.sqrt(vx) / F.sqrt(vy)).alias("corr_xy"),
    )


O_STATS_MOMENTS = """
WITH m AS (
    SELECT event_type,
           COUNT(*) AS n,
           SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
           SUM(x * x) AS sxx, SUM(y * y) AS syy
    FROM (
        SELECT event_type,
               CAST(FLOOR(value * 100) AS BIGINT) AS x,
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS y
        FROM events
    )
    GROUP BY event_type
)
SELECT event_type, n,
       (sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS cov_xy,
       sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS stddev_x,
       sqrt((syy - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS stddev_y,
       ((sxy - sx * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
           / sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
           / sqrt((syy - sy * sy / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS corr_xy
FROM m
"""


def q_win_range_interval(spark, sf_dir):
    """RANGE-frame window over a gapped daily series: 7-day trailing sum
    and count per event_type, where the frame is bounded by VALUE distance
    (6 days preceding) rather than row count — missing days simply aren't
    in the frame, which a ROWS frame would get wrong. Numeric day index
    keys the range frame (Spark's rangeBetween needs a numeric ordering
    expression); base metric in exact cents for determinism."""
    ev = _src(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.col("ts").cast("date"))
        .filter(F.dayofmonth("day") % 3 != 0)  # gapped on purpose
        .groupBy("event_type", "day")
        .agg(F.sum(F.floor(F.col("value") * 100)).cast("long").alias("cents"))
        .withColumn("day_n", F.datediff("day", F.lit("2024-01-01")))
    )
    w = Window.partitionBy("event_type").orderBy("day_n").rangeBetween(-6, 0)
    return daily.select(
        "event_type",
        "day",
        "cents",
        F.sum("cents").over(w).alias("cents_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("days_in_frame"),
    )


O_WIN_RANGE_INTERVAL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents,
           date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_n
    FROM events
    WHERE dayofmonth(CAST(ts AS DATE)) % 3 != 0
    GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type, day, cents,
       CAST(SUM(cents) OVER w AS BIGINT) AS cents_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS days_in_frame
FROM daily
WINDOW w AS (PARTITION BY event_type ORDER BY day_n
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


def q_funnel_stages(spark, sf_dir):
    """Ordered funnel view -> click -> purchase: each stage's timestamp must
    STRICTLY follow the previous stage's first qualifying time (min-ts per
    stage, chained). Three key-partitioned aggregations — each a single
    shuffle on user_id with map-side partials; no window sort, no UDF. The
    join chain stays on one key so AQE co-locates the stages. Output: one
    row of stage counts + conversion ratios."""
    ev = _src(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    counts = (
        s1.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(s2.agg(F.count(F.lit(1)).alias("n_click")))
        .crossJoin(s3.agg(F.count(F.lit(1)).alias("n_purchase")))
    )
    return counts.select(
        "n_view",
        "n_click",
        "n_purchase",
        (F.col("n_click") / F.col("n_view")).alias("view_to_click"),
        (F.col("n_purchase") / F.col("n_click")).alias("click_to_purchase"),
    )


O_FUNNEL = """
WITH s1 AS (
    SELECT user_id, MIN(ts) AS t1 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, MIN(e.ts) AS t2
    FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, MIN(e.ts) AS t3
    FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_click,
       (SELECT COUNT(*) FROM s3) AS n_purchase,
       CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
           / (SELECT COUNT(*) FROM s1) AS view_to_click,
       CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
           / (SELECT COUNT(*) FROM s2) AS click_to_purchase
"""


def q_retention_cohorts(spark, sf_dir):
    """Weekly retention matrix: cohort = Monday-truncated week of a user's
    first event; one row per (cohort_week, week_offset) with the count of
    cohort users active that week. first-seen = one groupBy(user); activity
    weeks = distinct projection; offset from integer day arithmetic —
    everything map-side-combining aggregations, no window."""
    ev = _src(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("week")
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff("week", "cohort_week") / 7).cast("long").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


O_RETENTION = """
WITH ev AS (
    SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
),
first AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY user_id),
active AS (SELECT DISTINCT user_id, week FROM ev)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.week) / 7 AS BIGINT) AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN first f ON a.user_id = f.user_id
GROUP BY f.cohort_week, CAST(date_diff('day', f.cohort_week, a.week) / 7 AS BIGINT)
"""


def q_ts_interpolate(spark, sf_dir):
    """Linear interpolation over a gapped daily series: daily per-type
    value sums (in exact floored cents — double sums are order-dependent,
    ints are not) with every 3rd day REMOVED, re-scaffolded and filled by
    lerp between the IGNORE-NULLS neighbors on each side. The carry
    windows are per-type sorted — fine at any scale because the partition
    key count is bounded and each series is one shuffle partition's worth
    of days; edge days with only one neighbor carry it flat."""
    ev = _src(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.col("ts").cast("date"))
        .filter(F.dayofmonth("day") % 3 != 0)  # synthetic gaps
        .groupBy("event_type", "day")
        .agg(F.sum(F.floor(F.col("value") * 100)).cast("long").alias("cents"))
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    scaffold = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    g = scaffold.join(daily, ["event_type", "day"], "left")
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    day_n = F.datediff("day", F.lit("2024-01-01"))
    prev_v = F.last("cents", ignorenulls=True).over(wp)
    prev_d = F.last(F.when(F.col("cents").isNotNull(), day_n), True).over(wp)
    next_v = F.first("cents", ignorenulls=True).over(wf)
    next_d = F.first(F.when(F.col("cents").isNotNull(), day_n), True).over(wf)
    lerp = F.when(F.col("cents").isNotNull(), F.col("cents").cast("double")).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * (day_n - prev_d) / (next_d - prev_d),
        ).otherwise(F.coalesce(prev_v, next_v).cast("double"))
    )
    return g.select(
        "event_type",
        "day",
        F.col("cents").isNull().alias("interpolated"),
        lerp.alias("cents_filled"),
    )


O_TS_INTERPOLATE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events
    WHERE dayofmonth(CAST(ts AS DATE)) % 3 != 0
    GROUP BY event_type, CAST(ts AS DATE)
),
bounds AS (
    SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY event_type
),
scaffold AS (
    SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
    FROM bounds
),
g AS (
    SELECT s.event_type, s.day, d.cents,
           date_diff('day', DATE '2024-01-01', s.day) AS day_n
    FROM scaffold s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
),
w AS (
    SELECT *,
        LAST_VALUE(cents IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        LAST_VALUE(CASE WHEN cents IS NOT NULL THEN day_n END IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
        FIRST_VALUE(cents IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        FIRST_VALUE(CASE WHEN cents IS NOT NULL THEN day_n END IGNORE NULLS) OVER (
            PARTITION BY event_type ORDER BY day
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d
    FROM g
)
SELECT event_type, day,
       cents IS NULL AS interpolated,
       CASE WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE)
            WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                 THEN prev_v + (next_v - prev_v) * CAST(day_n - prev_d AS DOUBLE)
                      / (next_d - prev_d)
            ELSE CAST(COALESCE(prev_v, next_v) AS DOUBLE) END AS cents_filled
FROM w
"""


# --------------------------------------------------------------------------
# registration
# --------------------------------------------------------------------------

def q_max_by(spark, sf_dir):
    """Built-in argmax/argmin (max_by/min_by): per customer, the order key
    of the priciest and cheapest order — the single-pass aggregate form of
    the W2 window argmax (no sort, no rank; one shuffle, map-side partials).
    Tie-break made deterministic by folding (price, orderkey) into one
    exact bigint key (cents × mult ± orderkey) — DuckDB's arg_max does not
    order on composite struct keys. The fold multiplier is DERIVED from the
    key domain (next power of 10 above max(o_orderkey), via a broadcast
    scalar subquery — a cheap single-column partial agg) instead of a
    hard-coded 1e8, so the fold stays injective at any scale factor.
    int64 headroom: cents ≤ ~6e7 × mult 1e10 (sf100 keys) ≈ 6e17 < 2^63."""
    o = _src(spark, sf_dir, "orders")
    mult_df = o.agg(
        F.pow(F.lit(10), F.ceil(F.log10(F.max("o_orderkey") + F.lit(1))))
        .cast("long")
        .alias("__mult")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    kmax = cents * F.col("__mult") + F.col("o_orderkey")
    kmin = cents * F.col("__mult") - F.col("o_orderkey")
    return (
        o.join(F.broadcast(mult_df))
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", kmax).alias("best_order"),
            F.min_by("o_orderkey", kmin).alias("worst_order"),
            F.max("o_totalprice").alias("best_price"),
        )
    )


O_MAX_BY = """
SELECT o_custkey,
       arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT)
                           * m.__mult + o_orderkey) AS best_order,
       arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT)
                           * m.__mult - o_orderkey) AS worst_order,
       MAX(o_totalprice) AS best_price
FROM orders,
     (SELECT CAST(POWER(10, CEIL(LOG10(MAX(o_orderkey) + 1))) AS BIGINT)
          AS __mult FROM orders) m
GROUP BY o_custkey
"""


def q_nullsafe_join(spark, sf_dir):
    """Null-safe equality (<=>): join event rows on a nullable derived key
    where NULL must match NULL — standard equi-join machinery applies (the
    null bucket co-locates), unlike `=` which drops NULL keys."""
    register_sources(spark, sf_dir)
    ev = spark.table("atomic_events")
    left = ev.groupBy(F.col("refr_source").alias("k")).agg(
        F.count(F.lit(1)).alias("n_events")
    )
    right = ev.groupBy(F.col("refr_source").alias("k")).agg(
        F.countDistinct("domain_userid").alias("n_users")
    )
    return left.join(right, left.k.eqNullSafe(right.k)).select(
        left.k.alias("refr_source"), "n_events", "n_users"
    )


# continues the oracle_query() view-CTE list (leading comma)
O_NULLSAFE_JOIN = """
, l AS (SELECT refr_source AS k, COUNT(*) AS n_events
        FROM atomic_events GROUP BY refr_source),
  r AS (SELECT refr_source AS k, COUNT(DISTINCT domain_userid) AS n_users
        FROM atomic_events GROUP BY refr_source)
SELECT l.k AS refr_source, l.n_events, r.n_users
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
"""


def q_regex_normalize(spark, sf_dir):
    """Regex text normalization: strip non-alphanumerics, collapse runs of
    whitespace — the canonicalization step before fingerprinting. Pattern
    syntax kept to the common RE2/Java subset; DuckDB needs the explicit
    'g' flag where Spark's regexp_replace is global by default."""
    docs = _src(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^a-z0-9 ]", " "), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("raw_len"),
        F.length(norm).cast("long").alias("norm_len"),
        F.substring(norm, 1, 40).alias("norm_prefix"),
    )


O_REGEX_NORMALIZE = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS raw_len,
       CAST(length(trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS norm_len,
       substr(trim(regexp_replace(regexp_replace(lower(text),
            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')), 1, 40) AS norm_prefix
FROM documents
"""


def q_set_ops(spark, sf_dir):
    """UNION (dedup) / INTERSECT / EXCEPT — absent from the reference
    (SURVEY §2.6 'not present'), table stakes for an engine. Compares the
    purchaser and clicker user populations."""
    ev = _src(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    u = buyers.union(clickers).distinct().agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("union").alias("op"), "n"
    )
    i = buyers.intersect(clickers).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("intersect").alias("op"), "n"
    )
    e = buyers.distinct().exceptAll(clickers.distinct()).agg(
        F.count(F.lit(1)).alias("n")
    ).select(F.lit("except").alias("op"), "n")
    return u.unionByName(i).unionByName(e)


O_SET_OPS = """
WITH b AS (SELECT user_id FROM events WHERE event_type = 'purchase'),
     c AS (SELECT user_id FROM events WHERE event_type = 'click')
SELECT 'union' AS op, COUNT(*) AS n FROM (SELECT user_id FROM b UNION SELECT user_id FROM c) t
UNION ALL
SELECT 'intersect', COUNT(*) FROM (SELECT user_id FROM b INTERSECT SELECT user_id FROM c) t
UNION ALL
SELECT 'except', COUNT(*) FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM c) t
"""


def q_date_scaffold(spark, sf_dir):
    """Gap-filling densification: generate the complete day×event-type grid
    (sequence + explode ⋈ distinct dims) and left-join actual daily counts,
    zero-filling missing days — the scaffold pattern for complete time
    series. The scaffold is generated, never scanned; the dims side is tiny
    and broadcast."""
    ev = _src(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min(F.col("ts").cast("date")).alias("d0"),
        F.max(F.col("ts").cast("date")).alias("d1"),
    )
    days = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    dims = ev.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(dims))
    actual = ev.groupBy(
        F.col("ts").cast("date").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return grid.join(actual, ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )


O_DATE_SCAFFOLD = """
WITH bounds AS (SELECT MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS d1 FROM events),
days AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM bounds),
dims AS (SELECT DISTINCT event_type FROM events),
actual AS (SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
           FROM events GROUP BY 1, 2)
SELECT g.day, g.event_type, CAST(COALESCE(a.n, 0) AS BIGINT) AS n
FROM (SELECT day, event_type FROM days, dims) g
LEFT JOIN actual a ON a.day = g.day AND a.event_type = g.event_type
"""


def q_win_first_last(spark, sf_dir):
    """FIRST_VALUE / LAST_VALUE / NTH_VALUE over the full partition frame —
    each order row sees its customer's first, latest, and second order."""
    o = _src(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first_value("o_orderkey").over(w).alias("first_order"),
        F.last_value("o_orderkey").over(w).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


O_WIN_FIRST_LAST = """
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderkey) OVER w AS first_order,
       LAST_VALUE(o_orderkey) OVER w AS last_order,
       NTH_VALUE(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_grouped_trend(spark, sf_dir):
    """Grouped-map ``applyInPandas`` (the batch per-group escape hatch —
    the one pandas-API shape the winnowing/ANN mapInPandas entries don't
    cover): per-user OLS slope of daily spend over day-of-month, computed
    inside an Arrow batch per group with numpy.

    Exactness contract: the slope is the closed form
    (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) evaluated from EXACT integer sums
    (x = day-of-month ≤ 31, y = integer cents — every product stays far
    below 2^53), so the one double division is bit-identical to the
    oracle's SQL arithmetic. Degenerate groups (single day: zero
    denominator) return NULL in both engines.

    Scale: one shuffle on user_id; each group is a small Arrow batch.
    The same formula is expressible as a plain aggregation (the oracle
    shows it) — applyInPandas earns its cost only when the per-group
    logic outgrows SQL (iterative fits, model scoring); this entry pins
    the plumbing either way."""
    import pandas as pd

    ev = _src(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id", F.dayofmonth("ts").cast("long").alias("day")
        )
        .agg(F.sum(F.floor(F.col("value") * 100).cast("long")).alias("cents"))
    )

    schema = "user_id bigint, n_days bigint, slope_cents_per_day double"

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        n = len(pdf)
        x = pdf["day"].astype("int64")
        y = pdf["cents"].astype("int64")
        sx, sy = int(x.sum()), int(y.sum())
        sxx, sxy = int((x * x).sum()), int((x * y).sum())
        den = n * sxx - sx * sx
        slope = (n * sxy - sx * sy) / den if den != 0 else None
        return pd.DataFrame(
            {"user_id": [int(pdf["user_id"].iloc[0])], "n_days": [n],
             "slope_cents_per_day": [slope]}
        )

    return daily.groupBy("user_id").applyInPandas(fit, schema)


O_GROUPED_TREND = """
WITH daily AS (
    SELECT user_id, CAST(EXTRACT(day FROM ts) AS BIGINT) AS day,
           CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM events GROUP BY user_id, EXTRACT(day FROM ts)
)
SELECT user_id, COUNT(*) AS n_days,
       CASE WHEN COUNT(*) * SUM(day * day) - SUM(day) * SUM(day) = 0 THEN NULL
            ELSE CAST(COUNT(*) * SUM(day * cents) - SUM(day) * SUM(cents) AS DOUBLE)
                 / (COUNT(*) * SUM(day * day) - SUM(day) * SUM(day))
       END AS slope_cents_per_day
FROM daily GROUP BY user_id
"""


def q_rollup_multires(spark, sf_dir):
    """Hypertable-style continuous aggregate: hour → day → month rollup
    where each coarser level re-aggregates the FINER level's partials,
    never the raw events (count/sum/min/max are re-aggregation-closed;
    exact distinct is not — that path is `hll_sketch_rollup`). The oracle
    computes every level directly from raw, so a hash match PROVES the
    re-aggregation algebra.

    Scale: this is the incremental-refresh shape for a 100 TB event log —
    the hourly layer is the only scan of raw data; day/month read
    ~24x/~720x fewer rows. Money-sum determinism: values fold to integer
    cents (FLOOR(value*100)) before summation, so the hierarchical double
    addition cannot round differently from the oracle's direct sum."""
    ev = _src(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    hourly = (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        )
    )

    def _coarsen(df, unit):
        return (
            df.groupBy(
                F.date_trunc(unit, "bucket").alias("bucket"), "event_type"
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_cents").alias("sum_cents"),
                F.min("min_cents").alias("min_cents"),
                F.max("max_cents").alias("max_cents"),
            )
        )

    daily = _coarsen(hourly, "day")
    monthly = _coarsen(daily, "month")
    out_cols = ["grain", "bucket_s", "event_type",
                "n_events", "sum_cents", "min_cents", "max_cents"]

    def _label(df, grain):
        return df.select(
            F.lit(grain).alias("grain"),
            epoch_seconds("bucket").alias("bucket_s"),
            "event_type", "n_events", "sum_cents", "min_cents", "max_cents",
        ).select(*out_cols)

    return (
        _label(hourly, "hour")
        .unionByName(_label(daily, "day"))
        .unionByName(_label(monthly, "month"))
    )


O_ROLLUP_MULTIRES = """
WITH base AS (
    SELECT ts, event_type,
           CAST(FLOOR(value * 100) AS BIGINT) AS cents
    FROM events
),
lvl AS (
    SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket, event_type, cents FROM base
    UNION ALL
    SELECT 'day', date_trunc('day', ts), event_type, cents FROM base
    UNION ALL
    SELECT 'month', date_trunc('month', ts), event_type, cents FROM base
)
SELECT grain,
       CAST(FLOOR(epoch(bucket)) AS BIGINT) AS bucket_s,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       MIN(cents) AS min_cents,
       MAX(cents) AS max_cents
FROM lvl
GROUP BY grain, bucket, event_type
"""


def q_event_cooccurrence(spark, sf_dir):
    """Market-basket co-occurrence: for each ordered pair of distinct
    event types, how many (user, day) baskets contain both — the support
    table behind association/affinity analysis. The self-join runs on
    the DISTINCT per-basket type relation (bounded: baskets x types,
    never raw events x events), with a.type < b.type so each pair counts
    once."""
    ev = _src(spark, sf_dir, "events")
    basket = ev.select(
        "user_id",
        F.col("ts").cast("date").alias("day"),
        "event_type",
    ).distinct()
    a, b = basket.alias("a"), basket.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )


O_EVENT_COOCCURRENCE = """
WITH basket AS (
    SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type
    FROM events
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       COUNT(*) AS n_baskets
FROM basket a
JOIN basket b
  ON a.user_id = b.user_id AND a.day = b.day
 AND a.event_type < b.event_type
GROUP BY a.event_type, b.event_type
"""


PAIRS = [
    ("win_lag_lead", q_win_lag_lead, O_WIN_LAG_LEAD),
    ("win_running", q_win_running, O_WIN_RUNNING),
    ("win_rank_ntile", q_win_rank_ntile, O_WIN_RANK_NTILE),
    ("agg_rollup", q_agg_rollup, O_AGG_ROLLUP),
    ("agg_cube", q_agg_cube, O_AGG_CUBE),
    ("agg_grouping_sets", q_agg_grouping_sets, GROUPING_SETS_SQL),
    ("pivot_returnflag", q_pivot_returnflag, O_PIVOT_RETURNFLAG),
    ("topk_orders", q_topk_orders, O_TOPK_ORDERS),
    ("hist_totalprice", q_hist_totalprice, O_HIST_TOTALPRICE),
    ("percentile_qty", q_percentile_qty, O_PERCENTILE_QTY),
    ("sessionize_events", q_sessionize_events, O_SESSIONIZE_EVENTS),
    ("sessionize_session_window", q_sessionize_session_window, O_SESSIONIZE_SW),
    ("win_range_interval", q_win_range_interval, O_WIN_RANGE_INTERVAL),
    ("win_cumulative_distinct", q_win_cumulative_distinct, O_WIN_CUM_DISTINCT),
    ("stats_moments", q_stats_moments, O_STATS_MOMENTS),
    ("order_stats_suite", q_order_stats, O_ORDER_STATS),
    ("funnel_stages", q_funnel_stages, O_FUNNEL),
    ("retention_cohorts", q_retention_cohorts, O_RETENTION),
    ("ts_interpolate", q_ts_interpolate, O_TS_INTERPOLATE),
    ("agg_max_by", q_max_by, O_MAX_BY),
    ("nullsafe_join", q_nullsafe_join, O_NULLSAFE_JOIN),
    ("regex_normalize", q_regex_normalize, O_REGEX_NORMALIZE),
    ("set_ops", q_set_ops, O_SET_OPS),
    ("date_scaffold_gapfill", q_date_scaffold, O_DATE_SCAFFOLD),
    ("win_first_last_nth", q_win_first_last, O_WIN_FIRST_LAST),
    ("rollup_multires", q_rollup_multires, O_ROLLUP_MULTIRES),
    ("grouped_trend_pandas", q_grouped_trend, O_GROUPED_TREND),
    ("event_cooccurrence", q_event_cooccurrence, O_EVENT_COOCCURRENCE),
]


def register_queries(register) -> None:
    from mycarely_saas_dbt_spark.sources.registry import oracle_query

    needs_views = {"nullsafe_join": ["atomic_events"]}
    for name, fn, oracle in PAIRS:
        register(name, fn, oracle_query(oracle, *needs_views.get(name, [])))
