"""Approximate / sketch aggregation operators — the 100 TB substitutes for
exact COUNT DISTINCT and exact percentiles (SURVEY §2.4 A2 note, §7 M5).

Differential-testing approach: an approximate value can never hash-match a
DuckDB oracle, so each query outputs (a) the DETERMINISTIC exact columns and
(b) the approximation's accuracy contract as a boolean (`within_tol`).
Spark computes the flag from its own approx vs exact values; the oracle
asserts the contract by emitting literal TRUE next to the same exact
columns. A regression that pushes the estimator outside its documented
error bound therefore fails the hash compare — the contract IS the test.

Scale notes (100 TB):
  * approx_count_distinct (HyperLogLog++) — fixed-size state (~1.5 KB at 5%
    rsd) vs the exact rewrite's per-value shuffle; the difference between a
    single map-side pass and an Expand + two-phase distinct at fact-table
    cardinality.
  * hll_sketch_agg / hll_union_agg (Apache DataSketches) — RE-AGGREGATABLE:
    persist one sketch per (day, dim) partition, answer any rollup (month,
    quarter, all-time uniques) by unioning sketches, never rescanning the
    fact table. This is the idiomatic warehouse pattern for distinct-count
    cubes.
  * approx_percentile (KLL-style) — bounded-memory quantiles; exact
    `percentile` materializes every value per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.sources.registry import register_sources

REL_TOL = 0.05


def _within(approx, exact):
    """Accuracy-contract flag, total over the whole domain: exact == 0 would
    make the relative error NULL (0/0 or x/0), flipping the oracle's literal
    TRUE into a hash mismatch on an empty group — treat it as within-bound
    iff the approximation also says zero."""
    return F.when(exact == 0, approx == 0).otherwise(
        (F.abs(approx - exact) / exact) <= REL_TOL
    )


def q_approx_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day unique users: exact countDistinct next to HLL++
    approx_count_distinct; output carries the exact value and the 5%%
    accuracy-contract flag."""
    register_sources(spark, sf_dir)
    ev = spark.table("events")
    day = F.col("ts").cast("date").alias("day")
    return (
        ev.groupBy(day)
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
        )
        .select(
            "day",
            "exact_users",
            _within(F.col("approx_users"), F.col("exact_users")).alias("within_tol"),
        )
    )


O_APPROX_DISTINCT_DAILY = """
SELECT CAST(ts AS DATE) AS day,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS within_tol
FROM events
GROUP BY CAST(ts AS DATE)
"""


def q_hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count cube: one DataSketches HLL sketch per
    day, unioned into a single monthly estimate — the fact table is scanned
    once and every coarser rollup is sketch algebra. Output: exact monthly
    uniques, number of daily sketches merged, accuracy flag."""
    register_sources(spark, sf_dir)
    ev = spark.table("events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk")
    )
    merged = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("approx_month_users"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_month_users"))
    return merged.crossJoin(F.broadcast(exact)).select(
        "n_days",
        "exact_month_users",
        _within(F.col("approx_month_users"), F.col("exact_month_users")).alias(
            "within_tol"
        ),
    )


O_HLL_SKETCH_ROLLUP = """
SELECT COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(DISTINCT user_id) AS exact_month_users,
       TRUE AS within_tol
FROM events
"""


def q_approx_percentile_tol(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory quantiles: approx_percentile vs exact interpolated
    percentile per return flag, with the accuracy contract as output.
    The exact p50 itself is NOT emitted: interpolated medians of prices
    land on half-cent ties ((a+b)/2 = x.xx5) where Spark's and DuckDB's
    interpolation formulas differ in the last bit and ROUND flips — the
    deterministic percentile VALUE check lives in percentile_qty (integral
    quantities interpolate exactly); here the contract is the bound."""
    register_sources(spark, sf_dir)
    li = spark.table("lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
            F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx_p50"),
        )
        .select(
            "l_returnflag",
            "n_rows",
            _within(F.col("approx_p50"), F.col("exact_p50")).alias("within_tol"),
        )
    )


O_APPROX_PERCENTILE_TOL = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       TRUE AS within_tol
FROM lineitem
GROUP BY l_returnflag
"""


CMS_DEPTH = 4      # independent hash rows
CMS_WIDTH = 256    # buckets per row
CMS_TOP_K = 10


def _cms_bucket(row: int, key: str):
    """Portable 32-bit md5 bucket for CMS row ``row`` — identical integer
    arithmetic in Spark and DuckDB (the repo-standard md5 trick)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("_", F.lit(str(row)), F.col(key).cast("string"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % CMS_WIDTH
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005) with
    the MERGEABILITY proof baked in: the sketch is built as the SUM of two
    half-sketches (even/odd event_id slices) — counters are linear, so the
    merged sketch must equal a single-pass sketch, and the oracle builds
    it single-pass. Point estimate for key u = min over depth rows of
    counter[row][bucket_row(u)]; CMS guarantees est >= exact (one-sided),
    surfaced as `overestimates` (always true on a correct sketch).

    Scale shape: the sketch is DEPTH x WIDTH = 1024 integer counters
    regardless of stream size — each slice's build is one map-side
    combinable groupBy on (row, bucket); merging shards/windows is
    counter addition (the same algebra the rollup/HLL entries prove).
    Estimates for the exact top-k keys join the top-k relation (tiny,
    broadcast) against the 1024-row sketch."""
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, sf_dir)
    # NULL keys are excluded EXPLICITLY in both engines: Spark's concat_ws
    # would silently drop a NULL segment (hashing just the row prefix)
    # while SQL's || propagates NULL — without the filter the two sketches
    # diverge the moment a NULL key appears
    ev = (
        spark.table("events")
        .filter(F.col("user_id").isNotNull())
        .select("event_id", F.col("user_id").cast("string").alias("u"))
    )

    def half_sketch(pred):
        rows = ev.filter(pred).select(
            F.posexplode(
                F.array(*[_cms_bucket(r, "u") for r in range(CMS_DEPTH)])
            ).alias("row", "bucket")
        )
        return rows.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))

    even = half_sketch(F.pmod("event_id", F.lit(2)) == 0)
    odd = half_sketch(F.pmod("event_id", F.lit(2)) == 1)
    sketch = (
        even.unionByName(odd)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )

    exact = ev.groupBy("u").agg(F.count(F.lit(1)).alias("exact_n"))
    topk = exact.orderBy(F.col("exact_n").desc(), F.col("u").asc()).limit(CMS_TOP_K)
    probes = topk.select(
        "u", "exact_n",
        F.posexplode(
            F.array(*[_cms_bucket(r, "u") for r in range(CMS_DEPTH)])
        ).alias("row", "bucket"),
    )
    return (
        F.broadcast(probes)
        .join(sketch, ["row", "bucket"])
        .groupBy("u", "exact_n")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "u", "exact_n", "cms_est",
            (F.col("cms_est") >= F.col("exact_n")).alias("overestimates"),
        )
    )


def _cms_bucket_sql(row: int, key: str) -> str:
    return (
        f"(('0x' || substr(md5('{row}_' || CAST({key} AS STRING)), 1, 8))::BIGINT"
        f" % {CMS_WIDTH})"
    )


O_CMS_HEAVY_HITTERS = f"""
WITH ev AS (SELECT CAST(user_id AS STRING) AS u FROM events WHERE user_id IS NOT NULL),
buckets AS (
    {" UNION ALL ".join(f"SELECT u, {r} AS row, {_cms_bucket_sql(r, 'u')} AS bucket FROM ev" for r in range(CMS_DEPTH))}
),
sketch AS (SELECT row, bucket, COUNT(*) AS c FROM buckets GROUP BY row, bucket),
exact AS (SELECT u, COUNT(*) AS exact_n FROM ev GROUP BY u),
topk AS (SELECT u, exact_n FROM exact ORDER BY exact_n DESC, u ASC LIMIT {CMS_TOP_K}),
probes AS (
    {" UNION ALL ".join(f"SELECT u, exact_n, {r} AS row, {_cms_bucket_sql(r, 'u')} AS bucket FROM topk" for r in range(CMS_DEPTH))}
)
SELECT p.u, p.exact_n, MIN(s.c) AS cms_est,
       MIN(s.c) >= p.exact_n AS overestimates
FROM probes p JOIN sketch s ON p.row = s.row AND p.bucket = s.bucket
GROUP BY p.u, p.exact_n
"""



# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) distinct sketch — the HASH-EXACT
# member of the sketch family (Bar-Yossef et al. 2002; Beyer et al.
# SIGMOD'07). HLL entries grade by accuracy contract because register
# merge order isn't portable; KMV's state is the SET of the K smallest
# 32-bit hash values — fully deterministic, so estimates hash-match the
# DuckDB oracle bit-for-bit, and merging is provably lossless:
# bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)).
# ---------------------------------------------------------------------------

KMV_K = 32


def _h32(key: str):
    """Portable 32-bit md5 value (the repo-standard md5 trick)."""
    return F.conv(
        F.substring(F.md5(F.col(key).cast("string")), 1, 8), 16, 10
    ).cast("long")


def _kmv_est(n_seen: str, kth: str):
    """(K-1) * 2^32 DIV h_K when more than K distinct hashes were seen,
    else the exact count — all-integer, identical in both engines."""
    return F.when(
        F.col(n_seen) < F.lit(KMV_K), F.col(n_seen).cast("long")
    ).otherwise(F.expr(f"({KMV_K} - 1) * 4294967296 DIV {kth}"))


def q_kmv_distinct_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day distinct-user estimate from a KMV bottom-K sketch, next to
    the exact distinct count — both integers, hash-exact cross-engine
    (unlike the HLL twin `approx_distinct_daily`, which needs an accuracy
    contract).

    Scale shape: one (day, h) DISTINCT shuffle (map-side combinable),
    then a per-day bottom-K — formulated as a rank window over the
    distinct hashes here; at 100 TB the same bottom-K is a two-phase
    min-K aggregate (per-partition partial top-K arrays merged
    associatively), K integers of state per group either way. The
    estimate is one integer expression per group."""
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, sf_dir)
    ev = (
        spark.table("events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.col("ts").cast("date").alias("day"),
            F.col("user_id").cast("string").alias("u"),
        )
    )
    hashes = ev.select("day", _h32("u").alias("h")).distinct()
    w = Window.partitionBy("day").orderBy(F.col("h").asc())
    sk = (
        hashes.withColumn("rk", F.row_number().over(w))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.max(F.when(F.col("rk") == KMV_K, F.col("h"))).alias("kth"),
        )
    )
    exact = ev.groupBy("day").agg(F.countDistinct("u").alias("exact_users"))
    return (
        sk.join(exact, "day")
        .select(
            "day",
            "exact_users",
            _kmv_est("n_h", "kth").alias("kmv_est"),
        )
    )


_H32_SQL = "(('0x' || substr(md5(CAST({k} AS STRING)), 1, 8))::BIGINT)"

O_KMV_DAILY = f"""
WITH ev AS (
    SELECT CAST(ts AS DATE) AS day, CAST(user_id AS STRING) AS u
    FROM events WHERE user_id IS NOT NULL
),
hashes AS (SELECT DISTINCT day, {_H32_SQL.format(k='u')} AS h FROM ev),
rk AS (
    SELECT day, h, ROW_NUMBER() OVER (PARTITION BY day ORDER BY h ASC) AS rk
    FROM hashes
),
sk AS (
    SELECT day, COUNT(*) AS n_h,
           MAX(CASE WHEN rk = {KMV_K} THEN h END) AS kth
    FROM rk GROUP BY day
),
exact AS (SELECT day, COUNT(DISTINCT u) AS exact_users FROM ev GROUP BY day)
SELECT s.day, e.exact_users,
       CAST(CASE WHEN s.n_h < {KMV_K} THEN s.n_h
                 ELSE ({KMV_K} - 1) * 4294967296 // s.kth END AS BIGINT)
           AS kmv_est
FROM sk s JOIN exact e ON s.day = e.day
"""


def q_kmv_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV mergeability proof (the lossless-union theorem): the weekly
    estimate computed from MERGED daily bottom-K sketches must equal the
    single-pass weekly estimate — bottomK(∪ days) = bottomK(∪ daily
    bottomKs), because any hash in the true weekly bottom-K is in its
    day's bottom-K. Both paths computed, both emitted, plus the equality
    flag (always true on a correct sketch) — the same algebra-proof shape
    as `hll_sketch_rollup`/`cms_heavy_hitters`, but hash-exact.

    Weeks are integer 7-day buckets from a fixed epoch via truncating
    integer division (portable — no cross-engine week-start convention,
    and Spark DIV / DuckDB // both truncate toward zero, unlike floor)."""
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, sf_dir)
    ev = (
        spark.table("events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.col("ts").cast("date").alias("day"),
            F.col("user_id").cast("string").alias("u"),
        )
    )
    # integer DIV truncates toward zero in BOTH engines (DuckDB // is
    # truncation too — floor() here would diverge for pre-epoch dates)
    week = F.expr("CAST(datediff(day, DATE '2024-01-01') AS BIGINT) DIV 7")
    hashes = ev.select(
        "day", week.alias("week"), _h32("u").alias("h")
    ).distinct()

    # daily bottom-K sketches, then merge within the week and re-bottom-K
    wd = Window.partitionBy("day").orderBy(F.col("h").asc())
    daily_bk = hashes.withColumn("rk", F.row_number().over(wd)).filter(
        F.col("rk") <= KMV_K
    )
    merged = daily_bk.select("week", "h").distinct()
    wm = Window.partitionBy("week").orderBy(F.col("h").asc())
    sk_merged = (
        merged.withColumn("rk", F.row_number().over(wm))
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.max(F.when(F.col("rk") == KMV_K, F.col("h"))).alias("kth"),
        )
        .select("week", _kmv_est("n_h", "kth").alias("est_merged"))
    )

    # single-pass weekly sketch
    weekly = hashes.select("week", "h").distinct()
    sk_single = (
        weekly.withColumn("rk", F.row_number().over(wm))
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).alias("n_h"),
            F.max(F.when(F.col("rk") == KMV_K, F.col("h"))).alias("kth"),
        )
        .select("week", _kmv_est("n_h", "kth").alias("est_single"))
    )
    return (
        sk_single.join(sk_merged, "week")
        .select(
            "week", "est_single", "est_merged",
            (F.col("est_single") == F.col("est_merged")).alias("merge_exact"),
        )
    )


O_KMV_MERGE = f"""
WITH ev AS (
    SELECT CAST(ts AS DATE) AS day, CAST(user_id AS STRING) AS u
    FROM events WHERE user_id IS NOT NULL
),
hashes AS (
    SELECT DISTINCT day, (day - DATE '2024-01-01') // 7 AS week,
           {_H32_SQL.format(k='u')} AS h
    FROM ev
),
daily_bk AS (
    SELECT week, h FROM (
        SELECT week, h,
               ROW_NUMBER() OVER (PARTITION BY day ORDER BY h ASC) AS rk
        FROM hashes
    ) WHERE rk <= {KMV_K}
),
merged AS (SELECT DISTINCT week, h FROM daily_bk),
sk_merged AS (
    SELECT week, COUNT(*) AS n_h,
           MAX(CASE WHEN rk = {KMV_K} THEN h END) AS kth
    FROM (
        SELECT week, h,
               ROW_NUMBER() OVER (PARTITION BY week ORDER BY h ASC) AS rk
        FROM merged
    ) GROUP BY week
),
weekly AS (SELECT DISTINCT week, h FROM hashes),
sk_single AS (
    SELECT week, COUNT(*) AS n_h,
           MAX(CASE WHEN rk = {KMV_K} THEN h END) AS kth
    FROM (
        SELECT week, h,
               ROW_NUMBER() OVER (PARTITION BY week ORDER BY h ASC) AS rk
        FROM weekly
    ) GROUP BY week
),
est AS (
    SELECT s.week,
           CAST(CASE WHEN s.n_h < {KMV_K} THEN s.n_h
                     ELSE ({KMV_K} - 1) * 4294967296 // s.kth END AS BIGINT)
               AS est_single,
           CAST(CASE WHEN m.n_h < {KMV_K} THEN m.n_h
                     ELSE ({KMV_K} - 1) * 4294967296 // m.kth END AS BIGINT)
               AS est_merged
    FROM sk_single s JOIN sk_merged m ON s.week = m.week
)
SELECT week, est_single, est_merged,
       est_single = est_merged AS merge_exact
FROM est
"""


# ---------------------------------------------------------------------------
# Misra–Gries heavy hitters (Misra & Gries 1982; merge rule from Agarwal
# et al., "Mergeable Summaries", PODS'12) — the deterministic counter-based
# summary complementing the hashing sketches (CMS/KMV/HLL) above.
# ---------------------------------------------------------------------------

MG_K = 100


def q_mg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent terms over the corpus tokens via the two-pass
    Misra–Gries shape: pass 1 maintains a K-counter MG summary PER
    PARTITION inside one Arrow mapInPandas (each batch's exact
    value_counts merges into the summary with the mergeable-summaries
    rule: add, then subtract the (K+1)-th largest count from all and
    drop non-positives), pass 2 exactly recounts ONLY the surviving
    candidates and keeps those with n*(K+1) > N. Correct because MG
    guarantees any item with partition frequency > n_p/(K+1) keeps a
    positive counter, and a GLOBAL heavy hitter (freq > N/(K+1)) exceeds
    that bound in at least one partition by pigeonhole — so the
    candidate union is a superset of the true answer and the exact
    second pass makes the output deterministic and partition-layout
    independent (the property the DuckDB oracle checks: the oracle
    never sees the sketch at all).

    Scale shape: pass 1 is one narrow corpus pass emitting <= K rows per
    partition (no shuffle); the candidate set broadcasts into pass 2's
    semi-restricted recount — the corpus never shuffles on the raw term;
    state is K counters per task regardless of stream size."""
    register_sources(spark, sf_dir)
    toks = spark.table("documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )

    def mg_summary(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for term, c in pdf["term"].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > MG_K:
                cut = sorted(counters.values(), reverse=True)[MG_K]
                counters = {
                    t: c - cut for t, c in counters.items() if c - cut > 0
                }
        yield pd.DataFrame(
            {"term": list(counters), "lb": list(counters.values())}
        )

    cands = (
        toks.mapInPandas(mg_summary, "term string, lb long")
        .select("term")
        .distinct()
    )
    total = toks.count()  # bounded scalar (one map-combinable count)
    return (
        toks.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .filter(F.col("exact_n") * (MG_K + 1) > F.lit(total))
        .orderBy(F.col("exact_n").desc(), F.col("term").asc())
    )


O_MG_HEAVY_HITTERS = f"""
WITH t AS (
    SELECT unnest(string_split(text, ' ')) AS term FROM documents
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS exact_n
FROM t GROUP BY term
HAVING COUNT(*) * ({MG_K} + 1) > (SELECT COUNT(*) FROM t)
ORDER BY exact_n DESC, term ASC
"""


PAIRS = [
    ("kmv_distinct_daily", q_kmv_distinct_daily, O_KMV_DAILY),
    ("kmv_merge_rollup", q_kmv_merge_rollup, O_KMV_MERGE),
    ("approx_distinct_daily", q_approx_distinct_daily, O_APPROX_DISTINCT_DAILY),
    ("hll_sketch_rollup", q_hll_sketch_rollup, O_HLL_SKETCH_ROLLUP),
    ("approx_percentile_tol", q_approx_percentile_tol, O_APPROX_PERCENTILE_TOL),
    ("cms_heavy_hitters", q_cms_heavy_hitters, O_CMS_HEAVY_HITTERS),
    ("mg_heavy_hitters", q_mg_heavy_hitters, O_MG_HEAVY_HITTERS),
]


def register_queries(register) -> None:
    for name, fn, oracle in PAIRS:
        register(name, fn, oracle)
