"""``traffic_pages_agg`` — daily per-page traffic (total + unique visitors).

Spark-first re-implementation of /root/reference/models/traffic_pages_agg.sql
(78 lines): scan -> bot/referrer filter -> daily groupBy(count,
countDistinct) -> UNION-ALL unpivot ('all' vs 'unique') -> row id -> final
projection. Operator chain per SURVEY.md §2.11 (S1, P1-P6, F7, A1/A2, U1, W1).

Scale notes (100 TB):
  * Filters sit directly on the scan => Catalyst pushes them into the parquet
    reader (PushedFilters) and prunes to the 6 consumed columns.
  * count + countDistinct in one groupBy => Catalyst's
    RewriteDistinctAggregates two-phase expansion with map-side partials.
  * ``id_strategy='hash'`` (the DEFAULT) derives the row id as a
    deterministic surrogate key over the grain (date, company_domain,
    page_urlpath, type): embarrassingly parallel, and it fixes reference
    bug B1 (row_number ids restart each incremental batch and overwrite
    unrelated target rows; SURVEY.md §2.12).
  * ``id_strategy='row_number'`` reproduces the reference's global
    ROW_NUMBER (models/traffic_pages_agg.sql:60) byte-exactly. Since r9 it
    is numbered by ``util.global_rank`` (range-partition + local rank +
    broadcast offsets), so even parity mode has no single-partition sort;
    the hash default remains preferred because it also fixes reference
    bug B1 (SURVEY.md §2.12).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.functions.dialect import not_ilike, surrogate_key
from mycarely_saas_dbt_spark.sources.registry import oracle_query, register_sources

EPOCH_FALLBACK = dt.date(1900, 1, 1)


def filtered_page_views(events: DataFrame, *, require_urlpath: bool = True) -> DataFrame:
    """The shared Snowplow scrub: page_views, non-internal referrer, no bots.

    NULL semantics are load-bearing (SURVEY.md B6): ``!=`` and ``NOT ILIKE``
    drop NULL referrer/useragent rows — identical in Spark, do not null-safe.
    (reference: models/traffic_pages_agg.sql:14-19)
    """
    out = events.filter(
        (F.col("event") == "page_view")
        & (F.col("refr_medium") != "internal")
        & not_ilike("useragent", "%bot%")
        & not_ilike("useragent", "%spider%")
        & not_ilike("useragent", "%crawl%")
    )
    if require_urlpath:
        out = out.filter(F.col("page_urlpath").isNotNull())
    return out


def traffic_pages_agg(
    spark: SparkSession,
    sf_dir: str | None = None,
    *,
    events: DataFrame | None = None,
    watermark: dt.date | None = None,
    id_strategy: str = "hash",
) -> DataFrame:
    """Build the model as a lazy DataFrame plan.

    ``watermark`` (incremental mode) keeps only event days strictly after it
    (models/traffic_pages_agg.sql:20-24 — late rows for processed days are
    deliberately dropped).
    """
    if events is None:
        register_sources(spark, sf_dir)
        events = spark.table("atomic_events")

    fe = filtered_page_views(events).select(
        F.col("collector_tstamp").cast("date").alias("event_date"),
        "app_id",
        "domain_userid",
        "page_urlpath",
    )
    if watermark is not None:
        fe = fe.filter(F.col("event_date") > F.lit(watermark))

    page_traffic = fe.groupBy(
        F.col("event_date").alias("date"),
        F.col("app_id").alias("company_domain"),
        "page_urlpath",
    ).agg(
        F.count(F.lit(1)).alias("total_visits"),
        F.countDistinct("domain_userid").alias("unique_visits"),
    )

    # UNION-ALL unpivot via stack(): same multiset as the reference's two
    # SELECTs over page_traffic (models/traffic_pages_agg.sql:38-56) but the
    # upstream scan+aggregate runs ONCE — Catalyst does not dedup common
    # subplans, so a literal UNION ALL would recompute it (SURVEY §4).
    labeled_visits = page_traffic.selectExpr(
        "company_domain",
        "date",
        "page_urlpath",
        "stack(2, 'all', total_visits, 'unique', unique_visits) AS (type, traffic)",
    )

    if id_strategy == "row_number":
        # Parity with the reference's global ROW_NUMBER — deterministic
        # because the ORDER BY key is the full (unique) output grain.
        # r9: numbered via util.global_rank (range-partition + local
        # rank + broadcast offsets) — byte-identical ids to the
        # reference's ROW_NUMBER, with NO single-partition sort even in
        # parity mode (the W1 hazard is gone from both strategies).
        from mycarely_saas_dbt_spark.util import global_rank

        ranked = global_rank(
            labeled_visits,
            [
                F.col("date").asc(),
                F.col("company_domain").asc(),
                F.col("page_urlpath").asc(),
                F.col("type").asc(),
            ],
            rank_col="id",
        )
        return ranked.select(
            "id",
            "date",
            "type",
            "page_urlpath",
            "traffic",
            F.lit(1).alias("company_id"),
            "company_domain",
        )
    if id_strategy != "hash":
        raise ValueError(f"unknown id_strategy: {id_strategy}")
    id_col = surrogate_key("date", "company_domain", "page_urlpath", "type")
    return labeled_visits.select(
        id_col.alias("id"),
        "date",
        "type",
        "page_urlpath",
        "traffic",
        F.lit(1).alias("company_id"),
        "company_domain",
    )


# DuckDB oracle: same semantics in portable ANSI SQL over the same derived
# view (CAST AS DATE replaces Redshift ::DATE; id cast to BIGINT matching the
# Spark side).
_ORACLE_MAIN = """
, filtered_events AS (
    SELECT
        CAST(collector_tstamp AS DATE) AS event_date,
        app_id,
        domain_userid,
        page_urlpath
    FROM atomic_events
    WHERE event = 'page_view'
      AND refr_medium != 'internal'
      AND useragent NOT ILIKE '%bot%'
      AND useragent NOT ILIKE '%spider%'
      AND useragent NOT ILIKE '%crawl%'
      AND page_urlpath IS NOT NULL
      {extra_filter}
),
page_traffic AS (
    SELECT
        event_date AS date,
        app_id AS company_domain,
        page_urlpath,
        COUNT(*) AS total_visits,
        COUNT(DISTINCT domain_userid) AS unique_visits
    FROM filtered_events
    GROUP BY 1, 2, 3
),
labeled_visits AS (
    SELECT company_domain, date, page_urlpath, 'all' AS type,
           total_visits AS traffic
    FROM page_traffic
    UNION ALL
    SELECT company_domain, date, page_urlpath, 'unique' AS type,
           unique_visits AS traffic
    FROM page_traffic
),
final_rows AS (
    SELECT
        {id_expr} AS id,
        1 AS company_id,
        company_domain,
        date,
        type,
        page_urlpath,
        traffic
    FROM labeled_visits
)
SELECT id, date, type, page_urlpath, traffic, company_id, company_domain
FROM final_rows
"""


def oracle_sql(extra_filter: str = "", *, id_strategy: str = "row_number") -> str:
    """DuckDB oracle; ``extra_filter`` injects an additional predicate into
    the event scrub (used by incremental two-batch tests to express the
    watermark slice in SQL). ``id_strategy`` mirrors the Spark-side option:
    'row_number' for the reference-parity registered entry, 'hash' (the
    engine default) for the incremental runners."""
    from mycarely_saas_dbt_spark.functions.dialect import surrogate_key_sql
    from mycarely_saas_dbt_spark.sources.synthetic import ATOMIC_EVENTS_SQL

    if id_strategy == "row_number":
        id_expr = (
            "CAST(ROW_NUMBER() OVER (\n"
            "            ORDER BY date, company_domain, page_urlpath, type) AS BIGINT)"
        )
    elif id_strategy == "hash":
        id_expr = surrogate_key_sql(["date", "company_domain", "page_urlpath", "type"])
    else:
        raise ValueError(f"unknown id_strategy: {id_strategy}")
    return f"WITH atomic_events AS ({ATOMIC_EVENTS_SQL})" + _ORACLE_MAIN.format(
        extra_filter=extra_filter, id_expr=id_expr
    )
