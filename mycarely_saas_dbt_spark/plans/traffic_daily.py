"""``traffic_daily_agg`` — daily traffic by channel x source x campaign + spend.

Spark-first re-implementation of /root/reference/models/traffic_daily_agg.sql
(145 lines): scrub -> paid/organic CASE classifier -> NVL source/campaign
pickers -> groupBy(count, countDistinct) -> left join to ad spend (constant
predicate ``traffic_type='paid'`` in the ON — nulls the match for organic
rows, later defaulted to 0) -> dual UNION-ALL unpivot ('all'=total_visits,
'unique'=unique_visitors) -> md5 surrogate key.

Scale notes (100 TB):
  * The reference re-evaluates the join in both UNION branches
    (models/traffic_daily_agg.sql:105-129). We join ONCE carrying both
    measures and unpivot afterwards — same rows, half the join work
    (SURVEY.md §4, "safe improvement").
  * ``campaign_spend_data`` is company x campaign x day — tiny next to the
    event log. We broadcast it explicitly so the join is shuffle-free.
  * Aggregation happens BEFORE the join (event grain -> daily grain), so the
    join input is already reduced by orders of magnitude.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.functions.dialect import nvl, surrogate_key
from mycarely_saas_dbt_spark.plans.traffic_pages import filtered_page_views
from mycarely_saas_dbt_spark.sources.registry import register_sources

PAID_MEDIA = ["cpc", "ppc", "paidsearch", "display", "social", "search", "email", "", "unknown"]
ORGANIC_MEDIA = ["display", "social", "search", "email", "", "unknown"]


def classify_traffic_type() -> F.Column:
    """Paid/organic channel classifier (models/traffic_daily_agg.sql:35-42).

    Note the ''-vs-NULL edge: ``NVL(mkt_network,'') <> ''`` is true only for
    non-null, non-empty networks (F9/B6).
    """
    network = nvl(F.col("mkt_network"), F.lit(""))
    paid = (F.col("refr_medium").isin(PAID_MEDIA) & (network != "")) | (
        F.col("refr_medium") == "paid"
    )
    organic = (
        F.col("refr_medium").isin(ORGANIC_MEDIA)
        & (F.col("refr_medium") != "paid")
        & (network == "")
    )
    return F.when(paid, "paid").when(organic, "organic").otherwise(F.lit(None))


def traffic_daily_agg(
    spark: SparkSession,
    sf_dir: str | None = None,
    *,
    events: DataFrame | None = None,
    spends: DataFrame | None = None,
    watermark: dt.date | None = None,
) -> DataFrame:
    if events is None or spends is None:
        register_sources(spark, sf_dir)
        events = events if events is not None else spark.table("atomic_events")
        spends = spends if spends is not None else spark.table("campaign_spends")

    fe = filtered_page_views(events, require_urlpath=False).select(
        F.col("collector_tstamp").cast("date").alias("event_date"),
        "app_id",
        "domain_userid",
        "refr_medium",
        "mkt_source",
        "refr_source",
        "mkt_network",
        "mkt_campaign",
        "mkt_term",
    )
    if watermark is not None:
        fe = fe.filter(F.col("event_date") > F.lit(watermark))

    classified = fe.withColumn("traffic_type", classify_traffic_type())

    # Source / campaign pickers — variadic NVL (Redshift NVL = COALESCE, F3).
    col_3 = (
        F.when(
            F.col("traffic_type") == "paid",
            nvl("mkt_source", "refr_source", "mkt_network", F.lit("unknown")),
        )
        .when(
            F.col("traffic_type") == "organic",
            nvl("mkt_source", "refr_source", F.lit("unknown")),
        )
        .otherwise(F.lit(None))
    )
    col_4 = (
        F.when(F.col("traffic_type") == "paid", nvl("mkt_campaign", F.lit("unknown")))
        .when(
            F.col("traffic_type") == "organic",
            nvl("mkt_term", "mkt_campaign", F.lit("unknown")),
        )
        .otherwise(F.lit(None))
    )

    event_traffic = (
        classified.filter(F.col("traffic_type").isNotNull())
        .withColumn("col_3", col_3)
        .withColumn("col_4", col_4)
        .groupBy("event_date", "app_id", "traffic_type", "col_3", "col_4")
        .agg(
            F.count(F.lit(1)).alias("total_visits"),
            F.countDistinct("domain_userid").alias("unique_visitors"),
        )
    )

    csd = spends.filter(F.col("spend").isNotNull()).select(
        "company_id",
        "company_domain",
        F.col("spend_date").cast("date").alias("spend_date"),
        "campaign_name",
        "spend",
    )
    if watermark is not None:
        csd = csd.filter(F.col("spend_date") > F.lit(watermark))

    # Single left join carrying both measures (vs the reference's twice-run
    # join); constant predicate in ON preserved — organic rows keep NULL
    # spend, defaulted below (J1 semantics).
    et = event_traffic.alias("et")
    c = F.broadcast(csd.alias("csd"))
    joined = et.join(
        c,
        (F.col("et.col_4") == F.col("csd.campaign_name"))
        & (F.col("et.event_date") == F.col("csd.spend_date"))
        & (F.col("et.traffic_type") == F.lit("paid")),
        "left",
    ).select(
        F.col("et.app_id").alias("company_domain"),
        F.col("et.event_date").alias("spend_date"),
        F.col("et.traffic_type").alias("col_2"),
        F.col("et.col_3").alias("col_3"),
        F.col("et.col_4").alias("col_4"),
        F.col("et.total_visits").alias("total_visits"),
        F.col("et.unique_visitors").alias("unique_visitors"),
        nvl(F.col("csd.spend"), F.lit(0)).cast("double").alias("spend"),
    )

    # UNION-ALL unpivot via stack(): the reference evaluates the spend join
    # in BOTH union branches (models/traffic_daily_agg.sql:105-129); same
    # output multiset, but the agg+join upstream runs ONCE (SURVEY §4 "safe
    # improvement") — at 100 TB this halves the heavy event aggregation.
    combined = joined.selectExpr(
        "999 AS company_id",
        "company_domain",
        "spend_date",
        "spend",
        "col_2",
        "col_3",
        "col_4",
        "stack(2, 'all', total_visits, 'unique', unique_visitors) AS (col_1, traffic)",
        "CAST(NULL AS STRING) AS col_5",
        "CAST(NULL AS STRING) AS col_6",
    )

    return combined.select(
        surrogate_key(
            "company_domain", "spend_date", "col_1", "col_2", "col_3", "col_4"
        ).alias("id"),
        "company_id",
        "company_domain",
        "spend_date",
        "traffic",
        "spend",
        "col_1",
        "col_2",
        "col_3",
        "col_4",
        "col_5",
        "col_6",
    )


# Portable oracle translation (COALESCE replaces Redshift's variadic NVL; the
# dbt_utils surrogate key macro expanded to its md5/concat compilation).
_SURROGATE = (
    "MD5(CONCAT_WS('-', "
    "COALESCE(CAST(company_domain AS STRING), '_dbt_utils_surrogate_key_null_'), "
    "COALESCE(CAST(spend_date AS STRING), '_dbt_utils_surrogate_key_null_'), "
    "COALESCE(CAST(col_1 AS STRING), '_dbt_utils_surrogate_key_null_'), "
    "COALESCE(CAST(col_2 AS STRING), '_dbt_utils_surrogate_key_null_'), "
    "COALESCE(CAST(col_3 AS STRING), '_dbt_utils_surrogate_key_null_'), "
    "COALESCE(CAST(col_4 AS STRING), '_dbt_utils_surrogate_key_null_')))"
)

def _oracle_main(ev_extra: str = "", sp_extra: str = "") -> str:
    return f"""
, filtered_events AS (
    SELECT
        CAST(collector_tstamp AS DATE) AS event_date,
        app_id, domain_userid, refr_medium, mkt_source, refr_source,
        mkt_network, mkt_campaign, mkt_term
    FROM atomic_events
    WHERE event = 'page_view'
      AND refr_medium != 'internal'
      AND useragent NOT ILIKE '%bot%'
      AND useragent NOT ILIKE '%spider%'
      AND useragent NOT ILIKE '%crawl%'
      {ev_extra}
),
classified_events AS (
    SELECT
        event_date, app_id, domain_userid,
        CASE
            WHEN (refr_medium IN ('cpc', 'ppc', 'paidsearch', 'display',
                                  'social', 'search', 'email', '', 'unknown')
                  AND COALESCE(mkt_network, '') <> '')
                 OR (refr_medium = 'paid') THEN 'paid'
            WHEN refr_medium IN ('display', 'social', 'search', 'email', '',
                                 'unknown')
                 AND refr_medium <> 'paid'
                 AND COALESCE(mkt_network, '') = '' THEN 'organic'
            ELSE NULL
        END AS traffic_type,
        mkt_source, refr_source, mkt_network, mkt_campaign, mkt_term
    FROM filtered_events
),
event_traffic AS (
    SELECT
        event_date, app_id, traffic_type,
        CASE
            WHEN traffic_type = 'paid'
                THEN COALESCE(mkt_source, refr_source, mkt_network, 'unknown')
            WHEN traffic_type = 'organic'
                THEN COALESCE(mkt_source, refr_source, 'unknown')
            ELSE NULL
        END AS col_3,
        CASE
            WHEN traffic_type = 'paid' THEN COALESCE(mkt_campaign, 'unknown')
            WHEN traffic_type = 'organic'
                THEN COALESCE(mkt_term, mkt_campaign, 'unknown')
            ELSE NULL
        END AS col_4,
        COUNT(*) AS total_visits,
        COUNT(DISTINCT domain_userid) AS unique_visitors
    FROM classified_events
    WHERE traffic_type IS NOT NULL
    GROUP BY event_date, app_id, traffic_type, col_3, col_4
),
campaign_spend_data AS (
    SELECT cs.company_id, cs.company_domain,
           CAST(cs.spend_date AS DATE) AS spend_date,
           cs.campaign_name, cs.spend
    FROM campaign_spends cs
    WHERE cs.spend IS NOT NULL
      {sp_extra}
),
combined_traffic AS (
    SELECT
        999 AS company_id,
        et.app_id AS company_domain,
        et.event_date AS spend_date,
        et.total_visits AS traffic,
        CAST(COALESCE(csd.spend, 0) AS DOUBLE) AS spend,
        'all' AS col_1,
        et.traffic_type AS col_2,
        et.col_3,
        et.col_4,
        CAST(NULL AS STRING) AS col_5,
        CAST(NULL AS STRING) AS col_6
    FROM event_traffic et
    LEFT JOIN campaign_spend_data csd
        ON et.col_4 = csd.campaign_name
        AND et.event_date = csd.spend_date
        AND et.traffic_type = 'paid'
    UNION ALL
    SELECT
        999 AS company_id,
        et.app_id AS company_domain,
        et.event_date AS spend_date,
        et.unique_visitors AS traffic,
        CAST(COALESCE(csd.spend, 0) AS DOUBLE) AS spend,
        'unique' AS col_1,
        et.traffic_type AS col_2,
        et.col_3,
        et.col_4,
        CAST(NULL AS STRING) AS col_5,
        CAST(NULL AS STRING) AS col_6
    FROM event_traffic et
    LEFT JOIN campaign_spend_data csd
        ON et.col_4 = csd.campaign_name
        AND et.event_date = csd.spend_date
        AND et.traffic_type = 'paid'
)
SELECT
    {_SURROGATE} AS id,
    company_id, company_domain, spend_date, traffic, spend,
    col_1, col_2, col_3, col_4, col_5, col_6
FROM combined_traffic
"""


def oracle_sql(ev_extra: str = "", sp_extra: str = "") -> str:
    from mycarely_saas_dbt_spark.sources.synthetic import (
        ATOMIC_EVENTS_SQL,
        CAMPAIGN_SPENDS_SQL,
    )

    return (
        f"WITH atomic_events AS ({ATOMIC_EVENTS_SQL}),\n"
        f"campaign_spends AS ({CAMPAIGN_SPENDS_SQL})" + _oracle_main(ev_extra, sp_extra)
    )
