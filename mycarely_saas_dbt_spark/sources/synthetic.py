"""Deterministic, engine-portable derivations of the reference's source tables.

The reference consumes three warehouse tables (models/sources.yml:1-18):
``atomic.events`` (Snowplow web log), ``public.campaign_spends`` and
``public.lead_stage_change_events``. The driver's testdata provides generic
TPC-H-ish tables instead (TESTDATA.md), so we derive reference-shaped tables
from them with PURE, DETERMINISTIC SQL that is valid verbatim in BOTH Spark
SQL and DuckDB. The same string is registered as a Spark temp view and
inlined as a CTE in every ``oracle_sql()`` entry — both engines therefore see
byte-identical inputs and the differential test exercises only our operator
implementations.

Generation constraints implemented here come from FIXTURES.md (null rates,
mixed-case campaign names overlapping campaign_spends case-insensitively,
''-vs-NULL mkt_network edge, bot/SPIDER/crawl useragents, duplicate CRM rows
for SELECT DISTINCT, etc.).

Portability notes (why the SQL looks the way it does):
  * CAST(x AS STRING)  — STRING is an alias in DuckDB and the native Spark type
    (plain VARCHAR without length is rejected by Spark).
  * date + integer     — adds days in both engines.
  * ``||`` concat, simple CASE, ``%`` on BIGINT — identical semantics.
  * no ROUND / random / now() — everything is a pure function of key columns.
"""

from __future__ import annotations

# Snowplow-shaped web event log, one row per tracked event, derived from the
# driver `events` table (event_id bigint, ts timestamp, user_id bigint,
# event_type string, value double, props string). 14 columns = exactly the
# set the reference touches (SURVEY.md §1.4).
ATOMIC_EVENTS_SQL = """
SELECT
    CAST(event_id AS STRING)                          AS event_id,
    ts                                                AS collector_tstamp,
    CASE WHEN event_type IN ('view', 'click') THEN 'page_view'
         ELSE event_type END                          AS event,
    'domain' || CAST(user_id % 3 AS STRING) || '.example.com' AS app_id,
    CASE WHEN event_id % 97 = 11 THEN NULL
         ELSE 'u' || CAST(user_id AS STRING) END      AS domain_userid,
    CASE WHEN event_id % 19 = 3 THEN NULL
         ELSE '/page/' || CAST(event_id % 10 AS STRING) END AS page_urlpath,
    CASE WHEN event_id % 53 = 7  THEN NULL
         WHEN event_id % 17 = 0  THEN 'Mozilla/5.0 (compatible; GoogleBot/2.1)'
         WHEN event_id % 17 = 1  THEN 'SPIDER-scan/3.4'
         WHEN event_id % 17 = 2  THEN 'simple webcrawler 1.0'
         WHEN event_id % 17 = 3  THEN 'BotNet-like UA'
         ELSE 'Mozilla/5.0 (X11; Linux x86_64) Gecko/20100101 Firefox/115.0'
         END                                          AS useragent,
    CASE CAST(event_id % 13 AS INT)
         WHEN 0 THEN 'internal'  WHEN 1 THEN 'paid'    WHEN 2 THEN 'cpc'
         WHEN 3 THEN 'ppc'       WHEN 4 THEN 'paidsearch'
         WHEN 5 THEN 'display'   WHEN 6 THEN 'social'  WHEN 7 THEN 'search'
         WHEN 8 THEN 'email'     WHEN 9 THEN ''        WHEN 10 THEN 'unknown'
         WHEN 11 THEN NULL       ELSE 'organicweb' END AS refr_medium,
    CASE WHEN event_id % 10 < 3 THEN NULL
         ELSE 'refsrc_' || CAST(event_id % 8 AS STRING) END AS refr_source,
    CASE WHEN event_id % 5 < 2 THEN NULL
         ELSE 'Medium_' || CAST(event_id % 6 AS STRING) END AS mkt_medium,
    CASE WHEN event_id % 7 < 2 THEN NULL
         WHEN event_id % 2 = 0 THEN 'AdWords'
         ELSE 'newsletter_' || CAST(event_id % 8 AS STRING) END AS mkt_source,
    CASE WHEN event_id % 8 < 3 THEN NULL
         WHEN event_id % 6 = 0 THEN 'Spring_Sale'
         WHEN event_id % 6 = 1 THEN 'BRAND_push'
         WHEN event_id % 6 = 2 THEN 'summer_promo'
         WHEN event_id % 6 = 3 THEN 'Holiday2024'
         WHEN event_id % 6 = 4 THEN 'retarget_q1'
         ELSE 'generic_cmp' END                       AS mkt_campaign,
    CASE WHEN event_id % 5 < 3 THEN NULL
         ELSE 'term_' || CAST(event_id % 10 AS STRING) END AS mkt_term,
    CASE CAST(event_id % 4 AS INT)
         WHEN 0 THEN 'google' WHEN 1 THEN 'bing' WHEN 2 THEN '' ELSE NULL
         END                                          AS mkt_network
FROM events
"""

# Ad spend: one row per company x campaign x day, derived from `orders`.
# Dates overlap the events range (2024-01) plus a tail with spend-but-no-
# traffic; ~10% NULL spend (filtered by `spend IS NOT NULL`), some zeros;
# campaign_name lowercase forms matching mkt_campaign case-insensitively.
CAMPAIGN_SPENDS_SQL = """
SELECT
    CAST(o_custkey % 3 + 1 AS INT)                    AS company_id,
    'domain' || CAST(o_custkey % 3 AS STRING) || '.example.com' AS company_domain,
    CAST('2024-01-01' AS DATE) + CAST(o_orderkey % 31 AS INT)   AS spend_date,
    CASE CAST(o_orderkey % 7 AS INT)
         WHEN 0 THEN 'spring_sale'  WHEN 1 THEN 'brand_push'
         WHEN 2 THEN 'summer_promo' WHEN 3 THEN 'holiday2024'
         WHEN 4 THEN 'retarget_q1'  WHEN 5 THEN 'generic_cmp'
         ELSE 'orphan_campaign' END                   AS campaign_name,
    CASE WHEN o_orderkey % 10 = 0 THEN NULL
         WHEN o_orderkey % 10 = 1 THEN CAST(0 AS DOUBLE)
         ELSE CAST(o_orderkey % 400 AS DOUBLE) / 4 END AS spend
FROM orders
WHERE o_orderkey % 5 = 0
"""

# CRM lead stage transitions, derived from `orders`. Every column is a pure
# function of k = o_orderkey % 211, so distinct source rows collapse to ~211
# exact-duplicate groups — exercising SELECT DISTINCT (SURVEY §2.4 A7).
# NULL rates per FIXTURES.md: ~10% new_stage_id (output gate P11), ~5%
# pipeline_id/pipeline_name, NULL domain_userid rows, mixed-case names
# (LOWERed in the model, F5). Exact binary fractions for product_price so
# CAST(x AS STRING) formats identically in Spark and DuckDB.
LEAD_STAGE_CHANGE_EVENTS_SQL = """
SELECT
    CASE CAST(k % 3 AS INT)
         WHEN 0 THEN 'Domain0.Example.Com'
         WHEN 1 THEN 'DOMAIN1.example.com'
         ELSE 'domain2.EXAMPLE.com' END               AS company_domain,
    CAST(k % 3 + 1 AS INT)                            AS company_id,
    CASE WHEN k % 10 = 9 THEN NULL
         ELSE 'u' || CAST((k * 7) % 160 AS STRING) END AS domain_userid,
    'lead_' || CAST(k AS STRING)                      AS lead_id,
    'person_' || CAST(k % 97 AS STRING)               AS person_id,
    CAST('2024-01-01' AS DATE) + CAST((k * 13) % 30 AS INT) AS date,
    CAST(k % 11 AS INT)                               AS lead_generator_id,
    CASE CAST(k % 4 AS INT)
         WHEN 0 THEN 'WebForm'  WHEN 1 THEN 'ColdCall'
         WHEN 2 THEN 'Referral' ELSE 'EventBooth' END AS lead_generator_name,
    CASE WHEN k % 6 = 5 THEN NULL
         ELSE 'ehr_' || CAST(k % 37 AS STRING) END    AS lead_source_ehr_id,
    CASE WHEN k % 10 = 4 THEN NULL
         ELSE CAST(k % 5 + 1 AS INT) END              AS new_stage_id,
    CASE WHEN k % 9 = 2 THEN NULL
         ELSE 'Stage_' || CAST(k % 5 + 1 AS STRING) END AS new_stage_name,
    CASE WHEN k % 5 = 0 THEN NULL
         ELSE CAST(k % 5 AS INT) END                  AS old_stage_id,
    CASE WHEN k % 5 = 0 THEN NULL
         ELSE 'Stage_' || CAST(k % 5 AS STRING) END   AS old_stage_name,
    CASE WHEN k % 20 = 13 THEN NULL
         ELSE CAST(k % 4 + 1 AS INT) END              AS pipeline_id,
    CASE WHEN k % 20 = 17 THEN NULL
         ELSE 'Pipeline_' || CAST(k % 4 + 1 AS STRING) END AS pipeline_name,
    CAST(k % 13 + 1 AS INT)                           AS product_id,
    'Product ' || CAST(k % 13 + 1 AS STRING)          AS product_name,
    CAST(k % 40 AS DOUBLE) / 4                        AS product_price,
    'SKU-' || CAST(k % 13 + 1 AS STRING)              AS product_sku
FROM (SELECT o_orderkey % 211 AS k FROM orders WHERE o_orderkey % 3 = 1) base
"""

# name -> (portable SQL, raw driver tables it reads)
DERIVED_VIEWS: dict[str, str] = {
    "atomic_events": ATOMIC_EVENTS_SQL,
    "campaign_spends": CAMPAIGN_SPENDS_SQL,
    "lead_stage_change_events": LEAD_STAGE_CHANGE_EVENTS_SQL,
}


def atomic_events_sql(table: str = "events") -> str:
    """The Snowplow derivation over an arbitrary relation name — used by the
    streaming variant to apply the identical projection to a stream."""
    return ATOMIC_EVENTS_SQL.replace("FROM events", f"FROM {table}")
