"""Semi-structured data operators: JSON extraction and array/collection
aggregation — the extension surface SURVEY §2.7 notes the reference lacks
("no regex, no JSON/array/map functions") but any event-log engine needs
(Snowplow contexts ship as JSON columns in practice).

Scale notes (100 TB):
  * get_json_object is JVM-side (Jackson) and codegen-friendly; for hot
    paths with a FIXED schema use from_json once into a struct column and
    prune fields — one parse instead of one per extraction.
  * collect_set/array_sort run per group post-shuffle; output arrays are
    bounded by the group's distinct count (here: event types, ≤5). Never
    collect unbounded per-group arrays — aggregate instead.
  * outputs cross the oracle boundary as STRINGS (array_join) because
    array stringification differs between engines; inside the plan they
    stay arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mycarely_saas_dbt_spark.sources.registry import register_sources


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract a JSON field from the event props payload and aggregate it
    per event type — parse, cast, and a null-safety edge (malformed or
    missing keys yield NULL, which the aggregates skip)."""
    register_sources(spark, sf_dir)
    ev = spark.table("events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


O_JSON_EXTRACT = """
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(CAST(props->>'k' AS INT)) AS n_with_k,
       CAST(SUM(CAST(props->>'k' AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'k' AS INT)) AS min_k,
       MAX(CAST(props->>'k' AS INT)) AS max_k
FROM events
GROUP BY event_type
"""


def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregation: per user, the sorted distinct event-type
    vocabulary (collect_set → array_sort → array_join) plus its size —
    emitted as a string so the compare is engine-portable."""
    register_sources(spark, sf_dir)
    ev = spark.table("events")
    types = F.array_sort(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.size(types).cast("long").alias("n_types"),
        F.array_join(types, ",").alias("type_vocab"),
    )


O_ARRAY_AGG = """
SELECT user_id,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS type_vocab
FROM events
GROUP BY user_id
"""


PAIRS = [
    ("json_extract_stats", q_json_extract, O_JSON_EXTRACT),
    ("array_agg_vocab", q_array_agg, O_ARRAY_AGG),
]


def q_hof_collection_suite(spark, sf_dir):
    """The higher-order-function surface in one registered pass:
    transform / filter / exists / forall / zip_with / aggregate over the
    token array — every lambda runs JVM-side inside codegen (these are the
    primitives the dedup/similarity/winnowing operators compose; this
    entry pins their per-primitive semantics against DuckDB's list_*)."""
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, sf_dir)
    d = spark.table("documents").withColumn("toks", F.split("text", " "))
    lens = F.expr("transform(toks, t -> length(t))")
    return d.select(
        "doc_id",
        F.size(F.expr("filter(toks, t -> length(t) > 3)"))
        .cast("long")
        .alias("n_long_tokens"),
        F.expr("exists(toks, t -> length(t) > 10)").alias("any_very_long"),
        F.expr("forall(toks, t -> length(t) > 0)").alias("all_nonempty"),
        F.expr(
            "aggregate(transform(toks, t -> length(t)), CAST(0 AS BIGINT), "
            "(a, x) -> a + x)"
        ).alias("sum_token_len"),
        # zip_with: position-weighted length sum (1-indexed positions)
        F.expr(
            "aggregate(zip_with(transform(toks, t -> CAST(length(t) AS BIGINT)), "
            "sequence(CAST(1 AS BIGINT), CAST(size(toks) AS BIGINT)), "
            "(l, p) -> l * p), CAST(0 AS BIGINT), (a, x) -> a + x)"
        ).alias("pos_weighted_len"),
    )


O_HOF_SUITE = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(list_filter(toks, t -> length(t) > 3)) AS BIGINT) AS n_long_tokens,
       len(list_filter(toks, t -> length(t) > 10)) > 0 AS any_very_long,
       len(list_filter(toks, t -> length(t) = 0)) = 0 AS all_nonempty,
       CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
           AS sum_token_len,
       CAST(list_sum(list_transform(generate_series(1, len(toks)),
                                    i -> length(toks[i]) * i)) AS BIGINT)
           AS pos_weighted_len
FROM t
"""


# ---------------------------------------------------------------------------
# VARIANT (Spark 4's open-format semi-structured type, parse once /
# navigate typed): the modern replacement for string-JSON hot paths —
# parse_json shreds to a binary variant, variant_get navigates paths
# with a TYPE (NULL on missing path; try_variant_get NULL on cast
# failure instead of erroring). Oracle: DuckDB's JSON operators over
# the identical synthesized document.
# ---------------------------------------------------------------------------


def q_variant_shred_rollup(spark, sf_dir: str):
    """Build a nested JSON document per event (wrapping the existing
    props payload), parse it ONCE to VARIANT, and roll up typed-path
    extractions per event type — plus the two NULL-semantics probes a
    pipeline relies on: a missing path must extract as NULL (n_missing
    stays 0 when counted) and try_variant_get with an impossible cast
    must yield NULL, not an error (n_badcast stays 0).

    Scale note: the variant parse is a narrow per-row op and the typed
    extraction happens WITHOUT re-parsing per path (the shredded binary
    is navigated directly) — the reason variant beats get_json_object
    chains that re-parse the string per extraction."""
    from pyspark.sql import functions as F

    from mycarely_saas_dbt_spark.sources.registry import register_sources

    register_sources(spark, sf_dir)
    ev = spark.table("events").filter(F.col("user_id").isNotNull())
    js = F.concat(
        F.lit('{"p": '), F.col("props"),
        F.lit(', "type": "'), F.col("event_type"),
        F.lit('", "flag": '),
        F.when(F.col("user_id") % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
        F.lit("}"),
    )
    v = F.parse_json(js)
    shred = ev.select(
        F.variant_get(v, "$.type", "string").alias("etype"),
        F.variant_get(v, "$.p.k", "bigint").alias("k"),
        F.variant_get(v, "$.flag", "boolean").alias("flag"),
        F.variant_get(v, "$.nope", "bigint").alias("missing"),
        F.try_variant_get(v, "$.type", "bigint").alias("badcast"),
    )
    return shred.groupBy("etype").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum(F.col("flag").cast("long")).alias("n_flag"),
        F.count("missing").alias("n_missing"),
        F.count("badcast").alias("n_badcast"),
    )


O_VARIANT_SHRED = """
WITH ev AS (
    SELECT '{"p": ' || props || ', "type": "' || event_type || '", "flag": '
           || CASE WHEN user_id % 2 = 0 THEN 'true' ELSE 'false' END || '}'
               AS js
    FROM events WHERE user_id IS NOT NULL
),
shred AS (
    SELECT js->>'$.type' AS etype,
           CAST(js->>'$.p.k' AS BIGINT) AS k,
           CAST(js->>'$.flag' AS BOOLEAN) AS flag,
           CAST(js->>'$.nope' AS BIGINT) AS missing,
           TRY_CAST(js->>'$.type' AS BIGINT) AS badcast
    FROM ev
)
SELECT etype, COUNT(*) AS n,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(SUM(CASE WHEN flag THEN 1 ELSE 0 END) AS BIGINT) AS n_flag,
       COUNT(missing) AS n_missing,
       COUNT(badcast) AS n_badcast
FROM shred
GROUP BY etype
"""


def register_queries(register) -> None:
    register("hof_collection_suite", q_hof_collection_suite, O_HOF_SUITE)
    register("variant_shred_rollup", q_variant_shred_rollup, O_VARIANT_SHRED)
    for name, fn, oracle in PAIRS:
        register(name, fn, oracle)
