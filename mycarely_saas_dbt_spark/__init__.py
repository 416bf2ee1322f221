"""mycarely_saas_dbt_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference dbt/Redshift project ``Carelydigital/mycarely-saas.dbt`` (see
SURVEY.md): the three incremental models ``traffic_pages_agg``,
``traffic_daily_agg`` and ``lead_activities_agg``, the relational operator
surface they exercise, the incremental (watermark + unique-key upsert)
materialization semantics, plus large-scale LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing).

Execution engine: Apache Spark (DataFrame API / Spark SQL / Catalyst).
"""

__version__ = "0.1.0"
