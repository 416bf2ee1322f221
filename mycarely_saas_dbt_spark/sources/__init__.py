from mycarely_saas_dbt_spark.sources.registry import (
    DRIVER_TABLES,
    load_table,
    register_sources,
    oracle_with_clause,
)

__all__ = ["DRIVER_TABLES", "load_table", "register_sources", "oracle_with_clause"]
