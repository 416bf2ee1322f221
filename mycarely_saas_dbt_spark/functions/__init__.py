from mycarely_saas_dbt_spark.functions.dialect import (
    nvl,
    not_ilike,
    surrogate_key,
    to_date,
    SURROGATE_KEY_NULL,
)

__all__ = ["nvl", "not_ilike", "surrogate_key", "to_date", "SURROGATE_KEY_NULL"]
