from mycarely_saas_dbt_spark.plans.traffic_pages import traffic_pages_agg
from mycarely_saas_dbt_spark.plans.traffic_daily import traffic_daily_agg
from mycarely_saas_dbt_spark.plans.lead_activities import lead_activities_agg

__all__ = ["traffic_pages_agg", "traffic_daily_agg", "lead_activities_agg"]
