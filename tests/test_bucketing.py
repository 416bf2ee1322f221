"""The bucketed co-located join must be shuffle-free: SortMergeJoin with
zero Exchange operators anywhere in the plan (join reads bucket-to-bucket;
the groupBy is on the bucket key so it inherits the distribution too)."""

from __future__ import annotations

import uuid

from tests.conftest import SF_DIR


def test_bucketed_join_has_no_exchange(spark):
    from mycarely_saas_dbt_spark.sources.bucketing import bucketed_join_plan

    db = f"buckettest_{uuid.uuid4().hex[:8]}"
    try:
        df = bucketed_join_plan(spark, SF_DIR, db)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
