"""Skew story for the LA argmax (SURVEY §2 W2, VERDICT r3 item 5).

`latest_events` ships two strategies that must stay byte-identical:

* ``window`` — ROW_NUMBER + rn=1, the reference's shape
  (/root/reference/models/lead_activities_agg.sql:45-55). One shuffle on
  ``domain_userid``, then a per-key SORT: a hot user's entire event
  history serializes through ONE task (window functions cannot be
  skew-split — all rows of a partition key must be co-located), and at
  the 8g-executor budget the hot task's sort spills.
* ``aggregate`` — ``max_by(payload, key)``: the same argmax as a hash
  aggregation with map-side partial combine, so a hot user collapses to
  one candidate row per input partition BEFORE the shuffle. This is the
  shape that survives a bot-like user owning half of a 100 TB event log.

The fixture below builds that adversarial distribution (one user = ~50%
of 12M rows, ties on timestamp so the full 3-level tiebreak is live) and
asserts (a) byte-identical output and (b) the STRUCTURAL facts the skew
claim rests on: the aggregate plan has no Window (its argmax is a
partial_max_by hash aggregate) and its shuffle volume is bounded by
keys x input-partitions (~0.8M partial rows measured) while the window
shuffle always carries all 12M and one task sorts 6M of them. Wall
clock is printed but not asserted — isolated min-of-3 measured ~2x in
the aggregate's favour, but this box's timings swing +/-50% under
concurrent load.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

N_ROWS = 12_000_000
HOT_SHARE = 0.5
N_COLD_USERS = 50_000
TIMING_RUNS = 1  # timings are printed as documentation, not asserted (box noise)


@pytest.fixture(scope="module")
def skewed_events(spark, tmp_path_factory):
    """12M page_views in a temp parquet; 'hot_user' owns ~50% of rows."""
    path = str(tmp_path_factory.mktemp("skew") / "events.parquet")
    (
        spark.range(N_ROWS, numPartitions=32)
        .withColumn(
            "domain_userid",
            F.when(
                F.pmod("id", F.lit(10)) < int(HOT_SHARE * 10), F.lit("hot_user")
            ).otherwise(F.format_string("user_%06d", F.pmod("id", F.lit(N_COLD_USERS)))),
        )
        .select(
            "domain_userid",
            F.format_string("ev_%09d", "id").alias("event_id"),
            F.lit("page_view").alias("event"),
            F.when(F.pmod("id", F.lit(7)) == 0, "paid")
            .when(F.pmod("id", F.lit(7)) == 1, "cpc")
            .otherwise("organic")
            .alias("refr_medium"),
            F.when(F.pmod("id", F.lit(3)) == 0, "adwords").alias("mkt_network"),
            F.lit("Mozilla/5.0").alias("useragent"),
            F.format_string("/p/%d", F.pmod("id", F.lit(40))).alias("page_urlpath"),
            F.lit("cpc").alias("mkt_medium"),
            F.lit("google").alias("mkt_source"),
            F.format_string("camp_%d", F.pmod("id", F.lit(5))).alias("mkt_campaign"),
            # coarse timestamps -> heavy ties, so the event_id tiebreak is live
            (F.lit("2024-01-01 00:00:00").cast("timestamp")
             + F.make_interval(secs=F.pmod("id", F.lit(86400)).cast("double"))
             ).alias("collector_tstamp"),
        )
        .write.parquet(path)
    )
    return spark.read.parquet(path)


def _run(events, strategy):
    from mycarely_saas_dbt_spark.plans.lead_activities import latest_events

    t0 = time.time()
    rows = latest_events(events, strategy).collect()
    return time.time() - t0, sorted(map(tuple, rows))


def test_argmax_strategies_identical_and_aggregate_wins_on_hot_key(
    spark, skewed_events, capsys
):
    from pyspark.sql import functions as F

    from mycarely_saas_dbt_spark.plans.lead_activities import latest_events

    t_win, rows_win = _run(skewed_events, "window")
    t_agg, rows_agg = _run(skewed_events, "aggregate")

    assert rows_agg == rows_win  # byte-identical argmax under a total order
    # cold residues with u % 10 < HOT_SHARE*10 are claimed by the hot
    # user, so only (1-HOT_SHARE) of the N_COLD_USERS residues occur
    assert len(rows_win) == int(N_COLD_USERS * (1 - HOT_SHARE)) + 1

    # Why the aggregate strategy survives the hot key and the window
    # cannot — asserted STRUCTURALLY (this box's wall clock swings +/-50%
    # under concurrent load; isolated min-of-3 measured ~2x in the
    # aggregate's favour, printed below as documentation only):
    # 1. the window plan must co-locate every row of a key, then sort it
    #    inside ONE task (Window + full-row Exchange); the aggregate plan
    #    has no Window at all — its argmax is a hash aggregate.
    win_plan = latest_events(skewed_events, "window")._jdf.queryExecution(
    ).executedPlan().toString()
    agg_plan = latest_events(skewed_events, "aggregate")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" in win_plan
    assert "Window" not in agg_plan
    assert "max_by" in agg_plan and "partial_max_by" in agg_plan, agg_plan
    # 2. map-side partial combine bounds the aggregate's shuffle volume by
    #    keys x input-partitions, independent of the hot key's size. The
    #    window shuffle always carries all N_ROWS rows; measure the
    #    partial reduction on the real fixture:
    partial_rows = (
        skewed_events.groupBy(
            F.spark_partition_id().alias("p"), "domain_userid"
        ).count().count()
    )
    assert partial_rows * 5 < N_ROWS, (
        f"partial combine only reduced {N_ROWS} -> {partial_rows}"
    )

    with capsys.disabled():
        print(
            f"\n[skew] hot-key fixture ({N_ROWS} rows, {HOT_SHARE:.0%} on one "
            f"key): window={t_win:.2f}s aggregate={t_agg:.2f}s; window "
            f"shuffles {N_ROWS} rows, aggregate shuffles <= {partial_rows}"
        )
