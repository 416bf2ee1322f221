"""The driver's correctness harness checks exactly the FIRST 50 registered
queries. These assertions pin the priority window so a future registration
change can't silently push the LLM-pipeline surface back out of it
(round-2 lesson: the TPC-H sweep occupied slots 28-49 and everything past
`win_lag_lead` was invisible to CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import glob
import json
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_driver_window_is_exactly_the_priority_list():
    from mycarely_saas_dbt_spark.entry import DRIVER_WINDOW, build_queries

    names = list(build_queries())
    assert len(DRIVER_WINDOW) == 50
    assert names[:50] == DRIVER_WINDOW
    assert len(names) == len(set(names))


def test_driver_window_covers_llm_pipeline_surface():
    from mycarely_saas_dbt_spark.entry import build_queries

    first50 = set(list(build_queries())[:50])
    must_have = {
        # reference models — parity row_number path + the SQL-API entry
        # whose oracle inlines the full TD chain (r15: the hash-id twin
        # and the two lighter sql_api_* rows demoted, pytest-pinned)
        "traffic_pages_agg", "traffic_daily_agg", "lead_activities_agg",
        "sql_api_lead_activities",
        # dedup family (r13: simhash64/cc_clusters demoted — banded
        # candidate generation stays via minhash_lsh, the CC iteration
        # runs inside training_mix_pipeline's canonical-keep stage)
        "dedup_minhash_lsh",
        # ANN family (r12: the append/delete-aware/pq-recall entries
        # demoted — the retrain + streaming-maintenance lifecycles run
        # build/append/delete/drift in their fixtures every run)
        "ann_index_retrain_recall", "streaming_ann_maintenance",
        # text analysis + retrieval
        "text_lang_id", "training_mix_pipeline",
        # incremental (dbt-semantics) runtimes
        "incremental_td_two_batch", "incremental_la_two_batch",
        # streaming — incl. the r13 stateful-family first-timers (the
        # applyInPandasWithState profile, interval/enrich stream joins,
        # state-store dedup)
        "mv_incremental_refresh", "streaming_ivm_distinct",
        "streaming_ivm_traffic_pages",
        "streaming_user_profile", "streaming_interval_join",
        "streaming_enrich_join", "streaming_dedup",
        # lakehouse + PyDS surface
        "pyds_incremental_rollup",
        # BM25 lifecycle family (r14: append demoted — it runs as a
        # measured phase inside the tiered entry's fixture)
        "bm25_index_tiered_search",
        "streaming_bm25_maintenance",
        # column mapping compositions (the r12/r13 builds)
        "colmap_cdf_lifecycle", "jv_incremental_refresh",
        "colmap_stream_restart",
        # r14 builds: the reference's TD DAG maintained through the
        # chained IVM API + the CREATE MATERIALIZED VIEW front door
        "ivm_traffic_daily", "sql_create_mv",
        # r14 rotation: the judge's ten never-artifacted picks
        "data_tests_suite", "data_tests_store_failures",
        "f_datetime_suite", "f_string_suite", "f_agg_suite",
        "format_csv_roundtrip", "asof_join_spend",
        "bucketed_colocated_join", "agg_grouping_sets",
        "retention_cohorts",
        # r15 rotation: fourteen never-artifacted picks (families at
        # zero driver artifacts — OLAP rollup/pivot, rank windows,
        # sampling, PII scrub, BPE, RFM segmentation, JSON roundtrip,
        # admission control, kNN eval, range join, interpolation,
        # multimodal frame sampling, moments)
        "agg_rollup", "pivot_returnflag", "win_rank_ntile",
        "sample_stratified", "text_pii_scrub", "text_token_bpe",
        "sql_rfm_segmentation", "format_json_roundtrip",
        "streaming_admission_quota", "knn_label_eval",
        "range_join_pairs", "ts_interpolate", "mm_frame_sample",
        "stats_moments",
    }
    assert must_have <= first50


def test_every_query_has_an_oracle_except_documented_rows_only():
    """All but two entries are oracle-checked; the two rows-only entries are
    justified in SURVEY §8 (HLL streaming distinct is not SQL-reproducible —
    the exact-uniques variant `streaming_traffic_pages` IS oracle-checked;
    fake multimodal features are container-stubbed)."""
    from mycarely_saas_dbt_spark.entry import build_oracle_sql, build_queries

    qs, os_ = build_queries(), build_oracle_sql()
    rows_only = set(qs) - set(os_)
    assert rows_only == {"streaming_traffic_pages_hll", "mm_fake_features"}


# Window-rotation debt ceiling (VERDICT r12 item 7): the number of
# registered entries that have NEVER appeared in a CORRECTNESS_r*.json
# window may only DECREASE round over round — lower this constant each
# round as rotations land; raising it requires justifying every new
# never-artifacted entry in the round's SURVEY delta. Entries currently
# IN the window don't count (they will be artifacted at round close).
NEVER_ARTIFACTED_CEILING = 52  # r15: 66 - 14 rotated in


def test_rotation_debt_only_decreases():
    from mycarely_saas_dbt_spark.entry import DRIVER_WINDOW, build_queries

    seen: set[str] = set()
    artifacts = sorted(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")))
    assert artifacts, "no CORRECTNESS artifacts found at the repo root"
    for f in artifacts:
        with open(f) as fh:
            seen.update(json.load(fh))
    registered = set(build_queries())
    never = registered - seen - set(DRIVER_WINDOW)
    assert len(never) <= NEVER_ARTIFACTED_CEILING, (
        f"rotation debt grew: {len(never)} never-artifacted entries "
        f"(ceiling {NEVER_ARTIFACTED_CEILING}) — rotate more entries into "
        f"the window or justify the new registrations: {sorted(never)}"
    )
