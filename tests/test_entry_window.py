"""The driver's correctness harness checks exactly the FIRST 50 registered
queries. These assertions pin the priority window so a future registration
change can't silently push the LLM-pipeline surface back out of it
(round-2 lesson: the TPC-H sweep occupied slots 28-49 and everything past
`win_lag_lead` was invisible to CORRECTNESS_r{N}.json)."""

from __future__ import annotations


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
        # reference models — parity row_number path AND the r12-windowed
        # ENGINE-DEFAULT hash-id path, plus the SQL-API verbatim trio
        "traffic_pages_agg", "traffic_daily_agg", "lead_activities_agg",
        "traffic_pages_agg_hash",
        "sql_api_traffic_pages", "sql_api_traffic_daily",
        "sql_api_lead_activities",
        # dedup family (r4: 64-bit Hamming-banded simhash is the scale
        # shape; r12: dedup_index_ingest demoted — the committed
        # signature index is the one streaming_index_maintenance
        # maintains in-window)
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash64",
        "dedup_cc_clusters", "semdedup",
        # ANN family (r12: the append/delete-aware/pq-recall entries
        # demoted — the retrain + streaming-maintenance lifecycles run
        # build/append/delete/drift in their fixtures every run)
        "ann_index_retrain_recall", "streaming_ann_maintenance",
        # text analysis + retrieval
        "text_lang_id", "training_mix_pipeline", "hybrid_rrf_search",
        # incremental (dbt-semantics) runtimes + the r12 rotation picks
        "incremental_two_batch_upsert", "incremental_td_two_batch",
        "incremental_la_two_batch",
        "scd2_hard_delete_two_batch", "incremental_schema_evolution",
        "variant_shred_rollup", "streaming_incremental_merge",
        "format_csv_permissive", "udtf_sentence_split",
        # streaming (r12: streaming_sessionize and the watermark-dedup
        # micro demoted — sessionize_session_window runs the same logic
        # through the harder built-in session_window state machinery;
        # streaming_cdc_apply demoted — tombstone CDC application runs
        # inside colmap_cdf_lifecycle's sink and both IVM sinks)
        "sessionize_session_window", "streaming_cdf_propagate",
        "streaming_index_maintenance", "streaming_ivm_minmax",
        # lakehouse + profiling
        "gen_prune_read", "profile_table_approx", "dv_pos_reinsert_read",
        "skew_salted_join", "dml_restore_clone",
        "graph_triangles",
        "pyds_sink_roundtrip",
        # BM25 lifecycle family (r12: the plain search + delete-aware
        # entries demoted — append/optimize/tiered/maintenance stay, all
        # sharing the same query path and oracle)
        "bm25_index_append_search", "bm25_index_optimize_search",
        "bm25_index_tiered_search", "streaming_bm25_maintenance",
        "interval_bin_join", "mm_image_decode",
        "cdf_schema_evolution", "lead_activities_agg_maxby",
        # provenance + column mapping + the r12 builds
        "time_travel_history", "rename_column_lifecycle",
        "colmap_cdf_lifecycle", "streaming_ivm_join_pruned",
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
