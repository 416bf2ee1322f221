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
        # reference models
        "traffic_pages_agg", "traffic_daily_agg", "lead_activities_agg",
        # dedup family (r4 rotation: 64-bit Hamming-banded simhash is the
        # scale shape; r8: containment + canonical_keep demoted — the
        # explode+equi-join family stays via line_dedup, canonical keep
        # runs inside training_mix_pipeline; r9: embedding_neardup
        # demoted for the richer semdedup)
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash64",
        "dedup_cc_clusters", "semdedup",
        # ANN family (r9: the transient exact/IVF entries demoted — the
        # persistent-index lifecycle entries grade against the exact leg
        # every run and add commit/pruning/delete-awareness on top)
        "ann_pq_index_recall", "ann_index_append_recall",
        "ann_index_delete_aware",
        # text analysis (r8: tfidf demoted; r9: token_stats/quality
        # demoted — they execute inside the windowed BM25/training-mix
        # entries; retrieval adds hybrid RRF)
        "text_lang_id", "training_mix_pipeline", "hybrid_rrf_search",
        # incremental + streaming runtimes (r9: streaming_traffic_pages
        # and sessionize_events demoted — their shapes run inside the
        # windowed streaming/sessionize/medallion/cdf entries)
        "incremental_two_batch_upsert", "incremental_td_two_batch",
        "incremental_la_two_batch",
        "streaming_sessionize",
        # r9 lakehouse + profiling first-timers (r11: dv_delete_read and
        # profile_table demoted — the DV family stays via the strictly
        # harder dv_pos_reinsert_read, the profiler via its approx
        # sibling; justifications in entry.py)
        # (r11 late: medallion_multihop demoted — manifest tailing, txn
        # sinks and multi-hop propagation all run in-window inside the
        # streaming maintenance/CDF/IVM entries; justification in
        # entry.py)
        "gen_prune_read", "merge_schema_evolution",
        "profile_table_approx",
        "streaming_cdf_propagate",
        # r6 first-time artifact coverage still windowed after r11
        # (r11 demotions: line_dedup, asof_join_spend_cogroup — dedup
        # family keeps six in-window entries; range/as-of semantics stay
        # via interval_bin_join; justifications in entry.py)
        "streaming_dedup_within_watermark",
        # r7 new-build first-timers (built r7; r10: cdc_apply_changes
        # demoted — the tombstone-hard-delete merge runs in-window inside
        # streaming_cdc_apply and both CDF streaming entries' sinks;
        # r11: repetition_filter, graph_pagerank, pyds_pushdown_slice,
        # mg_heavy_hitters, dsir_select demoted — shapes pinned by
        # in-window siblings, justifications in entry.py)
        "dedup_index_ingest", "ann_index_append_recall",
        # r8 rotation (VERDICT r7 item 4) + the r8 delete-aware build
        # (r10 demotions: pyds_manifest_stream — medallion_multihop tails
        # the same stream source in-window; bloom_point_lookup —
        # file-skipping pinned by gen_prune_read)
        "merge_multi_clause",
        "graph_triangles",
        "bm25_index_search", "ann_pq_index_recall",
        "pyds_sink_roundtrip",
        "streaming_cdc_apply", "bm25_index_delete_aware",
        # r10 rotation (VERDICT r9 item 2) + r10 new builds
        "streaming_index_maintenance", "bm25_index_append_search",
        "interval_bin_join", "streaming_ivm_aggregate",
        "bm25_index_optimize_search", "ann_index_retrain_recall",
        "mm_image_decode", "dv_pos_reinsert_read",
        # r11 new builds + rotation (VERDICT r10 items 2-4, 7)
        "streaming_ann_maintenance", "bm25_index_tiered_search",
        "streaming_bm25_maintenance",
        "cdf_schema_evolution", "skew_salted_join", "dml_restore_clone",
        "sessionize_session_window", "lead_activities_agg_maxby",
        # r11 late builds: delta-join IVM, commit provenance, column
        # mapping
        "streaming_ivm_join", "time_travel_history",
        "rename_column_lifecycle",
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
