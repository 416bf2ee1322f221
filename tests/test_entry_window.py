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
        # runs inside training_mix_pipeline)
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash64",
        "dedup_cc_clusters",
        # ANN family (r4 rotation: the Arrow-batched alternate scorer of
        # ann_cosine_topk moved to pytest-only in favour of p09)
        "ann_cosine_topk", "ann_ivf_topk",
        "embedding_neardup",
        # text analysis (r8: tfidf demoted — dsir_select + the BM25
        # entries pin corpus-statistic term scoring)
        "text_token_stats", "text_quality", "text_lang_id",
        "training_mix_pipeline",
        # incremental + streaming runtimes (r7: late_drop demoted — the
        # remaining watermarked entries pin late-row semantics)
        "incremental_two_batch_upsert", "incremental_td_two_batch",
        "incremental_la_two_batch", "streaming_traffic_pages",
        "streaming_sessionize",
        # heaviest OLAP extensions
        "sessionize_events", "approx_distinct_daily",
        # r6 first-time artifact coverage still windowed after r8
        "line_dedup", "asof_join_spend_cogroup",
        "streaming_dedup_within_watermark",
        # r7 first-time artifact coverage (VERDICT r6 item 5)
        "bm25_search", "repetition_filter", "graph_pagerank",
        "kmv_merge_rollup", "pyds_pushdown_slice", "mm_audio_decode",
        "streaming_interval_full_join", "seed_roundtrip",
        # r7 new-build first-timers (built r7)
        "dedup_index_ingest", "ann_index_append_recall",
        "cdc_apply_changes",
        # r8 rotation (VERDICT r7 item 4) + the r8 delete-aware build
        "merge_multi_clause", "cdf_table_changes", "bloom_point_lookup",
        "graph_triangles", "mg_heavy_hitters", "dsir_select",
        "bm25_index_search", "ann_pq_index_recall",
        "pyds_manifest_stream", "pyds_sink_roundtrip",
        "streaming_cdc_apply", "bm25_index_delete_aware",
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
