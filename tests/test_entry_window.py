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
        # scale shape; r5: ngram-jaccard demoted to pytest, containment in)
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash64",
        "dedup_cc_clusters", "substring_containment",
        # ANN family (r4 rotation: the Arrow-batched alternate scorer of
        # ann_cosine_topk moved to pytest-only in favour of p09)
        "ann_cosine_topk", "ann_ivf_topk",
        "embedding_neardup",
        # text analysis (r5: fingerprint demoted — winnowing's sibling —
        # tfidf_keywords in; r7: corpus_stats demoted — the rollup of the
        # three still-windowed per-doc text entries)
        "text_token_stats", "text_quality", "text_lang_id",
        "training_mix_pipeline", "tfidf_keywords",
        # incremental + streaming runtimes (r7: late_drop demoted — the
        # remaining watermarked entries pin late-row semantics)
        "incremental_two_batch_upsert", "incremental_td_two_batch",
        "incremental_la_two_batch", "streaming_traffic_pages",
        "streaming_sessionize",
        # heaviest OLAP extensions
        "sessionize_events", "approx_distinct_daily",
        # r5 first-time artifact coverage
        "rollup_multires", "cms_heavy_hitters", "attribution_models",
        "sql_recursive_cte", "zorder_morton",
        # r6 first-time artifact coverage (VERDICT r5 item 5)
        "line_dedup", "temperature_mixture", "asof_join_spend_cogroup",
        "dedup_canonical_keep", "streaming_dedup_within_watermark",
        "domain_cap_sample", "text_normalize", "scd2_snapshot_two_batch",
        # r7 first-time artifact coverage (VERDICT r6 item 5)
        "bm25_search", "repetition_filter", "graph_pagerank",
        "kmv_merge_rollup", "pyds_pushdown_slice", "mm_audio_decode",
        "streaming_interval_full_join", "seed_roundtrip",
        # r7 new-build first-timers (built this round)
        "dedup_index_ingest", "ann_index_append_recall",
        "cdc_apply_changes",
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
