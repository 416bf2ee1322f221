"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"traffic_pages_agg": sec, ...}, "sf": 0.1}

Each query is forced end-to-end with the noop sink (computes every output
column, unlike count() which lets Catalyst prune the plan).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BENCH_QUERIES = [
    "traffic_pages_agg",
    "traffic_daily_agg",
    "lead_activities_agg",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "tpch_q14",
    "tpch_q18",
]

# extension benches appended as they land (dedup, similarity, text analysis)
EXTENSION_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    "text_quality",
    "asof_join_spend",
    "sessionize_events",
    # round 3: the scale-default TP id path (no global Window) vs the
    # row_number parity entry above, plus the heaviest new text ops
    "traffic_pages_agg_hash",
    "lead_activities_agg_maxby",
    "sessionize_session_window",
    "doc_chunking",
    "chunk_packing",
    "skew_salted_join",
    "dedup_simhash64",
    "text_winnowing",
    # round 4: PQ-ADC shortlist + exact re-rank (includes its own exact
    # brute-force recall baseline, so the timing covers both paths), the
    # fingerprint-candidate containment dedup, and the composed
    # training-mix pipeline (near-dup keep + quality gate + domain cap)
    "ann_pq_adc_recall",
    "substring_containment",
    "training_mix_pipeline",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    from mycarely_saas_dbt_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    # Warm-up outside the timed region: JVM/codegen spin-up plus the one-time
    # source registration (parquet footer reads + temp-view creation) that is
    # session setup, not query execution.
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_sources(spark, sf_dir)

    # min of N_RUNS passes per query: first pass absorbs per-plan codegen and
    # file-listing cold costs; min is the standard steady-state estimator for
    # single-machine wall-clock with noisy neighbors.
    # Crash-proof: one broken query must never erase the whole artifact
    # (BENCH_r02 lesson — a single AnalysisException zeroed all 16 timings).
    # Each query is caught individually, its timing/error is flushed to
    # stderr as it completes, and the final JSON line always prints.
    # 3 runs: this box's wall-clock noise is +/-50% per query run-to-run
    # (firecracker VM, shared host); min-of-2 let one bad draw distort a
    # query's number, min-of-3 keeps the artifact comparable across rounds.
    N_RUNS = 3
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    names = [n for n in BENCH_QUERIES + EXTENSION_QUERIES if n in qs]
    for name in names:
        best = None
        try:
            for _ in range(N_RUNS):
                t0 = time.time()
                df = qs[name](spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                elapsed = time.time() - t0
                best = elapsed if best is None else min(best, elapsed)
            timings[name] = round(best, 3)
            print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)
        except Exception as exc:  # noqa: BLE001 — record and keep going
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"[bench] {name}: ERROR {errors[name]}", file=sys.stderr, flush=True)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "runs_per_query": N_RUNS,
        "aggregation": "min",
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out), flush=True)
    try:
        spark.stop()
    except Exception:
        pass


if __name__ == "__main__":
    main()
