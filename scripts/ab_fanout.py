"""Interleaved A/B of util.fanout_scan per call site (VERDICT r5 item 2).

For each affected query, runs fanout-ON and fanout-OFF back to back
(paired samples, interleaved across rounds — the only timing protocol
this box's ±50% load swings allow; see bench.py). Prints per-query
paired min/median and the per-round deltas so a keep/drop decision is
spread-backed, not single-sample.

Usage: python scripts/ab_fanout.py [query ...]   (default: the r5 suspects)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = [
    "dedup_simhash64",
    "text_winnowing",
    "substring_containment",
    "dedup_minhash_lsh",
    "doc_chunking",
    "line_dedup",
]

N_ROUNDS = 5


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mycarely_saas_dbt_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(app_name="ab_fanout")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_sources(spark, sf_dir)

    samples: dict[tuple[str, str], list[float]] = {}
    for rnd in range(N_ROUNDS):
        for name in names:
            for mode in ("on", "off"):
                os.environ["MYCARELY_FANOUT"] = "1" if mode == "on" else "0"
                t0 = time.time()
                qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
                samples.setdefault((name, mode), []).append(time.time() - t0)
        print(f"--- round {rnd + 1}/{N_ROUNDS}", flush=True)
    os.environ.pop("MYCARELY_FANOUT", None)

    for name in names:
        on = sorted(samples[(name, "on")])
        off = sorted(samples[(name, "off")])
        pairs = [
            round(b - a, 2)
            for a, b in zip(samples[(name, "on")], samples[(name, "off")])
        ]
        print(
            f"{name}: ON min={on[0]:.2f} med={on[len(on) // 2]:.2f} | "
            f"OFF min={off[0]:.2f} med={off[len(off) // 2]:.2f} | "
            f"paired off-on deltas={pairs}",
            flush=True,
        )


if __name__ == "__main__":
    main()
