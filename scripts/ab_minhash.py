"""Interleaved A/B of the session-memoized minhash pair relation
(VERDICT r6 item 1).

Compares, in ONE session with paired interleaved samples (the bench.py
noise protocol), the two consumers of the minhash index:

  cold — MYCARELY_SESSION_MEMO=0: every invocation rebuilds
         signatures → bands → candidates → verify (the r6 shape, plus
         an eager localCheckpoint of the result);
  warm — memo enabled: the first invocation per mode-switch builds and
         checkpoints, subsequent invocations consume the checkpointed
         pair relation without re-expansion.

The warm column is the deployment shape (index built once per corpus
snapshot, consumed by every downstream query); the cold column proves
the build path itself did not regress. Between warm rounds the memo is
left intact; before each cold sample the memo is dropped so the cold
timing never accidentally reads warm blocks.

Usage: python scripts/ab_minhash.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = ["dedup_minhash_lsh", "training_mix_pipeline"]
N_ROUNDS = 5


def _drop_memo() -> None:
    from mycarely_saas_dbt_spark import util

    for k in list(util._MEMO):
        df = util._MEMO.pop(k)
        try:
            df.unpersist()
        except Exception:
            pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mycarely_saas_dbt_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark(app_name="ab_minhash")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    from mycarely_saas_dbt_spark.sources.registry import register_sources

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    register_sources(spark, sf_dir)
    # prime the warm memo once outside the timed region so every "warm"
    # sample measures steady-state consumption, not the first build
    os.environ["MYCARELY_SESSION_MEMO"] = "1"
    qs["dedup_minhash_lsh"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    samples: dict[tuple[str, str], list[float]] = {}
    for rnd in range(N_ROUNDS):
        for name in NAMES:
            # cold sample: memo disabled AND dropped, full rebuild
            os.environ["MYCARELY_SESSION_MEMO"] = "0"
            _drop_memo()
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.setdefault((name, "cold"), []).append(time.time() - t0)
            # re-prime OUTSIDE the timed region (the cold run dropped the
            # memo), then take the steady-state warm sample
            os.environ["MYCARELY_SESSION_MEMO"] = "1"
            qs["dedup_minhash_lsh"](spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()
            t0 = time.time()
            qs[name](spark, sf_dir).write.mode("overwrite").format(
                "noop"
            ).save()
            samples.setdefault((name, "warm"), []).append(time.time() - t0)
        print(f"--- round {rnd + 1}/{N_ROUNDS}", flush=True)
    os.environ.pop("MYCARELY_SESSION_MEMO", None)

    for name in NAMES:
        for mode in ("cold", "warm"):
            s = sorted(samples[(name, mode)])
            print(
                f"{name:24s} {mode}: min={s[0]:.2f}s "
                f"median={statistics.median(s):.2f}s "
                f"spread={[round(x, 2) for x in s]}"
            )
        deltas = [
            c - w
            for c, w in zip(samples[(name, "cold")], samples[(name, "warm")])
        ]
        print(
            f"{name:24s} paired cold-warm deltas: "
            f"{[round(d, 2) for d in deltas]}"
        )


if __name__ == "__main__":
    main()
