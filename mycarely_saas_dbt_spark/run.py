"""CLI runner: ``python -m mycarely_saas_dbt_spark.run`` — the ``dbt run``
equivalent (model selection, --full-refresh, logged stats)."""

from __future__ import annotations

import argparse
import json
import logging


def main() -> None:
    ap = argparse.ArgumentParser(description="Run the model DAG incrementally.")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--target", default="/tmp/mycarely_target")
    ap.add_argument(
        "--models",
        nargs="*",
        default=None,
        help="subset of: traffic_pages_agg traffic_daily_agg lead_activities_agg",
    )
    ap.add_argument("--full-refresh", action="store_true")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(name)s %(message)s")

    from mycarely_saas_dbt_spark.incremental import run_dag
    from mycarely_saas_dbt_spark.session import get_spark

    spark = get_spark(app_name="mycarely-run")
    spark.sparkContext.setLogLevel("ERROR")
    for stats in run_dag(
        spark,
        args.sf_dir,
        args.target,
        models=args.models,
        full_refresh=args.full_refresh,
    ):
        print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
