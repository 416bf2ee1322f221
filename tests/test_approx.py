

def test_mg_summary_bounded_and_candidates_superset(spark):
    """r7 Misra–Gries: every partition's summary carries at most MG_K
    counters, and the candidate union is a superset of the exact heavy
    hitters — the two facts the two-pass exactness argument rests on."""
    from pyspark.sql import functions as F

    from mycarely_saas_dbt_spark.operators.approx import (
        MG_K,
        q_mg_heavy_hitters,
    )
    from mycarely_saas_dbt_spark.sources.registry import register_sources
    from tests.conftest import SF_DIR

    register_sources(spark, SF_DIR)
    toks = spark.table("documents").select(
        F.explode(F.split("text", " ")).alias("term")
    )

    # replicate pass 1 with a partition tag to bound per-partition rows
    def mg_tagged(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for term, c in pdf["term"].value_counts().items():
                counters[term] = counters.get(term, 0) + int(c)
            if len(counters) > MG_K:
                cut = sorted(counters.values(), reverse=True)[MG_K]
                counters = {
                    t: v - cut for t, v in counters.items() if v - cut > 0
                }
        yield pd.DataFrame({"term": list(counters)})

    per_part = (
        toks.repartition(8)
        .mapInPandas(mg_tagged, "term string")
        .withColumn("pid", F.spark_partition_id())
    )
    sizes = per_part.groupBy("pid").count().collect()
    assert sizes and all(r["count"] <= MG_K for r in sizes)

    cands = {r["term"] for r in per_part.select("term").distinct().collect()}
    hh = {r["term"] for r in q_mg_heavy_hitters(spark, SF_DIR).collect()}
    assert hh and hh <= cands
