

def test_bm25_index_warm_build_is_metadata_only(spark, monkeypatch):
    """Second build with an unchanged corpus is ONE manifest JSON read —
    no Spark touch (poisoned-session proof, the ANN-index pattern)."""
    import tempfile

    from mycarely_saas_dbt_spark.operators import textops as t
    from tests.conftest import SF_DIR

    class _Poison:
        def __getattr__(self, name):  # pragma: no cover - failure path
            raise AssertionError(f"Spark touched (.{name}) on warm path")

    root = tempfile.mkdtemp(prefix="bm25_idx_test_")
    m1 = t.bm25_index_build(spark, SF_DIR, root)
    m2 = t.bm25_index_build(_Poison(), SF_DIR, root)
    assert m2 == m1
    assert m1["meta"]["bm25"]["N"] > 0


def test_bm25_index_search_matches_transient_and_prunes_buckets(spark):
    """The committed-index query returns exactly bm25_search's rows, and
    its postings scan statically prunes to the query terms' bucket
    partitions."""
    import re

    from mycarely_saas_dbt_spark.operators.textops import (
        bm25_index_search,
        bm25_search,
    )
    from tests.conftest import SF_DIR

    idx = bm25_index_search(spark, SF_DIR)
    got = {tuple(r) for r in idx.collect()}
    want = {tuple(r) for r in bm25_search(spark, SF_DIR).collect()}
    assert got == want
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*bucket", plan), plan
