"""Persistent IVFADC index through the manifest protocol (VERDICT r6
item 4): build-once (codes as committed data files, codebooks in the same
manifest version's "meta"), query-many with zero training jobs.
"""

from __future__ import annotations

import tempfile

import pytest

from tests.conftest import SF_DIR


class _PoisonSpark:
    """Raises on ANY attribute access — proves a code path never touches
    the SparkSession (the same proof style as the watermark tests'
    monkeypatched read_target)."""

    def __getattr__(self, name):  # pragma: no cover - failure path
        raise AssertionError(f"SparkSession touched (.{name}) on the warm path")


def test_build_commits_codes_and_codebooks_in_one_snapshot(spark):
    from mycarely_saas_dbt_spark.incremental import IncrementalRunner
    from mycarely_saas_dbt_spark.operators.similarity import (
        ANN_INDEX_NAME,
        PQ_M,
        ann_index_build,
    )

    root = tempfile.mkdtemp(prefix="ann_idx_test_")
    m = ann_index_build(spark, SF_DIR, root)
    ann = m["meta"]["ann"]
    assert ann["m"] == PQ_M and len(ann["codebooks"]) == PQ_M
    codes = IncrementalRunner(spark, root).read_target(ANN_INDEX_NAME)
    n = codes.count()
    assert n == spark.read.parquet(f"{SF_DIR}/embeddings.parquet").count()
    assert set(codes.columns) == {"vid", "cid", "codes"}


def test_second_build_is_metadata_only_zero_spark_zero_training(
    spark, monkeypatch
):
    """The warm path must not train, not encode, and not even touch the
    SparkSession — a second invocation is one manifest JSON read."""
    from mycarely_saas_dbt_spark.operators import similarity

    root = tempfile.mkdtemp(prefix="ann_idx_test_")
    m1 = similarity.ann_index_build(spark, SF_DIR, root)

    def boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("training ran on the warm path")

    monkeypatch.setattr(similarity, "_pq_train_core", boom)
    monkeypatch.setattr(similarity, "_pq_encode_df", boom)
    m2 = similarity.ann_index_build(_PoisonSpark(), SF_DIR, root)
    assert m2 == m1


def test_corpus_fingerprint_mismatch_triggers_rebuild(spark, monkeypatch):
    from mycarely_saas_dbt_spark.operators import similarity

    root = tempfile.mkdtemp(prefix="ann_idx_test_")
    m1 = similarity.ann_index_build(spark, SF_DIR, root)
    # simulate a rewritten corpus: fingerprint changes -> rebuild commits v2
    monkeypatch.setattr(
        similarity, "_corpus_fingerprint", lambda d: ["changed"]
    )
    m2 = similarity.ann_index_build(spark, SF_DIR, root)
    assert m2["version"] == m1["version"] + 1
    assert m2["meta"]["ann"]["corpus"] == ["changed"]


def test_index_query_matches_transient_path(spark):
    """The committed-index query path returns the exact same (qid, vid)
    top-k as the transient train+encode+rank path — the split changes
    WHERE the codebooks live, not the math."""
    from mycarely_saas_dbt_spark.operators.similarity import (
        pq_adc_topk,
        pq_index_topk,
    )

    root = tempfile.mkdtemp(prefix="ann_idx_test_")
    got = {(r.qid, r.vid) for r in pq_index_topk(spark, SF_DIR, root).collect()}
    want = {(r.qid, r.vid) for r in pq_adc_topk(spark, SF_DIR).collect()}
    assert got == want


def test_index_query_plan_has_no_encode_stage(spark):
    """Once the index is committed the query plan reads codes from
    parquet — no ArrowEvalPython/MapInPandas encode pass over the raw
    corpus (the raw vectors appear only in the bounded re-rank scan)."""
    from mycarely_saas_dbt_spark.operators.similarity import pq_index_topk

    root = tempfile.mkdtemp(prefix="ann_idx_test_")
    pq_index_topk(spark, SF_DIR, root)  # first call builds + commits
    plan = (
        pq_index_topk(spark, SF_DIR, root)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" not in plan
