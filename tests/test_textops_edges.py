"""Degenerate-document edges for the text-quality operators (ADVICE r3):
engines must agree on docs with too few tokens to form a bigram."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_gopher_single_token_doc_has_no_bigrams(spark):
    """A 1-token doc has zero bigrams: top_bigram_frac must be 0.0 (DuckDB's
    generate_series(1, 0) is empty) — not 1.0 from Spark's sequence(0, -1)
    fabricating a [0, -1] index pair."""
    from mycarely_saas_dbt_spark.operators.textops import gopher_quality

    docs = spark.createDataFrame(
        [
            (1, "word"),                  # single token: no bigrams
            (2, "aaaa aaaa aaaa aaaa"),   # all-same bigrams: frac 1.0
            (3, "one two three four"),    # distinct bigrams: frac 1/3
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality(spark, SF_DIR, docs=docs).collect()
    }
    assert out[1]["top_bigram_frac"] == 0.0
    assert out[1]["mean_token_len"] == 4.0
    assert out[2]["top_bigram_frac"] == 1.0
    assert not out[2]["passes_gopher"]  # repetitive doc rejected
    assert abs(out[3]["top_bigram_frac"] - 1 / 3) < 1e-12


def test_winnowing_arrow_matches_catalyst(spark):
    """The Arrow-batched O(len) scorer and the pure-JVM O(len*k) fold must
    produce byte-identical fingerprints (same exact integer arithmetic)."""
    from mycarely_saas_dbt_spark.operators.textops import winnowing_fingerprints

    a = winnowing_fingerprints(spark, SF_DIR, strategy="arrow").toPandas()
    c = winnowing_fingerprints(spark, SF_DIR, strategy="catalyst").toPandas()
    cols = sorted(a.columns)
    assert sorted(c.columns) == cols
    a = a[cols].sort_values(cols, ignore_index=True)
    c = c[cols].sort_values(cols, ignore_index=True)
    assert a.equals(c)
