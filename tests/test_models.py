"""End-to-end oracle-differential tests for the three reference models."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_df_matches_oracle


@pytest.fixture(scope="module")
def entry_mod():
    import __spark_entry__ as e

    return e


def test_entry_smoke(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "id" in df.columns


@pytest.mark.parametrize(
    "name", ["traffic_pages_agg", "traffic_daily_agg", "lead_activities_agg"]
)
def test_model_matches_oracle(spark, duck, entry_mod, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    assert_df_matches_oracle(q(spark, SF_DIR), duck, sql)
