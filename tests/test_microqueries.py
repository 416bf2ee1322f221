"""Oracle-differential tests for every registered micro-query."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR, assert_df_matches_oracle


def _pairs():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    skip = {"traffic_pages_agg", "traffic_daily_agg", "lead_activities_agg"}
    return [(n, qs[n], oracles.get(n)) for n in qs if n not in skip]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_microquery_matches_oracle(spark, duck, name, fn, sql):
    df = fn(spark, SF_DIR)
    if sql is None:
        assert df.count() >= 0  # rows-only contract
    else:
        assert_df_matches_oracle(df, duck, sql)
