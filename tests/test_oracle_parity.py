"""Every queries() entry with an oracle must match it at sf0.001 —
the same check the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from etl_sql_and_pyspark_developement__spark.plans import ORACLES, QUERIES

from tests.parity import assert_parity

KEYS = sorted(QUERIES)


@pytest.mark.parametrize("key", KEYS)
def test_query_matches_oracle(spark, sf_dir, key):
    df = QUERIES[key](spark, sf_dir)
    sql = ORACLES.get(key)
    if sql is None:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    assert_parity(df, sql, sf_dir, key=key)
