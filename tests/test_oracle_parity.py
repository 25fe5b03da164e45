"""Every registered query with an oracle must hash-match DuckDB — this is a
local replica of the driver's t2 correctness gate (sf0.001 for speed; the
driver runs sf0.01)."""

from __future__ import annotations

import pytest

from dbt_on_snowflake_spark.registry import all_queries
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(spark, name):
    q = _QUERIES[name]
    if q.oracle is None:
        df = q.fn(spark, SF_SMOKE)
        assert df.columns  # rows-only check: runs and has a stable schema
        df.count()
    else:
        compare(spark, name, q.fn, q.oracle, SF_SMOKE)
