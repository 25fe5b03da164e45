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


def test_driver_export_within_budget():
    """The driver checks only the first DRIVER_BUDGET exported queries per
    round; exporting more silently drops CORRECTNESS rows (round-2 verdict
    "What's wrong" #4). Demoted (driver=False) queries are still covered by
    test_oracle_parity above."""
    from dbt_on_snowflake_spark.registry import DRIVER_BUDGET, driver_queries

    exported = driver_queries()
    assert len(exported) <= DRIVER_BUDGET
    # every query family that has driver=False members keeps >= 1 exported row
    families = {
        "dedup_", "text_", "ann_", "q", "w_", "a_", "t_events_", "multimodal_"
    }
    for fam in families:
        assert any(n.startswith(fam) for n in exported), fam
