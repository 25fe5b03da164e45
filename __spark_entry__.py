"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``dbt_on_snowflake_spark/operators/`` and register
themselves (with their DuckDB oracles) into
``dbt_on_snowflake_spark.registry``; this module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from dbt_on_snowflake_spark.registry import all_queries, driver_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    q = all_queries()["q1_pricing_summary"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §7.5.

    Exports the curated driver set (<= 50 — the per-round check budget) so
    every exported query gets a CORRECTNESS row every round; near-duplicate
    shapes register with driver=False and are verified by the local parity
    replica (tests/test_oracle_parity.py) over the full registry instead.
    """

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # events.parquet stores TIMESTAMP(NANOS); see testdata.table().
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        return run

    return {name: wrap(q.fn) for name, q in driver_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; omitted => rows-only check."""
    return {
        name: q.oracle for name, q in driver_queries().items() if q.oracle is not None
    }
