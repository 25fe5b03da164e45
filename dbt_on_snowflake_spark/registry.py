"""Query registry backing ``__spark_entry__.py``.

Every implemented operator from SURVEY.md §2 (plus the §7.5 extensions)
registers here as a named query: a PySpark callable ``(spark, sf_dir) ->
DataFrame`` and, where SQL-expressible, an equivalent ANSI-SQL oracle string
DuckDB runs on the same parquet tables. The driver hash-compares the two
(order-insensitively, columns sorted by name) — so both sides alias every
computed column identically, and float aggregates go through decimal-exact
paths (see ``functions``) to make the values bit-identical.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL; None => driver does a rows-only check
    headline: bool = False  # include in bench.py


QUERIES: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None, headline: bool = False):
    """Decorator registering a query (and optional DuckDB oracle)."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = RegisteredQuery(name, fn, oracle, headline)
        return fn

    return deco


def all_queries() -> dict[str, RegisteredQuery]:
    # Import operator modules for their registration side effects.
    from dbt_on_snowflake_spark import operators  # noqa: F401

    return QUERIES
