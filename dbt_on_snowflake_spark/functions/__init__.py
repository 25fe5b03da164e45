"""Portable scalar/aggregate helpers.

The driver compares Spark results against DuckDB by value-hash, so float
aggregates must be *bit-identical* across engines. Floating-point sums are
order-dependent (Spark's partial/final aggregation visits rows in a
different order than DuckDB), so every SUM/AVG over a money column goes
through an exact scaled-integer path:

    round(x * 10^s) -> bigint   # all testdata money/value columns carry
                                # <= 4 true decimal digits (verified), so
                                # x*10^s is within ~1e-10 of an integer and
                                # both engines round it identically
    sum(bigint)                 # exact, order-independent, and fast:
                                # stays inside whole-stage codegen (long
                                # arithmetic), unlike decimal aggregation
    cast(double) / 10^s         # correctly-rounded in both engines

Why not decimal? Spark's decimal aggregation falls out of the vectorized
hash-aggregate fast path (~4-10x slower in our bench) and DuckDB's
high-scale decimal->double cast is not correctly rounded. Integer sums are
the fast AND portable path. Overflow headroom: values scale to ~1e11 at
scale 6; a per-group sum overflows long only past ~1e8 rows/group — at
cluster scale use two-level aggregation or decimal128 (documented in
SCALING.md).

MD5 is the portable hash (same hex in Spark and DuckDB) used by the
minhash / fingerprint operators so their oracles can replicate signatures.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def scaled(col: str | Column, scale: int = 2) -> Column:
    """Exact scaled-integer view of a <=`scale`-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale)).cast("long")


def scaled_sql(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(({expr}) * {10**scale}) AS BIGINT)"


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent, engine-portable SUM over a money column."""
    return (F.sum(scaled(col, scale)).cast("double") / float(10**scale)).alias(alias)


def dsum_sql(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM({scaled_sql(expr, scale)}) AS DOUBLE) / {float(10 ** scale)}"
        f" AS {alias}"
    )


def sum_scaled(expr: Column, alias: str, scale: int) -> Column:
    """SUM of an already-scaled long expression, surfaced as double."""
    return (F.sum(expr).cast("double") / float(10**scale)).alias(alias)


def sum_scaled_sql(expr: str, alias: str, scale: int) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) / {float(10 ** scale)} AS {alias}"


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Portable AVG: exact integer sum, then double division by count."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(scaled(c, scale)).cast("double") / float(10**scale) / F.count(c)
    ).alias(alias)


def davg_sql(expr: str, alias: str, scale: int = 2) -> str:
    return (
        f"CAST(SUM({scaled_sql(expr, scale)}) AS DOUBLE) / {float(10 ** scale)}"
        f" / COUNT({expr}) AS {alias}"
    )


def revenue_scaled() -> Column:
    """lineitem revenue l_extendedprice*(1-l_discount), exact at scale 4."""
    return scaled("l_extendedprice") * (100 - scaled("l_discount"))


REVENUE_SCALED_SQL = (
    f"{scaled_sql('l_extendedprice')} * (100 - {scaled_sql('l_discount')})"
)


def sorted_set_str(col: str | Column, alias: str) -> Column:
    """ARRAY_AGG(DISTINCT ...) parity (reference
    customer_loyalty_metrics.sql:10): Snowflake's distinct array-agg is
    unordered, so for deterministic comparison we sort numerically and
    join to a CSV string — portable across Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.array_join(
        F.transform(F.array_sort(F.collect_set(c)), lambda x: x.cast("string")),
        ",",
    ).alias(alias)


def sorted_set_str_sql(expr: str, alias: str) -> str:
    return f"ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT {expr})), ',') AS {alias}"
