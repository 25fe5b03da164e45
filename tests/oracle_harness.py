"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, then compares row count, column names, and an order-insensitive
value comparison (columns sorted by name, rows sorted by their full tuple)
— strict equality, mirroring the driver's value-hash.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb

from dbt_on_snowflake_spark.testdata import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v: Any) -> Any:
    """Normalize a cell for cross-engine comparison.

    Numeric values are TYPE-TAGGED: the driver hash-compares
    representations, so a DuckDB HUGEINT coerced to float64 must NOT
    compare equal to Spark's int (Python's int==float leniency hid
    exactly this in round 1 — three oracle SUMs missing a BIGINT cast
    passed locally and hash-failed at the driver)."""
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        if v == 0.0:
            return ("f", 0.0)  # collapse -0.0/+0.0: equal values, different reprs
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if hasattr(v, "isoformat"):  # datetime/date; strip sub-second repr noise
        return v.isoformat()
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    return v


def _key(row: tuple) -> str:
    return repr(row)


def compare(spark, name: str, fn, oracle_sql: str, sf_dir: str) -> None:
    sdf = fn(spark, sf_dir)
    spark_cols = sorted(sdf.columns)
    srows = [
        tuple(_norm(r[c]) for c in spark_cols) for r in sdf.collect()
    ]

    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(oracle_sql)
        duck_cols_orig = [d[0] for d in res.description]
        drows_raw = res.fetchall()
    finally:
        con.close()
    duck_cols = sorted(c.lower() for c in duck_cols_orig)
    order = [duck_cols_orig.index(c) for c in sorted(duck_cols_orig, key=str.lower)]
    drows = [tuple(_norm(r[i]) for i in order) for r in drows_raw]

    assert [c.lower() for c in spark_cols] == duck_cols, (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count mismatch spark={len(srows)} duck={len(drows)}"
    )
    s_sorted = sorted(srows, key=_key)
    d_sorted = sorted(drows, key=_key)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(srows)} value mismatches; first 3: "
        + "; ".join(f"spark={a} duck={b}" for _, a, b in mismatches[:3])
    )
