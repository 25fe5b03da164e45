"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its DuckDB oracle on the same parquet
tables, then compares row count, column names, and an order-insensitive
value comparison (columns sorted by name, rows sorted by their full tuple)
— strict equality, mirroring the driver's value-hash.

BOTH sides are fetched as Arrow tables (``DataFrame.toArrow()`` /
``fetch_arrow_table()``) and every cell is tagged with its Arrow dtype
FAMILY before comparison. The round-6 driver failure shipped because the
old ``fetchall()`` path let Python coerce DuckDB's HUGEINT (Arrow
decimal128(38,0)) into int — equal to Spark's int64 locally, hash-distinct
at the driver. Arrow-level tagging makes that class fail here first:
an integer column and a decimal column NEVER compare equal, regardless of
value. Integer widths (int32 vs int64) and float widths are collapsed
within their family — the driver's 49 green r6 rows include both, so the
family, not the width, is the driver-observable boundary; decimals keep
their exact scale via ``str(Decimal)``.
"""

from __future__ import annotations

import math
import os
from datetime import timezone
from typing import Any

_UTC = timezone.utc

import duckdb
import pyarrow as pa

from dbt_on_snowflake_spark.testdata import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v: Any, t: pa.DataType) -> Any:
    """Normalize one cell, tagged by its Arrow dtype family.

    Tags: ``b`` bool, ``i`` any integer width, ``f`` any float width,
    ``dec`` decimal128/256 (scale-preserving via str), ``ts``/``d``
    timestamp/date, ``L`` list (element-normalized), ``S`` struct.
    A ``dec`` cell can never equal an ``i`` cell — the exact blind spot
    that let round 6's ``corpus_pack_sequences`` oracle ship uncast."""
    if v is None:
        return None
    if pa.types.is_boolean(t):
        return ("b", bool(v))
    if pa.types.is_integer(t):
        return ("i", int(v))
    if pa.types.is_floating(t):
        f = float(v)
        if math.isnan(f):
            return ("f", "NaN")
        if f == 0.0:
            return ("f", 0.0)  # collapse -0.0/+0.0: equal values, one repr
        return ("f", f)
    if pa.types.is_decimal(t):
        return ("dec", str(v))
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        # Spark's toArrow() emits timestamp[us, tz=UTC] (session tz);
        # DuckDB reads the same parquet micros as naive. Same instant —
        # normalize tz-aware to naive UTC before comparing.
        if getattr(v, "tzinfo", None) is not None:
            v = v.astimezone(_UTC).replace(tzinfo=None)
        return ("ts", v.isoformat())
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("L", tuple(_norm_cell(x, t.value_type) for x in v))
    if pa.types.is_struct(t):
        return (
            "S",
            tuple(
                sorted(
                    (t.field(i).name, _norm_cell(v.get(t.field(i).name), t.field(i).type))
                    for i in range(t.num_fields)
                )
            ),
        )
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return ("bin", bytes(v))
    return str(v)


def _rows_from_arrow(tbl: pa.Table) -> tuple[list[str], list[tuple]]:
    """(lowercased sorted column names, normalized row tuples) from Arrow."""
    cols_orig = list(tbl.column_names)
    order = sorted(range(len(cols_orig)), key=lambda i: cols_orig[i].lower())
    cols = [cols_orig[i].lower() for i in order]
    types = [tbl.schema.field(i).type for i in order]
    pylists = [tbl.column(i).to_pylist() for i in order]
    rows = [
        tuple(_norm_cell(pylists[j][r], types[j]) for j in range(len(order)))
        for r in range(tbl.num_rows)
    ]
    return cols, rows


def _key(row: tuple) -> str:
    return repr(row)


def compare(spark, name: str, fn, oracle_sql: str, sf_dir: str) -> int:
    """Hash-compare a Spark query against its DuckDB oracle; returns the
    (matching) row count so callers can assert nonzero evidence."""
    sdf = fn(spark, sf_dir)
    spark_cols, srows = _rows_from_arrow(sdf.toArrow())

    con = duckdb_conn(sf_dir)
    try:
        duck_tbl = con.execute(oracle_sql).fetch_arrow_table()
    finally:
        con.close()
    duck_cols, drows = _rows_from_arrow(duck_tbl)

    assert spark_cols == duck_cols, (
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
    return len(srows)
