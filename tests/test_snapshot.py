"""SCD2 snapshot semantics: open/close/unchanged/new-key paths over three
runs with an injectable clock."""

from __future__ import annotations

from datetime import datetime

import pandas as pd

from dbt_on_snowflake_spark.engine.snapshot import snapshot_apply

T1 = datetime(2026, 1, 1, 0, 0, 0)
T2 = datetime(2026, 1, 2, 0, 0, 0)
T3 = datetime(2026, 1, 3, 0, 0, 0)


def _src(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["cust_id", "city", "segment"])
    )


def test_scd2_lifecycle(spark):
    # run 1: initial load
    s1 = snapshot_apply(
        spark, _src(spark, [(1, "Oslo", "A"), (2, "Bergen", "B")]),
        None, "cust_id", ["city", "segment"], T1,
    )
    rows = {(r.cust_id, r.dbt_valid_from, r.dbt_valid_to) for r in s1.collect()}
    assert rows == {(1, T1, None), (2, T1, None)}

    # run 2: cust 1 moves city; cust 3 appears; cust 2 unchanged
    s2 = snapshot_apply(
        spark,
        _src(spark, [(1, "Tromso", "A"), (2, "Bergen", "B"), (3, "Stavanger", "C")]),
        s1, "cust_id", ["city", "segment"], T2,
    )
    r2 = sorted(
        (r.cust_id, r.city, r.dbt_valid_from, r.dbt_valid_to) for r in s2.collect()
    )
    assert r2 == [
        (1, "Oslo", T1, T2),       # closed
        (1, "Tromso", T2, None),   # opened
        (2, "Bergen", T1, None),   # unchanged
        (3, "Stavanger", T2, None),  # new key
    ]

    # run 3: cust 2 disappears from source -> closed; others unchanged
    s3 = snapshot_apply(
        spark, _src(spark, [(1, "Tromso", "A"), (3, "Stavanger", "C")]),
        s2, "cust_id", ["city", "segment"], T3,
    )
    r3 = sorted(
        (r.cust_id, r.city, r.dbt_valid_from, r.dbt_valid_to) for r in s3.collect()
    )
    assert r3 == [
        (1, "Oslo", T1, T2),
        (1, "Tromso", T2, None),
        (2, "Bergen", T1, T3),     # closed on disappearance
        (3, "Stavanger", T2, None),
    ]
    # scd ids are unique per (key, version)
    ids = [r.dbt_scd_id for r in s3.collect()]
    assert len(ids) == len(set(ids))


def test_snapshot_rejects_null_keys(spark):
    import pytest

    src = spark.createDataFrame(
        pd.DataFrame([(1, "Oslo", "A"), (None, "Bergen", "B")],
                     columns=["cust_id", "city", "segment"])
    )
    with pytest.raises(ValueError, match="NULL.*unique key"):
        snapshot_apply(spark, src, None, "cust_id", ["city", "segment"], T1)


def test_snapshot_dbt_updated_at(spark):
    """dbt snapshot format parity: every row version carries
    dbt_updated_at = the run time that CREATED the version; closing a row
    later does not touch it."""
    s1 = snapshot_apply(
        spark, _src(spark, [(1, "Oslo", "A")]), None,
        "cust_id", ["city", "segment"], T1,
    )
    s2 = snapshot_apply(
        spark, _src(spark, [(1, "Tromso", "A")]), s1,
        "cust_id", ["city", "segment"], T2,
    )
    rows = {(r.city): (r.dbt_updated_at, r.dbt_valid_to) for r in s2.collect()}
    assert rows == {
        "Oslo": (T1, T2),    # closed at T2 but created (updated_at) at T1
        "Tromso": (T2, None),
    }
