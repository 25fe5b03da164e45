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


def test_timestamp_strategy_lifecycle(spark):
    """Timestamp strategy: change detection by updated_at recency, version
    times from the DATA (not the run clock), stale re-extracts ignored,
    hard deletes closed at the run clock."""
    import pytest

    from dbt_on_snowflake_spark.engine.snapshot import snapshot_apply_timestamp

    U1 = datetime(2025, 12, 1, 0, 0, 0)
    U2 = datetime(2025, 12, 15, 0, 0, 0)

    def src(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["cust_id", "city", "updated_at"])
        )

    s1 = snapshot_apply_timestamp(
        spark, src([(1, "berlin", U1), (2, "paris", U1)]),
        None, "cust_id", "updated_at", ["city"], T1,
    ).cache()
    rows = {r.cust_id: r for r in s1.collect()}
    assert rows[1].dbt_valid_from == U1  # data time, not run time
    assert rows[1].dbt_valid_to is None

    # run 2: cust 1 updated (newer stamp), cust 2 re-extracted UNCHANGED
    # stamp, cust 3 new, and a stale row for cust 2 must not reopen it
    s2 = snapshot_apply_timestamp(
        spark,
        src([(1, "munich", U2), (2, "paris", U1), (3, "rome", U2)]),
        s1, "cust_id", "updated_at", ["city"], T2,
    ).cache()
    got = {(r.cust_id, r.city): r for r in s2.collect()}
    assert got[(1, "berlin")].dbt_valid_to == U2   # closed AT the new stamp
    assert got[(1, "munich")].dbt_valid_from == U2
    assert got[(1, "munich")].dbt_valid_to is None
    assert got[(2, "paris")].dbt_valid_to is None  # same stamp -> unchanged
    assert got[(3, "rome")].dbt_valid_from == U2

    # run 3: cust 3 hard-deleted -> closed at the RUN clock (no data time)
    s3 = snapshot_apply_timestamp(
        spark, src([(1, "munich", U2), (2, "paris", U1)]),
        s2, "cust_id", "updated_at", ["city"], T3,
    )
    got3 = {(r.cust_id, r.city, r.dbt_valid_to): r for r in s3.collect()}
    assert (3, "rome", T3) in got3

    # NULL updated_at is a hard parse error, like dbt
    with pytest.raises(ValueError, match="non-null updated_at"):
        snapshot_apply_timestamp(
            spark, src([(9, "x", None)]), None,
            "cust_id", "updated_at", ["city"], T1,
        )
