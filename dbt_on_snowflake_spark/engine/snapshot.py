"""Snapshots — dbt's SCD2 change tracking (core dbt surface; the
reference project doesn't use snapshots, but a user switching from dbt
expects them). Each run compares the source against the current snapshot
and writes history rows:

    key cols..., tracked cols..., dbt_valid_from, dbt_valid_to (NULL =
    current), dbt_scd_id (md5 of key + change hash)

Strategy = "check": a row changed when the md5 over its tracked columns
changed (dbt's check_cols strategy; the timestamp strategy is the same
plumbing keyed on an updated_at column instead of the hash).

Spark shape: one full-outer join between the current slice and the new
source on the key — a single key-partitioned shuffle; history rows are
untouched (append/close-only), so at scale the snapshot table is
partitioned by dbt_valid_from date and each run rewrites only the
current partition slice.

``now`` is injectable for deterministic tests (SURVEY §7.4 frozen clock).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _hash_cols(cols: list[str]):
    return F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols]))


def snapshot_apply(
    spark: SparkSession,
    source: DataFrame,
    existing: DataFrame | None,
    key: str,
    check_cols: list[str],
    now: datetime,
) -> DataFrame:
    """Return the new full snapshot table (history + updated current).

    Rejects NULL unique keys (dbt errors on them too): a NULL key matches
    nothing in the full-outer join, so the row would silently pass none of
    the unchanged/closed/opened filters and vanish from the snapshot."""
    if source.filter(F.col(key).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"snapshot source has NULL values in unique key {key!r}; "
            "dbt snapshots require a non-null unique key"
        )
    ts = F.lit(now).cast("timestamp")
    src = source.select(
        key,
        *check_cols,
        _hash_cols(check_cols).alias("_chash"),
    )
    if existing is None:
        return src.select(
            key,
            *check_cols,
            ts.alias("dbt_valid_from"),
            F.lit(None).cast("timestamp").alias("dbt_valid_to"),
            # dbt's snapshot format: when this row VERSION was created
            # (= run time under the check strategy)
            ts.alias("dbt_updated_at"),
            F.md5(
                F.concat_ws("|", F.col(key).cast("string"), F.col("_chash"),
                            ts.cast("string"))
            ).alias("dbt_scd_id"),
        )

    if "dbt_updated_at" not in existing.columns:
        # snapshots written before the column existed: backfill from
        # dbt_valid_from (the version-creation time under check strategy)
        existing = existing.withColumn("dbt_updated_at", F.col("dbt_valid_from"))
    history = existing.filter(F.col("dbt_valid_to").isNotNull())
    current = existing.filter(F.col("dbt_valid_to").isNull())
    cur = current.withColumn("_chash", _hash_cols(check_cols))

    j = cur.alias("c").join(
        src.alias("s"), F.col(f"c.{key}") == F.col(f"s.{key}"), "full_outer"
    )
    unchanged = j.filter(
        F.col(f"s.{key}").isNotNull()
        & F.col(f"c.{key}").isNotNull()
        & (F.col("c._chash") == F.col("s._chash"))
    ).select("c.*").drop("_chash")
    closed = (
        j.filter(
            F.col(f"c.{key}").isNotNull()
            & (F.col(f"s.{key}").isNull() | (F.col("c._chash") != F.col("s._chash")))
        )
        .select("c.*")
        .drop("_chash")
        .withColumn("dbt_valid_to", ts)
    )
    opened = (
        j.filter(
            F.col(f"s.{key}").isNotNull()
            & (F.col(f"c.{key}").isNull() | (F.col("c._chash") != F.col("s._chash")))
        )
        .select("s.*")
        .select(
            key,
            *check_cols,
            ts.alias("dbt_valid_from"),
            F.lit(None).cast("timestamp").alias("dbt_valid_to"),
            ts.alias("dbt_updated_at"),
            F.md5(
                # ts in the id: a key reverting to a prior value must not
                # collide with its earlier version's id
                F.concat_ws("|", F.col(key).cast("string"), F.col("_chash"),
                            ts.cast("string"))
            ).alias("dbt_scd_id"),
        )
    )
    return history.unionByName(unchanged).unionByName(closed).unionByName(opened)


def snapshot_apply_timestamp(
    spark: SparkSession,
    source: DataFrame,
    existing: DataFrame | None,
    key: str,
    updated_at: str,
    tracked_cols: list[str],
    now: datetime,
) -> DataFrame:
    """dbt's TIMESTAMP snapshot strategy: a row changed when its
    ``updated_at`` is strictly newer than the stored version's
    ``dbt_updated_at`` — no column hashing; the source system's own
    modification clock is trusted. Version times come from the DATA
    (dbt_valid_from / the closed row's dbt_valid_to = the new row's
    updated_at), not the run clock — so replaying an old extract yields
    identical history. ``now`` is used only to close hard-deleted keys
    (rows missing from the source), matching the check-strategy
    implementation above; dbt leaves deletions open unless
    invalidate_hard_deletes is set — this engine's snapshots always
    invalidate, documented here.

    Same single full-outer-join shuffle shape as the check strategy."""
    if source.filter(F.col(key).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"snapshot source has NULL values in unique key {key!r}; "
            "dbt snapshots require a non-null unique key"
        )
    if source.filter(F.col(updated_at).isNull()).limit(1).count() > 0:
        raise ValueError(
            f"timestamp strategy: NULL {updated_at!r} in source — dbt "
            "requires a non-null updated_at for every snapshotted row"
        )
    ts_now = F.lit(now).cast("timestamp")
    src = source.select(
        key, *tracked_cols, F.col(updated_at).cast("timestamp").alias("_uat")
    )

    def open_rows(df: DataFrame) -> DataFrame:
        return df.select(
            key,
            *tracked_cols,
            F.col("_uat").alias("dbt_valid_from"),
            F.lit(None).cast("timestamp").alias("dbt_valid_to"),
            F.col("_uat").alias("dbt_updated_at"),
            F.md5(
                F.concat_ws(
                    "|", F.col(key).cast("string"), F.col("_uat").cast("string")
                )
            ).alias("dbt_scd_id"),
        )

    if existing is None:
        return open_rows(src)

    history = existing.filter(F.col("dbt_valid_to").isNotNull())
    current = existing.filter(F.col("dbt_valid_to").isNull())

    j = current.alias("c").join(
        src.alias("s"), F.col(f"c.{key}") == F.col(f"s.{key}"), "full_outer"
    )
    newer = F.col("s._uat") > F.col("c.dbt_updated_at")
    unchanged = j.filter(
        F.col(f"s.{key}").isNotNull() & F.col(f"c.{key}").isNotNull() & ~newer
    ).select("c.*")
    closed_changed = (
        j.filter(
            F.col(f"c.{key}").isNotNull() & F.col(f"s.{key}").isNotNull() & newer
        )
        .select("c.*", F.col("s._uat").alias("_close_at"))
        .withColumn("dbt_valid_to", F.col("_close_at"))
        .drop("_close_at")
    )
    closed_deleted = (
        j.filter(F.col(f"c.{key}").isNotNull() & F.col(f"s.{key}").isNull())
        .select("c.*")
        .withColumn("dbt_valid_to", ts_now)
    )
    opened = open_rows(
        j.filter(
            F.col(f"s.{key}").isNotNull()
            & (F.col(f"c.{key}").isNull() | newer)
        ).select("s.*")
    )
    return (
        history.unionByName(unchanged)
        .unionByName(closed_changed)
        .unionByName(closed_deleted)
        .unionByName(opened)
    )
