"""As-of join — a temporal operator Spark lacks natively (SURVEY §2.3
notes range/as-of joins are absent from the reference; they're table
stakes for a time-series-capable engine, so we add them as an extension).

Semantics: for each left row (user_id, ts), attach the most recent right
row (same key, right.ts <= left.ts). Implemented as the *scalable*
composition — union both sides, one window sort per key, carry the last
right value forward — NOT the naive key-join + filter + rank, whose
intermediate is |left per key| x |right per key| and explodes on hot keys.

Cost: one shuffle (partition by key), one per-key sort. State per key is
O(1) during the scan (last_value ignoring nulls). This is exactly the
merge phase of `pd.merge_asof`, expressed relationally so it distributes.

Oracle: DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_on_snowflake_spark.registry import query
from dbt_on_snowflake_spark.testdata import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key.

    Both inputs are unioned with a side tag; right rows sort before left
    rows at equal timestamps (inclusive semantics). last_value(...,
    ignorenulls) over (key ORDER BY ts, side) carries the most recent
    right values onto each left row."""
    lcols = left.columns
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_lrow"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_rv_{c}") for c in right_values],
    )
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            l.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_values],
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "_k",
        "_ts",
        "_side",
        "_lrow",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_rv_{c}")
            for c in right_values
        ],
    )
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"_rv_{c}").alias(c) for c in right_values],
    )
    return out


@query(
    "asof_last_order_before_event",
    oracle="""
    SELECT e.event_id,
           e.user_id,
           e.ts AS event_ts,
           o.o_orderkey AS last_order_key,
           o.o_totalprice AS last_order_price
    FROM events e
    ASOF LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def asof_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the user's most recent order at event time —
    the canonical as-of enrichment (feature lookup at example time)."""
    e = table(spark, sf_dir, "events")
    o = table(spark, sf_dir, "orders")
    left = e.select("event_id", "user_id", F.col("ts").alias("event_ts"))
    right = o.select(
        F.col("o_custkey").alias("user_id"),
        "o_orderdate",
        "o_orderkey",
        "o_totalprice",
    )
    out = asof_join(
        left,
        right,
        on="user_id",
        left_ts="event_ts",
        right_ts="o_orderdate",
        right_values=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        "user_id",
        "event_ts",
        F.col("o_orderkey").alias("last_order_key"),
        F.col("o_totalprice").alias("last_order_price"),
    )
