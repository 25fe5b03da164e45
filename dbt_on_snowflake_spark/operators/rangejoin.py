"""Range (interval) join — the second temporal-join table stake next to
as-of (operators/asof.py): attach every fact whose timestamp falls inside
an interval, where intervals may OVERLAP (a fact can match several).

Scalable shape: a naive range join is a nested-loop (Spark falls back to
BroadcastNestedLoopJoin); the production idiom is **bin-and-refine** —
explode each interval into the day bins it covers, bin the fact side by
day, equi-join on the bin (a plain hash join), then refine with the exact
range predicate. Cost is (intervals x days-per-interval) + facts + one
key-partitioned shuffle; no nested loop at any scale. The bin width
trades explode volume against refine selectivity (pick ~median interval
length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_on_snowflake_spark.functions import dsum, dsum_sql
from dbt_on_snowflake_spark.registry import query
from dbt_on_snowflake_spark.testdata import table

N_WINDOWS = 16
STRIDE_H = 36  # window start spacing (hours)
LENGTH_H = 48  # window length: 48h at 36h stride -> adjacent windows overlap


def binned_range_join(
    facts: DataFrame, intervals: DataFrame, ts: str, start: str, end: str
) -> DataFrame:
    """Inner-join facts to every interval with start <= ts < end, via the
    day-bin equi-join. ``intervals`` may overlap; output has one row per
    (fact, matching interval)."""
    binned_i = intervals.withColumn(
        "_day",
        F.explode(
            F.sequence(F.col(start).cast("date"), F.col(end).cast("date"))
        ),
    )
    binned_f = facts.withColumn("_day", F.col(ts).cast("date"))
    return (
        binned_f.join(binned_i, "_day")
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) < F.col(end)))
        .drop("_day")
    )


def promo_windows(spark: SparkSession) -> DataFrame:
    """Deterministic overlapping promo windows over the events' time
    range: N_WINDOWS windows of LENGTH_H hours every STRIDE_H hours from
    2024-01-01 — adjacent windows overlap by 12h, so boundary events
    genuinely match two intervals."""
    return spark.range(N_WINDOWS).select(
        F.col("id").cast("long").alias("window_id"),
        F.expr(
            f"timestampadd(HOUR, CAST(id * {STRIDE_H} AS INT), "
            "TIMESTAMP'2024-01-01 00:00:00')"
        ).alias("window_start"),
        F.expr(
            f"timestampadd(HOUR, CAST(id * {STRIDE_H} + {LENGTH_H} AS INT), "
            "TIMESTAMP'2024-01-01 00:00:00')"
        ).alias("window_end"),
    )


@query(
    "t_events_range_join_windows",
    oracle=f"""
    WITH w AS (
        SELECT CAST(i AS BIGINT) AS window_id,
               TIMESTAMP '2024-01-01' + to_hours(i * {STRIDE_H})
                   AS window_start,
               TIMESTAMP '2024-01-01' + to_hours(i * {STRIDE_H} + {LENGTH_H})
                   AS window_end
        FROM (SELECT unnest(range(0, {N_WINDOWS})) AS i)
    )
    SELECT w.window_id,
           w.window_start,
           COUNT(*) AS n_events,
           {dsum_sql("e.value", "window_value", 4)}
    FROM events e
    JOIN w ON e.ts >= w.window_start AND e.ts < w.window_end
    GROUP BY w.window_id, w.window_start
    """,
)
def t_events_range_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events aggregated per overlapping promo window, through the binned
    range join (events in the 12h overlap count toward BOTH windows —
    what a tumbling/window groupBy cannot express). The oracle is the
    plain nested-loop range join, proving the bin-and-refine rewrite is
    semantics-preserving."""
    e = table(spark, sf_dir, "events")
    joined = binned_range_join(
        e, promo_windows(spark), ts="ts", start="window_start", end="window_end"
    )
    return (
        joined.groupBy("window_id", "window_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "window_value", 4),
        )
    )
