"""Python model: truck counts + sales metrics per location.

Port of the reference Snowpark model
(dbt/models/marts/sales_metrics_by_location.py:3-78) to native PySpark —
the Snowpark DataFrame API is a PySpark clone, so the program maps
call-for-call (SURVEY §3.2): city equi-join (many-to-many), USING-style
join, left join, groupBy aggregates, coalesce/concat/cast/withColumn.
UPPER-case column references work because the engine session keeps
spark.sql.caseSensitive=false (Snowflake folds unquoted identifiers to
upper; reference uses "LOCATION_ID" etc).

Deviation (documented): the reference sums ORDER_TAX_AMOUNT, a VARCHAR
column holding decimals, relying on Snowflake's implicit cast — we cast
explicitly (SURVEY §7.4 "stringly-typed numerics").
"""

from pyspark.sql.functions import coalesce, col, concat, count, lit
from pyspark.sql.functions import sum as sum_


def model(ctx, spark):
    locations_df = ctx.ref("raw_pos_location")
    trucks_df = ctx.ref("raw_pos_truck")
    orders_df = ctx.ref("raw_pos_order_header")

    # trucks joined to locations on city name (non-key, many-to-many)
    location_trucks = (
        trucks_df.join(
            locations_df,
            trucks_df["PRIMARY_CITY"] == locations_df["CITY"],
            "inner",
        )
        .select(
            locations_df["LOCATION_ID"],
            locations_df["LOCATION"],
            locations_df["CITY"],
            trucks_df["TRUCK_ID"],
        )
        .groupBy("LOCATION_ID", "LOCATION", "CITY")
        .agg(count("TRUCK_ID").alias("TRUCK_COUNT"))
    )

    # per-location sales metrics (USING-style join on the common column)
    location_metrics = (
        orders_df.join(locations_df, "LOCATION_ID", "inner")
        .groupBy("LOCATION_ID")
        .agg(
            sum_("ORDER_TOTAL").alias("TOTAL_SALES"),
            sum_("ORDER_AMOUNT").alias("TOTAL_AMOUNT"),
            sum_(col("ORDER_TAX_AMOUNT").cast("double")).alias("TOTAL_TAX"),
        )
    )

    # left join: locations with trucks but no orders keep NULL metrics...
    joined_df = location_trucks.join(location_metrics, "LOCATION_ID", "left")

    # ...which coalesce to zero here
    final_df = joined_df.select(
        col("LOCATION_ID"),
        col("LOCATION"),
        col("CITY"),
        col("TRUCK_COUNT"),
        coalesce(col("TOTAL_SALES"), lit(0)).alias("TOTAL_SALES"),
        coalesce(col("TOTAL_AMOUNT"), lit(0)).alias("TOTAL_AMOUNT"),
        coalesce(col("TOTAL_TAX"), lit(0)).alias("TOTAL_TAX"),
    )

    return final_df.withColumn(
        "LOCATION_DESCRIPTION",
        concat(
            col("CITY"),
            lit(" (Trucks: "),
            col("TRUCK_COUNT").cast("string"),
            lit(")"),
        ),
    )
