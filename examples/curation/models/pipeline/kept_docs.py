"""Quality gate: hashed-linear classifier scored inside the scan
projection (operators/textops.py quality_score) — zero shuffle."""

from dbt_on_snowflake_spark.operators.textops import quality_score


def model(ctx, spark):
    ctx.config(materialized="view")
    return ctx.source("raw", "documents").filter(quality_score("text") > 0)
