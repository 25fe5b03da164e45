"""Exact dedup of the quality-kept docs: md5 canonicalization window,
keep the min-doc_id copy (one skew-free shuffle)."""

from pyspark.sql import Window
from pyspark.sql import functions as F


def model(ctx, spark):
    d = ctx.ref("kept_docs")
    w = Window.partitionBy(F.md5("text"))
    return (
        d.withColumn("canonical_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("canonical_id"))
        .drop("canonical_id")
    )
