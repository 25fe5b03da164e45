"""Per-language token accounting of the curated corpus. Flip the
counting scheme to faithful BPE by adding config(token_count='bpe') —
no operator calls change (the token_count model config)."""

from pyspark.sql import functions as F


def model(ctx, spark):
    d = ctx.ref("unique_docs")
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(ctx.token_count_col("text")).alias("n_tokens"),
    )
