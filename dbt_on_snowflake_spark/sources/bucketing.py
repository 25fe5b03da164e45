"""Bucketed tables — the zero-shuffle co-located join path (SCALING.md:
"bucket both tables on the order key and the join becomes co-located").

``write_bucketed`` materializes a DataFrame as a bucketed+sorted managed
table; two tables bucketed by the same key into the same bucket count
join with NO exchange on either side (Spark trusts the bucket layout),
which at 100 TB removes the dominant cost of every fact-fact join. The
trade: buckets are fixed at write time (pick n_buckets for the target
scale) and the table must go through ``saveAsTable`` (bucket metadata
lives in the catalog, not the parquet files — this engine's path-based
tables can't carry it, so bucketing is a catalog-table feature; with a
Hive/Delta/Iceberg catalog the same call persists across sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort:
        # sorted buckets let SortMergeJoin skip its sort stage entirely
        writer = writer.sortBy(key)
    writer.saveAsTable(table_name)
