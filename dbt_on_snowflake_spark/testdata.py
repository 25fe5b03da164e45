"""Loaders for the driver-generated TPC-H-ish parquet tables.

Tables (one parquet each, see /root/repo/TESTDATA.md): region nation
customer supplier part orders lineitem events documents embeddings.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table. Column pruning + predicate pushdown reach
    the parquet scan because this is a plain declarative read.

    events.ts is parquet TIMESTAMP(NANOS), which Spark reads as a long
    (``spark.sql.legacy.parquet.nanosAsLong``); convert to a microsecond
    timestamp exactly like DuckDB does (integer truncation)."""
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
            # Fallback when the session was built without our conf (e.g. a
            # driver-owned SparkSession). A bare NTZ -> LTZ cast interprets
            # the wall clock in the *session* zone, shifting epochs by the
            # local offset relative to DuckDB's naive-as-UTC oracle on any
            # non-UTC session; from_utc_timestamp undoes that same-zone
            # shift, so epoch == wall-as-UTC under every session zone.
            df = df.withColumn(
                "ts",
                F.expr(
                    "from_utc_timestamp(cast(ts as timestamp),"
                    " current_timezone())"
                ),
            )
    return df


def fan_out_scan(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Round-robin repartition a scan ONLY when it has fewer splits than
    cores. The local testdata parquet files are single-row-group, so the
    scan yields one partition and every narrow transform downstream
    (shingling, hashing) serializes onto one core. On a cluster reading
    100 TB the scan has thousands of splits, this predicate is false,
    and the function is an identity — the scale-optimal plan (no extra
    shuffle of raw rows) is untouched. Used by CPU-dense per-row
    operators (minhash/jaccard shingling) where map-side work dominates
    the row volume."""
    n = df.rdd.getNumPartitions()
    p = spark.sparkContext.defaultParallelism
    return df.repartition(p) if n < p else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each table as a temp view (for Spark SQL queries)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
