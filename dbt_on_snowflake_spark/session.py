"""SparkSession factory tuned for both local testing and cluster scale.

Local runs are ``local[N]`` (one JVM); the confs below are chosen so the
same logical plans survive a 1000-executor cluster: AQE re-plans at runtime
(coalesces small shuffle partitions, converts to broadcast joins, splits
skewed partitions), timestamps are pinned to UTC for oracle comparability,
and Arrow is enabled for any Pandas-UDF path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dbt_on_snowflake_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. Shuffle partitions
    default to ~cores for local mode — at cluster scale this knob (or AQE's
    ``advisoryPartitionSizeInBytes``) sizes partitions to fit executor
    memory; the default 200 is wrong in both directions.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalesce / broadcast-conversion / skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # Parquet scans: vectorized reader + pushdown are on by default;
        # maxPartitionBytes keeps scan tasks memory-bounded at large SF.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # The testdata events table stores TIMESTAMP(NANOS) which the Spark
        # reader rejects; read as long and convert in testdata.table().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Driver testdata timestamps are parquet TIMESTAMP(MICROS,
        # isAdjustedToUTC=false); by default Spark 4 infers TIMESTAMP_NTZ,
        # which cannot be cast to numeric (epoch math in sessionize etc.)
        # and diverges from DuckDB's naive-as-UTC reading. Read them as
        # TIMESTAMP_LTZ — with the UTC session zone above the values are
        # bit-identical to the oracle's.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # warehouse + derby metastore live OUT of the repo cwd and as a
        # CONSISTENT pair (a warehouse without its metastore causes
        # LOCATION_ALREADY_EXISTS on overwrite). Stable default so managed
        # tables persist across CLI invocations (incremental models);
        # tests point SPARK_WAREHOUSE_DIR at per-session temp dirs because
        # derby allows only one process at a time.
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark_warehouse"),
        )
        .config(
            "spark.driver.extraJavaOptions",
            "-Dderby.system.home="
            + os.environ.get(
                "SPARK_DERBY_DIR",
                os.environ.get("SPARK_WAREHOUSE_DIR", "/tmp/spark_warehouse"),
            ),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
