"""Typed CSV ingestion — the Spark equivalent of the reference's staged
bulk load (reference setup/setup_data.sql:144-173: ``COPY INTO <table>
FROM @s3load/<prefix>/`` with a csv file format declared at
setup/setup.sql:59-60 — comma delimiter, no header, Snowflake defaults).

Semantics replicated:
- schema-on-write: an explicit StructType per table (no inference in the
  load path — inference is a second scan and nondeterministic at scale)
- permissive-but-accountable: malformed rows are captured in a
  ``_corrupt_record`` column instead of failing the load, mirroring
  COPY INTO's ON_ERROR accounting
- stringly-typed numerics stay strings at load (the reference declares
  e.g. city_population VARCHAR holding integers, setup_data.sql:14);
  casts happen explicitly downstream (SURVEY §7.4)

At scale: CSV scans parallelize by file split; explicit schemas keep the
read single-pass and allow predicate pushdown on partition columns only
(CSV has no row-group stats — which is why sources are converted to
parquet/saveAsTable immediately after load, as ``copy_into`` does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_typed(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    reader = (
        spark.read.option("header", header)
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSS]")
        .option("dateFormat", "yyyy-MM-dd")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # no declared schema: single-pass read, all strings (COPY INTO would
        # have required the target table DDL; mirror by not guessing types)
        reader = reader.option("inferSchema", False)
    return reader.csv(path)


def copy_into(
    spark: SparkSession,
    table_name: str,
    path: str,
    schema: T.StructType,
    header: bool = False,
    sep: str = ",",
    mode: str = "overwrite",
) -> int:
    """Load CSV into a managed table (parquet) and return the row count —
    the full ``CREATE TABLE`` + ``COPY INTO`` flow of the reference's
    setup_data.sql in one call."""
    df = read_csv_typed(spark, path, schema, header=header, sep=sep)
    df.write.mode(mode).saveAsTable(table_name)
    return spark.table(table_name).count()
