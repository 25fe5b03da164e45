"""dbt_on_snowflake_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
project (maciejtarsa/dbt-on-snowflake, a dbt project executed on Snowflake)
idiomatically on Spark SQL / DataFrame / Catalyst, plus LLM-data-pipeline
extension operators (dedup, similarity search, text analysis, multimodal
columns) designed for 100 TB scale.

Layout:
- ``session``     — SparkSession factory (AQE, UTC, tuned shuffle partitions)
- ``testdata``    — loaders for the driver's TPC-H-ish parquet tables
- ``registry``    — query registry backing ``__spark_entry__.py``
- ``operators/``  — relational + extension operators (each registered with
                    a DuckDB oracle where SQL-expressible)
- ``engine/``     — the dbt-like lifecycle: compile, DAG, materialize,
                    test runner (reference §2.9 O1–O9)
- ``sources/``    — source registry + typed CSV ingest (COPY INTO parity)
- ``functions/``  — portable scalar helpers (decimal-exact sums, md5 hashing)
- ``plans/``      — physical-plan assertions (pushdown, broadcast, codegen)
- ``streaming/``  — Structured Streaming extension over the events table
- ``tastybytes/`` — the reference dbt project ported to this engine
"""

__version__ = "0.1.0"
