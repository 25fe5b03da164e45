"""Source ingestion: typed CSV bulk load (COPY INTO parity) and the
source registry semantics (declared in a project's sources.yml; resolved
by engine.runner.Runner.load_sources)."""

from dbt_on_snowflake_spark.sources.csv_loader import (  # noqa: F401
    copy_into,
    read_csv_typed,
)
