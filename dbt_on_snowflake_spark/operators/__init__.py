"""Operator modules. Importing this package registers every query (and its
DuckDB oracle, where SQL-expressible) into ``registry.QUERIES``."""

# Plain imports on purpose: a broken module must fail LOUDLY at import
# time, not silently shrink queries() (an ImportError guard here once hid
# whole query families from the driver).
from dbt_on_snowflake_spark.operators import (  # noqa: F401
    analytics,
    asof,
    corpus,
    dedup,
    multimodal,
    rangejoin,
    relational,
    similarity,
    skew,
    textops,
)

# streaming queries register here too (module lives outside operators/)
from dbt_on_snowflake_spark import streaming  # noqa: F401
