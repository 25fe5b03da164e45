"""Operator modules. Importing this package registers every query (and its
DuckDB oracle, where SQL-expressible) into ``registry.QUERIES``."""

from dbt_on_snowflake_spark.operators import (  # noqa: F401
    analytics,
    asof,
    relational,
)

try:  # extension modules land incrementally
    from dbt_on_snowflake_spark.operators import dedup  # noqa: F401
except ImportError:
    pass
try:
    from dbt_on_snowflake_spark.operators import similarity  # noqa: F401
except ImportError:
    pass
try:
    from dbt_on_snowflake_spark.operators import textops  # noqa: F401
except ImportError:
    pass
try:
    from dbt_on_snowflake_spark.operators import multimodal  # noqa: F401
except ImportError:
    pass

# streaming queries register here too (module lives outside operators/)
from dbt_on_snowflake_spark import streaming  # noqa: F401
