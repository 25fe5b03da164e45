"""The engine layer: the reference's real "execution engine" is the dbt
lifecycle (SURVEY §2.9 O1–O9) — model DAG from ref()/source(), Jinja-style
compilation, materializations, targets, node selection, a declarative test
runner, and run-results artifacts. This package implements that lifecycle
natively on PySpark; query execution itself is delegated to Catalyst.
"""

from dbt_on_snowflake_spark.engine.compile import render  # noqa: F401
from dbt_on_snowflake_spark.engine.project import Project  # noqa: F401
from dbt_on_snowflake_spark.engine.runner import Runner  # noqa: F401
