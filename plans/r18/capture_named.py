"""Capture .explain("formatted") for NAMED registry queries (not just
headline) — used for the non-headline serves the r18 work touches.

Usage: python plans/r18/capture_named.py <suffix> <name> [<name> ...]
Writes plans/r18/<query>_<suffix>.txt for each named query at sf0.1.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from dbt_on_snowflake_spark.registry import all_queries
from dbt_on_snowflake_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("capture_named")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    qs = all_queries()
    for name in names:
        df = qs[name].fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({text.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
