"""Capture .explain("formatted") for every bench headline query.

Usage: python plans/r18/capture_plans.py <suffix> [sf_dir]
Writes plans/r17/<query>_<suffix>.txt for each headline query.

Plans are deterministic (AQE initial plans, isFinalPlan=false), so this is
safe to run on a busy machine; index-ensure builds run as a side effect,
exactly as in the bench warm pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from dbt_on_snowflake_spark.registry import all_queries
from dbt_on_snowflake_spark.session import get_spark


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_dir = os.path.dirname(os.path.abspath(__file__))
    spark = get_spark("capture_plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    headline = {n: q for n, q in all_queries().items() if q.headline}
    for name in sorted(headline):
        df = headline[name].fn(spark, sf_dir)
        text = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({text.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
