"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Execution uses the noop sink — full distributed execution of every plan,
no driver-side collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_on_snowflake_spark.registry import all_queries
from dbt_on_snowflake_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    headline = {n: q for n, q in all_queries().items() if q.headline}
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, q in sorted(headline.items()):
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT + file listing)
        # min-of-3 with the per-run spread in the JSON: the sandbox VM shows
        # multi-x run-to-run variance (r3's q1 "regression" was two noisy runs
        # in a row), so a single outlier must be both survivable and visible.
        times: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        runs[name] = times
        timings[name] = min(times)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
