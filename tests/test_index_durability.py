"""Two-SESSION durability of the persisted MinHash index: session A
builds and exits; a genuinely fresh session B (separate JVM) re-attaches
the artifact read-only and probes it. Proves the index is durable state
on disk, not same-session lineage — and that the re-attached table keeps
its bucket layout (probe joins it in place, no index-side shuffle)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SESSION_A = """
import sys
sys.path.insert(0, {repo!r})
import pandas as pd
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", {wh!r})
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from dbt_on_snowflake_spark.operators.dedup import build_minhash_index
corpus = pd.DataFrame({{
    "doc_id": [1, 2],
    "text": [" ".join(f"w{{i}}" for i in range(30)),
             " ".join(f"z{{i}}" for i in range(30))],
}})
build_minhash_index(
    spark, spark.createDataFrame(corpus), index_table="mh_durable_idx"
)
spark.stop()
print("A_DONE")
"""

_SESSION_B = """
import json, sys
sys.path.insert(0, {repo!r})
import pandas as pd
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", {wh!r})
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from dbt_on_snowflake_spark.operators.dedup import (
    attach_minhash_index, dedup_incremental_candidates,
)
# fresh in-memory catalog: the table must NOT be known yet, or this
# session isn't actually fresh
assert not spark.catalog.tableExists("mh_durable_idx")
attach_minhash_index(spark, "mh_durable_idx")
batch = spark.createDataFrame(pd.DataFrame({{
    "doc_id": [10],
    "text": [" ".join(f"w{{i}}" for i in range(30)) + " tail"],
}}))
cand = dedup_incremental_candidates(spark, batch, "mh_durable_idx")
plan_buf = cand._sc._jvm.PythonSQLUtils.explainString(
    cand._jdf.queryExecution(), "formatted")
pairs = sorted((r.doc_a, r.doc_b) for r in cand.collect())
n_idx = spark.table("mh_durable_idx").select("doc_id").distinct().count()
print("B_RESULT " + json.dumps({{
    "pairs": pairs,
    "n_idx_docs": n_idx,
    "bucketed_scan": "Bucketed: true" in plan_buf,
}}))
spark.stop()
"""


def _run(code: str) -> str:
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=240,
        cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    return out.stdout


def test_index_survives_across_sessions(tmp_path):
    wh = str(tmp_path / "warehouse")
    a = _run(_SESSION_A.format(repo=REPO, wh=wh))
    assert "A_DONE" in a
    b = _run(_SESSION_B.format(repo=REPO, wh=wh))
    line = next(l for l in b.splitlines() if l.startswith("B_RESULT "))
    res = json.loads(line.removeprefix("B_RESULT "))
    # the near-dup of corpus doc 1 is found purely from the on-disk index
    assert [tuple(p) for p in res["pairs"]] == [(1, 10)]
    assert res["n_idx_docs"] == 2  # read-only probe: the index did not grow
    assert res["bucketed_scan"]  # re-attached table kept its bucket layout


_SESSION_A_PRUNED = """
import sys
sys.path.insert(0, {repo!r})
import pandas as pd
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", {wh!r})
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from dbt_on_snowflake_spark.operators.dedup import build_minhash_index_pruned
corpus = pd.DataFrame({{
    "doc_id": [1, 2],
    "text": [" ".join(f"w{{i}}" for i in range(30)),
             " ".join(f"z{{i}}" for i in range(30))],
}})
build_minhash_index_pruned(
    spark, spark.createDataFrame(corpus), index_table="mh_durable_pp"
)
spark.stop()
print("A_DONE")
"""

_SESSION_B_PRUNED = """
import json, sys
sys.path.insert(0, {repo!r})
import pandas as pd
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir", {wh!r})
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from dbt_on_snowflake_spark.operators.dedup import (
    attach_minhash_index_pruned, dedup_incremental_candidates_pruned,
)
assert not spark.catalog.tableExists("mh_durable_pp")
attach_minhash_index_pruned(spark, "mh_durable_pp")
batch = spark.createDataFrame(pd.DataFrame({{
    "doc_id": [10],
    "text": [" ".join(f"w{{i}}" for i in range(30)) + " tail"],
}}))
cand = dedup_incremental_candidates_pruned(spark, batch, "mh_durable_pp")
plan_buf = cand._sc._jvm.PythonSQLUtils.explainString(
    cand._jdf.queryExecution(), "formatted")
pairs = sorted((r.doc_a, r.doc_b) for r in cand.collect())
n_idx = spark.table("mh_durable_pp").select("doc_id").distinct().count()
print("B_RESULT " + json.dumps({{
    "pairs": pairs,
    "n_idx_docs": n_idx,
    "partition_filtered": "band_part" in plan_buf,
}}))
spark.stop()
"""


def test_pruned_index_survives_across_sessions(tmp_path):
    """The partitioned+bucketed index layout re-attaches in a fresh JVM
    (DDL + MSCK partition discovery) and the probe still partition-
    prunes — same durability contract as the flat layout."""
    wh = str(tmp_path / "warehouse")
    a = _run(_SESSION_A_PRUNED.format(repo=REPO, wh=wh))
    assert "A_DONE" in a
    b = _run(_SESSION_B_PRUNED.format(repo=REPO, wh=wh))
    line = next(l for l in b.splitlines() if l.startswith("B_RESULT "))
    res = json.loads(line.removeprefix("B_RESULT "))
    assert [tuple(p) for p in res["pairs"]] == [(1, 10)]
    assert res["n_idx_docs"] == 2
    assert res["partition_filtered"]
