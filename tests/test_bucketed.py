"""Bucketed materializations: `bucket_by`/`buckets` model config writes
through Spark's bucketed writer into the engine's atomic table format and
serves via a catalog bucketed table — downstream joins and aggregations on
the bucket key skip their Exchange entirely. The catalog entry is a cache
derived from the manifest; versioning/time-travel/vacuum still apply.

Reference scope: the reference relies on Snowflake clustering keys for
key-centric layout (SURVEY §1.2); bucketing is the Spark-native analogue,
and the shuffle-elimination it buys is THE recurring-cost lever for a
100 TB mart consumed by key-joins."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dbt_on_snowflake_spark.engine import table_format
from dbt_on_snowflake_spark.engine.project import Project
from dbt_on_snowflake_spark.engine.runner import Runner
from dbt_on_snowflake_spark.plans import count_shuffles, final_plan


def _write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


@pytest.fixture()
def no_broadcast(spark):
    """Disable broadcast conversion so a tiny-side join can't dodge the
    shuffle question — the co-location claim must hold for two LARGE
    tables, which is exactly when neither side broadcasts."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _bucketed_project(tmp_path, name: str):
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame(
        {
            "cust_id": list(range(40)),
            "amount": [float(i * 10) for i in range(40)],
        }
    ).to_parquet(os.path.join(data, "orders.parquet"), index=False)
    pd.DataFrame(
        {
            "cust_id": list(range(40)),
            "segment": ["a" if i % 2 else "b" for i in range(40)],
        }
    ).to_parquet(os.path.join(data, "custs.parquet"), index=False)
    _write(
        f"{root}/project.yml",
        f"name: {name}\nmodels:\n  models:\n    materialized: table\n",
    )
    _write(
        f"{root}/sources.yml",
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: orders\n      - name: custs\n",
    )
    _write(
        f"{root}/models/models/fact_orders.sql",
        "{{ config(materialized='table', bucket_by='cust_id', buckets=8) }}\n"
        "SELECT cust_id, amount FROM {{ source('raw', 'orders') }}",
    )
    _write(
        f"{root}/models/models/dim_custs.sql",
        "{{ config(materialized='table', bucket_by='cust_id', buckets=8) }}\n"
        "SELECT cust_id, segment FROM {{ source('raw', 'custs') }}",
    )
    return root, data


def test_bucketed_join_and_agg_skip_exchange(spark, tmp_path, no_broadcast):
    """Two models bucketed on the same key/count: their join AND a
    groupBy on the bucket key execute with ZERO shuffle exchanges —
    the co-location survives across models because the bucket layout
    is on disk, not a per-query repartition."""
    root, _ = _bucketed_project(tmp_path, "bkt")
    runner = Runner(spark, Project(root, target="bk1"))
    results = runner.run()
    assert [r.status for r in results] == ["success", "success"]

    j = spark.sql(
        "SELECT f.cust_id, amount, segment FROM bk1_fact_orders f "
        "JOIN bk1_dim_custs d ON f.cust_id = d.cust_id"
    )
    plan = final_plan(j)
    assert count_shuffles(plan) == 0, plan
    assert j.count() == 40

    agg = spark.table("bk1_fact_orders").groupBy("cust_id").agg(
        F.sum("amount").alias("total")
    )
    aplan = final_plan(agg)
    assert count_shuffles(aplan) == 0, aplan
    assert agg.count() == 40

    # one data file per bucket: the write repartitioned to the bucket
    # hash, so the layout is n files, not (tasks x buckets) small files
    dpath = runner._data_path("bk1_fact_orders")
    files = [f for f in os.listdir(dpath) if f.endswith(".parquet")]
    assert len(files) == 8


def test_bucketed_rebuild_keeps_versions_and_catalog(spark, tmp_path):
    """A rebuild writes a NEW versioned dir and re-points the catalog
    entry — time travel across bucketed versions works like any other
    table-format relation."""
    root, data = _bucketed_project(tmp_path, "bktv")
    runner = Runner(spark, Project(root, target="bk2"))
    runner.run()
    # second run over grown source data
    pd.DataFrame(
        {
            "cust_id": list(range(50)),
            "amount": [float(i * 10) for i in range(50)],
        }
    ).to_parquet(os.path.join(data, "orders.parquet"), index=False)
    runner2 = Runner(spark, Project(root, target="bk2"))
    runner2.run()
    assert spark.table("bk2_fact_orders").count() == 50
    troot = runner2._table_path("bk2_fact_orders")
    vs = table_format.list_versions(spark, troot)
    assert len(vs) >= 2
    # time travel: the previous version still reads consistently
    old = spark.read.parquet(
        table_format.data_path(spark, troot, version=vs[-2])
    )
    assert old.count() == 40


def test_bucketed_registration_recovers_from_lost_catalog(
    spark, tmp_path, no_broadcast
):
    """The catalog entry is a derived cache: drop it (as a fresh process
    with an in-memory catalog effectively does) and _register_table
    rebuilds the BUCKETED table from the manifest alone — the agg still
    runs shuffle-free."""
    root, _ = _bucketed_project(tmp_path, "bktr")
    runner = Runner(spark, Project(root, target="bk3"))
    runner.run()
    spark.sql("DROP TABLE bk3_fact_orders")
    runner._register_table("bk3_fact_orders")
    agg = spark.table("bk3_fact_orders").groupBy("cust_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert count_shuffles(final_plan(agg)) == 0
    assert agg.count() == 40


def test_bucketed_incremental_merge(spark, tmp_path, no_broadcast):
    """incremental + unique_key == bucket key: later increments merge
    (delete+insert) and the target stays bucketed — the post-merge agg
    on the key is still shuffle-free, and merged values win."""
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame(
        {"cust_id": [1, 2, 3], "amount": [10.0, 20.0, 30.0]}
    ).to_parquet(os.path.join(data, "orders.parquet"), index=False)
    _write(
        f"{root}/project.yml",
        "name: bkti\nmodels:\n  models:\n    materialized: table\n",
    )
    _write(
        f"{root}/sources.yml",
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: orders\n",
    )
    _write(
        f"{root}/models/models/fact_incr.sql",
        "{{ config(materialized='incremental', unique_key='cust_id', "
        "bucket_by='cust_id', buckets=4) }}\n"
        "SELECT cust_id, amount FROM {{ source('raw', 'orders') }}",
    )
    runner = Runner(spark, Project(root, target="bk4"))
    assert runner.run()[0].status == "success"
    # increment: cust 3 restated, cust 4 new
    pd.DataFrame(
        {"cust_id": [3, 4], "amount": [99.0, 40.0]}
    ).to_parquet(os.path.join(data, "orders.parquet"), index=False)
    runner2 = Runner(spark, Project(root, target="bk4"))
    assert runner2.run()[0].status == "success"
    got = {
        (r.cust_id, r.amount)
        for r in spark.table("bk4_fact_incr").collect()
    }
    assert got == {(1, 10.0), (2, 20.0), (3, 99.0), (4, 40.0)}
    agg = spark.table("bk4_fact_incr").groupBy("cust_id").agg(
        F.sum("amount").alias("t")
    )
    assert count_shuffles(final_plan(agg)) == 0


def test_bucket_by_rejects_partition_by_and_microbatch(spark, tmp_path):
    """Layout levers don't compose: bucket_by + partition_by and
    bucket_by + microbatch error clearly instead of writing a layout
    downstream reads can't exploit."""
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame(
        {"cust_id": [1], "day": ["2026-01-01"], "amount": [1.0]}
    ).to_parquet(os.path.join(data, "orders.parquet"), index=False)
    _write(
        f"{root}/project.yml",
        "name: bktx\nmodels:\n  models:\n    materialized: table\n",
    )
    _write(
        f"{root}/sources.yml",
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: orders\n",
    )
    _write(
        f"{root}/models/models/bad_combo.sql",
        "{{ config(materialized='table', bucket_by='cust_id', "
        "partition_by='day') }}\n"
        "SELECT * FROM {{ source('raw', 'orders') }}",
    )
    runner = Runner(spark, Project(root, target="bk5"))
    res = runner.run()
    assert res[0].status == "error"
    assert "partition_by" in res[0].error

    _write(
        f"{root}/models/models/bad_combo.sql",
        "{{ config(materialized='incremental', "
        "incremental_strategy='microbatch', event_time='day', "
        "batch_size='day', bucket_by='cust_id') }}\n"
        "SELECT * FROM {{ source('raw', 'orders') }}",
    )
    runner2 = Runner(spark, Project(root, target="bk6"))
    res2 = runner2.run()
    assert res2[0].status == "error"
    assert "microbatch" in res2[0].error


def test_python_model_bucket_config(spark, tmp_path, no_broadcast):
    """ctx.config integer kwargs reach the engine: a Python model with
    bucket_by/buckets materializes bucketed (pre-fix the int literal was
    silently dropped and the default bucket count applied)."""
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame(
        {"cust_id": list(range(12)), "amount": [float(i) for i in range(12)]}
    ).to_parquet(os.path.join(data, "orders.parquet"), index=False)
    _write(
        f"{root}/project.yml",
        "name: pybkt\nmodels:\n  models:\n    materialized: table\n",
    )
    _write(
        f"{root}/sources.yml",
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: orders\n",
    )
    _write(
        f"{root}/models/models/pyfact.py",
        "def model(ctx, spark):\n"
        "    ctx.config(materialized='table', bucket_by='cust_id',"
        " buckets=4)\n"
        "    return ctx.source('raw', 'orders')\n",
    )
    project = Project(root, target="pbk")
    assert project.models["pyfact"].config["buckets"] == 4
    runner = Runner(spark, project)
    assert runner.run()[0].status == "success"
    dpath = runner._data_path("pbk_pyfact")
    files = [f for f in os.listdir(dpath) if f.endswith(".parquet")]
    # at most one file per CONFIGURED bucket (an empty bucket emits no
    # file); bucket ids in the names prove the 4-bucket layout applied
    assert 0 < len(files) <= 4
    ids = {int(f.split("_")[1].split(".")[0]) for f in files}
    assert ids <= {0, 1, 2, 3}
    agg = spark.table("pbk_pyfact").groupBy("cust_id").agg(
        F.sum("amount").alias("t")
    )
    from dbt_on_snowflake_spark.plans import count_shuffles, final_plan

    assert count_shuffles(final_plan(agg)) == 0
