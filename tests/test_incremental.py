"""Incremental + ephemeral materializations (dbt-core surface beyond the
reference's view/table pair), driven through a synthetic project built on
the fly."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dbt_on_snowflake_spark.engine.project import Project
from dbt_on_snowflake_spark.engine.runner import Runner


def _write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


@pytest.fixture()
def incr_project(spark, tmp_path):
    """A project with: raw events source -> ephemeral cleaning model ->
    incremental fact table keyed by event_id."""
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    _write(
        f"{root}/project.yml",
        "name: incr_demo\nmodels:\n  models:\n    materialized: view\n",
    )
    _write(
        f"{root}/sources.yml",
        f"""
sources:
  - name: raw
    base_path: "{data}"
    tables:
      - name: ev
""",
    )
    _write(
        f"{root}/models/models/clean_events.sql",
        """
{{ config(materialized='ephemeral') }}
SELECT event_id, user_id, value * 2 AS value2
FROM {{ source('raw', 'ev') }}
WHERE value IS NOT NULL
""",
    )
    _write(
        f"{root}/models/models/fact_events.sql",
        """
{{ config(materialized='incremental', unique_key='event_id') }}
SELECT event_id, user_id, value2
FROM {{ ref('clean_events') }}
{% if is_incremental() %}
WHERE event_id > (SELECT MAX(event_id) - 1 FROM {{ this }})
{% endif %}
""",
    )
    return root, data


def _load_batch(data: str, rows) -> None:
    pd.DataFrame(rows, columns=["event_id", "user_id", "value"]).to_parquet(
        os.path.join(data, "ev.parquet"), index=False
    )


def test_incremental_first_and_second_run(spark, incr_project):
    root, data = incr_project
    _load_batch(data, [(1, 10, 1.0), (2, 11, 2.0), (3, 12, None)])
    project = Project(root, target="dev")
    runner = Runner(spark, project)
    results = runner.run()
    # ephemeral model produces no result node; incremental full-loads
    assert [r.name for r in results] == ["fact_events"]
    t = spark.table("dev_fact_events")
    assert sorted(r.event_id for r in t.collect()) == [1, 2]  # null filtered

    # batch 2: event 2 restated (new value), events 4-5 new
    _load_batch(data, [(2, 11, 20.0), (4, 13, 4.0), (5, 14, 5.0)])
    runner2 = Runner(spark, project)
    res2 = runner2.run()
    assert res2[0].status == "success"
    rows = {r.event_id: r.value2 for r in spark.table("dev_fact_events").collect()}
    # unique_key replaced event 2; incremental filter read {{ this }}
    assert rows == {1: 2.0, 2: 40.0, 4: 8.0, 5: 10.0}


def test_ephemeral_is_inlined_not_materialized(spark, incr_project):
    root, data = incr_project
    _load_batch(data, [(1, 10, 1.0)])
    project = Project(root, target="dev")
    runner = Runner(spark, project)
    runner.run()
    assert not spark.catalog.tableExists("dev_clean_events")
    # and the compiled SQL contains the inlined subquery
    from dbt_on_snowflake_spark.engine.compile import render

    node = project.models["fact_events"]
    sql = render(node.body, runner.resolve_ref, runner.resolve_source,
                 this="dev_fact_events", is_incremental=False)
    assert "_eph_clean_events" in sql and "{{" not in sql


def test_incremental_upgrades_legacy_layout(spark, incr_project):
    """An incremental target written by the pre-format engine (parquet
    files directly at the table root, no manifest) must merge and upgrade:
    the run reads the legacy files as the current state, writes the merged
    result through the atomic commit seam, and subsequent reads resolve
    the manifest. (The old rename-swap recovery this replaced is gone —
    crash safety is pinned by tests/test_table_format.py.)"""
    import shutil

    from dbt_on_snowflake_spark.engine import table_format as tf

    root, data = incr_project
    _load_batch(data, [(1, 10, 1.0), (2, 11, 2.0)])
    project = Project(root, target="dev")
    runner = Runner(spark, project)
    path = runner._table_path("dev_fact_events")
    if os.path.isdir(path):  # leftover from sibling tests (shared warehouse)
        shutil.rmtree(path)
    runner.run()
    # rewrite the table as the legacy layout: files at the root, no _v/
    legacy_df = spark.read.parquet(runner._data_path("dev_fact_events"))
    rows = legacy_df.collect()
    shutil.rmtree(path)
    spark.createDataFrame(rows, legacy_df.schema).write.parquet(path)
    assert tf.current_version(spark, path) is None

    _load_batch(data, [(3, 12, 3.0)])
    runner2 = Runner(spark, project)
    res = runner2.run()
    assert res[0].status == "success"
    got = sorted(r.event_id for r in spark.table("dev_fact_events").collect())
    assert got == [1, 2, 3]
    assert tf.current_version(spark, path) == 1  # upgraded in place


def test_failing_model_skips_descendants_not_siblings(spark, tmp_path):
    """Per-node isolation: a failing model records an error, descendants
    record 'skipped', independent branches still run, and run_results.json
    is written with all three statuses."""
    import json

    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": [1, 2]}).to_parquet(os.path.join(data, "t.parquet"), index=False)
    _write(f"{root}/project.yml",
           "name: iso\nmodels:\n  models:\n    materialized: table\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(f"{root}/models/models/bad.sql",
           "SELECT no_such_column FROM {{ source('raw', 't') }}")
    _write(f"{root}/models/models/child_of_bad.sql",
           "SELECT * FROM {{ ref('bad') }}")
    _write(f"{root}/models/models/grandchild.sql",
           "SELECT * FROM {{ ref('child_of_bad') }}")
    _write(f"{root}/models/models/independent.sql",
           "SELECT id FROM {{ source('raw', 't') }}")

    project = Project(root, target="dev")
    runner = Runner(spark, project)
    results = runner.run()
    status = {r.name: r.status for r in results}
    assert status == {
        "bad": "error",
        "child_of_bad": "skipped",
        "grandchild": "skipped",
        "independent": "success",
    }
    skip = next(r for r in results if r.name == "child_of_bad")
    assert "bad" in (skip.error or "")
    out = str(tmp_path / "rr.json")
    runner.write_run_results(out)
    payload = json.load(open(out))
    assert {r["status"] for r in payload["results"]} == {"error", "skipped", "success"}


def test_cli_run_reports_failure_and_writes_results(tmp_path, capsys):
    """CLI 'run' with a failing model: prints all node lines, writes
    run_results.json, exits non-zero (no exception escapes)."""
    import json

    from dbt_on_snowflake_spark.__main__ import main

    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": [1]}).to_parquet(os.path.join(data, "t.parquet"), index=False)
    _write(f"{root}/project.yml",
           "name: clifail\nmodels:\n  models:\n    materialized: table\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(f"{root}/models/models/boom.sql",
           "SELECT missing_col FROM {{ source('raw', 't') }}")
    _write(f"{root}/models/models/fine.sql",
           "SELECT id FROM {{ source('raw', 't') }}")

    out = str(tmp_path / "rr.json")
    rc = main(["run", "--project", root, "--out", out])
    assert rc == 1
    printed = capsys.readouterr().out
    assert "error" in printed and "success" in printed
    payload = json.load(open(out))
    assert len(payload["results"]) == 2


def test_partition_by_table_materialization(spark, tmp_path):
    """partition_by config lays the mart out as parquet partition dirs;
    a partition-filtered read plans only the matching directory
    (partition pruning — the read-cost lever for date-partitioned
    marts)."""
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame(
        {"id": range(8), "status": ["open", "closed"] * 4, "v": range(8)}
    ).to_parquet(os.path.join(data, "t.parquet"), index=False)
    _write(f"{root}/project.yml",
           "name: parts\nmodels:\n  models:\n    materialized: table\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(
        f"{root}/models/models/by_status.sql",
        "{{ config(materialized='table', partition_by='status') }}\n"
        "SELECT id, status, v FROM {{ source('raw', 't') }}",
    )
    project = Project(root, target="dev")
    runner = Runner(spark, project)
    results = runner.run()
    assert results[0].status == "success" and results[0].rows == 8
    dpath = runner._data_path("dev_by_status")  # manifest-resolved dir
    assert sorted(
        d for d in os.listdir(dpath) if d.startswith("status=")
    ) == ["status=closed", "status=open"]
    filtered = spark.table("dev_by_status").filter("status = 'open'")
    assert filtered.count() == 4
    # pruning: only the matching partition directory is read
    files = filtered.select(
        F.input_file_name().alias("f")
    ).distinct().collect()
    assert files and all("status=open" in r.f for r in files)


def test_insert_overwrite_replaces_only_touched_partitions(spark, tmp_path):
    """incremental_strategy='insert_overwrite' + partition_by: a later run
    rewrites ONLY the partitions present in the increment (dynamic
    partition overwrite) — untouched partitions keep their files."""
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)

    def load(rows):
        pd.DataFrame(rows, columns=["id", "day", "v"]).to_parquet(
            os.path.join(data, "t.parquet"), index=False
        )

    load([(1, "d1", 10), (2, "d2", 20)])
    _write(f"{root}/project.yml",
           "name: iow\nmodels:\n  models:\n    materialized: view\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(
        f"{root}/models/models/daily.sql",
        "{{ config(materialized='incremental', "
        "incremental_strategy='insert_overwrite', partition_by='day') }}\n"
        "SELECT id, day, v FROM {{ source('raw', 't') }}",
    )
    project = Project(root, target="dev")
    runner = Runner(spark, project)
    path = runner._table_path("dev_daily")
    if os.path.isdir(path):
        import shutil as _sh

        _sh.rmtree(path)
    res1 = runner.run()
    assert res1[0].status == "success" and res1[0].rows == 2
    dpath = runner._data_path("dev_daily")  # partitions live in the
    # manifest-resolved data dir (engine/table_format.py)
    d1_files_before = set(os.listdir(os.path.join(dpath, "day=d1")))

    # increment touches only d2 (restated) and d3 (new); d1 untouched
    load([(2, "d2", 99), (3, "d3", 30)])
    runner2 = Runner(spark, Project(root, target="dev"))
    res2 = runner2.run()
    assert res2[0].status == "success" and res2[0].rows == 2
    rows = {
        (r.id, r.day): r.v for r in spark.table("dev_daily").collect()
    }
    assert rows == {(1, "d1"): 10, (2, "d2"): 99, (3, "d3"): 30}
    assert runner2._data_path("dev_daily") == dpath  # same version dir
    assert set(os.listdir(os.path.join(dpath, "day=d1"))) == d1_files_before


def test_insert_overwrite_requires_partition_by(spark, tmp_path):
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": [1]}).to_parquet(os.path.join(data, "t.parquet"), index=False)
    _write(f"{root}/project.yml",
           "name: iow2\nmodels:\n  models:\n    materialized: view\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(
        f"{root}/models/models/nopart.sql",
        "{{ config(materialized='incremental', "
        "incremental_strategy='insert_overwrite') }}\n"
        "SELECT id FROM {{ source('raw', 't') }}",
    )
    project = Project(root, target="dev")
    runner = Runner(spark, project)
    runner.run()  # first run: plain full load, fine
    res = Runner(spark, Project(root, target="dev")).run()
    assert res[0].status == "error"
    assert "partition_by" in res[0].error


def test_full_refresh_rebuilds_incremental(spark, incr_project):
    """--full-refresh: is_incremental() renders false and the table is
    rebuilt from the sources alone — restated history replaces the
    accumulated state instead of merging into it."""
    root, data = incr_project
    _load_batch(data, [(1, 10, 1.0), (2, 11, 2.0)])
    project = Project(root, target="dev")
    runner = Runner(spark, project)
    path = runner._table_path("dev_fact_events")
    if os.path.isdir(path):
        import shutil as _sh

        _sh.rmtree(path)
    runner.run()
    # incremental run accumulates 1,2,3
    _load_batch(data, [(3, 12, 3.0)])
    Runner(spark, project).run()
    assert sorted(
        r.event_id for r in spark.table("dev_fact_events").collect()
    ) == [1, 2, 3]
    # full refresh with only event 9 in the source -> table is JUST event 9
    _load_batch(data, [(9, 15, 9.0)])
    res = Runner(spark, project, full_refresh=True).run()
    assert res[0].status == "success" and res[0].rows == 1
    assert sorted(
        r.event_id for r in spark.table("dev_fact_events").collect()
    ) == [9]


def test_threaded_run_matches_serial(spark, tmp_path):
    """threads>1 materializes independent branches concurrently with the
    same results, statuses, and failure isolation as the serial path."""
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": [1, 2, 3]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    _write(f"{root}/project.yml",
           "name: thr\nmodels:\n  models:\n    materialized: table\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    for i in range(4):  # four independent branches
        _write(f"{root}/models/models/branch{i}.sql",
               f"SELECT id, id * {i + 1} AS v FROM {{{{ source('raw', 't') }}}}")
    _write(f"{root}/models/models/joined.sql",
           "SELECT a.id, a.v + b.v AS s FROM {{ ref('branch0') }} a "
           "JOIN {{ ref('branch1') }} b ON a.id = b.id")
    _write(f"{root}/models/models/bad.sql",
           "SELECT nope FROM {{ source('raw', 't') }}")
    _write(f"{root}/models/models/child_of_bad.sql",
           "SELECT * FROM {{ ref('bad') }}")

    results = Runner(spark, Project(root, target="dev"), threads=4).run()
    status = {r.name: r.status for r in results}
    assert status == {
        "branch0": "success", "branch1": "success", "branch2": "success",
        "branch3": "success", "joined": "success",
        "bad": "error", "child_of_bad": "skipped",
    }
    assert sorted(r.s for r in spark.table("dev_joined").collect()) == [3, 6, 9]
    # dependents appear after their upstreams in the results order
    names = [r.name for r in results]
    assert names.index("joined") > names.index("branch0")
    assert names.index("joined") > names.index("branch1")


# ---------------------------------------------------------------- on_schema_change


def _drift_project(tmp_path, policy: str, extra_cfg: str = "") -> tuple[str, str]:
    """Incremental model `SELECT * FROM source` — schema drift is driven
    by changing the source parquet's columns between runs. The model (and
    so the relation) is named per-policy: the warehouse dir is shared by
    the whole Spark session, so a shared relation would leak state across
    tests."""
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data, exist_ok=True)
    _write(f"{root}/project.yml",
           "name: drift\nmodels:\n  models:\n    materialized: view\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(
        f"{root}/models/models/acc_{policy}.sql",
        "{{ config(materialized='incremental', unique_key='id', "
        "on_schema_change='" + policy + "'" + extra_cfg + ") }}\n"
        "SELECT * FROM {{ source('raw', 't') }}",
    )
    return root, data


def _run_drift(spark, root: str, policy: str) -> list:
    runner = Runner(spark, Project(root, target="dev"))
    path = runner._table_path(f"dev_acc_{policy}")
    return runner.run(), path


def test_on_schema_change_ignore_drops_added_column(spark, tmp_path):
    root, data = _drift_project(tmp_path, "ignore")
    pd.DataFrame({"id": [1], "v": [10]}).to_parquet(f"{data}/t.parquet", index=False)
    res, path = _run_drift(spark, root, "ignore")
    if os.path.isdir(path):  # stale warehouse from an earlier session run
        import shutil; shutil.rmtree(path)
        res, path = _run_drift(spark, root, "ignore")
    assert res[0].status == "success"
    pd.DataFrame({"id": [2], "v": [20], "extra": [99]}).to_parquet(
        f"{data}/t.parquet", index=False
    )
    res2, _ = _run_drift(spark, root, "ignore")
    assert res2[0].status == "success"
    t = spark.table("dev_acc_ignore")
    assert t.columns == ["id", "v"]  # target schema wins; extra dropped
    assert sorted((r.id, r.v) for r in t.collect()) == [(1, 10), (2, 20)]


def test_on_schema_change_ignore_errors_on_removed_column(spark, tmp_path):
    root, data = _drift_project(tmp_path, "ignore")
    pd.DataFrame({"id": [1], "v": [10]}).to_parquet(f"{data}/t.parquet", index=False)
    res, path = _run_drift(spark, root, "ignore")
    pd.DataFrame({"id": [2]}).to_parquet(f"{data}/t.parquet", index=False)
    res2, _ = _run_drift(spark, root, "ignore")
    assert res2[0].status == "error"
    assert "missing existing columns" in res2[0].error


def test_on_schema_change_fail_errors_on_any_drift(spark, tmp_path):
    root, data = _drift_project(tmp_path, "fail")
    pd.DataFrame({"id": [1], "v": [10]}).to_parquet(f"{data}/t.parquet", index=False)
    res, path = _run_drift(spark, root, "fail")
    if os.path.isdir(path) and res[0].rows != 1:  # stale warehouse
        import shutil; shutil.rmtree(path)
        _run_drift(spark, root, "fail")
    pd.DataFrame({"id": [2], "v": [20], "extra": [1]}).to_parquet(
        f"{data}/t.parquet", index=False
    )
    res2, _ = _run_drift(spark, root, "fail")
    assert res2[0].status == "error"
    assert "on_schema_change='fail'" in res2[0].error
    # nothing was written: the table still has only row 1
    assert [r.id for r in spark.table("dev_acc_fail").collect()] == [1]


def test_on_schema_change_append_new_columns_merge(spark, tmp_path):
    """Drifted-column merge: the new column extends the target, historic
    rows read NULL, and the unique_key merge still replaces keys."""
    root, data = _drift_project(tmp_path, "append_new_columns")
    pd.DataFrame({"id": [1, 2], "v": [10, 20]}).to_parquet(
        f"{data}/t.parquet", index=False
    )
    res, path = _run_drift(spark, root, "append_new_columns")
    if os.path.isdir(path) and res[0].rows != 2:  # stale warehouse
        import shutil; shutil.rmtree(path)
        _run_drift(spark, root, "append_new_columns")
    pd.DataFrame({"id": [2, 3], "v": [99, 30], "extra": [7, 8]}).to_parquet(
        f"{data}/t.parquet", index=False
    )
    res2, _ = _run_drift(spark, root, "append_new_columns")
    assert res2[0].status == "success"
    t = spark.table("dev_acc_append_new_columns")
    assert t.columns == ["id", "v", "extra"]
    rows = {r.id: (r.v, r.extra) for r in t.collect()}
    assert rows == {1: (10, None), 2: (99, 7), 3: (30, 8)}


def test_on_schema_change_sync_all_columns_drops_removed(spark, tmp_path):
    root, data = _drift_project(tmp_path, "sync_all_columns")
    pd.DataFrame({"id": [1], "v": [10], "old": [5]}).to_parquet(
        f"{data}/t.parquet", index=False
    )
    res, path = _run_drift(spark, root, "sync_all_columns")
    if os.path.isdir(path) and res[0].rows != 1:  # stale warehouse
        import shutil; shutil.rmtree(path)
        _run_drift(spark, root, "sync_all_columns")
    pd.DataFrame({"id": [2], "v": [20], "fresh": [6]}).to_parquet(
        f"{data}/t.parquet", index=False
    )
    res2, _ = _run_drift(spark, root, "sync_all_columns")
    assert res2[0].status == "success"
    t = spark.table("dev_acc_sync_all_columns")
    assert t.columns == ["id", "v", "fresh"]  # old dropped, fresh added
    rows = {r.id: (r.v, r.fresh) for r in t.collect()}
    assert rows == {1: (10, None), 2: (20, 6)}


def test_on_schema_change_append_with_insert_overwrite(spark, tmp_path):
    """insert_overwrite + append_new_columns: untouched partitions keep
    their (narrower) files; the merged view reads their missing column as
    NULL."""
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    _write(f"{root}/project.yml",
           "name: iodrift\nmodels:\n  models:\n    materialized: view\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(
        f"{root}/models/models/daily.sql",
        "{{ config(materialized='incremental', "
        "incremental_strategy='insert_overwrite', partition_by='day', "
        "on_schema_change='append_new_columns') }}\n"
        "SELECT * FROM {{ source('raw', 't') }}",
    )
    pd.DataFrame({"id": [1, 2], "day": ["d1", "d2"], "v": [10, 20]}).to_parquet(
        f"{data}/t.parquet", index=False
    )
    runner = Runner(spark, Project(root, target="dev"))
    path = runner._table_path("dev_daily")
    if os.path.isdir(path):
        import shutil; shutil.rmtree(path)
    assert runner.run()[0].status == "success"
    # increment restates d2 with an extra column; d1 untouched
    pd.DataFrame(
        {"id": [3], "day": ["d2"], "v": [99], "extra": [7]}
    ).to_parquet(f"{data}/t.parquet", index=False)
    res2 = Runner(spark, Project(root, target="dev")).run()
    assert res2[0].status == "success"
    rows = {r.id: (r.day, r.v, r.extra) for r in spark.table("dev_daily").collect()}
    assert rows == {1: ("d1", 10, None), 3: ("d2", 99, 7)}


def test_on_schema_change_sync_rejected_on_insert_overwrite(spark, tmp_path):
    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    _write(f"{root}/project.yml",
           "name: iosync\nmodels:\n  models:\n    materialized: view\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(
        f"{root}/models/models/daily.sql",
        "{{ config(materialized='incremental', "
        "incremental_strategy='insert_overwrite', partition_by='day', "
        "on_schema_change='sync_all_columns') }}\n"
        "SELECT * FROM {{ source('raw', 't') }}",
    )
    pd.DataFrame({"id": [1], "day": ["d1"], "v": [10]}).to_parquet(
        f"{data}/t.parquet", index=False
    )
    runner = Runner(spark, Project(root, target="dev"))
    path = runner._table_path("dev_daily")
    if os.path.isdir(path):
        import shutil; shutil.rmtree(path)
    assert runner.run()[0].status == "success"
    pd.DataFrame({"id": [2], "day": ["d1"]}).to_parquet(
        f"{data}/t.parquet", index=False
    )
    res2 = Runner(spark, Project(root, target="dev")).run()
    assert res2[0].status == "error"
    assert "sync_all_columns" in res2[0].error


# ----------------------------------------------------------------- --defer


def test_defer_reads_unmodified_parents_from_state_namespace(spark, tmp_path):
    """CI defer pattern: prod built parent+child; child's SQL changes; a
    dev run with --select state:modified --defer --state builds ONLY the
    child in dev, reading the unmodified parent from prod's relation."""
    import shutil

    from dbt_on_snowflake_spark.__main__ import main
    from dbt_on_snowflake_spark.engine.artifacts import write_manifest

    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": [1, 2, 3], "v": [10, 20, 30]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    _write(f"{root}/project.yml",
           "name: deferdemo\nmodels:\n  models:\n    materialized: table\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(f"{root}/models/models/parent.sql",
           "SELECT id, v FROM {{ source('raw', 't') }}")
    _write(f"{root}/models/models/child.sql",
           "SELECT id, v * 2 AS v2 FROM {{ ref('parent') }}")

    # stale-warehouse hygiene: the session warehouse is shared
    runner_probe = Runner(spark, Project(root, target="dev"))
    for rel in ("prod_parent", "prod_child", "dev_parent", "dev_child"):
        if os.path.isdir(runner_probe._table_path(rel)):
            shutil.rmtree(runner_probe._table_path(rel))

    # 1. prod builds everything; manifest records prod relations
    assert main(["run", "--project", root, "--target", "prod"]) == 0
    manifest = str(tmp_path / "prod_manifest.json")
    write_manifest(Project(root, target="prod"), manifest)

    # 2. child changes; prod's source data is then restated so a dev
    # rebuild of parent would differ from prod's stored parent
    _write(f"{root}/models/models/child.sql",
           "SELECT id, v * 10 AS v10 FROM {{ ref('parent') }}")
    pd.DataFrame({"id": [9], "v": [999]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )

    # 3. dev run: only the modified child builds, against PROD's parent
    rc = main([
        "run", "--project", root, "--target", "dev",
        "--select", "state:modified", "--defer", "--state", manifest,
    ])
    assert rc == 0
    assert not os.path.isdir(runner_probe._table_path("dev_parent"))
    rows = {r.id: r.v10 for r in spark.table("dev_child").collect()}
    # values derive from prod's parent (ids 1-3), NOT the restated source
    assert rows == {1: 100, 2: 200, 3: 300}


def test_defer_prefers_already_built_dev_relation(spark, tmp_path):
    """dbt's dev-wins default: if the unselected parent ALREADY exists in
    the dev namespace, defer leaves it alone and uses it."""
    import shutil

    from dbt_on_snowflake_spark.engine.artifacts import build_manifest

    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": [1], "v": [10]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    _write(f"{root}/project.yml",
           "name: deferdev\nmodels:\n  models:\n    materialized: table\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n    tables:\n      - name: t\n")
    _write(f"{root}/models/models/parent.sql",
           "SELECT id, v FROM {{ source('raw', 't') }}")
    _write(f"{root}/models/models/child.sql",
           "SELECT id, v + 1 AS v1 FROM {{ ref('parent') }}")

    probe = Runner(spark, Project(root, target="dev"))
    for rel in ("prod_parent", "prod_child", "dev_parent", "dev_child"):
        if os.path.isdir(probe._table_path(rel)):
            shutil.rmtree(probe._table_path(rel))

    # prod parent has OLD data; dev parent is then built with NEW data
    Runner(spark, Project(root, target="prod")).run("parent")
    manifest = build_manifest(Project(root, target="prod"))
    pd.DataFrame({"id": [1], "v": [70]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    Runner(spark, Project(root, target="dev")).run("parent")

    res = Runner(
        spark, Project(root, target="dev"), defer_state=manifest
    ).run("child")
    assert [r.name for r in res] == ["child"] and res[0].status == "success"
    # dev parent (v=70) won over prod parent (v=10)
    assert [r.v1 for r in spark.table("dev_child").collect()] == [71]


def test_microbatch_day_replay_idempotent(spark, tmp_path):
    """microbatch incremental: day-bucketed partitions, one write per
    batch. A --event-start/--event-end replay rewrites ONLY the targeted
    day (idempotent on re-run, other days untouched); a plain run picks
    up new days plus the lookback tail."""
    import pandas as pd

    root = str(tmp_path / "proj")
    data = str(tmp_path / "data")
    os.makedirs(data)

    def events(day_vals: dict[str, int]) -> None:
        rows = []
        for day, val in day_vals.items():
            for h in (9, 15):
                rows.append(
                    {"user_id": h, "ts": f"{day} {h:02d}:00:00", "val": val}
                )
        # a NULL event_time row belongs to no batch: it must be dropped
        # (dbt's event-time range filter semantics), not crash the
        # batch-key sort or invent a null partition
        rows.append({"user_id": 99, "ts": None, "val": -1})
        frame = pd.DataFrame(rows)
        frame["ts"] = pd.to_datetime(frame["ts"]).astype("datetime64[us]")
        frame.to_parquet(os.path.join(data, "ev.parquet"), index=False)

    events({"2024-01-01": 1, "2024-01-02": 2, "2024-01-03": 3})
    _write(f"{root}/project.yml", "name: mb\n")
    _write(f"{root}/sources.yml",
           f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
           "    tables:\n      - name: ev\n")
    _write(f"{root}/models/models/mb_events.sql",
           "{{ config(materialized='incremental', "
           "incremental_strategy='microbatch', event_time='ts', "
           "batch_size='day') }}\n"
           "SELECT user_id, ts, val FROM {{ source('raw', 'ev') }}")

    res = Runner(spark, Project(root, target="dev")).run()
    assert res[-1].status == "success" and res[-1].rows == 6
    # partition-column inference reads the day string back as a DATE
    t = lambda: {  # noqa: E731
        (str(r.event_batch), r.user_id): r.val
        for r in spark.table("dev_mb_events").collect()
    }
    base = t()
    assert len(base) == 6
    assert base[("2024-01-02", 9)] == 2

    # source corrected for days 2+3, day 4 arrives — replay ONLY day 2
    events({"2024-01-01": 1, "2024-01-02": 102, "2024-01-03": 103,
            "2024-01-04": 104})
    res = Runner(
        spark, Project(root, target="dev"),
        event_start="2024-01-02 00:00:00", event_end="2024-01-03 00:00:00",
    ).run()
    assert res[-1].status == "success" and res[-1].rows == 2
    after = t()
    assert len(after) == 6  # day 4 NOT built: outside the replay window
    assert after[("2024-01-02", 9)] == 102  # replayed day updated
    assert after[("2024-01-01", 9)] == 1  # untouched
    assert after[("2024-01-03", 9)] == 3  # untouched (outside window)

    # replaying the same day again is idempotent
    res = Runner(
        spark, Project(root, target="dev"),
        event_start="2024-01-02 00:00:00", event_end="2024-01-03 00:00:00",
    ).run()
    assert res[-1].status == "success" and res[-1].rows == 2
    assert t() == after

    # plain incremental run: new day 4 + lookback tail (day 3) rebuild;
    # days 1-2 are settled history and stay untouched
    res = Runner(spark, Project(root, target="dev")).run()
    assert res[-1].status == "success" and res[-1].rows == 4
    final = t()
    assert len(final) == 8
    assert final[("2024-01-04", 9)] == 104  # new day arrived
    assert final[("2024-01-03", 9)] == 103  # lookback day rewritten
    assert final[("2024-01-01", 9)] == 1
    assert final[("2024-01-02", 9)] == 102
