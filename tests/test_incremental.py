"""Incremental + ephemeral materializations (dbt-core surface beyond the
reference's view/table pair), driven through a synthetic project built on
the fly."""

from __future__ import annotations

import os

import pandas as pd
import pytest

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
