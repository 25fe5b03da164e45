"""Package mechanism (reference dbt/packages.yml:2-3 — dbt_utils): a
package contributes macros, generic tests, and models; the project pulls
it in via ``packages:`` in project.yml."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from dbt_on_snowflake_spark.engine.compile import (
    Macro,
    expand_macros,
    extract_macros,
)
from dbt_on_snowflake_spark.engine.project import Project
from dbt_on_snowflake_spark.engine.runner import Runner
from dbt_on_snowflake_spark.engine.testing import TestRunner


def _write(path: str, content: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(content)


def test_macro_parsing_and_expansion():
    macros = extract_macros(
        """
{% macro cents_to_dollars(col, precision=2) %}
ROUND({{ col }} / 100.0, {{ precision }})
{% endmacro %}

{% macro money(col) %}
{{ cents_to_dollars(col, precision=4) }} AS {{ col }}_usd
{% endmacro %}
"""
    )
    assert set(macros) == {"cents_to_dollars", "money"}
    assert macros["cents_to_dollars"].params == [("col", None), ("precision", "2")]
    out = expand_macros("SELECT {{ cents_to_dollars('amt') }}", macros)
    assert out == "SELECT ROUND(amt / 100.0, 2)"
    # nested macro call + kwarg + default override
    out2 = expand_macros("SELECT {{ money('amt') }}", macros)
    assert "ROUND(amt / 100.0, 4) AS amt_usd" in out2
    # nested parens in an argument survive
    out3 = expand_macros(
        "SELECT {{ cents_to_dollars(\"COALESCE(a, b)\") }}", macros
    )
    assert out3 == "SELECT ROUND(COALESCE(a, b) / 100.0, 2)"


def test_macro_errors():
    macros = {"m": Macro("m", [("a", None)], "{{ a }}")}
    with pytest.raises(ValueError, match="missing args"):
        expand_macros("{{ m() }}", macros)
    with pytest.raises(ValueError, match="too many positional"):
        expand_macros("{{ m(1, 2) }}", macros)
    rec = {"r": Macro("r", [], "{{ r() }}")}
    with pytest.raises(ValueError, match="converge"):
        expand_macros("{{ r() }}", rec)


@pytest.fixture()
def pkg_project(spark, tmp_path):
    """Project using a package that ships a macro, a generic test, and a
    model."""
    root = str(tmp_path / "proj")
    pkg = str(tmp_path / "pkg")
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame(
        {"id": [1, 2, 3], "amount_cents": [250, 499, 1000]}
    ).to_parquet(os.path.join(data, "pay.parquet"), index=False)

    _write(
        f"{pkg}/macros/money.sql",
        """
{% macro cents_to_dollars(col, precision=2) %}
ROUND({{ col }} / 100.0, {{ precision }})
{% endmacro %}
""",
    )
    _write(
        f"{pkg}/tests/checks.py",
        """
from pyspark.sql import functions as F


def is_round_dollars(df, column):
    \"\"\"Fails on amounts that are not whole cents multiples of 50.\"\"\"
    return df.filter(F.col(column) % 50 != 0)
""",
    )
    _write(
        f"{pkg}/models/pkg_amounts.sql",
        "SELECT id, {{ cents_to_dollars('amount_cents') }} AS dollars\n"
        "FROM {{ source('raw', 'pay') }}",
    )

    _write(
        f"{root}/project.yml",
        f"name: pkgdemo\npackages:\n  - \"{pkg}\"\n"
        "models:\n  models:\n    materialized: table\n",
    )
    _write(
        f"{root}/sources.yml",
        f"""
sources:
  - name: raw
    base_path: "{data}"
    tables:
      - name: pay
        columns:
          - name: amount_cents
            tests:
              - is_round_dollars
""",
    )
    _write(
        f"{root}/models/models/spend.sql",
        "SELECT id, {{ cents_to_dollars('amount_cents', precision=4) }} AS usd\n"
        "FROM {{ source('raw', 'pay') }}\n"
        "WHERE id IN (SELECT id FROM {{ ref('pkg_amounts') }})",
    )
    return root, pkg


def test_package_macro_model_and_test(spark, pkg_project, tmp_path):
    root, _pkg = pkg_project
    project = Project(root, target="dev")
    # package model merged into the DAG; project model refs it
    assert "pkg_amounts" in project.models
    assert project.models["spend"].refs == ["pkg_amounts"]
    runner = Runner(spark, project)
    results = runner.run()
    assert {r.name: r.status for r in results} == {
        "pkg_amounts": "success",
        "spend": "success",
    }
    rows = {
        r.id: float(r.dollars) for r in spark.table("dev_pkg_amounts").collect()
    }
    assert rows == {1: 2.50, 2: 4.99, 3: 10.00}

    # the package's generic test runs from sources.yml by bare name
    tr = TestRunner(spark, custom=project.package_tests)
    tres = tr.run_source_tests(project, runner)
    byname = {r.name: r for r in tres}
    assert byname["is_round_dollars"].status == "fail"  # 499 trips it
    assert byname["is_round_dollars"].failures == 1


def test_duplicate_model_name_across_package_fails(spark, pkg_project):
    root, pkg = pkg_project
    _write(
        f"{root}/models/models/pkg_amounts.sql",
        "SELECT 1 AS x",
    )
    with pytest.raises(ValueError, match="duplicate model name"):
        Project(root, target="dev")


def test_package_lockfile_write_and_mismatch(spark, pkg_project):
    """Resolved packages are pinned into <root>/package-lock.yml — the
    VERSION-CONTROLLED project root, like the reference's
    dbt/package-lock.yml:1-4, not the CI-wiped target/ dir. Content
    changing under the same version is a hard error; a version bump is an
    intentional re-resolve and re-locks cleanly."""
    import yaml

    root, pkg = pkg_project
    _write(f"{pkg}/project.yml", "name: moneypkg\nversion: 1.3.0\n")

    Project(root, target="dev")
    lock_path = os.path.join(root, "package-lock.yml")
    with open(lock_path) as f:
        lock = yaml.safe_load(f)
    (entry,) = lock["packages"]
    assert entry["name"] == "moneypkg" and entry["version"] == "1.3.0"
    sha = entry["sha"]
    assert sha and entry["path"] == pkg

    # same content re-resolves cleanly
    Project(root, target="dev")

    # content edit without a version bump -> locked out
    _write(f"{pkg}/macros/extra.sql", "{% macro one() %}1{% endmacro %}")
    with pytest.raises(ValueError, match="without a version bump"):
        Project(root, target="dev")

    # a version bump IS the intentional re-resolve: accepted + re-locked
    _write(f"{pkg}/project.yml", "name: moneypkg\nversion: 1.4.0\n")
    Project(root, target="dev")
    with open(lock_path) as f:
        relock = yaml.safe_load(f)
    assert relock["packages"][0]["version"] == "1.4.0"
    assert relock["packages"][0]["sha"] != sha

    # and the new lock holds: same content passes, new drift errors again
    Project(root, target="dev")
    _write(f"{pkg}/macros/extra2.sql", "{% macro two() %}2{% endmacro %}")
    with pytest.raises(ValueError, match="without a version bump"):
        Project(root, target="dev")


def test_package_lockfile_reads_legacy_target_location(spark, pkg_project):
    """A lock previously written under target/ still guards the first run
    after upgrading; the lock is then rewritten at the project root."""
    import yaml

    root, pkg = pkg_project
    _write(f"{pkg}/project.yml", "name: moneypkg\nversion: 2.0.0\n")
    Project(root, target="dev")
    root_lock = os.path.join(root, "package-lock.yml")
    with open(root_lock) as f:
        lock = yaml.safe_load(f)
    os.makedirs(os.path.join(root, "target"), exist_ok=True)
    os.rename(root_lock, os.path.join(root, "target", "package-lock.yml"))
    # drift against the legacy lock is still caught
    _write(f"{pkg}/macros/extra3.sql", "{% macro three() %}3{% endmacro %}")
    with pytest.raises(ValueError, match="without a version bump"):
        Project(root, target="dev")


def test_macro_param_not_substituted_in_string_literals():
    """A param named like a string literal inside a nested call must not
    rewrite the literal — Jinja never substitutes inside quotes (ADVICE
    compile.py:140)."""
    macros = extract_macros(
        """
{% macro q(x) %}QUOTED_{{ x }}{% endmacro %}
{% macro wrap(col) %}{{ col }} AND {{ q('col') }} AND {{ q(col) }}{% endmacro %}
"""
    )
    out = expand_macros("{{ wrap('amt') }}", macros)
    assert out == "amt AND QUOTED_col AND QUOTED_amt"
