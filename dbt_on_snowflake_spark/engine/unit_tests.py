"""dbt unit tests: YAML-declared mock inputs + expected rows for SQL
models, executed against the COMPILED model SQL without touching any
real source or materialized relation (dbt 1.8 `unit_tests:` surface;
the reference's marts — e.g. dbt/models/marts/orders.sql:35-47's 6-way
join — are exactly the logic these target).

Declaration, in any ``models/**/*.yml``:

    unit_tests:
      - name: ut_orders_joins
        model: orders
        given:
          - input: ref('raw_pos_order_detail')
            rows:
              - {order_detail_id: 1, order_id: 10, ...}
          - input: source('raw', 'logs')   # sources mock the same way
            rows: [...]
          - input: ref('empty_side')
            schema: "id bigint, v double"  # empty input needs a schema
            rows: []
        expect:
          rows:
            - {order_id: 10, truck_brand_name: "Plant Palace"}

Semantics:
- every ref()/source() the model's SQL uses MUST be mocked (explicit
  beats dbt's silently-empty default: a forgotten mock in an inner join
  yields an empty — vacuously passing — expectation);
- the comparison is row-multiset equality over EXACTLY the columns
  mentioned in ``expect`` (extra output columns are ignored, like dbt);
- mock rows build a real DataFrame, so the model's casts, join-type
  coercions, and null propagation run through Spark, not a simulation.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from decimal import Decimal
from typing import Any

from pyspark.sql import SparkSession

_INPUT_RE = re.compile(
    r"^\s*(?:ref\(\s*['\"]([\w.]+)['\"]\s*\)"
    r"|source\(\s*['\"]([\w.]+)['\"]\s*,\s*['\"]([\w.]+)['\"]\s*\))\s*$"
)


@dataclass
class UnitTest:
    name: str
    model: str
    # parsed given entries: ("ref", name) or ("source", group, table)
    # -> {"rows": [...], "schema": str | None}
    given: dict[tuple, dict] = field(default_factory=dict)
    expect_rows: list[dict] = field(default_factory=list)
    # dbt `overrides: vars:` — test-local var values layered over the
    # project's vars when compiling the model under test
    vars_overrides: dict[str, Any] = field(default_factory=dict)


@dataclass
class UnitTestResult:
    name: str
    model: str
    status: str  # pass | fail | error
    message: str | None = None


def parse_unit_tests(doc: dict, models: dict, filename: str) -> list[UnitTest]:
    """Parse the ``unit_tests:`` key of one schema-yml document."""
    out = []
    for spec in doc.get("unit_tests", []) or []:
        name, model = spec["name"], spec["model"]
        if model not in models:
            raise ValueError(
                f"{filename}: unit test {name!r} targets unknown model "
                f"{model!r}"
            )
        if models[model].kind != "sql":
            raise ValueError(
                f"{filename}: unit test {name!r}: only SQL models are "
                f"supported ({model!r} is {models[model].kind})"
            )
        given: dict[tuple, dict] = {}
        for g in spec.get("given", []) or []:
            m = _INPUT_RE.match(str(g.get("input", "")))
            if not m:
                raise ValueError(
                    f"{filename}: unit test {name!r}: input must be "
                    f"ref('model') or source('group', 'table'), got "
                    f"{g.get('input')!r}"
                )
            key = (
                ("ref", m.group(1))
                if m.group(1)
                else ("source", m.group(2), m.group(3))
            )
            rows = g.get("rows") or []
            schema = g.get("schema")
            if not rows and not schema:
                raise ValueError(
                    f"{filename}: unit test {name!r}: empty mock input "
                    f"{g['input']!r} needs an explicit schema"
                )
            given[key] = {"rows": rows, "schema": schema}
        expect = (spec.get("expect") or {}).get("rows")
        if expect is None:
            raise ValueError(
                f"{filename}: unit test {name!r} has no expect rows"
            )
        # expect: rows: [] is a VALID declaration (assert zero output
        # rows — e.g. a filter that must reject every mock row)
        overrides = spec.get("overrides") or {}
        unknown = sorted(set(overrides) - {"vars"})
        if unknown:
            raise ValueError(
                f"{filename}: unit test {name!r}: unsupported overrides "
                f"{unknown} (only 'vars' is supported)"
            )
        out.append(
            UnitTest(
                name=name,
                model=model,
                given=given,
                expect_rows=expect,
                vars_overrides=overrides.get("vars") or {},
            )
        )
    return out


def _norm(v: Any) -> Any:
    """Normalize a cell for YAML-vs-Spark comparison: numerics collapse
    to float (YAML 2 must equal a Spark bigint 2 or DECIMAL 2.0000),
    temporal values to isoformat strings (YAML dates arrive as
    datetime.date already; string-typed expectations compare as text)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float, Decimal)):
        return float(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def _coerce(v: Any, dt) -> Any:
    """YAML scalars -> what createDataFrame accepts for a declared type:
    floats/ints to Decimal for DecimalType, ISO strings to date/datetime
    for temporal types. Anything else passes through (createDataFrame's
    own validation reports remaining mismatches)."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    from pyspark.sql import types as T

    if v is None:
        return None
    if isinstance(dt, T.DecimalType) and isinstance(v, (int, float, str)):
        return _Dec(str(v))
    if isinstance(dt, T.DateType) and isinstance(v, str):
        return _dt.date.fromisoformat(v)
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)) and isinstance(v, str):
        return _dt.datetime.fromisoformat(v)
    if isinstance(dt, T.DoubleType | T.FloatType) and isinstance(v, int):
        return float(v)
    return v


def _mock_df(spark: SparkSession, rows: list[dict], schema: str | None):
    if schema:
        # parse with Spark's own DDL parser — a naive split(',') breaks
        # on parametrized/nested types (decimal(10,2), map<k,v>, ...)
        from pyspark.sql.types import _parse_datatype_string

        struct = _parse_datatype_string(schema)
        data = [
            tuple(_coerce(r.get(f.name), f.dataType) for f in struct.fields)
            for r in rows
        ]
        return spark.createDataFrame(data, schema=struct)
    # union of keys across rows, first-seen order; Spark infers types
    cols: list[str] = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    return spark.createDataFrame([{c: r.get(c) for c in cols} for r in rows])


def run_unit_tests(
    spark: SparkSession,
    project,
    only: set[str] | None = None,
    models: set[str] | None = None,
) -> list[UnitTestResult]:
    """Execute the project's unit tests; nothing is materialized and no
    real source is read — each test compiles its model's SQL against
    temp views built from the mock rows. ``only`` filters by test name;
    ``models`` scopes to tests whose model is in the given selection
    (dbt: a selected build runs only the selection's unit tests)."""
    from dbt_on_snowflake_spark.engine.compile import render

    results = []
    variables = project.config.get("vars") or {}
    for ut in project.unit_tests:
        if only is not None and ut.name not in only:
            continue
        if models is not None and ut.model not in models:
            continue
        node = project.models[ut.model]
        try:
            views: dict[tuple, str] = {}
            for i, (key, mock) in enumerate(ut.given.items()):
                vname = f"__ut_{ut.name}_{i}"
                _mock_df(spark, mock["rows"], mock["schema"]) \
                    .createOrReplaceTempView(vname)
                views[key] = vname

            def resolve_ref(n):
                if ("ref", n) not in views:
                    raise ValueError(
                        f"unit test {ut.name!r}: ref({n!r}) is not mocked "
                        "(every input must appear under given:)"
                    )
                return views[("ref", n)]

            def resolve_source(g, t):
                if ("source", g, t) not in views:
                    raise ValueError(
                        f"unit test {ut.name!r}: source({g!r}, {t!r}) is "
                        "not mocked (every input must appear under given:)"
                    )
                return views[("source", g, t)]

            sql = render(
                node.body, resolve_ref, resolve_source,
                this=f"__ut_{ut.name}_this",
                variables={**variables, **ut.vars_overrides},
            )
            actual = spark.sql(sql).collect()
            expect_cols: list[str] = []
            for r in ut.expect_rows:
                for k in r:
                    if k not in expect_cols:
                        expect_cols.append(k)
            missing = [
                c for c in expect_cols
                if actual and c not in actual[0].asDict()
            ]
            if missing:
                raise ValueError(
                    f"expected columns {missing} absent from model output "
                    f"{sorted(actual[0].asDict())}"
                )
            # repr-keyed sort: tuples mixing None with values are not
            # orderable directly, and a tie on leading columns would
            # otherwise crash the comparison of a correct result
            got = sorted(
                (tuple(_norm(r[c]) for c in expect_cols) for r in actual),
                key=repr,
            )
            want = sorted(
                (
                    tuple(_norm(r.get(c)) for c in expect_cols)
                    for r in ut.expect_rows
                ),
                key=repr,
            )
            if got == want:
                results.append(UnitTestResult(ut.name, ut.model, "pass"))
            else:
                extra = [t for t in got if t not in want]
                lacking = [t for t in want if t not in got]
                results.append(
                    UnitTestResult(
                        ut.name, ut.model, "fail",
                        f"columns {expect_cols}: {len(lacking)} expected "
                        f"row(s) missing {lacking[:3]}, {len(extra)} "
                        f"unexpected {extra[:3]}",
                    )
                )
        except Exception as e:  # noqa: BLE001 — per-test isolation
            results.append(
                UnitTestResult(ut.name, ut.model, "error", str(e)[:500])
            )
    return results
