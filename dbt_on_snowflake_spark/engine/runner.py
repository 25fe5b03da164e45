"""Model runner: materialization dispatch + run-results artifact
(reference §2.9 O3/O7/O9; materializations from dbt_project.yml:20-25 —
staging=view, marts=table; run_results export per README.md:163-187).

Materializations:
- view  -> temp view over the compiled SELECT (zero storage; Catalyst
           inlines it downstream, so predicate pushdown and column pruning
           flow THROUGH the view into the source scans — the same reason
           dbt materializes staging as views)
- table -> overwrite-saveAsTable (parquet, session warehouse dir); at
           cluster scale this is the precomputed wide mart the reference
           builds with CREATE TABLE AS
"""

from __future__ import annotations

import importlib.util
import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession

from dbt_on_snowflake_spark.engine.compile import render
from dbt_on_snowflake_spark.engine.dag import select
from dbt_on_snowflake_spark.engine.project import ModelNode, Project


@dataclass
class NodeResult:
    name: str
    status: str  # success | error | skipped
    materialization: str
    relation: str
    rows: int | None
    seconds: float
    error: str | None = None


class ModelContext:
    """What a Python model receives as ``ctx`` (the reference's ``dbt``
    object, sales_metrics_by_location.py:3-12): ref()/source() return
    PySpark DataFrames."""

    def __init__(self, runner: "Runner"):
        self._runner = runner

    def ref(self, name: str) -> DataFrame:
        return self._runner.spark.table(self._runner.resolve_ref(name))

    def source(self, group: str, name: str) -> DataFrame:
        return self._runner.spark.table(self._runner.resolve_source(group, name))


class Runner:
    def __init__(self, spark: SparkSession, project: Project):
        self.spark = spark
        self.project = project
        self.results: list[NodeResult] = []

    # -- resolution -------------------------------------------------------
    def resolve_ref(self, name: str) -> str:
        node = self.project.models[name]
        return self.project.relation_for(name, node.config.get("schema"))

    def resolve_source(self, group: str, name: str) -> str:
        return f"src_{group}_{name}"

    # -- sources ----------------------------------------------------------
    def load_sources(self) -> None:
        """Register every declared source as a temp view (reference S4:
        sources are externally-loaded raw tables)."""
        for (group, name), src in self.project.sources.items():
            reader = self.spark.read
            if src.format == "csv":
                from dbt_on_snowflake_spark.sources.csv_loader import read_csv_typed

                df = read_csv_typed(self.spark, src.path)
            else:
                df = reader.parquet(src.path)
            df.createOrReplaceTempView(self.resolve_source(group, name))

    # -- execution --------------------------------------------------------
    def run(self, selector: str | None = None) -> list[NodeResult]:
        self.load_sources()
        for name in select(self.project, selector):
            self._run_node(self.project.models[name])
        return self.results

    def _run_node(self, node: ModelNode) -> None:
        mat = self.project.materialization_for(node)
        relation = self.resolve_ref(node.name)
        t0 = time.perf_counter()
        try:
            df = self._build_df(node)
            rows = self._materialize(df, relation, mat)
            self.results.append(
                NodeResult(
                    node.name, "success", mat, relation, rows,
                    round(time.perf_counter() - t0, 3),
                )
            )
        except Exception as e:  # noqa: BLE001 — per-node isolation is the point
            self.results.append(
                NodeResult(
                    node.name, "error", mat, relation, None,
                    round(time.perf_counter() - t0, 3), str(e)[:500],
                )
            )
            raise

    def _build_df(self, node: ModelNode) -> DataFrame:
        if node.kind == "sql":
            sql = render(node.body, self.resolve_ref, self.resolve_source)
            return self.spark.sql(sql)
        spec = importlib.util.spec_from_file_location(
            f"model_{node.name}", node.path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.model(ModelContext(self), self.spark)

    def _materialize(self, df: DataFrame, relation: str, mat: str) -> int | None:
        if mat == "view":
            df.createOrReplaceTempView(relation)
            return None  # views are lazy; no action (dbt also reports 0)
        if mat == "table":
            df.write.mode("overwrite").saveAsTable(relation)
            t = self.spark.table(relation)
            return t.count()
        raise ValueError(f"unknown materialization: {mat}")

    # -- artifacts --------------------------------------------------------
    def write_run_results(self, path: str) -> None:
        payload = {
            "elapsed": round(sum(r.seconds for r in self.results), 3),
            "target": self.project.target,
            "results": [asdict(r) for r in self.results],
        }
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)
