"""Project loading: models directory scan + config tree + profiles
(reference §2.9 O1/O3/O5; dbt_project.yml:1-25, profiles.yml:1-19).

A project directory looks like:

    project.yml          # name, model config (per-directory materialization)
    profiles.yml         # targets: dev/prod -> database/schema namespace
    sources.yml          # source groups -> tables (+ tests, freshness)
    models/
      staging/*.sql      # SQL models ({{ ref }}/{{ source }} Jinja-lite)
      marts/*.sql
      marts/*.py         # Python models: def model(ctx, spark) -> DataFrame

Namespaces: models materialize into ``<schema>_<name>`` relation names in
the Spark session catalog (the reference's custom generate_schema_name
macro resolves a *literal* schema per target; Spark temp views have a flat
namespace, so the target schema becomes a name prefix — same resolution
logic, different catalog shape).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import yaml

from dbt_on_snowflake_spark.engine.compile import extract_config, extract_deps


@dataclass
class ModelNode:
    name: str
    path: str
    kind: str  # "sql" | "python"
    subdir: str  # first directory under models/ (config scope)
    body: str | None  # sql text (None for python)
    refs: list[str] = field(default_factory=list)
    sources: list[tuple[str, str]] = field(default_factory=list)
    config: dict[str, str] = field(default_factory=dict)


@dataclass
class SourceTable:
    group: str
    name: str
    path: str  # parquet/csv location
    format: str = "parquet"
    columns: dict[str, list[dict[str, Any]]] = field(default_factory=dict)
    tests: list[dict[str, Any]] = field(default_factory=list)
    loaded_at_field: str | None = None


class Project:
    def __init__(self, root: str, target: str = "dev"):
        self.root = root
        self.target = target
        with open(os.path.join(root, "project.yml")) as f:
            self.config = yaml.safe_load(f)
        prof_path = os.path.join(root, "profiles.yml")
        self.profiles = {}
        if os.path.exists(prof_path):
            with open(prof_path) as f:
                self.profiles = yaml.safe_load(f) or {}
        self.models = self._discover_models()
        self.sources = self._load_sources()

    # -- namespace resolution (reference generate_schema_name.sql:1-14:
    # a literal custom schema wins; else the target's schema) -------------
    @property
    def schema(self) -> str:
        tgt = self.profiles.get("targets", {}).get(self.target, {})
        return tgt.get("schema", self.target)

    def relation_for(self, model: str, custom_schema: str | None = None) -> str:
        schema = custom_schema or self.schema
        return f"{schema}_{model}"

    # -- discovery --------------------------------------------------------
    def _discover_models(self) -> dict[str, ModelNode]:
        models: dict[str, ModelNode] = {}
        mdir = os.path.join(self.root, "models")
        for dirpath, _dirs, files in os.walk(mdir):
            subdir = os.path.relpath(dirpath, mdir).split(os.sep)[0]
            for fn in sorted(files):
                path = os.path.join(dirpath, fn)
                name, ext = os.path.splitext(fn)
                if ext == ".sql":
                    with open(path) as f:
                        body = f.read()
                    refs, sources = extract_deps(body)
                    cfg = extract_config(body)
                    models[name] = ModelNode(
                        name, path, "sql", subdir, body, refs, sources, cfg
                    )
                elif ext == ".py" and not fn.startswith("_"):
                    with open(path) as f:
                        body = f.read()
                    # python models declare refs via ctx.ref("name") calls
                    import re

                    refs = re.findall(r"\bctx\.ref\(\s*['\"](\w+)['\"]", body)
                    srcs = re.findall(
                        r"\bctx\.source\(\s*['\"](\w+)['\"]\s*,\s*['\"](\w+)['\"]",
                        body,
                    )
                    models[name] = ModelNode(
                        name, path, "python", subdir, None, refs, list(srcs), {}
                    )
        return models

    def materialization_for(self, node: ModelNode) -> str:
        if "materialized" in node.config:
            return node.config["materialized"]
        per_dir = self.config.get("models", {}).get(node.subdir, {})
        return per_dir.get("materialized", "view")

    # -- sources ----------------------------------------------------------
    def _load_sources(self) -> dict[tuple[str, str], SourceTable]:
        path = os.path.join(self.root, "sources.yml")
        out: dict[tuple[str, str], SourceTable] = {}
        if not os.path.exists(path):
            return out
        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        for group in doc.get("sources", []):
            gname = group["name"]
            base = group.get("base_path", "")
            for tbl in group.get("tables", []):
                raw_path = tbl.get("path", os.path.join(base, f"{tbl['name']}.parquet"))
                out[(gname, tbl["name"])] = SourceTable(
                    group=gname,
                    name=tbl["name"],
                    path=os.path.expandvars(raw_path),
                    format=tbl.get("format", group.get("format", "parquet")),
                    columns={
                        c["name"]: c.get("tests", [])
                        for c in tbl.get("columns", [])
                    },
                    tests=tbl.get("tests", []),
                    loaded_at_field=tbl.get("loaded_at_field"),
                )
        return out
