"""Build artifacts — the machine-readable project state a UI or CI
consumes (reference README.md:115-127 compile/DAG view, 163-187 per-run
monitoring/history):

- ``manifest.json``     — nodes, edges, materializations, relations,
  sources; written by ``compile`` (dbt's manifest.json equivalent).
- ``run_history.jsonl`` — one line appended per ``run`` invocation, so
  run monitoring has cross-invocation history, not only the latest
  run_results.json.
"""

from __future__ import annotations

import hashlib
import json
import os
from datetime import datetime, timezone
from typing import Any


# state:modified checksum-scheme version. v1 hashed file bytes only; v2
# added the schema.yml tests/contract repr (a contract or test edit is a
# modification). Recorded in the manifest so the selector can WARN when
# diffing against a manifest written under a different scheme — the
# comparison then flags every model once, and the warning says why —
# instead of silently selecting everything.
CHECKSUM_VERSION = 2


def _file_checksum(path: str) -> str:
    with open(path, "rb") as f:
        return hashlib.md5(f.read()).hexdigest()


def node_checksum(project, name: str) -> str:
    """A model node's state:modified checksum: the SQL/Python file bytes
    PLUS its schema.yml declaration (tests, contract) — dbt treats a
    contract or test edit as a modification (the model's guarantees
    changed even though its body didn't), so a CI state:modified build
    re-runs and re-tests it."""
    node = project.models[name]
    h = hashlib.md5()
    with open(node.path, "rb") as f:
        h.update(f.read())
    mt = project.model_tests.get(name)
    if mt is not None:
        h.update(
            repr(
                (
                    sorted(mt.columns.items()),
                    mt.tests,
                    mt.contract_enforced,
                    sorted(mt.column_types.items()),
                )
            ).encode()
        )
    return h.hexdigest()

from dbt_on_snowflake_spark.engine.dag import build_graph, toposort
from dbt_on_snowflake_spark.engine.project import Project


def build_manifest(project: Project) -> dict[str, Any]:
    graph = build_graph(project)
    nodes = {}
    for name in toposort(project):
        node = project.models[name]
        nodes[name] = {
            "name": name,
            "kind": node.kind,
            "path": os.path.relpath(node.path, project.root),
            "materialized": project.materialization_for(node),
            "relation": project.relation_for(name, node.config.get("schema")),
            "refs": sorted(node.refs),
            "sources": [list(s) for s in sorted(node.sources)],
            "config": dict(node.config),
            # content checksum (file + schema.yml tests/contract): the
            # state:modified selector diffs these against a prior
            # manifest to build only changed models
            "checksum": node_checksum(project, name),
            # governance: owning group + ref-boundary access level
            "group": getattr(project, "model_group", {}).get(name),
            "access": getattr(project, "model_access", {}).get(
                name, "protected"
            ),
        }
    edges = sorted(
        [up, down] for down, ups in graph.items() for up in ups
    )
    sources = {
        f"{g}.{t}": {
            "group": g,
            "table": t,
            "path": src.path,
            "format": src.format,
            "loaded_at_field": src.loaded_at_field,
        }
        for (g, t), src in project.sources.items()
    }
    exposures = {
        e.name: {
            "type": e.type,
            "owner": e.owner,
            "url": e.url,
            "description": e.description,
            "depends_on": sorted(e.model_refs),
            "depends_on_sources": [list(s) for s in sorted(e.source_refs)],
            # the physical relations a consumer actually reads — lineage
            # past the warehouse edge for impact analysis
            "relations": sorted(
                project.relation_for(
                    m, project.models[m].config.get("schema")
                )
                for m in e.model_refs
            ),
        }
        for e in getattr(project, "exposures", [])
    }
    return {
        "project": project.config.get("name"),
        "target": project.target,
        "schema": project.schema,
        "checksum_version": CHECKSUM_VERSION,
        "groups": getattr(project, "groups", {}),
        # versioned models: base name -> {latest node, v -> node}
        "versions": {
            base: {
                "latest": getattr(project, "version_alias", {}).get(base),
                "versions": {str(v): c for v, c in vmap.items()},
            }
            for base, vmap in getattr(project, "model_versions", {}).items()
        },
        "nodes": nodes,
        "edges": edges,
        "sources": sources,
        "exposures": exposures,
        "seeds": {
            name: {
                "path": path,
                "relation": project.relation_for(name),
                # checksum of the seed CSV itself: state:modified treats
                # models ref'ing an edited seed as modified (a CI
                # rebuild-what-changed run must not skip them)
                "checksum": _file_checksum(path),
            }
            for name, path in getattr(project, "seeds", {}).items()
        },
        "snapshots": {
            name: {
                "relation": project.relation_for(name),
                "on": snap.relation,
                "strategy": snap.strategy,
                "unique_key": snap.unique_key,
            }
            for name, snap in getattr(project, "snapshots", {}).items()
        },
    }


def write_manifest(project: Project, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(build_manifest(project), f, indent=2)


def append_run_history(path: str, payload: dict[str, Any]) -> None:
    """Append one invocation record as a JSON line (append-mode: history
    survives across invocations, unlike run_results.json which is
    overwritten each run)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    record = {
        "invoked_at": datetime.now(timezone.utc).isoformat(timespec="seconds"),
        **payload,
    }
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def build_catalog(spark, runner) -> dict[str, Any]:
    """dbt `docs generate` equivalent: per-relation column schemas (from
    the session catalog — no data scan) + row counts as recorded by the
    run's write metrics."""
    out: dict[str, Any] = {}
    for r in runner.results:
        if r.status != "success":
            continue
        try:
            fields = spark.table(r.relation).schema.fields
        except Exception:  # noqa: BLE001 — e.g. seed/view dropped meanwhile
            continue
        out[r.relation] = {
            "model": r.name,
            "materialized": r.materialization,
            "rows": r.rows,
            "columns": [
                {"name": f.name, "type": f.dataType.simpleString()}
                for f in fields
            ],
        }
    return {"relations": out}


def write_catalog(spark, runner, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(build_catalog(spark, runner), f, indent=2)
