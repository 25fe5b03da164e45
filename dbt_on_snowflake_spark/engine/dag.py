"""Model DAG: edges from ref()/source(), topological execution order,
and dbt-style node selection (reference §2.9 O1/O4; selection syntax from
setup/task.sql:5 ``run --select customer_loyalty_metrics``).
"""

from __future__ import annotations

from graphlib import TopologicalSorter

from dbt_on_snowflake_spark.engine.project import Project


def build_graph(project: Project) -> dict[str, set[str]]:
    """model -> set of upstream models (sources and seeds are roots, not
    nodes — seeds are always materialized before any model runs)."""
    seeds = getattr(project, "seeds", {})
    graph: dict[str, set[str]] = {}
    for name, node in project.models.items():
        missing = [
            r for r in node.refs if r not in project.models and r not in seeds
        ]
        if missing:
            raise ValueError(f"model '{name}' refs unknown model(s): {missing}")
        graph[name] = {r for r in node.refs if r in project.models}
    return graph


def toposort(project: Project) -> list[str]:
    return list(TopologicalSorter(build_graph(project)).static_order())


def ancestors(graph: dict[str, set[str]], name: str) -> set[str]:
    seen: set[str] = set()
    stack = [name]
    while stack:
        cur = stack.pop()
        for up in graph.get(cur, ()):  # parents
            if up not in seen:
                seen.add(up)
                stack.append(up)
    return seen


def descendants(graph: dict[str, set[str]], name: str) -> set[str]:
    children: dict[str, set[str]] = {}
    for m, ups in graph.items():
        for u in ups:
            children.setdefault(u, set()).add(m)
    seen: set[str] = set()
    stack = [name]
    while stack:
        cur = stack.pop()
        for down in children.get(cur, ()):
            if down not in seen:
                seen.add(down)
                stack.append(down)
    return seen


def modified_models(project: Project, state: dict) -> set[str]:
    """Models whose file checksum differs from a prior manifest (or that
    are new) — dbt's state:modified comparison, powering CI builds that
    rebuild only what changed."""
    from dbt_on_snowflake_spark.engine.artifacts import _file_checksum

    prior = {
        name: node.get("checksum")
        for name, node in state.get("nodes", {}).items()
    }
    return {
        name
        for name, node in project.models.items()
        if prior.get(name) != _file_checksum(node.path)
    }


def select(
    project: Project, selector: str | None, state: dict | None = None
) -> list[str]:
    """Resolve a dbt-style selector to an ordered execution list.

    Supported: ``name`` (node + required ancestors, like dbt's default for
    a build), ``+name`` (ancestors + node), ``name+`` (node + descendants),
    ``+name+``, comma-separated union; ``state:modified`` /
    ``state:modified+`` (models changed vs the ``state`` manifest,
    optionally with descendants — requires ``state``); None = all models.
    """
    order = toposort(project)
    if not selector:
        return order
    graph = build_graph(project)
    wanted: set[str] = set()
    for part in selector.split(","):
        part = part.strip()
        trail = part.endswith("+")
        name = part.strip("+")
        if name == "state:modified":
            if state is None:
                raise ValueError(
                    "state:modified requires --state <manifest.json>"
                )
            for m in modified_models(project, state):
                wanted.add(m)
                wanted |= ancestors(graph, m)
                if trail:
                    wanted |= descendants(graph, m)
            continue
        if name not in project.models:
            raise ValueError(f"unknown model in selector: {name!r}")
        wanted.add(name)
        # a selected node always needs its ancestors materialized to run
        wanted |= ancestors(graph, name)
        if trail:
            wanted |= descendants(graph, name)
    return [m for m in order if m in wanted]
