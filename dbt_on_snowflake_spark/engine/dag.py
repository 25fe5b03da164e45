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
    snapshots = getattr(project, "snapshots", {})
    alias = getattr(project, "version_alias", {})
    graph: dict[str, set[str]] = {}
    for name, node in project.models.items():
        # a bare ref to a VERSIONED model resolves to its latest version
        refs = [alias.get(r, r) for r in node.refs]
        missing = [
            r
            for r in refs
            if r not in project.models and r not in seeds and r not in snapshots
        ]
        if missing:
            raise ValueError(f"model '{name}' refs unknown model(s): {missing}")
        graph[name] = {r for r in refs if r in project.models}
    return graph


def toposort(project: Project) -> list[str]:
    return list(TopologicalSorter(build_graph(project)).static_order())


def snapshot_ref_model(snap) -> str | None:
    """The upstream model of a ``ref('model')``-backed snapshot, or None
    for a source-backed one. Determines DAG placement in ``build``:
    source-backed snapshots run before the model pass, ref-backed ones
    after it (so they see this run's state, not last run's)."""
    import re

    m = re.match(r"\s*ref\(\s*['\"]([^'\"]+)['\"]\s*\)\s*$", snap.relation)
    return m.group(1) if m else None


def split_snapshot_atoms(
    project: Project, selector: str | None
) -> tuple[str | None, list[str]]:
    """Partition a dbt-style selector into (model-only selector,
    snapshot atoms). Snapshots are not model-graph nodes, so ``build``
    resolves their atoms out-of-band; a ``snap+`` atom's descendant
    MODELS (direct dependents, with their own +) are folded back into
    the model selector so downstream consumers rebuild."""
    snaps = getattr(project, "snapshots", {})
    if not selector or not snaps:
        return selector, []
    keep: list[str] = []
    snap_atoms: list[str] = []
    for atom in selector.split(","):
        atom = atom.strip()
        if atom.strip("+") in snaps:
            snap_atoms.append(atom)
            if atom.endswith("+"):
                name = atom.strip("+")
                keep.extend(
                    f"{m}+"
                    for m, node in project.models.items()
                    if name in node.refs
                )
        else:
            keep.append(atom)
    return (",".join(keep) if keep else None), snap_atoms


def select_snapshots(
    project: Project,
    selector: str | None,
    snap_atoms: list[str],
    snap_exclude_atoms: list[str],
    selected_models: set[str] | None,
) -> set[str]:
    """The snapshots a ``build`` invocation should run: all of them on an
    unnarrowed build; under a selection, the explicitly named ones plus
    any snapshot a selected model refs (a required ancestor — the model
    reads its table). Exclusion atoms remove by literal name."""
    snaps = set(getattr(project, "snapshots", {}))
    if selector is None:
        wanted = snaps
    else:
        wanted = {a.strip("+") for a in snap_atoms}
        for m in selected_models or ():
            wanted |= {r for r in project.models[m].refs if r in snaps}
    return wanted - {a.strip("+") for a in snap_exclude_atoms}


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
    rebuild only what changed. A model ref'ing a seed whose CSV checksum
    changed is modified too: its input data changed even though its own
    file didn't."""
    from dbt_on_snowflake_spark.engine.artifacts import (
        CHECKSUM_VERSION,
        _file_checksum,
        node_checksum,
    )

    prior_version = state.get("checksum_version", 1)
    if prior_version != CHECKSUM_VERSION:
        import sys

        print(
            f"state:modified: prior manifest uses checksum scheme "
            f"v{prior_version}, this engine writes v{CHECKSUM_VERSION} — "
            f"every model will be flagged modified this once; re-written "
            f"manifests compare normally",
            file=sys.stderr,
        )

    prior = {
        name: node.get("checksum")
        for name, node in state.get("nodes", {}).items()
    }
    prior_seeds = {
        name: s.get("checksum") for name, s in state.get("seeds", {}).items()
    }
    seeds = getattr(project, "seeds", {})
    changed_seeds = {
        name
        for name, path in seeds.items()
        if prior_seeds.get(name) != _file_checksum(path)
    }
    return {
        name
        for name, node in project.models.items()
        if prior.get(name) != node_checksum(project, name)
        or any(r in changed_seeds for r in node.refs)
    }


def model_tags(project: Project, name: str) -> set[str]:
    """Tags on a model: in-model ``{{ config(tags='a,b') }}`` plus the
    per-directory ``tags:`` block in project.yml (dbt's two tag sources)."""
    node = project.models[name]
    tags: set[str] = set()
    raw = node.config.get("tags")
    if raw:
        cleaned = str(raw).strip("[]").replace("'", "").replace('"', "")
        tags |= {t.strip() for t in cleaned.split(",") if t.strip()}
    per_dir = project.config.get("models", {}).get(node.subdir, {}) or {}
    dir_tags = per_dir.get("tags")
    if isinstance(dir_tags, str):
        tags |= {t.strip() for t in dir_tags.split(",") if t.strip()}
    elif isinstance(dir_tags, list):
        tags |= {str(t).strip() for t in dir_tags}
    return tags


def _expand_part(
    project: Project,
    graph: dict[str, set[str]],
    part: str,
    state: dict | None,
    implicit_ancestors: bool,
) -> set[str]:
    """Resolve one selector atom (``[+]name|tag:t|state:modified[+]``) to a
    node set. Selection implicitly adds ancestors (a selected node needs
    them materialized to run); exclusion (dbt --exclude) resolves the atom
    literally — only an explicit leading ``+`` pulls in ancestors."""
    part = part.strip()
    lead = part.startswith("+")
    trail = part.endswith("+")
    name = part.strip("+")
    if name.startswith("selector:"):
        # a named selectors.yml definition; resolves as written (its own
        # atoms carry their own +/implicit-ancestor behavior), so a
        # leading/trailing + on the reference itself is rejected
        if lead or trail:
            raise ValueError(
                f"selector reference {part!r} cannot take +; put the + on "
                "atoms inside the named definition"
            )
        sel = name[len("selector:"):]
        if sel not in project.selectors:
            raise ValueError(f"unknown selector: {sel!r} (selectors.yml)")
        return _resolve_selector_def(
            project, graph, project.selectors[sel], state, implicit_ancestors
        )
    if name == "state:modified":
        if state is None:
            raise ValueError("state:modified requires --state <manifest.json>")
        base = modified_models(project, state)
    elif name.startswith("exposure:"):
        # an exposure selects its declared model dependencies (dbt:
        # `--select +exposure:dash` builds everything a dashboard needs;
        # ancestors then come from the implicit/+ expansion below)
        exp = name[len("exposure:"):]
        by_name = {e.name: e for e in getattr(project, "exposures", [])}
        if exp not in by_name:
            raise ValueError(f"unknown exposure: {exp!r}")
        base = set(by_name[exp].model_refs)
    elif name.startswith("tag:"):
        tag = name[4:]
        base = {m for m in project.models if tag in model_tags(project, m)}
    elif name.startswith("group:"):
        # dbt group selector: every model belonging to the owner group
        grp = name[len("group:"):]
        if grp not in getattr(project, "groups", {}):
            raise ValueError(f"unknown group: {grp!r}")
        base = {
            m
            for m, g in getattr(project, "model_group", {}).items()
            if g == grp
        }
    else:
        if name not in project.models:
            # a versioned model's BASE name selects like ref(): the
            # latest version's node (dbt: `--select dim` works whether
            # or not dim is versioned)
            aliased = getattr(project, "version_alias", {}).get(name)
            if aliased is None:
                raise ValueError(f"unknown model in selector: {name!r}")
            name = aliased
        base = {name}
    out = set(base)
    for m in base:
        if lead or implicit_ancestors:
            out |= ancestors(graph, m)
        if trail:
            out |= descendants(graph, m)
    return out


def _resolve_selector_def(
    project: Project,
    graph: dict[str, set[str]],
    defn,
    state: dict | None,
    implicit_ancestors: bool,
) -> set[str]:
    """Resolve one selectors.yml definition node: an atom string, a list
    (implicit union), or a dict of ``union:``/``intersection:`` over
    nested definitions with an optional ``exclude:`` (subtracted AFTER
    the combination; exclude atoms resolve literally, like --exclude).
    A string uses the full --select grammar (comma = union)."""
    if isinstance(defn, str):
        out: set[str] = set()
        for atom in defn.split(","):
            out |= _expand_part(
                project, graph, atom, state, implicit_ancestors
            )
        return out
    if isinstance(defn, list):
        out: set[str] = set()
        for item in defn:
            out |= _resolve_selector_def(
                project, graph, item, state, implicit_ancestors
            )
        return out
    if isinstance(defn, dict):
        keys = [k for k in ("union", "intersection") if k in defn]
        if len(keys) != 1:
            raise ValueError(
                "selector definition dict needs exactly one of "
                f"'union'/'intersection', got {sorted(defn)}"
            )
        parts = [
            _resolve_selector_def(project, graph, d, state, implicit_ancestors)
            for d in defn[keys[0]]
        ]
        base: set[str] = set()
        if parts:
            base = (
                set.union(*parts) if keys[0] == "union"
                else set.intersection(*parts)
            )
        for excl in defn.get("exclude", []) or []:
            base -= _resolve_selector_def(project, graph, excl, state, False)
        return base
    raise ValueError(f"unsupported selector definition: {defn!r}")


def select(
    project: Project,
    selector: str | None,
    state: dict | None = None,
    exclude: str | None = None,
    implicit_ancestors: bool = True,
) -> list[str]:
    """Resolve a dbt-style selector to an ordered execution list.

    Supported atoms (comma-separated union): ``name`` (node + required
    ancestors, like dbt's default for a build), ``+name`` (ancestors +
    node), ``name+`` (node + descendants), ``+name+``, ``tag:nightly``
    (every model carrying the tag), ``state:modified`` /
    ``state:modified+`` (models changed vs the ``state`` manifest —
    requires ``state``); None = all models. ``exclude`` takes the same
    grammar and subtracts its resolved set AFTER selection (dbt
    --exclude); excluded atoms resolve literally (no implicit ancestors),
    so ``--select tag:staging --exclude stg_orders`` drops exactly that
    model.

    ``implicit_ancestors=False`` resolves selection atoms literally (only
    an explicit ``+`` pulls ancestors) — the ``--defer`` mode, where
    unselected parents are read from the deferred namespace instead of
    being rebuilt.
    """
    order = toposort(project)
    graph = build_graph(project)
    if not selector:
        wanted = set(order)
    else:
        wanted = set()
        for part in selector.split(","):
            wanted |= _expand_part(
                project, graph, part, state, implicit_ancestors
            )
    if exclude:
        for part in exclude.split(","):
            wanted -= _expand_part(project, graph, part, state, False)
    return [m for m in order if m in wanted]
