"""Project loading: models directory scan + config tree + profiles
(reference §2.9 O1/O3/O5; dbt_project.yml:1-25, profiles.yml:1-19).

A project directory looks like:

    project.yml          # name, model config, packages: [paths]
    profiles.yml         # targets: dev/prod -> database/schema namespace
    sources.yml          # source groups -> tables (+ tests, freshness)
    macros/*.sql         # {% macro %} definitions (optional)
    models/
      staging/*.sql      # SQL models ({{ ref }}/{{ source }} Jinja-lite)
      marts/*.sql
      marts/*.py         # Python models: def model(ctx, spark) -> DataFrame

Packages (reference dbt/packages.yml:2-3 — dbt_utils): ``project.yml``
lists ``packages: [<path>, ...]`` (relative to the project root). A
package directory may contribute:

    macros/*.sql         # macros callable from any model
    tests/*.py           # generic tests: public fns (df, column, ...) ->
                         #   failing-rows DataFrame, registered by name
    models/**/*.sql|.py  # extra models merged into the project DAG

Namespaces: models materialize into ``<schema>_<name>`` relation names in
the Spark session catalog (the reference's custom generate_schema_name
macro resolves a *literal* schema per target; Spark temp views have a flat
namespace, so the target schema becomes a name prefix — same resolution
logic, different catalog shape).
"""

from __future__ import annotations

import importlib.util
import inspect
import os
from dataclasses import dataclass, field
from typing import Any, Callable

import yaml

from dbt_on_snowflake_spark.engine.compile import (
    expand_macros,
    extract_config,
    extract_deps,
    extract_macros,
)


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
    # originating package name; "" = the root project. Drives the
    # `access: protected` boundary (cross-package refs rejected).
    package: str = ""


@dataclass
class ModelTests:
    """YAML-declared tests on a MODEL (dbt schema.yml under models/) —
    same test taxonomy as sources, applied to the materialized relation.
    Also carries the model's CONTRACT declaration (dbt `config: contract:
    enforced: true` + per-column `data_type`), enforced at build time by
    ``Runner._enforce_contract``."""

    name: str
    columns: dict[str, list] = field(default_factory=dict)
    tests: list = field(default_factory=list)
    contract_enforced: bool = False
    column_types: dict[str, str] = field(default_factory=dict)


@dataclass
class Exposure:
    """dbt exposure: a declared downstream consumer (dashboard, ML job,
    application) of models/sources — surfaces in the manifest so lineage
    extends past the warehouse edge, and selectable as
    ``+exposure:<name>`` (reference README.md:163-187's monitoring story
    ends at run results; exposures say WHO breaks when a mart does)."""

    name: str
    type: str  # dashboard | notebook | analysis | ml | application
    model_refs: list[str] = field(default_factory=list)
    source_refs: list[tuple[str, str]] = field(default_factory=list)
    owner: dict[str, Any] = field(default_factory=dict)
    url: str | None = None
    description: str | None = None


@dataclass
class SourceTable:
    group: str
    name: str
    path: str  # parquet/csv location
    format: str = "parquet"
    columns: dict[str, list[dict[str, Any]]] = field(default_factory=dict)
    tests: list[dict[str, Any]] = field(default_factory=list)
    loaded_at_field: str | None = None
    # dbt freshness block: {"warn_after": {"count": N, "period":
    # "minute|hour|day"}, "error_after": {...}}; table-level overrides
    # group-level, None = engine defaults
    freshness: dict[str, Any] | None = None


@dataclass
class SnapshotNode:
    """A dbt 1.9-style YAML-defined snapshot (snapshots.yml): SCD2
    change tracking over a ref()/source() relation. ``strategy`` is
    ``check`` (column-hash comparison over ``check_cols``; 'all' =
    every non-key column) or ``timestamp`` (trust the source system's
    ``updated_at`` clock)."""

    name: str
    relation: str  # "source('g','t')" or "ref('model')"
    unique_key: str
    strategy: str = "check"
    check_cols: Any = "all"  # list[str] | "all"
    updated_at: str | None = None


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
        self.macros = {}
        # dbt SQL generic tests ({% test %} blocks in tests/generic/*.sql)
        self.sql_tests: dict[str, Any] = {}
        self.package_tests: dict[str, Callable] = {}
        self._package_model_dirs: list[tuple[str, str]] = []
        self._package_restrict: dict[str, bool] = {}
        self._load_packages()
        self.models = self._discover_models()
        # dbt model versions: loaded right after discovery so schema.yml
        # loaders below can expand a versioned entry onto its concrete
        # <name>_v<N> nodes, and ref('name') can alias to the latest
        self.model_versions, self.version_alias = self._load_versions()
        self.sources = self._load_sources()
        self.model_tests = self._load_model_tests()
        self.unit_tests = self._load_unit_tests()
        self.exposures = self._load_exposures()
        # dbt governance (groups + access): loaded AFTER model_tests so
        # well-formedness (known models, no duplicate declarations) is
        # already guaranteed; enforced at parse time like dbt
        self.groups, self.model_group, self.model_access = (
            self._load_governance()
        )
        self._enforce_access()
        self.seeds = self._discover_seeds()
        self.snapshots = self._load_snapshots()
        self.selectors = self._load_selectors()
        self.analyses = self._discover_analyses()
        # ref() resolves seeds before models, so a shared name would
        # silently shadow the model — reject at discovery, mirroring the
        # duplicate-model guard
        clash = sorted(set(self.seeds) & set(self.models))
        if clash:
            raise ValueError(
                f"seed/model name collision: {clash} (a seed would shadow "
                f"the model at ref() sites); rename one of them"
            )

    def _load_selectors(self) -> dict[str, Any]:
        """dbt ``selectors.yml``: named, version-controlled selection
        definitions (``selectors: [{name, description, definition}]``).
        A definition is an atom string of the --select grammar, a list
        (implicit union), or a dict with ``union:``/``intersection:`` of
        nested definitions plus an optional ``exclude:`` list; invoked as
        ``--selector <name>`` (or the ``selector:<name>`` atom)."""
        path = os.path.join(self.root, "selectors.yml")
        if not os.path.exists(path):
            return {}
        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        out: dict[str, Any] = {}
        for entry in doc.get("selectors", []):
            if "name" not in entry or "definition" not in entry:
                raise ValueError(
                    "selectors.yml entries need 'name' and 'definition'"
                )
            out[entry["name"]] = entry["definition"]
        return out

    def _discover_seeds(self) -> dict[str, str]:
        """dbt seeds: <root>/seeds/*.csv, loaded as tables and valid
        ``ref()`` targets (they are DAG roots — always materialized before
        any model runs)."""
        sdir = os.path.join(self.root, "seeds")
        if not os.path.isdir(sdir):
            return {}
        return {
            os.path.splitext(fn)[0]: os.path.join(sdir, fn)
            for fn in sorted(os.listdir(sdir))
            if fn.endswith(".csv")
        }

    # -- packages ----------------------------------------------------------
    @staticmethod
    def _package_identity(pkg_root: str) -> tuple[str, str | None]:
        """(name, version) from the package's own project.yml, falling back
        to the directory name (unversioned path package)."""
        name = os.path.basename(os.path.normpath(pkg_root))
        version = None
        py = os.path.join(pkg_root, "project.yml")
        if os.path.isfile(py):
            with open(py) as f:
                cfg = yaml.safe_load(f) or {}
            name = cfg.get("name", name)
            if cfg.get("version") is not None:
                version = str(cfg["version"])
        return name, version

    @staticmethod
    def _package_sha(pkg_root: str) -> str:
        """Deterministic content hash over the package's contributed files
        (macros/tests/models) — the lockfile's integrity field."""
        import hashlib

        h = hashlib.sha256()
        for sub in ("macros", "tests", "models"):
            d = os.path.join(pkg_root, sub)
            if not os.path.isdir(d):
                continue
            for dirpath, dirnames, filenames in sorted(os.walk(d)):
                dirnames.sort()
                for fn in sorted(filenames):
                    if fn.endswith((".sql", ".py", ".yml")):
                        p = os.path.join(dirpath, fn)
                        h.update(os.path.relpath(p, pkg_root).encode())
                        with open(p, "rb") as f:
                            h.update(f.read())
        return h.hexdigest()[:16]

    def _check_and_write_lock(self, pkgs: list[tuple[str, str | None, str, str]]) -> None:
        """Validate resolved packages against <root>/package-lock.yml and
        (re)write it — the engine's equivalent of the reference's pinned
        dbt/package-lock.yml:1-4 (name + version + content sha). The lock
        lives at the PROJECT ROOT, next to project.yml, so it is
        version-controlled and survives a fresh checkout / CI target wipe
        (the reference pins it the same way; target/ is gitignored). A
        version bump is an intentional re-resolve and re-locks cleanly;
        only content changing WITHOUT a version bump is a hard error — CI
        must not silently run different code under the same version."""
        lock_path = os.path.join(self.root, "package-lock.yml")
        legacy_path = os.path.join(self.root, "target", "package-lock.yml")
        read_path = lock_path if os.path.isfile(lock_path) else legacy_path
        locked: dict[str, dict] = {}
        if os.path.isfile(read_path):
            with open(read_path) as f:
                doc = yaml.safe_load(f) or {}
            locked = {p["name"]: p for p in doc.get("packages", [])}
        for name, version, sha, _root in pkgs:
            prev = locked.get(name)
            if not prev:
                continue
            if prev.get("version") != version:
                continue  # explicit version bump: accept and re-lock below
            if prev.get("sha") != sha:
                raise ValueError(
                    f"package {name!r} content changed without a version "
                    f"bump (lock sha {prev.get('sha')}, found {sha}); bump "
                    f"the package version or delete package-lock.yml"
                )
        if pkgs:
            with open(lock_path, "w") as f:
                yaml.safe_dump(
                    {
                        "packages": [
                            {"name": n, "version": v, "sha": s, "path": r}
                            for n, v, s, r in pkgs
                        ]
                    },
                    f,
                    sort_keys=False,
                )

    def _load_packages(self) -> None:
        """Load macros/tests/models from the project itself and every
        listed package (deterministic order; later packages and the
        project's own macros win name clashes — dbt dispatch order)."""
        roots = []
        for entry in self.config.get("packages", []) or []:
            p = entry.get("path") if isinstance(entry, dict) else entry
            pkg_root = p if os.path.isabs(p) else os.path.join(self.root, p)
            if not os.path.isdir(pkg_root):
                raise ValueError(f"package path does not exist: {pkg_root}")
            roots.append(pkg_root)
        self._check_and_write_lock(
            [(*self._package_identity(r), self._package_sha(r), r) for r in roots]
        )
        roots.append(self.root)  # project-level macros/ override packages
        for pkg_root in roots:
            mdir = os.path.join(pkg_root, "macros")
            if os.path.isdir(mdir):
                for fn in sorted(os.listdir(mdir)):
                    if fn.endswith(".sql"):
                        with open(os.path.join(mdir, fn)) as f:
                            self.macros.update(extract_macros(f.read()))
            gdir = os.path.join(pkg_root, "tests", "generic")
            if os.path.isdir(gdir):
                from dbt_on_snowflake_spark.engine.compile import (
                    extract_sql_tests,
                )

                for fn in sorted(os.listdir(gdir)):
                    if fn.endswith(".sql"):
                        with open(os.path.join(gdir, fn)) as f:
                            self.sql_tests.update(extract_sql_tests(f.read()))
            tdir = os.path.join(pkg_root, "tests")
            if os.path.isdir(tdir) and pkg_root != self.root:
                for fn in sorted(os.listdir(tdir)):
                    if fn.endswith(".py") and not fn.startswith("_"):
                        self.package_tests.update(
                            _load_test_module(os.path.join(tdir, fn))
                        )
            if pkg_root != self.root and os.path.isdir(
                os.path.join(pkg_root, "models")
            ):
                pkg_name = self._package_identity(pkg_root)[0]
                self._package_model_dirs.append(
                    (pkg_name, os.path.join(pkg_root, "models"))
                )
                # dbt restrict-access: a package opts IN to having its
                # protected models blocked from cross-package refs
                py = os.path.join(pkg_root, "project.yml")
                restrict = False
                if os.path.isfile(py):
                    with open(py) as f:
                        restrict = bool(
                            (yaml.safe_load(f) or {}).get("restrict-access")
                        )
                self._package_restrict[pkg_name] = restrict

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
    def _discover_analyses(self) -> dict[str, str]:
        """dbt ANALYSES (reference ``dbt/dbt_project.yml:9``
        ``analysis-paths: [analysis]``): SQL files that are Jinja-
        compiled with full ref()/source() resolution but NEVER
        materialized — ad-hoc investigation queries versioned next to
        the models. Discovered from every dir in ``analysis-paths``
        (default ``[analyses]``, dbt's default); ``compile`` writes
        their resolved SQL under ``target/compiled/analyses/``. A name
        collision among analyses is an error (the model-discovery
        posture); models and analyses live in separate namespaces
        (analyses are not ref()-able)."""
        # an EXPLICIT empty list means "no analysis dirs" (dbt
        # semantics); only an absent key falls back to the default
        paths = self.config.get("analysis-paths")
        if paths is None:
            paths = ["analyses"]
        if not isinstance(paths, list) or not all(
            isinstance(p, str) for p in paths
        ):
            # a scalar (`analysis-paths: analysis`) would iterate as
            # CHARACTERS and silently discover nothing — refuse
            # malformed config outright (the clean-targets posture)
            raise ValueError(
                f"analysis-paths must be a YAML list of paths, got "
                f"{paths!r}"
            )
        out: dict[str, str] = {}
        for p in paths:
            adir = p if os.path.isabs(p) else os.path.join(self.root, p)
            if not os.path.isdir(adir):
                continue
            for dirpath, _dirs, files in os.walk(adir):
                for fn in sorted(files):
                    name, ext = os.path.splitext(fn)
                    if ext != ".sql":
                        continue
                    if name in out:
                        raise ValueError(
                            f"duplicate analysis name {name!r} under "
                            f"{paths}"
                        )
                    with open(os.path.join(dirpath, fn)) as f:
                        # stored RAW: macro expansion happens at
                        # compile time (compile_analysis below), so a
                        # malformed macro call in an ad-hoc analysis
                        # fails `compile` — never `run`/`test`/`clean`
                        # (r12 review: project load must not couple
                        # model commands to scratch SQL)
                        out[name] = f.read()
        return out

    def compile_analysis(self, name: str) -> str:
        """The analysis body with project macros expanded — the
        compile command renders ref()/source()/vars over this."""
        return expand_macros(self.analyses[name], self.macros)

    def _discover_models(self) -> dict[str, ModelNode]:
        models: dict[str, ModelNode] = {}
        for package, mdir in [
            ("", os.path.join(self.root, "models")),
            *self._package_model_dirs,
        ]:
            self._scan_model_dir(mdir, models, package)
        return models

    def _scan_model_dir(
        self, mdir: str, models: dict[str, ModelNode], package: str = ""
    ) -> None:
        for dirpath, _dirs, files in os.walk(mdir):
            subdir = os.path.relpath(dirpath, mdir).split(os.sep)[0]
            for fn in sorted(files):
                path = os.path.join(dirpath, fn)
                name, ext = os.path.splitext(fn)
                if ext in (".sql", ".py") and name in models:
                    raise ValueError(
                        f"duplicate model name {name!r}: {path} vs "
                        f"{models[name].path}"
                    )
                if ext == ".sql":
                    with open(path) as f:
                        body = f.read()
                    # macros expand BEFORE dependency extraction so refs/
                    # sources inside macro bodies join the DAG
                    body = expand_macros(body, self.macros)
                    refs, sources = extract_deps(body)
                    cfg = extract_config(body)
                    models[name] = ModelNode(
                        name, path, "sql", subdir, body, refs, sources, cfg,
                        package=package,
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
                    # dbt python models declare config with dbt.config(...)
                    # parsed statically; same here for ctx.config(...) —
                    # string AND integer literal kwargs (materialized,
                    # token_count, bucket_by, buckets, ...), read before
                    # the model executes. Without the int capture a
                    # `ctx.config(bucket_by='k', buckets=8)` silently
                    # dropped `buckets` and fell back to the default.
                    cfg = {}
                    mcfg = re.search(r"\bctx\.config\(([^)]*)\)", body)
                    if mcfg:
                        for k, sval, ival in re.findall(
                            r"(\w+)\s*=\s*(?:['\"]([^'\"]*)['\"]|(\d+))",
                            mcfg.group(1),
                        ):
                            cfg[k] = int(ival) if ival else sval
                    models[name] = ModelNode(
                        name, path, "python", subdir, None, refs, list(srcs),
                        cfg, package=package,
                    )

    def config_for(self, node: ModelNode, key: str, default=None):
        """Model config resolution, in-model over per-dir project.yml —
        the same precedence materialization_for uses, for ANY key (e.g.
        ``token_count``)."""
        if key in node.config:
            return node.config[key]
        per_dir = self.config.get("models", {}).get(node.subdir, {})
        if isinstance(per_dir, dict) and key in per_dir:
            return per_dir[key]
        return default

    def materialization_for(self, node: ModelNode) -> str:
        if "materialized" in node.config:
            return node.config["materialized"]
        per_dir = self.config.get("models", {}).get(node.subdir, {})
        return per_dir.get("materialized", "view")

    # -- sources ----------------------------------------------------------
    def _load_model_tests(self) -> dict[str, ModelTests]:
        """dbt schema.yml files under models/: any ``*.yml`` with a
        ``models:`` key declares column- and table-level tests on models
        (same taxonomy as source tests; run by ``test``/``build``)."""
        out: dict[str, ModelTests] = {}
        mdir = os.path.join(self.root, "models")
        if not os.path.isdir(mdir):
            return out
        for dirpath, dirnames, filenames in sorted(os.walk(mdir)):
            dirnames.sort()
            for fn in sorted(filenames):
                if not fn.endswith((".yml", ".yaml")):
                    continue
                with open(os.path.join(dirpath, fn)) as f:
                    doc = yaml.safe_load(f) or {}
                for m in doc.get("models", []) or []:
                    name = m["name"]
                    if (
                        name not in self.models
                        and name not in self.model_versions
                    ):
                        raise ValueError(
                            f"{fn}: tests declared for unknown model {name!r}"
                        )
                    if name in out:
                        raise ValueError(
                            f"{fn}: duplicate test declaration for model "
                            f"{name!r}"
                        )
                    contract = (m.get("config") or {}).get("contract") or {}
                    enforced = bool(contract.get("enforced"))
                    column_types = {
                        c["name"]: str(c["data_type"]).lower()
                        for c in m.get("columns", [])
                        if c.get("data_type") is not None
                    }
                    if enforced:
                        missing = [
                            c["name"]
                            for c in m.get("columns", [])
                            if c.get("data_type") is None
                        ]
                        if missing:
                            raise ValueError(
                                f"{fn}: model {name!r} declares an enforced "
                                f"contract but columns {missing} have no "
                                "data_type"
                            )
                    # a versioned entry's tests/contract apply to EVERY
                    # version node (dbt: the declaration is per model,
                    # the relations are per version)
                    for target in self._version_targets(name):
                        out[target] = ModelTests(
                            name=target,
                            columns={
                                c["name"]: c.get("tests", [])
                                for c in m.get("columns", [])
                            },
                            tests=m.get("tests", []),
                            contract_enforced=enforced,
                            column_types=column_types,
                        )
        return out

    def _load_versions(
        self,
    ) -> tuple[dict[str, dict[int, str]], dict[str, str]]:
        """dbt model versions (the contract-evolution surface added in
        dbt 1.6): a schema.yml entry declares

            models:
              - name: m
                latest_version: 2       # default: highest v
                versions: [{v: 1}, {v: 2}]

        with one FILE per version named ``<model>_v<N>.sql`` (each is a
        normal discovered node; ``defined_in`` renames are deliberately
        unsupported — the fixed convention keeps ref rewriting static).
        ``ref('m')`` resolves to the latest version's node;
        ``ref('m', v=1)`` pins — both normalized by engine.compile.

        Returns (base -> {v: concrete node}, base -> latest node)."""
        versions: dict[str, dict[int, str]] = {}
        alias: dict[str, str] = {}
        for dirpath, dirnames, filenames in self._walk_all_model_dirs():
            dirnames.sort()
            for fn in sorted(filenames):
                if not fn.endswith((".yml", ".yaml")):
                    continue
                with open(os.path.join(dirpath, fn)) as f:
                    doc = yaml.safe_load(f) or {}
                for m in doc.get("models", []) or []:
                    if not m.get("versions"):
                        continue
                    name = m["name"]
                    if name in self.models:
                        raise ValueError(
                            f"{fn}: versioned model {name!r} collides with "
                            f"an unversioned file of the same name; version "
                            f"files must be named {name}_v<N>.sql"
                        )
                    if name in versions:
                        raise ValueError(
                            f"{fn}: duplicate versions declaration for "
                            f"{name!r}"
                        )
                    vmap: dict[int, str] = {}
                    for entry in m["versions"]:
                        if "defined_in" in entry:
                            raise ValueError(
                                f"{fn}: model {name!r}: defined_in is not "
                                f"supported; name the file "
                                f"{name}_v{entry.get('v')}.sql"
                            )
                        num = int(entry["v"])
                        concrete = f"{name}_v{num}"
                        if concrete not in self.models:
                            raise ValueError(
                                f"{fn}: model {name!r} declares v{num} but "
                                f"{concrete}.sql does not exist"
                            )
                        vmap[num] = concrete
                    latest = int(m.get("latest_version", max(vmap)))
                    if latest not in vmap:
                        raise ValueError(
                            f"{fn}: model {name!r} latest_version "
                            f"{latest} is not among its versions "
                            f"{sorted(vmap)}"
                        )
                    versions[name] = vmap
                    alias[name] = vmap[latest]
        return versions, alias

    def _walk_all_model_dirs(self):
        """os.walk over the root models/ dir AND every installed
        package's models/ dir — a package's own schema.yml can declare
        its models' governance (access/group) and versions, exactly as
        dbt honors package-side yml (under restrict-access the package
        is the ONLY place its models can be opened up)."""
        dirs = [os.path.join(self.root, "models")] + [
            d for _, d in self._package_model_dirs
        ]
        for mdir in dirs:
            if not os.path.isdir(mdir):
                continue
            yield from sorted(os.walk(mdir))

    def _version_targets(self, name: str) -> list[str]:
        """Concrete node names a schema.yml model entry applies to: the
        version nodes for a versioned entry, else the entry itself."""
        if name in self.model_versions:
            return [c for _, c in sorted(self.model_versions[name].items())]
        return [name]

    def _load_governance(
        self,
    ) -> tuple[dict[str, dict], dict[str, str], dict[str, str]]:
        """dbt model governance (the multi-team surface added in dbt 1.5):

        - ``groups:`` entries in any models/**/*.yml declare a named
          owner group (``{name, owner: {name, email}}``);
        - a model's yml entry may carry ``group: <name>`` (membership)
          and ``access: private|protected|public``.

        Returns (groups, model->group, model->access). Defaults follow
        dbt: no group, ``protected`` access (ref-able within the same
        package only). Validation here, enforcement in
        ``_enforce_access``. Governance is metadata, not logic, so it is
        deliberately NOT part of the state:modified checksum basis."""
        groups: dict[str, dict] = {}
        model_group: dict[str, str] = {}
        model_access: dict[str, str] = {}
        for dirpath, dirnames, filenames in self._walk_all_model_dirs():
            dirnames.sort()
            for fn in sorted(filenames):
                if not fn.endswith((".yml", ".yaml")):
                    continue
                with open(os.path.join(dirpath, fn)) as f:
                    doc = yaml.safe_load(f) or {}
                for g in doc.get("groups", []) or []:
                    if "name" not in g:
                        raise ValueError(f"{fn}: group entry needs 'name'")
                    if g["name"] in groups:
                        raise ValueError(
                            f"{fn}: duplicate group {g['name']!r}"
                        )
                    groups[g["name"]] = {"owner": g.get("owner") or {}}
                for m in doc.get("models", []) or []:
                    name = m["name"]
                    # a versioned entry's governance applies to every
                    # version node, like its tests/contract
                    for target in self._version_targets(name):
                        if m.get("group") is not None:
                            model_group[target] = str(m["group"])
                        if m.get("access") is not None:
                            access = str(m["access"])
                            if access not in (
                                "private", "protected", "public"
                            ):
                                raise ValueError(
                                    f"{fn}: model {name!r} access must be "
                                    f"private|protected|public, got "
                                    f"{access!r}"
                                )
                            model_access[target] = access
        for name, grp in model_group.items():
            if grp not in groups:
                raise ValueError(
                    f"model {name!r} declares group {grp!r} but no such "
                    f"group is defined (add a groups: entry)"
                )
        for name, access in model_access.items():
            if access == "private" and name not in model_group:
                raise ValueError(
                    f"model {name!r} is access: private but has no group — "
                    f"private restricts refs to the model's own group"
                )
        return groups, model_group, model_access

    def _enforce_access(self) -> None:
        """dbt ref-boundary enforcement, at parse time:

        - ``private``   -> ref-able only from models in the SAME group;
        - ``protected`` (default) -> ref-able from the same package; a
          CROSS-package ref is rejected only when the owning package
          opts in with ``restrict-access: true`` in its project.yml
          (dbt semantics — without the opt-in, packages are libraries
          and their models are ref-able);
        - ``public``    -> ref-able from anywhere.
        """
        for name, node in self.models.items():
            for ref in node.refs:
                # a bare ref to a versioned model governs as its latest
                ref = self.version_alias.get(ref, ref)
                if ref not in self.models:
                    continue  # seeds / unknown handled elsewhere
                up = self.models[ref]
                access = self.model_access.get(ref, "protected")
                if access == "public":
                    continue
                if access == "private":
                    if self.model_group.get(name) != self.model_group.get(
                        ref
                    ):
                        raise ValueError(
                            f"model {name!r} cannot ref private model "
                            f"{ref!r}: {ref!r} belongs to group "
                            f"{self.model_group.get(ref)!r}, {name!r} to "
                            f"{self.model_group.get(name)!r}"
                        )
                elif (
                    node.package != up.package
                    and self._package_restrict.get(up.package, False)
                ):
                    raise ValueError(
                        f"model {name!r} (package "
                        f"{node.package or 'root'!r}) cannot ref protected "
                        f"model {ref!r} (package {up.package!r} sets "
                        f"restrict-access); declare {ref!r} access: public "
                        f"to allow cross-package refs"
                    )

    def _load_unit_tests(self) -> list:
        """dbt ``unit_tests:`` declarations in any models/**/*.yml —
        mock-input tests over compiled model SQL (engine.unit_tests)."""
        from dbt_on_snowflake_spark.engine.unit_tests import parse_unit_tests

        out: list = []
        seen: set[str] = set()
        mdir = os.path.join(self.root, "models")
        if not os.path.isdir(mdir):
            return out
        for dirpath, dirnames, filenames in sorted(os.walk(mdir)):
            dirnames.sort()
            for fn in sorted(filenames):
                if not fn.endswith((".yml", ".yaml")):
                    continue
                with open(os.path.join(dirpath, fn)) as f:
                    doc = yaml.safe_load(f) or {}
                for ut in parse_unit_tests(doc, self.models, fn):
                    if ut.name in seen:
                        raise ValueError(
                            f"{fn}: duplicate unit test name {ut.name!r}"
                        )
                    seen.add(ut.name)
                    out.append(ut)
        return out

    _EXPOSURE_TYPES = ("dashboard", "notebook", "analysis", "ml", "application")

    def _load_exposures(self) -> list[Exposure]:
        """dbt ``exposures:`` in any models/**/*.yml: declared downstream
        consumers with ``depends_on`` entries in ref()/source() syntax,
        validated against the project's models and sources at load. The
        dep grammar is the unit-test input grammar — one regex, not two
        drifting copies."""
        from dbt_on_snowflake_spark.engine.unit_tests import _INPUT_RE

        out: list[Exposure] = []
        seen: set[str] = set()
        mdir = os.path.join(self.root, "models")
        if not os.path.isdir(mdir):
            return out
        for dirpath, dirnames, filenames in sorted(os.walk(mdir)):
            dirnames.sort()
            for fn in sorted(filenames):
                if not fn.endswith((".yml", ".yaml")):
                    continue
                with open(os.path.join(dirpath, fn)) as f:
                    doc = yaml.safe_load(f) or {}
                for e in doc.get("exposures", []) or []:
                    name, etype = e["name"], e.get("type", "dashboard")
                    if name in seen:
                        raise ValueError(
                            f"{fn}: duplicate exposure {name!r}"
                        )
                    if etype not in self._EXPOSURE_TYPES:
                        raise ValueError(
                            f"{fn}: exposure {name!r} has unknown type "
                            f"{etype!r} (one of {self._EXPOSURE_TYPES})"
                        )
                    model_refs, source_refs = [], []
                    for dep in e.get("depends_on", []) or []:
                        m = _INPUT_RE.match(str(dep))
                        if m and m.group(1):
                            if m.group(1) not in self.models:
                                raise ValueError(
                                    f"{fn}: exposure {name!r} depends on "
                                    f"unknown model {m.group(1)!r}"
                                )
                            model_refs.append(m.group(1))
                        elif m:
                            key = (m.group(2), m.group(3))
                            if key not in self.sources:
                                raise ValueError(
                                    f"{fn}: exposure {name!r} depends on "
                                    f"unknown source {key!r}"
                                )
                            source_refs.append(key)
                        else:
                            raise ValueError(
                                f"{fn}: exposure {name!r}: depends_on "
                                "entries must be ref('m') or "
                                f"source('g', 't'), got {dep!r}"
                            )
                    seen.add(name)
                    out.append(
                        Exposure(
                            name=name,
                            type=etype,
                            model_refs=model_refs,
                            source_refs=source_refs,
                            owner=e.get("owner") or {},
                            url=e.get("url"),
                            description=e.get("description"),
                        )
                    )
        return out

    def _load_snapshots(self) -> dict[str, "SnapshotNode"]:
        """snapshots.yml -> SnapshotNode map (dbt 1.9 YAML snapshots).
        Validated at parse time like models: unknown strategies, a
        timestamp strategy without updated_at, and name collisions with
        models/seeds are load errors, not run failures."""
        path = os.path.join(self.root, "snapshots.yml")
        out: dict[str, SnapshotNode] = {}
        if not os.path.exists(path):
            return out
        with open(path) as f:
            doc = yaml.safe_load(f) or {}
        for entry in doc.get("snapshots", []):
            cfg = entry.get("config", {})
            node = SnapshotNode(
                name=entry["name"],
                relation=entry["relation"],
                unique_key=cfg["unique_key"],
                strategy=cfg.get("strategy", "check"),
                check_cols=cfg.get("check_cols", "all"),
                updated_at=cfg.get("updated_at"),
            )
            if node.strategy not in ("check", "timestamp"):
                raise ValueError(
                    f"snapshot {node.name!r}: unknown strategy "
                    f"{node.strategy!r} (check|timestamp)"
                )
            if node.strategy == "timestamp" and not node.updated_at:
                raise ValueError(
                    f"snapshot {node.name!r}: timestamp strategy requires "
                    "config.updated_at"
                )
            if node.name in self.models or node.name in self.seeds:
                raise ValueError(
                    f"snapshot {node.name!r} collides with a model/seed "
                    "name (it would shadow ref() resolution)"
                )
            if node.name in out:
                raise ValueError(f"duplicate snapshot {node.name!r}")
            out[node.name] = node
        return out

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
                expanded = os.path.expandvars(raw_path)
                if "$" in expanded:
                    # expandvars leaves unset vars literal; surface a clear
                    # config error instead of an opaque path-not-found later.
                    raise ValueError(
                        f"source {gname}.{tbl['name']}: path {raw_path!r} "
                        "references an unset environment variable"
                    )
                out[(gname, tbl["name"])] = SourceTable(
                    group=gname,
                    name=tbl["name"],
                    path=expanded,
                    format=tbl.get("format", group.get("format", "parquet")),
                    columns={
                        c["name"]: c.get("tests", [])
                        for c in tbl.get("columns", [])
                    },
                    tests=tbl.get("tests", []),
                    loaded_at_field=tbl.get("loaded_at_field"),
                    freshness=tbl.get("freshness", group.get("freshness")),
                )
        return out


def _load_test_module(path: str) -> dict[str, Callable]:
    """Import a package's tests/*.py and return its public functions as
    generic tests keyed by function name. Test contract = the builtin one
    (engine/testing.py): fn(df, column?, **kwargs) -> failing-rows
    DataFrame."""
    name = os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(f"pkg_tests_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return {
        n: fn
        for n, fn in vars(mod).items()
        if not n.startswith("_")
        and inspect.isfunction(fn)
        # defined IN the module (not imported into it, e.g. F helpers)
        and getattr(fn, "__module__", None) == mod.__name__
    }
