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
import posixpath
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from dbt_on_snowflake_spark.engine.compile import render
from dbt_on_snowflake_spark.engine import table_format
from dbt_on_snowflake_spark.engine.fs import fs_list
from dbt_on_snowflake_spark.engine.dag import select
from dbt_on_snowflake_spark.engine.project import ModelNode, Project


@dataclass
class NodeResult:
    name: str
    status: str  # success | error | skipped | reused (retry, from disk)
    materialization: str
    relation: str
    rows: int | None
    seconds: float
    error: str | None = None
    trace: str | None = None  # path to the node's physical-plan trace


class ModelContext:
    """What a Python model receives as ``ctx`` (the reference's ``dbt``
    object, sales_metrics_by_location.py:3-12): ref()/source() return
    PySpark DataFrames."""

    def __init__(self, runner: "Runner", node: "ModelNode | None" = None):
        self._runner = runner
        self._node = node

    def config(self, **kwargs) -> None:
        """dbt-style in-model config DECLARATION (``dbt.config(...)``):
        string-literal kwargs are extracted statically at project load
        (engine/project.py), so the runtime call is a no-op."""

    def config_get(self, key: str, default=None):
        """Read this model's resolved config (in-model ctx.config(...)
        over per-dir project.yml) — dbt's ``dbt.config.get``."""
        if self._node is None:
            return default
        return self._runner.project.config_for(self._node, key, default)

    def token_count_col(self, col: str = "text"):
        """The Column counting tokens the way this model is CONFIGURED
        to (``config(token_count='bpe')`` for tokenizer-faithful counts,
        default whitespace) — pass it to any token-keyed operator
        (budget / mixture / packing) so a pipeline flips counting
        schemes in config, not code."""
        from dbt_on_snowflake_spark.operators.textops import token_count_column

        return token_count_column(
            self.config_get("token_count", "whitespace"), col
        )

    def ref(self, name: str) -> DataFrame:
        return self._runner.spark.table(self._runner.resolve_ref(name))

    def source(self, group: str, name: str) -> DataFrame:
        return self._runner.spark.table(self._runner.resolve_source(group, name))

    _NO_DEFAULT = object()  # sentinel: an explicit None default is valid

    def var(self, name: str, default=_NO_DEFAULT):
        """dbt var() for Python models (project.yml vars + CLI --vars).
        ``var('x', None)`` is a legitimate explicit default — only a call
        with NO default raises on an undefined var."""
        if name in self._runner.vars:
            return self._runner.vars[name]
        if default is not ModelContext._NO_DEFAULT:
            return default
        raise ValueError(f"var {name!r} is not defined and has no default")


class Runner:
    """Managed tables are plain parquet directories under the warehouse
    dir, registered as temp views — NOT metastore tables: Spark's default
    catalog is in-memory, so saveAsTable metadata dies with the process
    while its files persist, breaking any cross-invocation workflow
    (incremental models, cron re-runs) with LOCATION_ALREADY_EXISTS.
    Path-based tables make the CLI idempotent across processes; swapping
    to a real catalog (Hive metastore / Delta / Iceberg) changes only
    ``_table_path``/``_materialize``."""

    def __init__(
        self,
        spark: SparkSession,
        project: Project,
        trace_dir: str | None = None,
        full_refresh: bool = False,
        threads: int = 1,
        cli_vars: dict | None = None,
        defer_state: dict | None = None,
        reuse: set[str] | None = None,
        event_start: str | None = None,
        event_end: str | None = None,
        fail_fast: bool = False,
        empty: bool = False,
        wap: bool = False,
    ):
        self.spark = spark
        self.project = project
        self.results: list[NodeResult] = []
        # dbt vars: project.yml `vars:` defaults, CLI --vars overrides
        self.vars = {
            **(project.config.get("vars") or {}),
            **(cli_vars or {}),
        }
        # dbt --full-refresh: incremental models rebuild from scratch
        # (is_incremental() renders false; existing state is replaced)
        self.full_refresh = full_refresh
        # dbt's `threads`: independent DAG branches materialize
        # concurrently. Spark's scheduler interleaves the jobs, so a wide
        # generation of small models overlaps planning/IO instead of
        # serializing; each node still runs as its own Spark job
        self.threads = max(1, threads)
        # when set, each executed node's formatted physical plan is written
        # to <trace_dir>/<node>.txt — the per-query trace a user debugs a
        # slow mart with (reference README.md:163-187 monitoring surface)
        self.trace_dir = trace_dir
        # dbt --defer: a prior (prod) manifest dict. ref()s to models NOT
        # in the current selection resolve to the manifest's recorded
        # relation — the CI pattern where modified nodes build in dev
        # while unmodified parents are read from prod
        self.defer_state = defer_state
        # dbt retry: names that succeeded in the prior invocation. A node
        # in this set whose table-backed relation still exists on disk is
        # REGISTERED from the warehouse instead of rebuilt (status
        # ``reused``); views rebuild regardless — they have no storage and
        # cost only planning. At 100 TB this is the difference between a
        # retry touching one failed mart and recomputing the whole DAG.
        self.reuse = reuse or set()
        # dbt microbatch backfill window (--event-start/--event-end,
        # ISO timestamps): restricts which event-time batches a
        # microbatch model rewrites — the per-day replay path
        self.event_start = event_start
        self.event_end = event_end
        # dbt --fail-fast: the FIRST node failure stops scheduling — every
        # not-yet-run node records `skipped` (descendants of the failure
        # would skip anyway; fail-fast extends that to independent
        # branches, the CI mode where one red light means stop the line)
        self.fail_fast = fail_fast
        # dbt --empty (1.8): every model materializes from LIMIT-0 input —
        # the schema-only dry run CI uses to validate DDL, contracts and
        # ref wiring without moving data. At 100 TB this is the only way
        # to smoke a DAG change in minutes.
        self.empty = empty
        # Write-Audit-Publish (build --wap): full-state writes STAGE
        # their new version (data dir written, manifest NOT committed)
        # and the relation's view is pointed at the staged dir; the
        # build's per-node test gate then audits the STAGED data and
        # calls publish_staged / discard_staged — a failing test leaves
        # the previous committed version serving, untouched. The
        # manifest-pointer format makes this free: staging is just
        # deferring the one commit file.
        self.wap = wap
        import threading as _threading

        self._staged: dict[str, dict] = {}
        self._staged_lock = _threading.Lock()
        self._selected: set[str] | None = None
        wh = spark.conf.get("spark.sql.warehouse.dir", "/tmp/spark_warehouse")
        self.warehouse = wh.removeprefix("file:")

    def _table_path(self, relation: str) -> str:
        return os.path.join(self.warehouse, relation)

    def _data_path(self, relation: str) -> str | None:
        """The relation's CURRENT data directory, resolved through the
        table format's manifest pointer (engine/table_format.py); legacy
        pre-format tables resolve to their root."""
        return table_format.data_path(self.spark, self._table_path(relation))

    def _register_table(self, relation: str, merge_schema: bool = False) -> None:
        """``merge_schema`` is for insert_overwrite targets, whose
        partitions can carry heterogeneous footers after an
        append_new_columns run — the merged (superset) schema must be the
        view schema. Costs a footer read per file, so it stays off for
        homogeneous tables.

        A relation whose manifest records a bucket spec registers as a
        CATALOG bucketed table instead of a temp view: Spark only
        exploits bucketing (shuffle-free joins/aggs on the bucket key)
        through catalog metadata. The catalog entry is a derived CACHE of
        the manifest — rebuilt here from (current data dir, footer
        schema, manifest bucket spec) on every registration, so a fresh
        process, a version rollback, or a dropped catalog all recover
        from the manifest alone."""
        # resolve the manifest ONCE: version -> (data dir, bucket spec)
        # in a single read instead of one read for the bucket probe and
        # another inside data_path — registration runs per node per run,
        # so warehouse metadata round-trips here are multiplied
        root = self._table_path(relation)
        v = table_format.current_version(self.spark, root)
        if v is None:
            dpath = self._data_path(relation)  # legacy pre-format root
            bucket = None
        else:
            m = table_format.read_manifest(self.spark, root, v)
            dpath = posixpath.join(root, m["data_dir"])
            bucket = (
                (str(m["bucket_by"]), int(m["buckets"]))
                if m.get("bucket_by")
                else None
            )
        if bucket is not None:
            self._register_bucketed(relation, dpath, *bucket)
            return
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        reader.parquet(dpath).createOrReplaceTempView(relation)

    def _register_bucketed(
        self, relation: str, dpath: str, col: str, n: int
    ) -> None:
        # fast path: an existing catalog entry already pointing at this
        # exact versioned dir needs no rebuild — skipping the
        # DROP/CREATE and the parquet footer read matters because
        # registration runs per node per run. A shadowing TEMP VIEW has
        # no Location row, so it falls through to the rebuild below.
        try:
            if self.spark.catalog.tableExists(relation):
                # DESCRIBE output is bounded table metadata, not data
                info = {
                    r.col_name.strip(): (r.data_type or "").strip()
                    for r in self.spark.sql(
                        f"DESCRIBE FORMATTED `{relation}`"
                    ).collect()
                }
                loc = info.get("Location", "")
                if loc.rstrip("/").endswith(dpath.rstrip("/")) and info.get(
                    "Num Buckets"
                ) == str(n):
                    return
        except Exception:  # noqa: BLE001 — any doubt: rebuild from manifest
            pass
        # a temp view from a prior unbucketed materialization would
        # SHADOW the catalog table in resolution — remove it first
        self.spark.catalog.dropTempView(relation)
        self.spark.sql(f"DROP TABLE IF EXISTS `{relation}`")
        sch = self.spark.read.parquet(dpath).schema
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in sch.fields
        )
        self.spark.sql(
            f"CREATE TABLE `{relation}` ({cols}) USING parquet "
            f"CLUSTERED BY (`{col}`) SORTED BY (`{col}`) INTO {n} BUCKETS "
            f"LOCATION '{dpath}'"
        )

    def table_exists(self, relation: str) -> bool:
        return self._data_path(relation) is not None

    def _write_versioned(
        self, df: DataFrame, relation: str, partition_by: list[str] | None = None
    ) -> int:
        """Full-state write through the atomic commit seam: data lands in
        a fresh ``d-<n>`` dir, then ONE manifest create publishes it —
        no rename, so the protocol is atomic on object stores too. A
        crash before the commit leaves the previous version served and
        an orphan dir for vacuum."""
        root = self._table_path(relation)
        version, data_dir = table_format.next_txn(self.spark, root)
        rows = self._write_counted(
            df, posixpath.join(root, data_dir), partition_by
        )
        # rows is known from the write's own Observation, so the manifest
        # records it for free — version history doubles as a row-count
        # audit trail (and a future size hint for join planning)
        table_format.commit(
            self.spark, root, version, data_dir,
            meta={"partition_by": partition_by or [], "rows": rows},
        )
        table_format.vacuum(self.spark, root)
        return rows

    def _bucketed_write(
        self, df: DataFrame, path: str, relation: str, col: str, n: int
    ) -> int:
        """The one bucketed write dance (shared by the committing and
        the WAP-staging paths): Spark's bucketed writer only runs via
        saveAsTable, so data lands at ``path`` through a throwaway
        EXTERNAL staging name (dropped immediately — metadata only, the
        files stay). The ``repartition(n, col)`` matches the writer's
        own bucket hash, so each task holds exactly one bucket's rows —
        one file per bucket instead of (tasks x buckets) small files,
        and that one shuffle is the LAST time this key ever shuffles."""
        stage = f"{relation}__bkt_stage"
        self.spark.sql(f"DROP TABLE IF EXISTS `{stage}`")
        obs = Observation()
        (
            df.observe(obs, F.count(F.lit(1)).alias("rows"))
            .repartition(n, col)
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n, col)
            .sortBy(col)
            .option("path", path)
            .saveAsTable(stage)
        )
        rows = int(obs.get["rows"])
        self.spark.sql(f"DROP TABLE `{stage}`")
        return rows

    def _write_versioned_bucketed(
        self, df: DataFrame, relation: str, col: str, n: int
    ) -> int:
        """Full-state BUCKETED write through the same atomic commit seam
        as ``_write_versioned`` (the write mechanics live in
        ``_bucketed_write``, shared with the WAP staging path): the
        manifest create is still the single publish point, the bucket
        spec is recorded in the manifest, and ``_register_table``
        re-derives the serving catalog entry from it."""
        root = self._table_path(relation)
        version, data_dir = table_format.next_txn(self.spark, root)
        path = posixpath.join(root, data_dir)
        rows = self._bucketed_write(df, path, relation, col, n)
        table_format.commit(
            self.spark, root, version, data_dir,
            meta={
                "partition_by": [],
                "bucket_by": col,
                "buckets": n,
                "rows": rows,
            },
        )
        table_format.vacuum(self.spark, root)
        return rows

    # -- write-audit-publish ----------------------------------------------
    def _stage_versioned(
        self,
        df: DataFrame,
        relation: str,
        partition_by: list[str],
        bucket: tuple[str, int] | None,
    ) -> int:
        """WAP stage: write the next version's data dir but DEFER the
        manifest commit; point the relation's temp view at the STAGED
        dir so the audit (the build test gate) reads the candidate
        data. publish_staged lands the one-file commit; discard_staged
        deletes the dir and re-registers the committed state — either
        way readers outside this build never see unaudited data."""
        root = self._table_path(relation)
        version, data_dir = table_format.next_txn(self.spark, root)
        path = posixpath.join(root, data_dir)
        # marked BEFORE any data lands: a concurrent vacuum (tasks.yml
        # cron) must never see the staged dir as an unreferenced orphan
        table_format.stage_mark(self.spark, root, data_dir, relation)
        meta: dict = {"partition_by": partition_by or []}
        if bucket is not None:
            col, n = bucket
            rows = self._bucketed_write(df, path, relation, col, n)
            meta.update({"partition_by": [], "bucket_by": col, "buckets": n})
        else:
            rows = self._write_counted(df, path, partition_by)
        meta["rows"] = rows
        # the audit reads the staged candidate through the relation name
        self.spark.catalog.dropTempView(relation)
        self.spark.sql(f"DROP TABLE IF EXISTS `{relation}`")
        self.spark.read.parquet(path).createOrReplaceTempView(relation)
        with self._staged_lock:
            self._staged[relation] = {
                "root": root,
                "version": version,
                "data_dir": data_dir,
                "meta": meta,
            }
        return rows

    def publish_staged(self, relation: str) -> None:
        """Audit passed: the deferred manifest create publishes the
        staged version (the same single-object atomic commit every
        write uses), then the relation registers from its manifest.

        Ledger discipline (r9 advice runner.py:397 + r10 review): the
        entry is popped up front so a concurrent discard during the
        commit is a no-op (it must never delete a dir the commit is
        about to reference), and RE-INSERTED if the commit raises
        (e.g. CommitConflict) so the gate's exception-path
        discard_staged can still delete the staged dir and re-point
        the relation at the committed state — without the re-insert
        the session would keep serving the never-published staged
        dir."""
        with self._staged_lock:
            st = self._staged.pop(relation, None)
        if st is None:
            return
        try:
            table_format.commit(
                self.spark, st["root"], st["version"], st["data_dir"],
                meta=st["meta"],
            )
        except BaseException:
            with self._staged_lock:
                self._staged.setdefault(relation, st)
            raise
        # Deliberately NO eager stage_unmark here (r10 advice,
        # runner.py:422): a concurrent cron vacuum that listed manifests
        # BEFORE this commit re-checks the marker at delete time — if
        # publish unmarked first, that stale vacuum would see the
        # just-committed dir as unreferenced AND unmarked and delete
        # committed data. The marker stays until a vacuum with a fresh
        # manifest read heals it (the dir is then manifest-referenced,
        # so the marker is redundant — vacuum's heal path); the
        # vacuum below normally does exactly that.
        table_format.vacuum(self.spark, st["root"])
        self._register_table(relation)

    def discard_staged(self, relation: str) -> None:
        """Audit failed: delete the staged dir (never committed — no
        reader outside this build saw it) and re-register the previous
        committed state, which has been serving all along."""
        from dbt_on_snowflake_spark.engine.fs import fs_delete

        with self._staged_lock:
            st = self._staged.pop(relation, None)
        if st is None:
            return
        fs_delete(
            self.spark, posixpath.join(st["root"], st["data_dir"])
        )
        table_format.stage_unmark(self.spark, st["root"], st["data_dir"])
        self.spark.catalog.dropTempView(relation)
        if self.table_exists(relation):
            self._register_table(relation)

    def resolve_staged(self, name: str) -> str:
        """Relation name for a model, for the WAP gate's bookkeeping."""
        node = self.project.models.get(name)
        return self.project.relation_for(
            name, node.config.get("schema") if node else None
        )

    # -- resolution -------------------------------------------------------
    def resolve_ref(self, name: str) -> str:
        # bare ref to a versioned model -> its latest version's node
        name = getattr(self.project, "version_alias", {}).get(name, name)
        if name in self.project.seeds:
            return self.project.relation_for(name)
        if name in getattr(self.project, "snapshots", {}):
            # marts ref() snapshots like any relation (dbt: ref to the
            # snapshot node); the table must have been built by a prior
            # `snapshot` invocation — same contract as an unbuilt model
            relation = self.project.relation_for(name)
            if not self.table_exists(relation):
                raise ValueError(
                    f"snapshot {name!r} has no table yet — run the "
                    "`snapshot` command before models that ref() it"
                )
            self._register_table(relation)
            return relation
        deferred = self._resolve_deferred(name)
        if deferred is not None:
            return deferred
        node = self.project.models[name]
        if self.project.materialization_for(node) == "ephemeral":
            # ephemeral models inline as a subquery — no relation exists
            # (dbt's CTE injection; Catalyst flattens the subquery anyway)
            if node.kind != "sql":
                raise ValueError(f"python model {name!r} cannot be ephemeral")
            body = render(
                node.body, self.resolve_ref, self.resolve_source,
                this=None, is_incremental=False, variables=self.vars,
            )
            return f"({body}) AS _eph_{name}"
        return self.project.relation_for(name, node.config.get("schema"))

    def _resolve_deferred(self, name: str) -> str | None:
        """dbt --defer resolution: an unselected model resolves to the
        state manifest's recorded relation, UNLESS it already exists in
        the current target namespace (dbt's default dev-wins preference;
        --favor-state would flip it). The deferred relation is registered
        from its warehouse directory on first touch — prod tables persist
        as parquet paths, so a fresh dev process can read them; a prod
        VIEW has no on-disk state and falls through to normal resolution
        (same failure a dbt dev run sees when prod holds only a view)."""
        if self.defer_state is None or self._selected is None:
            return None
        if name in self._selected:
            return None
        node = self.project.models.get(name)
        if node is not None:
            dev_relation = self.project.relation_for(
                name, node.config.get("schema")
            )
            if self.table_exists(dev_relation) or self.spark.catalog.tableExists(
                dev_relation
            ):
                return None  # already built in this namespace: dev wins
        rec = (self.defer_state.get("nodes") or {}).get(name)
        relation = (rec or {}).get("relation")
        if not relation:
            return None
        if not self.spark.catalog.tableExists(relation) and self.table_exists(
            relation
        ):
            self._register_table(relation)
        if self.spark.catalog.tableExists(relation):
            return relation
        return None

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
            elif src.format == "json":
                # newline-delimited JSON (the log/export interchange format);
                # schema inference here is a second scan — acceptable for
                # raw landing zones, declared schemas for anything hot
                df = reader.json(src.path)
            else:
                df = reader.parquet(src.path)
            df.createOrReplaceTempView(self.resolve_source(group, name))

    # -- snapshots ---------------------------------------------------------
    def _snapshot_source_df(self, snap) -> DataFrame:
        """Resolve a SnapshotNode's relation string — ``source('g','t')``
        or ``ref('model')`` — to a DataFrame."""
        import re

        m = re.match(
            r"\s*source\(\s*['\"]([^'\"]+)['\"]\s*,\s*['\"]([^'\"]+)['\"]"
            r"\s*\)\s*$",
            snap.relation,
        )
        if m:
            self.load_sources()
            return self.spark.table(self.resolve_source(m.group(1), m.group(2)))
        m = re.match(r"\s*ref\(\s*['\"]([^'\"]+)['\"]\s*\)\s*$", snap.relation)
        if m:
            return self.spark.table(self.resolve_ref(m.group(1)))
        raise ValueError(
            f"snapshot {snap.name!r}: relation must be source('g','t') or "
            f"ref('model'), got {snap.relation!r}"
        )

    def run_snapshots(self, now=None, only=None) -> list[NodeResult]:
        """dbt snapshot: apply snapshots.yml nodes against their current
        source state, SCD2-merging into the snapshot table through the
        atomic table format (one full-outer-join shuffle per node — see
        engine/snapshot.py for the at-scale posture). ``now`` is
        injectable for deterministic tests, mirroring freshness.
        ``only`` (advice r7): restrict to the named snapshots — build
        scopes snapshots to its selection instead of advancing every
        SCD2 history on any invocation."""
        from datetime import datetime, timezone

        from dbt_on_snowflake_spark.engine.snapshot import (
            snapshot_apply,
            snapshot_apply_timestamp,
        )

        if now is None:
            now = datetime.now(timezone.utc).replace(tzinfo=None)
        out: list[NodeResult] = []
        names = sorted(
            getattr(self.project, "snapshots", {})
            if only is None
            else only
        )
        for name in names:
            snap = self.project.snapshots[name]
            relation = self.project.relation_for(name)
            t0 = time.time()
            try:
                src = self._snapshot_source_df(snap)
                existing = None
                if self.table_exists(relation):
                    self._register_table(relation)
                    existing = self.spark.table(relation)
                if snap.strategy == "timestamp":
                    tracked = [
                        c
                        for c in src.columns
                        if c not in (snap.unique_key, snap.updated_at)
                    ]
                    snapped = snapshot_apply_timestamp(
                        self.spark, src, existing, snap.unique_key,
                        snap.updated_at, tracked, now,
                    )
                else:
                    cols = snap.check_cols
                    if cols in (None, "all"):
                        cols = [c for c in src.columns if c != snap.unique_key]
                    snapped = snapshot_apply(
                        self.spark, src, existing, snap.unique_key,
                        list(cols), now,
                    )
                rows = self._write_versioned(snapped, relation)
                self._register_table(relation)
                out.append(NodeResult(
                    name, "success", "snapshot", relation, rows,
                    time.time() - t0,
                ))
            except Exception as e:  # noqa: BLE001 — per-node isolation
                out.append(NodeResult(
                    name, "error", "snapshot", relation, None,
                    time.time() - t0, error=str(e),
                ))
        self.results.extend(out)
        return out

    # -- seeds -------------------------------------------------------------
    def load_seeds(self, only: set[str] | None = None) -> set[str]:
        """dbt seeds: version-controlled CSVs under <project>/seeds/,
        materialized as tables and referenceable via {{ ref('<seed>') }}
        (small lookup/dimension data a 100 TB pipeline still needs —
        mapping tables, allowlists).

        ``only`` restricts loading to the given seed names (run() passes
        the seeds the selection actually refs, so ``--select one_model``
        doesn't re-materialize every seed). Each seed loads with the same
        per-node isolation as models — a malformed CSV records an error
        NodeResult and is returned in the failed set (models ref'ing it
        get skipped) instead of crashing the run before artifacts are
        written. Declared ``seeds: <name>: column_types:`` in project.yml
        pin column types with explicit casts (dbt column_types), so data
        drift — an all-int column gaining a decimal — can't flip the
        seed's schema between runs; inference covers undeclared columns.
        """
        failed: set[str] = set()
        seed_cfg = self.project.config.get("seeds", {}) or {}
        for name, path in self.project.seeds.items():
            if only is not None and name not in only:
                continue
            relation = self.project.relation_for(name)
            t0 = time.perf_counter()
            try:
                df = (
                    self.spark.read.option("header", True)
                    .option("inferSchema", True)
                    .csv(path)
                )
                ctypes = (seed_cfg.get(name, {}) or {}).get("column_types", {}) or {}
                unknown = sorted(set(ctypes) - set(df.columns))
                if unknown:
                    raise ValueError(
                        f"seed {name!r}: column_types for unknown columns "
                        f"{unknown}"
                    )
                for col, typ in ctypes.items():
                    df = df.withColumn(col, F.col(col).cast(typ))
                rows = self._write_versioned(df, relation)
                self._register_table(relation)
                self.results.append(
                    NodeResult(
                        name, "success", "seed", relation, rows,
                        round(time.perf_counter() - t0, 3),
                    )
                )
            except Exception as e:  # noqa: BLE001 — same isolation as models
                failed.add(name)
                self.results.append(
                    NodeResult(
                        name, "error", "seed", relation, None,
                        round(time.perf_counter() - t0, 3), str(e)[:500],
                    )
                )
        return failed

    # -- execution --------------------------------------------------------
    def run(
        self,
        selector: str | None = None,
        state: dict | None = None,
        exclude: str | None = None,
        test_hook: "Callable[[str], bool] | None" = None,
        blocked: dict[str, str] | None = None,
    ) -> list[NodeResult]:
        """Execute the selected models in topological order with dbt-style
        per-node isolation: a failing model marks its descendants skipped
        (recorded as such), while independent branches keep running. The
        CLI maps any non-success result to a non-zero exit AFTER printing
        and writing run_results.json. ``state`` is a prior manifest dict
        for ``state:modified`` selection. ``test_hook(name) -> bool``, when
        given, runs after each successful materialization (dbt build):
        returning False marks the node's data untrusted — its descendants
        skip, exactly like a model failure. ``blocked`` maps node names
        to a reason for NOT building them at all (dbt build skips a
        model whose unit test failed, plus its descendants) — blocked
        nodes record ``skipped`` without executing."""
        self.load_sources()
        if not self._run_project_hooks("on_run_start"):
            # dbt semantics: a failing on-run-start hook aborts the
            # invocation before any node builds; on-run-end still fires
            # (cleanup/audit hooks must see every outcome)
            self._run_project_hooks("on_run_end")
            return self.results
        try:
            return self._run_selected(
                selector, state, exclude, test_hook, blocked or {}
            )
        finally:
            self._run_project_hooks("on_run_end")

    def _run_project_hooks(self, which: str) -> bool:
        """dbt on-run-start / on-run-end: project-level SQL statements
        bracketing the whole invocation (audit bookkeeping, session setup,
        cleanup). ``project.yml`` declares them under ``on_run_start:`` /
        ``on_run_end:`` (dash spelling accepted) as one statement or a
        list; each renders with the same ref/source/var resolution as
        model bodies and records its own NodeResult (materialization
        ``hook``), so run_results shows hook timing and failures like any
        node. Returns False if any hook errored."""
        raw = self.project.config.get(which)
        if raw is None:
            raw = self.project.config.get(which.replace("_", "-"))
        if raw is None:
            return True
        stmts = raw if isinstance(raw, list) else [raw]
        ok = True
        for i, stmt in enumerate(stmts):
            label = f"{which.replace('_', '-')}-{i}"
            t0 = time.perf_counter()
            try:
                self.spark.sql(
                    render(
                        str(stmt), self.resolve_ref, self.resolve_source,
                        this=None, variables=self.vars,
                    )
                )
                self.results.append(
                    NodeResult(
                        label, "success", "hook", "", None,
                        round(time.perf_counter() - t0, 3),
                    )
                )
            except Exception as e:  # noqa: BLE001 — isolation, like nodes
                ok = False
                self.results.append(
                    NodeResult(
                        label, "error", "hook", "", None,
                        round(time.perf_counter() - t0, 3), str(e)[:500],
                    )
                )
        return ok

    def _run_selected(
        self,
        selector: str | None,
        state: dict | None,
        exclude: str | None,
        test_hook: "Callable[[str], bool] | None",
        blocked: dict[str, str] | None = None,
    ) -> list[NodeResult]:
        blocked = blocked or {}
        # with --defer, selection atoms resolve literally: unselected
        # ancestors are read from the deferred namespace, not rebuilt
        order = select(
            self.project,
            selector,
            state=state,
            exclude=exclude,
            implicit_ancestors=self.defer_state is None,
        )
        self._selected = set(order)
        # only the seeds the selection refs (all of them on a full run);
        # a failed seed propagates exactly like a failed model: its
        # dependents skip, siblings keep running. Any narrowing —
        # --select OR --exclude — scopes seeds to the post-exclude order:
        # a malformed seed ref'd only by an excluded subtree must not
        # fail a run that deliberately excluded that subtree
        needed = (
            None
            if selector is None and exclude is None
            else {
                r
                for m in order
                for r in self.project.models[m].refs
                if r in self.project.seeds
            }
        )
        dead: set[str] = set(self.load_seeds(needed))

        def dispatch(name: str) -> bool:
            """Returns True if the node was handled (skipped/ephemeral)
            without needing execution."""
            node = self.project.models[name]
            mat = self.project.materialization_for(node)
            if name in blocked:
                dead.add(name)
                if mat != "ephemeral":
                    self.results.append(
                        NodeResult(
                            name, "skipped", mat,
                            self.project.relation_for(
                                name, node.config.get("schema")
                            ),
                            None, 0.0, blocked[name],
                        )
                    )
                return True
            # bare refs to versioned models alias to the latest node —
            # without this a failed dim_v2 would not skip a `ref('dim')`
            # consumer
            alias = getattr(self.project, "version_alias", {})
            bad_upstream = sorted(
                {alias.get(r, r) for r in node.refs} & dead
            )
            if bad_upstream:
                dead.add(name)
                if mat != "ephemeral":  # ephemeral nodes never report
                    self.results.append(
                        NodeResult(
                            name, "skipped", mat,
                            self.project.relation_for(
                                name, node.config.get("schema")
                            ),
                            None, 0.0,
                            "upstream failed: " + ", ".join(bad_upstream),
                        )
                    )
                return True
            return mat == "ephemeral"

        def skip_rest(rest: list[str], reason: str) -> None:
            for name in rest:
                node = self.project.models[name]
                mat = self.project.materialization_for(node)
                if mat == "ephemeral":
                    continue
                self.results.append(
                    NodeResult(
                        name, "skipped", mat,
                        self.project.relation_for(
                            name, node.config.get("schema")
                        ),
                        None, 0.0, reason,
                    )
                )

        if self.threads == 1:
            for i, name in enumerate(order):
                if dispatch(name):
                    continue
                if not self._run_node(self.project.models[name]):
                    dead.add(name)
                elif test_hook is not None and not test_hook(name):
                    dead.add(name)
                else:
                    continue
                if self.fail_fast:
                    skip_rest(order[i + 1:], "fail-fast: stopping after "
                              f"{name} failed")
                    break
            return self.results

        # threaded: run each topological generation's runnable nodes
        # concurrently (barrier between generations keeps ref() ordering);
        # results append in a deterministic per-generation order
        from concurrent.futures import ThreadPoolExecutor
        from graphlib import TopologicalSorter

        selected = set(order)
        _alias = getattr(self.project, "version_alias", {})
        graph = {
            n: {
                _alias.get(r, r)
                for r in self.project.models[n].refs
                if _alias.get(r, r) in selected
            }
            for n in order
        }
        ts = TopologicalSorter(graph)
        ts.prepare()
        done: set[str] = set()
        while ts.is_active():
            batch = set(ts.get_ready())
            ready = [n for n in order if n in batch]
            runnable = [n for n in ready if not dispatch(n)]
            failed_here = False
            if runnable:
                with ThreadPoolExecutor(max_workers=self.threads) as pool:
                    oks = list(
                        pool.map(
                            lambda n: (n, self._exec_node(self.project.models[n])),
                            runnable,
                        )
                    )
                for name, result in oks:
                    self.results.append(result)
                    if result.status not in ("success", "reused"):
                        dead.add(name)
                        failed_here = True
                    elif test_hook is not None and not test_hook(name):
                        dead.add(name)
                        failed_here = True
            for n in ready:
                ts.done(n)
            done |= set(ready)
            if self.fail_fast and failed_here:
                # fail-fast barrier: the in-flight generation finishes,
                # everything after it records skipped
                skip_rest(
                    [n for n in order if n not in done],
                    "fail-fast: stopping after a failure in the current "
                    "generation",
                )
                break
        return self.results

    def _run_node(self, node: ModelNode) -> bool:
        result = self._exec_node(node)
        self.results.append(result)
        return result.status in ("success", "reused")

    def _exec_node(self, node: ModelNode) -> NodeResult:
        """Execute one non-ephemeral node and return its result WITHOUT
        touching shared state — safe to call from worker threads."""
        mat = self.project.materialization_for(node)
        relation = self.project.relation_for(node.name, node.config.get("schema"))
        t0 = time.perf_counter()
        if (
            node.name in self.reuse
            and mat in ("table", "incremental")
            and self.table_exists(relation)
        ):
            self._register_table(
                relation,
                merge_schema=node.config.get("incremental_strategy")
                in ("insert_overwrite", "microbatch"),
            )
            return NodeResult(
                node.name, "reused", mat, relation, None,
                round(time.perf_counter() - t0, 3),
            )
        try:
            self._run_hook(node, "pre_hook", relation)
            df = self._build_df(node)
            if self.empty:
                # --empty: LIMIT 0 AFTER the model body resolves — every
                # ref/source/contract/materialization path still runs,
                # the scan just produces no rows (dbt applies the limit
                # to the model's input refs; limiting the output is
                # equivalent for schema purposes and one seam here)
                df = df.limit(0)
            self._enforce_contract(node, df)
            trace = self._write_trace(node.name, df)
            rows = self._materialize(df, relation, mat, node)
            self._run_hook(node, "post_hook", relation)
            return NodeResult(
                node.name, "success", mat, relation, rows,
                round(time.perf_counter() - t0, 3), trace=trace,
            )
        except Exception as e:  # noqa: BLE001 — per-node isolation is the point
            # a WAP stage that landed before a later step failed (e.g. a
            # post_hook) must not leave the relation's view pointing at
            # never-to-be-published data
            if self.wap:
                self.discard_staged(relation)
            return NodeResult(
                node.name, "error", mat, relation, None,
                round(time.perf_counter() - t0, 3), str(e)[:500],
            )

    def _run_hook(self, node: ModelNode, which: str, relation: str) -> None:
        """dbt pre/post hooks: arbitrary SQL around a materialization
        (audit rows, grants, OPTIMIZE on a real table format). Rendered
        with the same ref/source/this resolution as model bodies."""
        hook = node.config.get(which)
        if hook:
            self.spark.sql(
                render(hook, self.resolve_ref, self.resolve_source, this=relation,
                       variables=self.vars)
            )

    def _enforce_contract(self, node: ModelNode, df: DataFrame) -> None:
        """dbt model contracts, two declaration forms, enforced BEFORE
        anything is written so a widened column or silent type drift can't
        reach downstream consumers:

        - in-model ``config(contract='col:type,...')`` — pins the exact
          output schema (names, Spark simpleString types, order);
        - YAML (dbt-native) ``config: contract: enforced: true`` plus
          per-column ``data_type`` in the model's schema.yml — name-keyed
          comparison with per-column diagnostics (missing / unexpected /
          type-mismatched columns are each named in the error).

        Contracts compose with ``on_schema_change``: the contract check
        runs on the SELECT's schema first, so an incremental model with
        an enforced contract fails a drifted run even when its
        on_schema_change policy would have absorbed the drift — the
        contract is the outer guardrail."""
        spec = node.config.get("contract")
        if spec:
            want = []
            for part in spec.split(","):
                name, _, typ = part.strip().partition(":")
                want.append((name.strip(), typ.strip()))
            got = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
            if want != got:
                raise ValueError(
                    f"contract violation in {node.name!r}: declared {want}, "
                    f"model produces {got}"
                )
        mt = self.project.model_tests.get(node.name)
        if mt is None or not mt.contract_enforced:
            return
        got_types = {
            f.name.lower(): f.dataType.simpleString() for f in df.schema.fields
        }
        want_types = {n.lower(): t for n, t in mt.column_types.items()}
        problems = []
        for col, typ in want_types.items():
            if col not in got_types:
                problems.append(f"declared column {col!r} missing from output")
            elif got_types[col] != typ:
                problems.append(
                    f"column {col!r}: declared {typ}, model produces "
                    f"{got_types[col]}"
                )
        for col in got_types:
            if col not in want_types:
                problems.append(f"undeclared column {col!r} in output")
        if problems:
            raise ValueError(
                f"contract violation in {node.name!r}: " + "; ".join(problems)
            )

    def _write_trace(self, name: str, df: DataFrame) -> str | None:
        if self.trace_dir is None:
            return None
        from dbt_on_snowflake_spark.plans import explain_str

        os.makedirs(self.trace_dir, exist_ok=True)
        path = os.path.join(self.trace_dir, f"{name}.txt")
        with open(path, "w") as f:
            f.write(explain_str(df))
        return path

    def _build_df(self, node: ModelNode) -> DataFrame:
        if node.kind == "sql":
            relation = self.project.relation_for(
                node.name, node.config.get("schema")
            )
            incremental = (
                self.project.materialization_for(node) == "incremental"
                and self.table_exists(relation)
                and not self.full_refresh
            )
            if incremental:
                # {{ this }} must resolve; insert_overwrite and
                # microbatch targets may hold heterogeneous footers
                # after append_new_columns (microbatch always registers
                # merged — its own materializer does too)
                self._register_table(
                    relation,
                    merge_schema=node.config.get("incremental_strategy")
                    in ("insert_overwrite", "microbatch"),
                )
            sql = render(
                node.body,
                self.resolve_ref,
                self.resolve_source,
                this=relation,
                is_incremental=incremental,
                variables=self.vars,
            )
            return self.spark.sql(sql)
        spec = importlib.util.spec_from_file_location(
            f"model_{node.name}", node.path
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod.model(ModelContext(self, node), self.spark)

    def _materialize(
        self, df: DataFrame, relation: str, mat: str, node: ModelNode | None = None
    ) -> int | None:
        if mat == "view":
            df.createOrReplaceTempView(relation)
            return None  # views are lazy; no action (dbt also reports 0)
        if mat == "table":
            bucket = self._bucket_spec(node)
            if self.wap:
                return self._stage_versioned(
                    df, relation, self._partition_cols(node), bucket
                )
            if bucket is not None:
                rows = self._write_versioned_bucketed(df, relation, *bucket)
            else:
                rows = self._write_versioned(
                    df, relation, self._partition_cols(node)
                )
            self._register_table(relation)
            return rows
        if mat == "incremental":
            return self._materialize_incremental(df, relation, node)
        raise ValueError(f"unknown materialization: {mat}")

    def _bucket_spec(self, node: ModelNode | None) -> tuple[str, int] | None:
        """dbt-style ``bucket_by: <col>`` (+ ``buckets: N``, default 32)
        model config: the mart is written through Spark's bucketed
        writer and served as a catalog bucketed table, so every
        downstream join or aggregation ON THE BUCKET KEY — including
        across separate runs and separate models bucketed the same way —
        reads pre-hash-partitioned files and skips its Exchange
        entirely. At 100 TB that converts the dominant recurring cost of
        a key-centric mart (re-shuffling it under every consumer) into a
        one-time layout decision, the same lever as Snowflake clustering
        keys in the reference's warehouse (SURVEY §1.2)."""
        if node is None:
            return None
        col = str(node.config.get("bucket_by") or "").strip()
        if not col:
            return None
        if "," in col:
            raise ValueError(
                f"bucket_by takes a single column, got {col!r}"
            )
        n = int(node.config.get("buckets", 32))
        if n <= 0:
            raise ValueError(f"buckets must be positive, got {n}")
        if self._partition_cols(node):
            raise ValueError(
                "bucket_by cannot combine with partition_by: partition "
                "pruning and bucket co-location are different layout "
                "levers — pick the one the mart's consumers filter/join on"
            )
        return col, n

    @staticmethod
    def _partition_cols(node: ModelNode | None) -> list[str]:
        """dbt-style ``partition_by`` model config ('col' or 'a,b'):
        the mart is laid out as parquet partition directories, so
        downstream reads with a filter on the partition column scan only
        the matching directories (partition pruning) — the single
        biggest read-cost lever for a date-partitioned 100 TB mart."""
        if node is None:
            return []
        raw = node.config.get("partition_by", "")
        return [c.strip() for c in raw.split(",") if c.strip()]

    def _write_counted(
        self, df: DataFrame, path: str, partition_by: list[str] | None = None
    ) -> int:
        """Overwrite-write df to parquet and return its row count from the
        WRITE action itself (Observation metrics) — not a post-write
        re-read: at 100 TB a `spark.table(t).count()` after every mart
        materialization is a second pass over each mart's files."""
        obs = Observation()
        writer = df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        )
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(path)
        return int(obs.get["rows"])

    def _apply_on_schema_change(
        self,
        df: DataFrame,
        existing: DataFrame,
        node: ModelNode | None,
        relation: str,
        *,
        rewrite: bool,
    ) -> tuple[DataFrame, DataFrame]:
        """dbt ``on_schema_change`` for incremental models — the policy for
        column drift between the model's output and the existing target:

        - ``ignore`` (default): the target schema wins — columns the model
          newly produces are dropped from the increment; a column the
          target has but the increment lost is an ERROR (the engine never
          silently invents values for existing columns).
        - ``fail``: any drift (added or removed columns) errors before
          anything is written.
        - ``append_new_columns``: new columns extend the target (historic
          rows read as NULL); columns missing from the increment stay in
          the target and are NULL-filled in the new rows.
        - ``sync_all_columns``: the target schema becomes the model schema
          — new columns appear, removed columns are dropped. Merge path
          only (``rewrite=True``): insert_overwrite leaves untouched
          partitions' files in place, so a column cannot be dropped
          without the full rewrite the strategy exists to avoid.

        Drift is detected by column NAME; a same-named column changing
        type surfaces through unionByName/parquet-merge type resolution.
        Returns the (increment, existing) pair aligned to a common schema;
        on the insert_overwrite path the returned ``existing`` is unused.
        """
        policy = (
            node.config.get("on_schema_change") if node else None
        ) or "ignore"
        tgt = existing.columns
        new = df.columns
        added = [c for c in new if c not in tgt]
        removed = [c for c in tgt if c not in new]
        if policy == "fail":
            if added or removed:
                raise ValueError(
                    f"on_schema_change='fail': {relation} schema drifted "
                    f"(added {added}, removed {removed})"
                )
            return df, existing
        if policy == "ignore":
            if removed:
                raise ValueError(
                    f"on_schema_change='ignore': increment for {relation} "
                    f"is missing existing columns {removed}; use "
                    "append_new_columns/sync_all_columns or --full-refresh"
                )
            return (df.select(*tgt) if added else df), existing
        if policy == "append_new_columns":
            for c in removed:
                df = df.withColumn(
                    c, F.lit(None).cast(existing.schema[c].dataType)
                )
            if rewrite:
                for c in added:
                    existing = existing.withColumn(
                        c, F.lit(None).cast(df.schema[c].dataType)
                    )
            return df.select(*tgt, *added), existing
        if policy == "sync_all_columns":
            if not rewrite:
                raise ValueError(
                    "on_schema_change='sync_all_columns' is not supported "
                    "with insert_overwrite: untouched partitions keep "
                    "their files, so removed columns would survive there"
                )
            existing = existing.select(*[c for c in tgt if c in new])
            for c in added:
                existing = existing.withColumn(
                    c, F.lit(None).cast(df.schema[c].dataType)
                )
            return df, existing.select(*new)
        raise ValueError(f"unknown on_schema_change: {policy!r}")

    def _materialize_incremental(
        self, df: DataFrame, relation: str, node: ModelNode | None
    ) -> int:
        """dbt-style incremental: first run = full table; later runs append
        the model's (usually filtered-by-{{ this }}) output. With a
        unique_key config, existing rows with matching keys are replaced
        (delete+insert semantics) via a left-anti join — the non-Delta
        equivalent of MERGE. The combined result is written through the
        atomic commit seam (engine/table_format.py): a fresh data dir,
        published by a single manifest create. The new data can safely
        read the target's own files because the current version's dir is
        never touched; there is no rename and no recovery protocol — a
        crash at any point leaves either the old or the new version
        fully served.

        At scale: the anti-join shuffles on the unique key once — or,
        with ``bucket_by: <unique_key>`` (r9, implemented below), zero
        times: the existing side reads as a catalog bucketed scan
        already hash-partitioned on the key, so only the increment
        moves. The commit is O(1) metadata regardless of table size."""
        parts = self._partition_cols(node)
        bucket = self._bucket_spec(node)
        strategy = (node.config.get("incremental_strategy") if node else None) or (
            "merge"
        )
        if strategy == "microbatch":
            if bucket is not None:
                raise ValueError(
                    "bucket_by is not supported with "
                    "incremental_strategy='microbatch' (its per-period "
                    "dynamic partition overwrite is a partition layout)"
                )
            if self.wap:
                raise ValueError(
                    "--wap is not supported with incremental_strategy="
                    "'microbatch': its per-period writes mutate the "
                    "current data dir in place, so there is no staged "
                    "version to defer"
                )
            return self._materialize_microbatch(df, relation, node, parts)
        if strategy == "insert_overwrite" and self.wap:
            raise ValueError(
                "--wap is not supported with incremental_strategy="
                "'insert_overwrite': dynamic partition overwrite mutates "
                "the current data dir in place, so there is no staged "
                "version to defer"
            )
        if self.full_refresh or not self.table_exists(relation):
            # full refresh: the model read only sources (is_incremental()
            # was false, {{ this }} never resolved); the versioned write
            # publishes atomically either way
            if self.wap:
                return self._stage_versioned(df, relation, parts, bucket)
            if bucket is not None:
                rows = self._write_versioned_bucketed(df, relation, *bucket)
            else:
                rows = self._write_versioned(df, relation, parts)
            self._register_table(relation)
            return rows
        if strategy == "insert_overwrite":
            # Dynamic partition overwrite: ONLY the partitions present in
            # this increment are replaced — the 100 TB incremental path
            # (the merge strategy below rewrites the whole table; this
            # rewrites one day of a date-partitioned mart). Requires
            # partition_by. The write mutates the CURRENT data dir in
            # place: copying the untouched partitions into a fresh
            # versioned dir would rewrite the other 364 days of a 100 TB
            # mart, defeating the strategy; atomicity here is Spark's own
            # per-partition commit protocol (per-task staging +
            # partition-directory replacement at commit).
            if not parts:
                raise ValueError(
                    "incremental_strategy='insert_overwrite' requires "
                    "partition_by"
                )
            dpath = self._data_path(relation)
            # schema-drift policy against the merged on-disk schema (a
            # prior append_new_columns run leaves partitions with
            # different footers; mergeSchema sees the superset)
            existing = self.spark.read.option("mergeSchema", "true").parquet(
                dpath
            )
            df, _ = self._apply_on_schema_change(
                df, existing, node, relation, rewrite=False
            )
            obs = Observation()
            (
                df.observe(obs, F.count(F.lit(1)).alias("rows"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*parts)
                .parquet(dpath)
            )
            self._register_table(relation, merge_schema=True)
            return int(obs.get["rows"])
        unique_key = node.config.get("unique_key") if node else None
        if bucket is not None:
            # bucketed target: read through the catalog entry so the
            # existing side arrives pre-hash-partitioned — with
            # unique_key == bucket key the anti-join never shuffles the
            # (large) target, only the (small) increment
            self._register_table(relation)
            existing = self.spark.table(relation)
        else:
            existing = self.spark.read.parquet(self._data_path(relation))
        df, existing = self._apply_on_schema_change(
            df, existing, node, relation, rewrite=True
        )
        if unique_key:
            new_keys = df.select(unique_key).distinct()
            kept = existing.join(new_keys, unique_key, "left_anti")
            combined = kept.unionByName(df)
        else:
            combined = existing.unionByName(df)
        # the combined plan READS the current version's files while the
        # write lands in the next version's dir — safe without a staging
        # rename precisely because a committed version's dir is immutable
        if self.wap:
            return self._stage_versioned(combined, relation, parts, bucket)
        if bucket is not None:
            rows = self._write_versioned_bucketed(combined, relation, *bucket)
        else:
            rows = self._write_versioned(combined, relation, parts)
        self._register_table(relation)
        return rows

    def _materialize_microbatch(
        self, df: DataFrame, relation: str, node: ModelNode | None, parts: list[str]
    ) -> int:
        """dbt 1.9 ``incremental_strategy='microbatch'``: the model's
        output is bucketed by ``event_time`` into ``batch_size`` periods
        (hour/day/month) and each period is written as its own dynamic
        partition overwrite — one INDEPENDENT write action per batch, so
        a failed day retries alone (re-run, or replay explicitly with
        ``--event-start/--event-end``) and a replayed day is idempotent:
        the period's directory is replaced wholesale, never appended.

        Batch selection without an explicit window: every batch present
        in the increment that is not yet on disk, plus the trailing
        ``lookback`` (default 1) existing batches — late-arriving events
        inside the lookback window get their day rewritten; older late
        data needs an explicit replay (dbt semantics). The engine adds an
        ``event_batch`` partition column (``yyyy-MM-dd`` for day), which
        doubles as the partition-pruning key for downstream reads of a
        100 TB event mart; the per-batch to-do list is a driver-side list
        of PERIODS (bounded by calendar time, not data volume).

        Composes with ``on_schema_change`` exactly like insert_overwrite
        (checked against the mergeSchema union of on-disk footers);
        ``sync_all_columns`` is rejected for the same
        untouched-partitions reason."""
        if node is None or not node.config.get("event_time"):
            raise ValueError(
                "incremental_strategy='microbatch' requires event_time"
            )
        event_time = node.config.get("event_time")
        batch_size = node.config.get("batch_size", "day")
        fmts = {"hour": "yyyy-MM-dd-HH", "day": "yyyy-MM-dd", "month": "yyyy-MM"}
        if batch_size not in fmts:
            raise ValueError(
                f"microbatch batch_size must be one of {sorted(fmts)}, "
                f"got {batch_size!r}"
            )
        lookback = int(node.config.get("lookback", 1))
        bcol = "event_batch"
        if self.event_start:
            df = df.filter(
                F.col(event_time) >= F.lit(self.event_start).cast("timestamp")
            )
        if self.event_end:
            df = df.filter(
                F.col(event_time) < F.lit(self.event_end).cast("timestamp")
            )
        begin = node.config.get("begin")
        if begin:
            df = df.filter(
                F.col(event_time) >= F.lit(str(begin)).cast("timestamp")
            )
        # rows with NULL event_time belong to no batch — dbt's
        # event-time range filters drop them too; keeping them would
        # crash the batch-key sort (None vs str) or invent a partition
        df = df.filter(F.col(event_time).isNotNull())
        dfb = df.withColumn(
            bcol,
            F.date_format(
                F.date_trunc(batch_size, F.col(event_time)), fmts[batch_size]
            ),
        )
        if self.full_refresh or not self.table_exists(relation):
            rows = self._write_versioned(dfb, relation, [bcol, *parts])
            self._register_table(relation, merge_schema=True)
            return rows
        # per-batch dynamic overwrites mutate the CURRENT data dir (see
        # insert_overwrite above: a day-replay must not rewrite the mart)
        dpath = self._data_path(relation)
        existing = self.spark.read.option("mergeSchema", "true").parquet(dpath)
        dfb, _ = self._apply_on_schema_change(
            dfb, existing, node, relation, rewrite=False
        )
        todo = sorted(r[0] for r in dfb.select(bcol).distinct().collect())
        if not (self.event_start or self.event_end):
            have = sorted(
                d.split("=", 1)[1]
                for d in fs_list(self.spark, dpath)
                if d.startswith(f"{bcol}=")
            )
            recent = set(have[-lookback:]) if lookback > 0 else set()
            todo = [b for b in todo if b not in have or b in recent]
        total = 0
        for b in todo:
            obs = Observation()
            (
                dfb.filter(F.col(bcol) == b)
                .observe(obs, F.count(F.lit(1)).alias("rows"))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(bcol, *parts)
                .parquet(dpath)
            )
            total += int(obs.get["rows"])
        self._register_table(relation, merge_schema=True)
        return total

    # -- artifacts --------------------------------------------------------
    def _results_payload(
        self,
        command: str | None = None,
        tests: list | None = None,
        unit_tests: list | None = None,
        cli_args: dict | None = None,
    ) -> dict:
        """``command``/``args``/``tests``/``unit_tests`` make
        run_results.json a complete retry input: dbt retry replays the
        recorded COMMAND *with its flags* (selection, --full-refresh,
        --vars, the microbatch event window — without them a retry of a
        hook-aborted ``run --select marts`` would rebuild the whole
        project, and a retried event-window replay would rewrite the
        wrong batches), and a build that failed only on tests must not
        read as all-green (its node results are all successes)."""
        payload = {
            "elapsed": round(sum(r.seconds for r in self.results), 3),
            "target": self.project.target,
            "results": [asdict(r) for r in self.results],
        }
        if command is not None:
            payload["command"] = command
        if cli_args is not None:
            payload["args"] = cli_args
        if tests is not None:
            payload["tests"] = [asdict(t) for t in tests]
        if unit_tests is not None:
            payload["unit_tests"] = [asdict(u) for u in unit_tests]
        return payload

    def write_run_results(
        self,
        path: str,
        command: str | None = None,
        tests: list | None = None,
        unit_tests: list | None = None,
        cli_args: dict | None = None,
    ) -> None:
        payload = self._results_payload(command, tests, unit_tests, cli_args)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(payload, f, indent=2)

    def append_run_history(self, path: str) -> None:
        """One JSON line per invocation (run monitoring across runs, not
        just the latest run_results)."""
        from dbt_on_snowflake_spark.engine.artifacts import append_run_history

        append_run_history(path, self._results_payload())
