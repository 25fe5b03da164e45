"""Engine-owned atomic table format: manifest-pointer commits.

A managed table is a directory whose CURRENT state is whatever the
highest-numbered manifest in ``_v/`` points at:

    <warehouse>/<relation>/
        _v/000000000001.json      {"data_dir": "d-000000000001", ...}
        _v/000000000002.json      {"data_dir": "d-000000000002", ...}
        d-000000000001/  part-*.parquet        (old version, vacuumable)
        d-000000000002/  part-*.parquet        (current)

Write protocol (replaces the round<=6 staged-rename swap, whose rename
step is copy+delete and non-atomic on S3A):

    1. write the new state to a fresh data dir ``d-<n+1>`` — never
       touches the current version's files;
    2. COMMIT by atomically creating ``_v/<n+1>.json`` (a single-object
       create/PUT — atomic on HDFS and S3, no rename anywhere);
    3. vacuum data dirs no retained manifest references.

A crash before step 2 leaves an orphan data dir and the old version
still served — exactly what the crash-injection test pins
(tests/test_table_format.py). A crash after step 2 is a completed
commit. Two writers racing the same version collide on the manifest
create (overwrite=False) and the loser raises ``CommitConflict`` with
its data dir intact for retry. Readers resolve the manifest once per
registration, so they never observe a half-written state.

Partition-level strategies (insert_overwrite / microbatch) mutate the
current data dir through Spark's own per-partition commit protocol —
replacing one day of a date-partitioned 100 TB mart must not rewrite a
manifest-referenced copy of the other 364 days — and then publish a new
manifest pointing at the SAME data dir (schema metadata may change).

Legacy layout (pre-format tables: parquet files directly under the
table root, as the round<=6 engine wrote) reads transparently: no
``_v/`` directory means the root itself is the data dir; the first
versioned write upgrades in place and clears the legacy files after
its commit.

Reference parity note: the reference (maciejtarsa/dbt-on-snowflake)
delegates atomic DDL swaps to Snowflake (``CREATE OR REPLACE`` in
``setup/setup.sql``); this module is the engine-side equivalent for an
object-store warehouse.
"""

from __future__ import annotations

import json
import posixpath

from pyspark.sql import SparkSession

from dbt_on_snowflake_spark.engine.fs import (
    fs_create_atomic,
    fs_delete,
    fs_exists,
    fs_list,
    fs_read,
)

VERSIONS_DIR = "_v"
DATA_PREFIX = "d-"
VACUUM_KEEP = 2  # manifests (and their data dirs) retained by vacuum


class CommitConflict(RuntimeError):
    """Another writer published this version first."""


def _versions_dir(root: str) -> str:
    return posixpath.join(root, VERSIONS_DIR)


def _manifest_path(root: str, version: int) -> str:
    return posixpath.join(_versions_dir(root), f"{version:012d}.json")


def list_versions(spark: SparkSession, root: str) -> list[int]:
    names = fs_list(spark, _versions_dir(root))
    out = []
    for n in names:
        if n.endswith(".json"):
            try:
                out.append(int(n[:-5]))
            except ValueError:
                continue
    return sorted(out)


def current_version(spark: SparkSession, root: str) -> int | None:
    vs = list_versions(spark, root)
    return vs[-1] if vs else None


def read_manifest(spark: SparkSession, root: str, version: int) -> dict:
    return json.loads(fs_read(spark, _manifest_path(root, version)).decode())


def data_path(
    spark: SparkSession, root: str, version: int | None = None
) -> str | None:
    """Resolve a table's data directory — current state by default, a
    specific committed version with ``version`` (time travel: committed
    data dirs are immutable, so any retained version reads consistently
    regardless of later commits). Returns None if the table does not
    exist; raises on a version vacuum has already reclaimed. Legacy
    (pre-format) tables resolve to their root."""
    if version is not None:
        vs = list_versions(spark, root)
        if version not in vs:
            raise ValueError(
                f"version {version} of {root} is not available "
                f"(retained: {vs or 'none'}; older versions are "
                "reclaimed by vacuum)"
            )
        return posixpath.join(
            root, read_manifest(spark, root, version)["data_dir"]
        )
    v = current_version(spark, root)
    if v is not None:
        return posixpath.join(root, read_manifest(spark, root, v)["data_dir"])
    # legacy layout: files live at the root. A root holding ONLY orphan
    # d-* dirs (a first-ever write that crashed before its commit) is
    # NOT a table — serving it would expose uncommitted data.
    legacy = [
        n
        for n in fs_list(spark, root)
        if n != VERSIONS_DIR and not n.startswith(DATA_PREFIX)
    ]
    if legacy:
        return root
    return None


def next_txn(spark: SparkSession, root: str) -> tuple[int, str]:
    """(version to commit, fresh data dir name) for a new full write."""
    v = (current_version(spark, root) or 0) + 1
    return v, f"{DATA_PREFIX}{v:012d}"


def commit(
    spark: SparkSession,
    root: str,
    version: int,
    data_dir: str,
    meta: dict | None = None,
) -> None:
    """Publish ``data_dir`` as version ``version`` — ONE atomic file
    create; no rename, no window where readers see a missing table."""
    manifest = {"version": version, "data_dir": data_dir, **(meta or {})}
    payload = json.dumps(manifest, sort_keys=True).encode()
    try:
        fs_create_atomic(spark, _manifest_path(root, version), payload)
    except Exception as e:  # py4j wraps FileAlreadyExistsException
        if "exist" in str(e).lower():
            raise CommitConflict(
                f"version {version} of {root} was committed concurrently"
            ) from e
        raise


def _pins_dir(root: str) -> str:
    return posixpath.join(_versions_dir(root), "pins")


def pins(spark: SparkSession, root: str) -> dict[str, dict]:
    """pin_id -> {"data_dir", "holder"} for every live pin on ``root``.
    A pin keeps its data dir out of vacuum's reach — the reference-
    tracking half of zero-copy clones."""
    out: dict[str, dict] = {}
    for name in fs_list(spark, _pins_dir(root)):
        if not name.endswith(".json"):
            continue
        payload = fs_read(
            spark, posixpath.join(_pins_dir(root), name)
        ).decode()
        out[name[:-5]] = json.loads(payload)
    return out


def pin(
    spark: SparkSession, root: str, pin_id: str, data_dir: str, holder: str
) -> None:
    """Pin ``data_dir`` of ``root`` on behalf of ``holder`` (a clone's
    table root). Pin ids are unique per (holder, holder version), so a
    pin is only ever CREATED — one atomic PUT, no delete-then-create
    replacement window during which the dir would be unprotected. A
    retried clone that recomputes the identical pin tolerates the
    already-exists collision (same content by construction)."""
    path = posixpath.join(_pins_dir(root), f"{pin_id}.json")
    try:
        fs_create_atomic(
            spark, path,
            json.dumps(
                {"data_dir": data_dir, "holder": holder}, sort_keys=True
            ).encode(),
        )
    except Exception as e:
        # Only the benign already-exists collision (an identical retried
        # clone) is tolerated — and only after verifying the pin file IS
        # present, so a failure that merely mentions 'exist' (e.g. "path
        # does not exist") can't silently leave the clone's data dir
        # unprotected from the source's vacuum (r9 advice,
        # table_format.py:199).
        if "exist" not in str(e).lower() or not fs_exists(spark, path):
            raise


def unpin(spark: SparkSession, root: str, pin_id: str) -> None:
    fs_delete(spark, posixpath.join(_pins_dir(root), f"{pin_id}.json"))


def _staged_markers_dir(root: str) -> str:
    return posixpath.join(_versions_dir(root), "staged")


def staged_markers(spark: SparkSession, root: str) -> dict[str, dict]:
    """data_dir name -> marker payload for every live staged marker.
    Markers are short-lived (cleared on every publish/discard), so one
    may legitimately vanish between the listing and the read when a
    WAP build runs concurrently with a cron vacuum — a vanished marker
    is simply no longer live and is skipped, not an error."""
    out: dict[str, dict] = {}
    for name in fs_list(spark, _staged_markers_dir(root)):
        if not name.endswith(".json"):
            continue
        path = posixpath.join(_staged_markers_dir(root), name)
        try:
            payload = fs_read(spark, path).decode()
        except Exception:
            if fs_exists(spark, path):
                raise
            continue  # unmarked concurrently: not live
        out[name[:-5]] = json.loads(payload)
    return out


def stage_mark(
    spark: SparkSession, root: str, data_dir: str, holder: str
) -> None:
    """Mark ``data_dir`` as a STAGED (write-audit-publish) candidate so
    vacuum treats it as a live reference for the whole audit window.
    Without the marker, vacuum's invariant "an unreferenced d-* dir
    cannot be an in-flight commit" is false under --wap: the staged dir
    is exactly that until publish, and a concurrent vacuum/compact
    (e.g. a tasks.yml cron) would delete staged data mid-audit (r9
    advice, table_format.py:275). Created BEFORE the staged write
    begins — there is no window where the dir exists unmarked.

    Lifecycle: publish deliberately does NOT clear the marker after its
    commit — an eager unmark races a concurrent vacuum whose manifest
    listing predates the commit (its delete-time marker recheck would
    then see the just-committed dir as unreferenced AND unmarked; r10
    advice, runner.py:422). The marker is healed by any vacuum whose
    fresh manifest read references the dir (publish runs one
    immediately); discard clears it after deleting the dir. A marker
    leaked by a crash protects at most one orphan dir of one
    uncommitted version until that version number is reused and
    committed.
    """
    path = posixpath.join(_staged_markers_dir(root), f"{data_dir}.json")
    try:
        fs_create_atomic(
            spark, path,
            json.dumps({"holder": holder}, sort_keys=True).encode(),
        )
    except Exception as e:
        # A retried stage of the same uncommitted version reuses the
        # data-dir name; the existing marker already protects it. As in
        # pin(), tolerate only a VERIFIED already-exists collision.
        if "exist" not in str(e).lower() or not fs_exists(spark, path):
            raise


def stage_unmark(spark: SparkSession, root: str, data_dir: str) -> None:
    fs_delete(
        spark, posixpath.join(_staged_markers_dir(root), f"{data_dir}.json")
    )


def clone_pin_id(dst_root: str, dst_version: int, data_dir: str) -> str:
    """Deterministic, UNIQUE pin id per (clone target, target version,
    pinned dir): every clone creates a fresh pin file (atomic create,
    never replace); the old pin is released when the old clone manifest
    ages out of the target's retention (see ``vacuum``)."""
    import hashlib

    h = hashlib.md5(f"{dst_root}|{data_dir}".encode()).hexdigest()[:16]
    return f"clone-{h}-{dst_version:012d}"


def clone_table(spark: SparkSession, src_root: str, dst_root: str) -> dict:
    """ZERO-COPY clone (the table-format analogue of Snowflake's
    ``CREATE TABLE ... CLONE``, which the reference's dbt workflow gets
    from its warehouse): the destination gets a new manifest whose
    data_dir is the current data dir by absolute path — no data
    movement at any table size. The referenced dir is protected from
    its OWNER's vacuum by a pin (``_v/pins/`` on the owner root — when
    the source is itself a clone, the owner is the root the source's
    manifest records, so clone chains of any depth pin the root that
    can actually vacuum the dir); the pin is released automatically
    when the clone's own history stops referencing the dir (see
    ``vacuum``), i.e. after the clone is rebuilt in place and its clone
    manifest ages out of retention.

    Snapshot isolation: committed data dirs are immutable for
    full-state writes, so the clone serves a consistent version
    forever. insert_overwrite/microbatch marts mutate their current dir
    in place — a clone of one sees subsequent partition overwrites
    (same caveat as any reader pinned to that dir).

    Returns the manifest committed to ``dst_root``."""
    v = current_version(spark, src_root)
    if v is None:
        raise ValueError(
            f"{src_root} has no committed table-format version to clone "
            "(legacy pre-format tables need one versioned write first)"
        )
    m = read_manifest(spark, src_root, v)
    if m.get("cloned_from"):
        # the source is itself a clone: its data dir belongs to the
        # ORIGIN root — pin there, or the origin's vacuum could reclaim
        # the dir once the intermediate clone stops referencing it
        owner_root = m["cloned_from"]
        dir_name = posixpath.basename(m["data_dir"])
        src_dir_abs = m["data_dir"]
    else:
        owner_root = src_root
        dir_name = m["data_dir"]
        src_dir_abs = posixpath.join(src_root, m["data_dir"])
    dv, _ = next_txn(spark, dst_root)
    pid = clone_pin_id(dst_root, dv, dir_name)
    pin(spark, owner_root, pid, dir_name, holder=dst_root)
    meta = {
        k: m[k]
        for k in ("partition_by", "bucket_by", "buckets", "rows")
        if k in m
    }
    meta["cloned_from"] = owner_root
    meta["clone_pin"] = pid
    commit(spark, dst_root, dv, src_dir_abs, meta=meta)
    vacuum(spark, dst_root)
    return {"version": dv, "data_dir": src_dir_abs, **meta}


def vacuum(spark: SparkSession, root: str, keep: int = VACUUM_KEEP) -> list[str]:
    """Delete data dirs no retained manifest references — old versions
    beyond ``keep`` and orphans from crashed writers (single-writer
    engine: an unreferenced ``d-*`` dir cannot be an in-flight commit
    — EXCEPT a write-audit-publish stage, which ``stage_mark`` declares
    as a live reference for its audit window so a concurrent
    vacuum/compact cannot reap it).
    Also clears legacy root files once a manifest exists (readers have
    already moved to the pointer). Returns what it deleted.

    Clone awareness: data dirs named by a live pin survive (another
    table's manifest serves them); when an expiring manifest of THIS
    table references a clone (cloned_from/clone_pin meta) and no
    retained manifest still does, the pin on the source is released —
    the two rules together make zero-copy clones safe against both
    sides' retention cycles."""
    vs = list_versions(spark, root)
    if not vs:
        return []
    retained = vs[-keep:] if keep > 0 else vs[-1:]
    retained_manifests = [read_manifest(spark, root, v) for v in retained]
    referenced = {m["data_dir"] for m in retained_manifests}
    referenced |= {p["data_dir"] for p in pins(spark, root).values()}
    # WAP awareness: staged dirs are in-flight commits for the whole
    # audit window — live references, NOT crashed-writer orphans. A
    # marker whose dir a retained manifest now references was published
    # (or its version number was reused and committed) with a crash
    # before the unmark: the manifest protects the dir, so the
    # redundant marker is healed away here.
    for staged_name in list(staged_markers(spark, root)):
        if staged_name in referenced:
            stage_unmark(spark, root, staged_name)
        else:
            referenced.add(staged_name)
    retained_clone_pins = {
        (m.get("cloned_from"), m.get("clone_pin"))
        for m in retained_manifests
        if m.get("clone_pin")
    }
    removed = []
    for name in fs_list(spark, root):
        full = posixpath.join(root, name)
        if name.startswith(DATA_PREFIX) and name not in referenced:
            # TOCTOU guard (r10 review): a stage can begin AFTER the
            # staged_markers() snapshot above but BEFORE this listing
            # observed the dir. stage_mark creates the marker before
            # any data lands, so re-checking the marker at delete time
            # closes the race: marker present now => in-flight stage.
            if fs_exists(
                spark,
                posixpath.join(_staged_markers_dir(root), f"{name}.json"),
            ):
                continue
            # Fresh-reference recheck (r11 review): this vacuum's
            # `referenced` set may predate a commit that published this
            # very dir, and the dir's stage marker may ALREADY have been
            # healed away by a vacuum that did see the new manifest —
            # the marker recheck alone cannot save it then. Re-reading
            # the manifests here closes that race by ordering: an
            # unmark happens only after a manifest references the dir,
            # and this read happens after the (absent-)marker check, so
            # it must observe a manifest set at least as new — a
            # just-committed dir is always seen referenced. PINS are
            # re-read too (r11 review, second pass): a clone created
            # after the pins() snapshot is the same shape — pin first,
            # then the source ages out of retention; without the fresh
            # pin read a stale vacuum reaps the clone's only data dir.
            # Dirs aged out of the FRESH retention and unpinned are
            # still deleted. Cost: one version listing + <= keep
            # manifest reads + one pins listing per deletion candidate,
            # and deletions are rare.
            fresh_vs = list_versions(spark, root)
            fresh_retained = (
                fresh_vs[-keep:] if keep > 0 else fresh_vs[-1:]
            )
            if any(
                read_manifest(spark, root, v)["data_dir"] == name
                for v in fresh_retained
            ):
                continue
            if name in {
                p["data_dir"] for p in pins(spark, root).values()
            }:
                continue
            fs_delete(spark, full)
            removed.append(name)
        elif name != VERSIONS_DIR and not name.startswith(DATA_PREFIX):
            # legacy pre-format files/dirs superseded by the manifest
            fs_delete(spark, full)
            removed.append(name)
    for v in vs:
        if v not in retained:
            m = read_manifest(spark, root, v)
            key = (m.get("cloned_from"), m.get("clone_pin"))
            if m.get("clone_pin") and key not in retained_clone_pins:
                unpin(spark, m["cloned_from"], m["clone_pin"])
            fs_delete(spark, _manifest_path(root, v))
    return removed
