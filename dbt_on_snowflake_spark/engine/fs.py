"""Warehouse filesystem operations via the Hadoop FileSystem API.

The engine's staged-rename swap protocol and index-table cleanup were
originally ``os.rename``/``shutil.rmtree`` — correct on the sandbox's
local warehouse but wrong the moment ``spark.sql.warehouse.dir`` points
at an object store (the 100 TB deployment). Routing every mutation
through ``Path.getFileSystem`` makes the SAME code work on file://,
hdfs://, s3a://, gs://, ...: the scheme picks the implementation.

Atomicity: table commits do NOT rely on rename. ``engine/table_format``
publishes a new table state by atomically creating a single manifest file
(``fs_create_atomic``) that readers resolve through — a one-object PUT,
atomic on HDFS (create) and on S3 (PUT visibility is all-or-nothing).
Renames here are used only for non-commit housekeeping.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def _fs_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs_path(spark, path)
    return bool(fs.exists(p))


def fs_delete(spark: SparkSession, path: str) -> None:
    """Recursive delete; a missing path is not an error."""
    fs, p = _fs_path(spark, path)
    fs.delete(p, True)


def fs_rename(spark: SparkSession, src: str, dst: str) -> None:
    fs, s = _fs_path(spark, src)
    _, d = _fs_path(spark, dst)
    if not fs.rename(s, d):
        raise OSError(f"rename failed: {src} -> {dst}")


def fs_list(spark: SparkSession, path: str) -> list[str]:
    """Child names (not full paths) of a directory; [] if missing."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    return [st.getPath().getName() for st in fs.listStatus(p)]


def fs_read(spark: SparkSession, path: str) -> bytes:
    fs, p = _fs_path(spark, path)
    stream = fs.open(p)
    try:
        jvm = spark._jvm
        out = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 8192, False)
        return bytes(out.toByteArray())
    finally:
        stream.close()


def fs_mtime(spark: SparkSession, path: str) -> int | None:
    """Modification time (ms) of a path itself; None if missing —
    including a path that vanishes between the existence probe and the
    status read (a concurrent rename mid-flight), which would
    otherwise escape as a Py4JJavaError through callers whose
    documented contract is OSError (r14 review pass 9, finding 1)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return None
    try:
        return int(fs.getFileStatus(p).getModificationTime())
    except Exception as exc:  # noqa: BLE001 — classify below
        s = str(exc)
        if "FileNotFound" in s or "does not exist" in s:
            return None
        raise


def fs_size(spark: SparkSession, path: str) -> int:
    """Total bytes under a path (getContentSummary); 0 if missing."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return 0
    return int(fs.getContentSummary(p).getLength())


def fs_count_files(
    spark: SparkSession, path: str, suffix: str = ".parquet"
) -> int:
    """Recursive count of data files under a path; 0 if missing. The
    small-file metric index compaction is judged by."""
    return len(fs_list_files(spark, path, suffix))


def fs_list_files(
    spark: SparkSession,
    path: str,
    suffix: str = ".parquet",
    committed_only: bool = True,
) -> list[str]:
    """Recursive list of data-file paths (full URIs) under a path; []
    if missing. See ``fs_file_stats`` for the ``committed_only``
    contract — race/emptiness GUARDS pass False, read PROBES keep the
    default. One traversal shared with fs_file_stats so a snapshot and
    the fingerprint can't diverge."""
    return [
        p
        for p, _size, _mtime in fs_file_stats(
            spark, path, suffix, committed_only
        )
    ]


def fs_file_stats(
    spark: SparkSession,
    path: str,
    suffix: str = ".parquet",
    committed_only: bool = True,
) -> list[tuple[str, int, int]]:
    """Recursive ``(path, size, mtime_ms)`` listing of data files under
    a path; [] if missing. A change-detection fingerprint source: a
    corpus regenerated in place at the same path changes size or mtime
    even when the file set is identical (r10 advice, similarity.py:2323).

    ``committed_only`` (default): files under hidden path segments
    (``_temporary/**`` staging, ``.``-prefixed) are EXCLUDED — Spark's
    own read-path convention. The append/delete idempotence PROBES need
    this (r12 review pass 5): they read the listing as explicit leaf
    paths, bypassing Spark's hidden-dir filtering, so an uncommitted
    staged file would count a retried batch as already-ingested and
    silently drop it. Race/emptiness GUARDS pass ``False`` (r12 review
    pass 6): the compaction snapshot-recheck and the fold's
    drop-when-empty decision must SEE an in-flight staged write, or
    they treat a concurrently-growing table as quiescent and destroy
    the racing batch's commit."""
    out = [
        (full, size, mtime)
        for full, size, mtime, hidden in _file_entries(spark, path, suffix)
        if not (committed_only and hidden)
    ]
    return sorted(out)


def _file_entries(
    spark: SparkSession, path: str, suffix: str
) -> list[tuple[str, int, int, bool]]:
    """One recursive traversal yielding ``(path, size, mtime_ms,
    hidden)`` — the shared walk behind ``fs_file_stats`` and
    ``fs_list_files_split`` so call sites needing both the committed
    and the staged view pay ONE listing (a LIST per call on object
    stores)."""
    fs, p = _fs_path(spark, path)
    if not fs.exists(p):
        return []
    # qualify the root the same way listFiles qualifies results, or the
    # segment arithmetic below misaligns on bare (scheme-less) inputs
    p = fs.makeQualified(p)
    base_depth = len(p.toString().rstrip("/").split("/"))
    it = fs.listFiles(p, True)
    out: list[tuple[str, int, int, bool]] = []
    while it.hasNext():
        st = it.next()
        fpath = st.getPath()
        full = fpath.toString()
        if not fpath.getName().endswith(suffix):
            continue
        # any path segment BELOW the listing root starting with _ or .
        # marks uncommitted/metadata content (the final segment too:
        # _SUCCESS, ._COPYING_ renditions carry no committed rows)
        segs = full.rstrip("/").split("/")[base_depth:]
        hidden = any(s.startswith(("_", ".")) for s in segs)
        out.append((full, st.getLen(), st.getModificationTime(), hidden))
    return out


def fs_list_files_split(
    spark: SparkSession, path: str, suffix: str = ".parquet"
) -> tuple[list[str], list[str]]:
    """``(committed, staged)`` data-file paths in ONE traversal — for
    the triage sites that must distinguish committed rows from
    in-flight ``_temporary`` staging without paying two LISTs."""
    committed: list[str] = []
    staged: list[str] = []
    for full, _size, _mtime, hidden in _file_entries(spark, path, suffix):
        (staged if hidden else committed).append(full)
    return sorted(committed), sorted(staged)


def fs_create_atomic(spark: SparkSession, path: str, data: bytes) -> None:
    """Create a NEW file with ``data`` — fails if it already exists
    (overwrite=False), which is the commit-conflict signal for two
    writers racing to publish the same table version. The file becomes
    visible only complete: HDFS create+close is atomic; on S3A close()
    issues the single PUT."""
    fs, p = _fs_path(spark, path)
    stream = fs.create(p, False)
    try:
        stream.write(bytearray(data))
    finally:
        stream.close()


# suffix of the staging name fs_replace_atomic publishes through; a
# reader that may observe a mid-replace crash goes through
# fs_read_replaceable instead of fs_read
REPLACE_NEW_SUFFIX = ".new"
# the exclusive write-staging name (step 3's first half) — never read
REPLACE_TMP_SUFFIX = REPLACE_NEW_SUFFIX + ".tmp"


def is_replace_artifact(name: str, base_suffix: str = "") -> bool:
    """Whether ``name`` is one of the replace protocol's staging names
    (the ``.new`` twin or the never-read ``.new.tmp`` claim) — the one
    place the suffixes are spelled, so crash-leftover tolerance in
    cleanup gates (e.g. the tombstone pristine drop) cannot drift from
    the protocol (r14 review pass 4, finding 6). ``base_suffix``
    restricts the match to artifacts OF files with that suffix
    (e.g. ".json"): a deletion gate must not treat a foreign
    ``_export.csv.new`` as an ignorable protocol leftover (pass 9,
    finding 6)."""
    return name.endswith((
        base_suffix + REPLACE_NEW_SUFFIX,
        base_suffix + REPLACE_TMP_SUFFIX,
    ))

# a `.new` alongside a live canonical that is OLDER than this is a
# crashed writer's step-3 leftover (safe to heal away); a YOUNGER one
# is plausibly a CONCURRENT writer mid-protocol — deleting its
# complete `.new` while it deletes the canonical would strand the path
# with NEITHER file, the exact window the protocol exists to remove
# (r14 review, finding 1) — so the heal raises contention instead.
# The gate compares the DRIVER's wall clock to the STORE's mtime, so
# it assumes driver/store clocks agree within minutes (the same model
# as the 48h staging reclaim and every mtime-based GC here; NTP-synced
# deployments are orders of magnitude inside the 10-minute margin).
# A driver running >10 min AHEAD of the store could misread a live
# writer's .new as stale — keep the gate generous rather than tight.
REPLACE_STALE_MS = 10 * 60 * 1000


def _claim_blocked(spark: SparkSession, p: str) -> int | None:
    """How long (ms) a replace-protocol artifact at ``p`` must still be
    treated as a LIVE concurrent writer's: the remaining stale-gate
    wait when it is younger than ``REPLACE_STALE_MS``, the full gate
    when it vanished between the caller's existence probe and the
    mtime read (a writer just moved it — r14 review pass 8, finding 3),
    ``None`` when it is provably abandoned. One gate shared by all
    three heal/claim sites so the freshness contract cannot
    desynchronize between them (pass 8, finding 5)."""
    import time

    mtime = fs_mtime(spark, p)
    if mtime is None:
        return REPLACE_STALE_MS
    left = REPLACE_STALE_MS - (time.time() * 1000 - mtime)
    return int(left) if left > 0 else None


def _raise_contention(p: str, remaining_ms: int) -> None:
    # surface the wait: after a crash, a retry within the stale gate
    # raises this for up to REPLACE_STALE_MS where pre-r14 code
    # self-healed immediately — intentional (healing a LIVE writer's
    # twin strands the path with neither file), test-pinned, and
    # documented operator-facing in README.md §maintenance (r14 advice
    # #4: the horizon must not live only in this module)
    import math

    # ceil, floored at 1: with <1s of gate left a truncating render
    # would tell the operator "clears in <= 0 s" while the call still
    # raises (r15 advice #3)
    raise OSError(
        f"concurrent rewrite in progress: {p} is fresh (or just "
        "moved) — retry after the other writer commits; if that writer "
        "crashed, the stale gate clears in <= "
        f"{max(1, math.ceil(remaining_ms / 1000))} s"
    )


def fs_replace_atomic(spark: SparkSession, path: str, data: bytes) -> None:
    """Replace ``path``'s contents so that a crash at ANY point leaves
    a complete copy readable via ``fs_read_replaceable`` — the
    crash-window-free rewrite for single-file metadata sidecars (a bare
    delete-then-create leaves NO file between the two calls; r13
    verdict Next #4). Protocol (all steps driver-side, sequential):

    1. heal a prior writer's crash — but only once the leftover is
       provably ABANDONED (older than ``REPLACE_STALE_MS``): a
       ``<path>.new`` with no canonical ``path`` is COMPLETE by
       construction (the canonical is only ever deleted in step 4,
       strictly after step 3 finished) and is renamed into place
       before replacing; one alongside a live canonical is a
       superseded step-3 leftover and is deleted. A FRESH ``.new`` in
       EITHER state is indistinguishable from a concurrent writer
       mid-protocol, so the heal raises contention instead — promoting
       or deleting a live writer's twin under it is how a path ends up
       with NEITHER file (r14 review, finding 1 + pass 7, finding 1).
       The cost: a crashed write's immediate retry waits out the stale
       gate; readers lose nothing meanwhile (``fs_read_replaceable``
       serves the complete twin);
    2. (now no ``.new`` exists)
    3. write the new contents to ``<path>.new.tmp`` (never read by
       anyone), then rename to ``<path>.new`` — so a VISIBLE ``.new``
       is complete even for the first-ever write of the path (HDFS and
       local filesystems expose a file mid-create); a rename that
       fails because ``.new`` appeared since step 1 is a concurrent
       writer — contention, not corruption;
    4. delete the canonical;
    5. rename ``<path>.new`` -> ``path`` (source is complete, dest is
       absent — the rename cannot half-apply).

    One writer per path at a time is the supported regime (these are
    maintenance-path metadata rewrites); a detected concurrent writer
    fails LOUDLY with OSError and the caller retries after the other
    commit lands — crashed leftovers age past the stale gate and heal.

    Store-capability boundary (r14 review pass 8, finding 1; tier
    corrected per r14 advice #3): the exclusive tmp claim is ATOMIC on
    HDFS (create-if-absent is a namespace operation under the
    namenode's lock). On S3A, ``create(overwrite=false)`` is
    HEAD-then-PUT, and on LOCAL filesystems Hadoop's
    RawLocalFileSystem is an exists-check-then-create (no O_EXCL) —
    both tiers let two writers racing within that window believe they
    won, so the loud-contention guarantee there is best-effort and the
    single-writer regime (tasks.yml serializes all scheduled
    maintenance through one runner) is the operative protection;
    CRASH safety — the property this protocol exists for — is
    unaffected on every tier (a torn tmp is never read; visibility of
    the rename/PUT is all-or-nothing).

    Readers that never race a replace (the canonical is written once
    at build time) may keep plain ``fs_read``; anything reattaching or
    proving state across sessions must use ``fs_read_replaceable``."""
    path_new = path + REPLACE_NEW_SUFFIX
    path_tmp = path + REPLACE_TMP_SUFFIX
    if fs_exists(spark, path_new):
        if not fs_exists(spark, path):
            # canonical absent + `.new` present: EITHER a crashed
            # writer between its steps 4-5 (heal: promote) OR a live
            # writer in that same instant (its own promote is
            # milliseconds away — healing under it would let both
            # writers proceed and strand the path with neither file,
            # r14 review pass 7, finding 1). The same stale gate
            # distinguishes them; readers are unaffected either way
            # (fs_read_replaceable serves the complete `.new`).
            left = _claim_blocked(spark, path_new)
            if left is not None:
                _raise_contention(path_new, left)
            fs_rename(spark, path_new, path)
        else:
            left = _claim_blocked(spark, path_new)
            if left is not None:
                _raise_contention(path_new, left)
            fs_delete(spark, path_new)
    # step 3 in two sub-steps so a VISIBLE `.new` is always complete,
    # even for the FIRST-ever write of a path (HDFS/local expose a file
    # mid-create; a torn first `.new` with no canonical would otherwise
    # read back as 'complete' garbage — r14 review pass 2, finding 1):
    # write the bytes to a `.new.tmp` nobody ever reads, then rename.
    # The tmp is claimed with an EXCLUSIVE create — never a blind
    # delete-then-create, which would let writer B destroy writer A's
    # staged bytes and then have A rename B's bytes into place while
    # reporting success to A (silent lost update — r14 review pass 3,
    # finding 1). A FRESH existing tmp is a concurrent writer (loud
    # contention); a STALE one is a crashed writer's leftover (cleared,
    # then claimed).
    if fs_exists(spark, path_tmp):
        left = _claim_blocked(spark, path_tmp)
        if left is not None:
            _raise_contention(path_tmp, left)
        fs_delete(spark, path_tmp)
    try:
        fs_create_atomic(spark, path_tmp, data)
    except Exception as exc:  # noqa: BLE001 — classify, then re-raise
        # classify by the JAVA EXCEPTION CLASS first — message
        # substrings are brittle across Hadoop FS implementations, and
        # a create-refusal whose message doesn't match would take the
        # 'partial write is ours' branch and delete a competing
        # writer's live claim (r14 advice #2); the substring check
        # stays as the fallback for wrappers that lose the cause class
        if (
            _java_exc_is(
                exc, "FileAlreadyExistsException",
                # HDFS lease conflict: another writer has the tmp
                # OPEN — also a refusal; misreading it as our own
                # partial write would delete the WINNER's live claim
                # (r14 review pass 9, finding 2)
                "AlreadyBeingCreatedException",
            )
            or "alreadyexists" in (m := str(exc).lower().replace(" ", ""))
            or "alreadybeingcreated" in m
        ):
            # the exclusive create was REFUSED: another writer claimed
            # the tmp between our heal and our create — contention
            raise OSError(
                f"concurrent rewrite in progress: {path_tmp} was "
                "claimed by another writer; retry after it commits"
            ) from exc
        # the create OPENED then the write/close failed (disk full,
        # transient IO): the partial tmp is OURS — clear it so the
        # path is not wedged behind the stale gate for 10 minutes
        # after the condition clears, and surface the real error
        # (r14 review pass 4, finding 1)
        fs_delete(spark, path_tmp)
        raise
    # re-check `.new` absence AFTER winning the tmp claim: POSIX/local
    # rename silently REPLACES an existing destination (only HDFS
    # returns false), so relying on the rename to refuse would let a
    # competitor's just-renamed `.new` be overwritten — that competitor
    # then deletes the canonical and fails its own final rename,
    # stranding the path with NEITHER file (r14 review pass 5,
    # finding 2). The check is race-free, not merely narrowed: the tmp
    # is an exclusive token, so any competing `.new` was renamed from a
    # tmp that existed BEFORE ours was created — its rename
    # happened-before our create succeeded, and is visible here.
    if fs_exists(spark, path_new):
        fs_delete(spark, path_tmp)  # release our claim
        raise OSError(
            f"concurrent rewrite in progress: {path_new} appeared "
            "after the heal step; retry after the other writer "
            "commits"
        )
    try:
        fs_rename(spark, path_tmp, path_new)
    except Exception as exc:  # noqa: BLE001 — Py4JJavaError too, not
        # just the returns-false OSError (r14 review pass 7, finding 3)
        # release our claim on EVERY failure path — a leaked fresh tmp
        # would trip the stale gate's contention check on each retry
        # for 10 minutes with no other writer in sight (r14 review
        # pass 6, finding 1)
        fs_delete(spark, path_tmp)
        if fs_exists(spark, path_new):  # HDFS dest-exists refusal
            raise OSError(
                f"concurrent rewrite in progress: {path_new} appeared "
                "after the heal step; retry after the other writer "
                "commits"
            ) from exc
        raise  # a real rename failure (missing parent, IO error)
    fs_delete(spark, path)
    fs_rename(spark, path_new, path)


def fs_read_replaceable(spark: SparkSession, path: str) -> bytes | None:
    """Read a file maintained by ``fs_replace_atomic`` (see
    ``fs_read_replaceable_ex``)."""
    return fs_read_replaceable_ex(spark, path)[0]


def _java_exc_is(exc: Exception, *class_names: str) -> bool:
    """Whether a Py4J-wrapped failure's JAVA exception class (or any
    class in its cause chain) is one of ``class_names`` (simple names).
    Message-substring classification is brittle across Hadoop FS
    implementations (r14 advice #2) — the class name is the contract
    the FS API actually documents; callers keep a substring fallback
    for wrappers that lose the cause."""
    je = getattr(exc, "java_exception", None)
    seen = 0
    while je is not None and seen < 8:  # bounded cause-chain walk
        try:
            name = je.getClass().getName()
        except Exception:  # noqa: BLE001 — a dead gateway: no class info
            return False
        if name.rsplit(".", 1)[-1] in class_names:
            return True
        try:
            je = je.getCause()
        except Exception:  # noqa: BLE001
            return False
        seen += 1
    return False


def _vanished(exc: Exception) -> bool:
    """True when an fs_read failure is the file disappearing between
    the existence probe and the read — the signature of racing a
    concurrent ``fs_replace_atomic`` — rather than a real IO error
    (permissions, corruption) that must propagate. Classified by the
    Java exception class first (r14 advice #2), message substring as
    the fallback."""
    if _java_exc_is(exc, "FileNotFoundException", "PathNotFoundException"):
        return True
    s = str(exc)
    return "FileNotFound" in s or "does not exist" in s


def fs_read_replaceable_ex(
    spark: SparkSession, path: str
) -> tuple[bytes | None, bool]:
    """Read a file maintained by ``fs_replace_atomic``: the canonical
    ``path`` when present, else the ``<path>.new`` a writer that
    crashed between delete and rename left behind (complete by the
    protocol's step ordering), else None. Returns ``(contents,
    read_from_canonical)`` so callers that rewrite-on-missing-canonical
    need no second existence round-trip (r14 review, finding 5).

    Never raises on absence, INCLUDING mid-race absence: a concurrent
    replace can delete the canonical between the probe and the read
    (caught and retried) or hold the one (delete -> rename) instant
    where neither name is visible (re-probed) — bounded attempts, then
    None only if the file is truly gone (r14 review, finding 2).

    The common TRULY-ABSENT case (drift sweeps over baseline-less
    families, sidecar-less dir triage) stays cheap: when nothing
    exists and no read raced, one immediate canonical re-probe covers
    the delete->rename instant and the call returns after 3 existence
    round-trips with no sleeps; the retry-with-backoff loop engages
    only when a read actually observed a file vanish (r14 review
    pass 4, finding 5)."""
    import time

    path_new = path + REPLACE_NEW_SUFFIX
    for attempt in range(3):
        raced = False
        for p, canonical in ((path, True), (path_new, False)):
            if not fs_exists(spark, p):
                continue
            try:
                return fs_read(spark, p), canonical
            except Exception as exc:  # noqa: BLE001 — classify below
                if not _vanished(exc):
                    raise
                raced = True
        if not raced:
            # neither name existed: either truly absent, or we probed
            # inside a replace's delete->rename instant — one canonical
            # re-probe resolves which without taxing the absent case
            if fs_exists(spark, path):
                try:
                    return fs_read(spark, path), True
                except Exception as exc:  # noqa: BLE001
                    if not _vanished(exc):
                        raise
                    raced = True
            if not raced:
                return None, False
        if attempt < 2:
            time.sleep(0.05 * (attempt + 1))
    return None, False


def fs_copy(spark: SparkSession, src: str, dst: str) -> None:
    """Recursive copy (FileUtil.copy) — `clone`'s physical fallback when
    the warehouse has no zero-copy clone primitive. On Delta/Iceberg the
    equivalent is a metadata-only SHALLOW CLONE."""
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    sfs, s = _fs_path(spark, src)
    dfs, d = _fs_path(spark, dst)
    if not jvm.org.apache.hadoop.fs.FileUtil.copy(sfs, s, dfs, d, False, conf):
        raise OSError(f"copy failed: {src} -> {dst}")
