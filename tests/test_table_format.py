"""Atomic manifest-pointer table format (engine/table_format.py).

The write path's crash contract: data lands in a fresh dir, ONE atomic
manifest create publishes it. These tests pin the states around that
boundary — crash before commit leaves the old version served (never a
missing or half-swapped table, the failure mode of the old rename-swap on
S3A), commit conflicts surface instead of clobbering, vacuum reclaims
orphans and old versions, and legacy (pre-format) tables read and upgrade
transparently — plus an engine-level crash injection through Runner's
incremental merge path.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from dbt_on_snowflake_spark.engine import table_format as tf
from dbt_on_snowflake_spark.engine.project import Project
from dbt_on_snowflake_spark.engine.runner import Runner


def _mkdf(spark, vals):
    return spark.createDataFrame([(i, v) for i, v in vals], "id long, v string")


def _versioned_write(spark, root, df):
    v, ddir = tf.next_txn(spark, root)
    df.write.mode("overwrite").parquet(os.path.join(root, ddir))
    tf.commit(spark, root, v, ddir)
    return v


def test_crash_before_commit_serves_old_version(spark, tmp_path):
    root = str(tmp_path / "t")
    _versioned_write(spark, root, _mkdf(spark, [(1, "a"), (2, "a")]))

    # simulated crash: new state fully written, process dies before the
    # manifest create — readers must still resolve version 1
    v, ddir = tf.next_txn(spark, root)
    _mkdf(spark, [(1, "b")]).write.mode("overwrite").parquet(
        os.path.join(root, ddir)
    )
    assert tf.current_version(spark, root) == 1
    got = {r.v for r in spark.read.parquet(tf.data_path(spark, root)).collect()}
    assert got == {"a"}

    # vacuum reclaims the orphan dir; a retry then lands the same version
    removed = tf.vacuum(spark, root)
    assert ddir in removed
    _versioned_write(spark, root, _mkdf(spark, [(1, "b")]))
    got = {r.v for r in spark.read.parquet(tf.data_path(spark, root)).collect()}
    assert got == {"b"}


def test_commit_conflict_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    _versioned_write(spark, root, _mkdf(spark, [(1, "a")]))
    with pytest.raises(tf.CommitConflict):
        tf.commit(spark, root, 1, "d-000000000009")


def test_vacuum_retains_keep_versions(spark, tmp_path):
    root = str(tmp_path / "t")
    for tag in ("a", "b", "c"):
        _versioned_write(spark, root, _mkdf(spark, [(1, tag)]))
        tf.vacuum(spark, root)
    names = set(os.listdir(root))
    assert "d-000000000003" in names and "d-000000000002" in names
    assert "d-000000000001" not in names  # beyond VACUUM_KEEP=2
    assert tf.list_versions(spark, root) == [2, 3]
    got = {r.v for r in spark.read.parquet(tf.data_path(spark, root)).collect()}
    assert got == {"c"}


def test_legacy_layout_reads_and_upgrades(spark, tmp_path):
    """A pre-format table (parquet at the root, as rounds <=6 wrote) must
    read as-is, and the first versioned write must upgrade it in place —
    manifest readers take over, legacy files are cleared post-commit."""
    root = str(tmp_path / "t")
    _mkdf(spark, [(1, "old")]).write.mode("overwrite").parquet(root)
    assert tf.data_path(spark, root) == root  # legacy: root is the data dir

    _versioned_write(spark, root, _mkdf(spark, [(1, "new")]))
    tf.vacuum(spark, root)
    got = {r.v for r in spark.read.parquet(tf.data_path(spark, root)).collect()}
    assert got == {"new"}
    leftovers = [
        n for n in os.listdir(root)
        if n != tf.VERSIONS_DIR and not n.startswith(tf.DATA_PREFIX)
    ]
    assert leftovers == []


def _crash_project(tmp_path, data):
    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    with open(f"{root}/project.yml", "w") as f:
        f.write("name: crash_demo\nmodels:\n  models:\n    materialized: view\n")
    with open(f"{root}/sources.yml", "w") as f:
        f.write(
            f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
            "    tables:\n      - name: ev\n"
        )
    with open(f"{root}/models/models/fact.sql", "w") as f:
        f.write(
            "{{ config(materialized='incremental', unique_key='event_id') }}\n"
            "SELECT event_id, user_id FROM {{ source('raw', 'ev') }}\n"
        )
    return root


def test_runner_incremental_crash_between_write_and_commit(
    spark, tmp_path, monkeypatch
):
    """Engine-level crash injection: kill the merge materialization after
    the data write but before the manifest commit; the table must still
    serve the prior version, and a plain re-run must succeed."""
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame([(1, 10), (2, 11)], columns=["event_id", "user_id"]).to_parquet(
        os.path.join(data, "ev.parquet"), index=False
    )
    root = _crash_project(tmp_path, data)
    project = Project(root, target="dev")
    assert Runner(spark, project).run()[0].status == "success"
    assert spark.table("dev_fact").count() == 2

    pd.DataFrame(
        [(2, 99), (3, 12)], columns=["event_id", "user_id"]
    ).to_parquet(os.path.join(data, "ev.parquet"), index=False)

    real_commit = tf.commit

    def dying_commit(*a, **kw):
        raise RuntimeError("injected crash before manifest commit")

    monkeypatch.setattr(tf, "commit", dying_commit)
    res = Runner(spark, project).run()
    assert res[0].status == "error"
    # old version still fully served — never a missing/half-swapped table
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "dev_fact")
    assert tf.current_version(spark, troot) == 1
    users = {
        r.user_id
        for r in spark.read.parquet(tf.data_path(spark, troot)).collect()
    }
    assert users == {10, 11}

    monkeypatch.setattr(tf, "commit", real_commit)
    res2 = Runner(spark, project).run()
    assert res2[0].status == "success"
    rows = {
        r.event_id: r.user_id for r in spark.table("dev_fact").collect()
    }
    assert rows == {1: 10, 2: 99, 3: 12}


def test_time_travel_reads_retained_versions(spark, tmp_path):
    """data_path(version=N) reads any RETAINED committed version — the
    immutable data dirs give consistent snapshots for free; a vacuumed
    version errors with the retained list, not a partial read."""
    root = str(tmp_path / "t")
    for tag in ("a", "b"):
        _versioned_write(spark, root, _mkdf(spark, [(1, tag)]))
    v1 = spark.read.parquet(tf.data_path(spark, root, version=1))
    v2 = spark.read.parquet(tf.data_path(spark, root, version=2))
    assert {r.v for r in v1.collect()} == {"a"}
    assert {r.v for r in v2.collect()} == {"b"}

    _versioned_write(spark, root, _mkdf(spark, [(1, "c")]))
    tf.vacuum(spark, root)  # keep=2 -> v1 reclaimed
    with pytest.raises(ValueError, match="retained"):
        tf.data_path(spark, root, version=1)
    assert {r.v for r in spark.read.parquet(
        tf.data_path(spark, root, version=2)
    ).collect()} == {"b"}


def test_show_at_version_previews_old_table_state(spark, tmp_path, capsys):
    """`show --select m --at-version N` previews the model's table as of
    a prior commit — the audit surface for 'what did this mart say
    yesterday' without any extra storage copy."""
    import pandas as pd

    from dbt_on_snowflake_spark.__main__ import main

    data = str(tmp_path / "data")
    os.makedirs(data)

    def load(val):
        pd.DataFrame({"id": [1], "v": [val]}).to_parquet(
            os.path.join(data, "t.parquet"), index=False
        )

    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write(
        "name: ttshow\nmodels:\n  models:\n    materialized: table\n"
    )
    open(f"{root}/sources.yml", "w").write(
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: t\n"
    )
    open(f"{root}/models/models/ttm.sql", "w").write(
        "SELECT id, v FROM {{ source('raw', 't') }}"
    )
    load("first")
    assert main(["run", "--project", root]) == 0
    load("second")
    assert main(["run", "--project", root]) == 0
    capsys.readouterr()

    assert main(["show", "--project", root, "--select", "ttm",
                 "--at-version", "1"]) == 0
    out = capsys.readouterr().out
    assert "first" in out and "second" not in out and "@ v1" in out
    assert main(["show", "--project", root, "--select", "ttm",
                 "--at-version", "2"]) == 0
    out = capsys.readouterr().out
    assert "second" in out


def test_manifest_records_row_counts(spark, tmp_path):
    """Every versioned commit records its row count (from the write's
    own Observation) — the version history doubles as an audit trail."""
    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": [1, 2, 3]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write(
        "name: rowsmeta\nmodels:\n  models:\n    materialized: table\n"
    )
    open(f"{root}/sources.yml", "w").write(
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: t\n"
    )
    open(f"{root}/models/models/rm.sql", "w").write(
        "SELECT id FROM {{ source('raw', 't') }}"
    )
    runner = Runner(spark, Project(root, target="dev"))
    assert runner.run()[0].status == "success"
    troot = runner._table_path("dev_rm")
    v = tf.current_version(spark, troot)
    assert tf.read_manifest(spark, troot, v)["rows"] == 3


def test_vacuum_cli_reclaims_across_warehouse(spark, tmp_path, capsys):
    """`vacuum` walks the warehouse, reclaims old versions + orphan dirs
    of every versioned table, and leaves non-versioned dirs alone."""
    from dbt_on_snowflake_spark.__main__ import main

    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": [1]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write(
        "name: vaccli\nmodels:\n  models:\n    materialized: table\n"
    )
    open(f"{root}/sources.yml", "w").write(
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: t\n"
    )
    open(f"{root}/models/models/vc.sql", "w").write(
        "SELECT id FROM {{ source('raw', 't') }}"
    )
    for _ in range(3):  # three commits -> one dir beyond VACUUM_KEEP=2
        assert main(["run", "--project", root]) == 0
    capsys.readouterr()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "dev_vc")
    # per-write vacuum already ran; plant an orphan to reclaim
    os.makedirs(os.path.join(troot, "d-000000000099"), exist_ok=True)
    assert main(["vacuum", "--project", root]) == 0
    out = capsys.readouterr().out
    assert "dev_vc" in out and "d-000000000099" in out
    assert not os.path.isdir(os.path.join(troot, "d-000000000099"))
    assert spark.read.parquet(tf.data_path(spark, troot)).count() == 1


def test_table_format_random_op_sequences_hold_invariants(spark, tmp_path):
    """Property check over random operation sequences (committed write /
    crashed write / vacuum): after every step the table serves exactly
    the LAST COMMITTED value, versions are strictly increasing, and
    vacuum never removes a dir any retained manifest references."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(
            st.sampled_from(["write", "crash", "vacuum"]),
            min_size=1,
            max_size=7,
        )
    )
    def check(ops):
        import uuid

        root = str(tmp_path / f"t_{uuid.uuid4().hex[:8]}")
        committed = None
        tag = 0
        for op in ops:
            if op == "write":
                tag += 1
                _versioned_write(spark, root, _mkdf(spark, [(1, f"v{tag}")]))
                committed = f"v{tag}"
            elif op == "crash":
                tag += 1
                v, ddir = tf.next_txn(spark, root)
                _mkdf(spark, [(1, f"v{tag}")]).write.mode("overwrite").parquet(
                    os.path.join(root, ddir)
                )  # no commit: simulated death before publish
            else:
                tf.vacuum(spark, root)
            vs = tf.list_versions(spark, root)
            assert vs == sorted(set(vs))
            if committed is None:
                assert vs == []
                # a crashed first write must NOT make the table exist —
                # serving an orphan dir would expose uncommitted data
                assert tf.data_path(spark, root) is None
                continue
            got = {
                r.v
                for r in spark.read.parquet(tf.data_path(spark, root)).collect()
            }
            assert got == {committed}, (ops, op, committed, got)
            # every retained manifest's data dir exists on disk
            for v in vs[-tf.VACUUM_KEEP:]:
                d = tf.read_manifest(spark, root, v)["data_dir"]
                assert os.path.isdir(os.path.join(root, d))

    check()


def test_compact_cli_coalesces_files_into_new_version(spark, tmp_path, capsys):
    """`compact` rewrites a versioned table's many small files into few,
    as a NEW committed version (readers never see a half state); rows
    and values are unchanged; partitioned tables keep their layout."""
    import glob

    from dbt_on_snowflake_spark.__main__ import main

    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": range(64), "v": range(64)}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write(
        "name: cptest\nmodels:\n  models:\n    materialized: table\n"
    )
    open(f"{root}/sources.yml", "w").write(
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: t\n"
    )
    # repartition(16) forces 16 small files — the accumulation shape
    open(f"{root}/models/models/cp.sql", "w").write(
        "SELECT /*+ REPARTITION(16) */ id, v FROM {{ source('raw', 't') }}"
    )
    assert main(["run", "--project", root]) == 0
    capsys.readouterr()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "dev_cp")
    v1 = tf.current_version(spark, troot)
    dp1 = tf.data_path(spark, troot)
    files_before = len(glob.glob(os.path.join(dp1, "*.parquet")))
    assert files_before >= 16

    assert main(["compact", "--project", root]) == 0
    out = capsys.readouterr().out
    assert f"compacted dev_cp: v{v1} -> v{v1 + 1}" in out
    assert tf.current_version(spark, troot) == v1 + 1
    dp2 = tf.data_path(spark, troot)
    files_after = len(glob.glob(os.path.join(dp2, "*.parquet")))
    assert files_after < files_before
    got = spark.read.parquet(dp2)
    assert got.count() == 64
    assert {r.id for r in got.collect()} == set(range(64))
    m = tf.read_manifest(spark, troot, v1 + 1)
    assert m["compacted_from"] == v1


def test_show_at_version_errors_cleanly(spark, tmp_path, capsys):
    """A vacuumed/unknown version or an unbuilt model gets a one-line
    stderr message and exit 2, not a traceback."""
    import pandas as pd

    from dbt_on_snowflake_spark.__main__ import main

    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"id": [1]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write(
        "name: ttclean\nmodels:\n  models:\n    materialized: table\n"
    )
    open(f"{root}/sources.yml", "w").write(
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: t\n"
    )
    open(f"{root}/models/models/ttc.sql", "w").write(
        "SELECT id FROM {{ source('raw', 't') }}"
    )
    # never built: clean message
    assert main(["show", "--project", root, "--select", "ttc",
                 "--at-version", "1"]) == 2
    err = capsys.readouterr().err
    assert "not available" in err or "no table storage" in err

    assert main(["run", "--project", root]) == 0
    capsys.readouterr()
    # unknown version: retained list in the message
    assert main(["show", "--project", root, "--select", "ttc",
                 "--at-version", "99"]) == 2
    assert "retained" in capsys.readouterr().err


def test_zero_copy_clone_pins_and_releases(spark, tmp_path):
    """clone_table commits a manifest pointing at the SOURCE's current
    data dir (no data movement); the pin keeps that dir alive through
    the source's vacuum cycles; rebuilding the clone and aging the
    clone manifest out of retention releases the pin, after which the
    source's vacuum reclaims the dir."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _versioned_write(spark, src, _mkdf(spark, [(1, "a"), (2, "a")]))
    cloned_dir = tf.data_path(spark, src)

    m = tf.clone_table(spark, src, dst)
    assert m["data_dir"] == cloned_dir
    assert m["cloned_from"] == src
    # zero-copy: no parquet landed under dst
    assert [n for n in os.listdir(dst) if n.startswith("d-")] == []
    got = {r.v for r in spark.read.parquet(tf.data_path(spark, dst)).collect()}
    assert got == {"a"}
    assert tf.pins(spark, src)[m["clone_pin"]]["data_dir"] == "d-000000000001"

    # source advances well past retention: the pinned dir must survive
    for tag in ("b", "c", "d", "e"):
        _versioned_write(spark, src, _mkdf(spark, [(1, tag)]))
        tf.vacuum(spark, src)
    assert os.path.isdir(cloned_dir)  # pin held it
    got = {r.v for r in spark.read.parquet(tf.data_path(spark, dst)).collect()}
    assert got == {"a"}  # clone still serves its snapshot
    # ...while unpinned old source versions were reclaimed
    local = [n for n in sorted(os.listdir(src)) if n.startswith("d-")]
    assert "d-000000000002" not in local and "d-000000000001" in local

    # the clone is rebuilt in place; once its clone manifest ages out of
    # retention, its vacuum releases the pin
    for tag in ("x", "y", "z"):
        _versioned_write(spark, dst, _mkdf(spark, [(9, tag)]))
        tf.vacuum(spark, dst)
    assert tf.pins(spark, src) == {}
    tf.vacuum(spark, src)
    assert not os.path.isdir(cloned_dir)


def test_reclone_pins_both_until_old_manifest_expires(spark, tmp_path):
    """Re-cloning the same destination from a newer source version
    creates a NEW pin (pins are create-only — no delete-then-create
    window where the served dir is unprotected); the old pin lives
    until the old clone manifest ages out of the destination's
    retention, then releases."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _versioned_write(spark, src, _mkdf(spark, [(1, "a")]))
    m1 = tf.clone_table(spark, src, dst)
    _versioned_write(spark, src, _mkdf(spark, [(1, "b")]))
    m2 = tf.clone_table(spark, src, dst)
    assert m1["clone_pin"] != m2["clone_pin"]
    # both clone manifests are within dst's retention -> both pins live
    ps = tf.pins(spark, src)
    assert set(ps) == {m1["clone_pin"], m2["clone_pin"]}
    assert ps[m2["clone_pin"]]["data_dir"] == "d-000000000002"
    got = {r.v for r in spark.read.parquet(tf.data_path(spark, dst)).collect()}
    assert got == {"b"}
    # dst advances past retention: the v1 clone manifest expires and its
    # pin releases; the serving v2 pin stays
    for tag in ("x", "y"):
        _versioned_write(spark, dst, _mkdf(spark, [(9, tag)]))
        tf.vacuum(spark, dst)
    ps = tf.pins(spark, src)
    assert m1["clone_pin"] not in ps


def test_clone_of_clone_pins_origin(spark, tmp_path):
    """A clone of a clone pins the ORIGIN root (the one whose vacuum
    could reclaim the dir): after the intermediate clone is rebuilt
    away and the origin churns versions, the grand-clone still serves
    its snapshot."""
    orig = str(tmp_path / "orig")
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    _versioned_write(spark, orig, _mkdf(spark, [(1, "a0")]))
    origin_dir = tf.data_path(spark, orig)
    tf.clone_table(spark, orig, a)
    mb = tf.clone_table(spark, a, b)
    assert mb["cloned_from"] == orig  # owner, not the intermediate
    assert mb["data_dir"] == origin_dir
    # the origin holds pins for BOTH clones
    holders = {p["holder"] for p in tf.pins(spark, orig).values()}
    assert holders == {a, b}
    # intermediate clone rebuilt away + vacuumed past retention: its pin
    # releases, b's pin remains
    for tag in ("x", "y", "z"):
        _versioned_write(spark, a, _mkdf(spark, [(5, tag)]))
        tf.vacuum(spark, a)
    holders = {p["holder"] for p in tf.pins(spark, orig).values()}
    assert holders == {b}
    # origin churns well past retention: the pinned dir survives and b
    # still reads its snapshot
    for tag in ("c", "d", "e"):
        _versioned_write(spark, orig, _mkdf(spark, [(1, tag)]))
        tf.vacuum(spark, orig)
    assert os.path.isdir(origin_dir)
    got = {r.v for r in spark.read.parquet(tf.data_path(spark, b)).collect()}
    assert got == {"a0"}


def test_clone_of_legacy_table_raises(spark, tmp_path):
    src = str(tmp_path / "legacy")
    _mkdf(spark, [(1, "a")]).write.mode("overwrite").parquet(src)
    with pytest.raises(ValueError, match="no committed table-format"):
        tf.clone_table(spark, src, str(tmp_path / "dst"))


def test_compact_sort_by_clusters_files(spark, tmp_path, capsys):
    """`compact --sort-by id` rewrites as range-partitioned, internally
    sorted files: per-file parquet min/max ranges on the column are
    DISJOINT, so a range filter can skip whole files — the 1-D Z-ORDER.
    Rows unchanged; the manifest records the clustering."""
    import glob

    import pyarrow.parquet as pq

    from dbt_on_snowflake_spark.__main__ import main

    data = str(tmp_path / "data")
    os.makedirs(data)
    # shuffled ids so clustering is observable
    ids = [(i * 37) % 256 for i in range(256)]
    pd.DataFrame({"id": ids, "v": range(256)}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write(
        "name: cps\nmodels:\n  models:\n    materialized: table\n"
    )
    open(f"{root}/sources.yml", "w").write(
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: t\n"
    )
    open(f"{root}/models/models/cs.sql", "w").write(
        "SELECT /*+ REPARTITION(8) */ id, v FROM {{ source('raw', 't') }}"
    )
    assert main(["run", "--project", root, "--target", "srt"]) == 0
    capsys.readouterr()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "srt_cs")
    v1 = tf.current_version(spark, troot)

    assert main(["compact", "--project", root, "--target", "srt",
                 "--sort-by", "id"]) == 0
    out = capsys.readouterr().out
    assert f"compacted srt_cs: v{v1} -> v{v1 + 1} (sorted by id)" in out
    dp = tf.data_path(spark, troot)
    ranges = []
    for f in sorted(glob.glob(os.path.join(dp, "*.parquet"))):
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "id"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        ranges.append((min(mins), max(maxs)))
    # disjoint per-file ranges: sorted by min, no overlap
    ranges.sort()
    for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, ranges
    got = spark.read.parquet(dp)
    assert got.count() == 256
    assert sorted(r.id for r in got.collect()) == sorted(ids)
    m = tf.read_manifest(spark, troot, v1 + 1)
    assert m["sorted_by"] == ["id"]


def test_compact_skips_bucketed_and_clone_tables(spark, tmp_path, capsys):
    """compact must not destroy a bucketed table's file-per-bucket
    layout nor silently materialize a zero-copy clone — both are
    skipped with a reason, and the bucketed table's zero-exchange
    property survives the maintenance pass."""
    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.__main__ import main
    from dbt_on_snowflake_spark.plans import count_shuffles, final_plan

    data = str(tmp_path / "data")
    os.makedirs(data)
    pd.DataFrame({"k": range(32), "v": range(32)}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write(
        "name: cpb\nmodels:\n  models:\n    materialized: table\n"
    )
    open(f"{root}/sources.yml", "w").write(
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: t\n"
    )
    open(f"{root}/models/models/bk.sql", "w").write(
        "{{ config(bucket_by='k', buckets=4) }}\n"
        "SELECT k, v FROM {{ source('raw', 't') }}"
    )
    assert main(["run", "--project", root, "--target", "cpb"]) == 0
    assert main(["compile", "--project", root, "--target", "cpb",
                 "--out", f"{root}/m.json"]) == 0
    assert main(["clone", "--project", root, "--target", "cpc",
                 "--state", f"{root}/m.json"]) == 0
    capsys.readouterr()

    assert main(["compact", "--project", root, "--target", "cpb"]) == 0
    out = capsys.readouterr().out
    assert "skip      cpb_bk (bucketed" in out
    assert "skip      cpc_bk (zero-copy clone" in out

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = spark.table("cpb_bk").groupBy("k").agg(F.sum("v").alias("s"))
        assert count_shuffles(final_plan(agg)) == 0
        assert agg.count() == 32
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _wap_project(tmp_path, name, threshold):
    """A source -> table model with a value-range test whose pass/fail
    is controlled by the source data vs `threshold`."""
    data = str(tmp_path / "data")
    os.makedirs(data, exist_ok=True)
    pd.DataFrame({"id": [1, 2, 3], "v": [10, 20, 30]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write(
        f"name: {name}\nmodels:\n  models:\n    materialized: table\n"
    )
    open(f"{root}/sources.yml", "w").write(
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: t\n"
    )
    open(f"{root}/models/models/mart.sql", "w").write(
        "SELECT id, v FROM {{ source('raw', 't') }}"
    )
    open(f"{root}/models/models/schema.yml", "w").write(
        "models:\n  - name: mart\n    columns:\n"
        "      - name: v\n        tests:\n"
        "          - accepted_range: {min_value: 0, "
        f"max_value: {threshold}}}\n"
    )
    return root, data


def test_wap_failing_audit_keeps_previous_version(spark, tmp_path, capsys):
    """build --wap: a version whose tests fail is NEVER published — the
    previously committed version keeps serving, the staged dir is
    deleted, and the node reports failure (descendants would skip)."""
    from dbt_on_snowflake_spark.__main__ import main

    root, data = _wap_project(tmp_path, "wap1", threshold=100)
    tgt = ["--project", root, "--target", "wp1"]
    assert main(["build", "--wap", *tgt]) == 0
    capsys.readouterr()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "wp1_mart")
    v1 = tf.current_version(spark, troot)
    assert v1 is not None

    # poison the source: v=999 violates the accepted_range audit
    pd.DataFrame({"id": [1, 2, 3, 4], "v": [10, 20, 30, 999]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    rc = main(["build", "--wap", *tgt])
    out = capsys.readouterr().out
    assert rc == 1
    assert "fail" in out
    # NOT published: same committed version, old data still served,
    # staged dir cleaned up
    assert tf.current_version(spark, troot) == v1
    assert sorted(r.v for r in spark.table("wp1_mart").collect()) == [
        10, 20, 30,
    ]
    orphans = [
        n for n in os.listdir(troot)
        if n.startswith("d-") and n != tf.read_manifest(
            spark, troot, v1
        )["data_dir"]
    ]
    assert orphans == []

    # healthy data publishes normally again
    pd.DataFrame({"id": [1, 2], "v": [50, 60]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    assert main(["build", "--wap", *tgt]) == 0
    capsys.readouterr()
    assert tf.current_version(spark, troot) == v1 + 1
    assert sorted(r.v for r in spark.table("wp1_mart").collect()) == [50, 60]


def test_wap_audit_reads_staged_candidate(spark, tmp_path, capsys):
    """The audit must test the STAGED data, not the prior version: a
    first-ever build (no committed version at all) with a failing test
    proves the gate saw the candidate — and nothing gets published."""
    from dbt_on_snowflake_spark.__main__ import main

    root, _ = _wap_project(tmp_path, "wap2", threshold=15)  # 20,30 fail
    rc = main(["build", "--wap", "--project", root, "--target", "wp2"])
    out = capsys.readouterr().out
    assert rc == 1 and "fail" in out
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "wp2_mart")
    assert tf.current_version(spark, troot) is None  # never published


def test_wap_rejects_in_place_strategies(spark, tmp_path, capsys):
    """insert_overwrite/microbatch mutate the current dir in place —
    there is no staged version to defer, so --wap errors clearly."""
    from dbt_on_snowflake_spark.__main__ import main

    root, data = _wap_project(tmp_path, "wap3", threshold=100)
    open(f"{root}/models/models/mart.sql", "w").write(
        "{{ config(materialized='incremental', "
        "incremental_strategy='insert_overwrite', partition_by='id') }}\n"
        "SELECT id, v FROM {{ source('raw', 't') }}"
    )
    rc = main(["build", "--wap", "--project", root, "--target", "wp3"])
    capsys.readouterr()
    assert rc == 1
    import json

    rr = json.load(open(f"{root}/target/run_results.json"))
    err = next(
        r["error"] for r in rr["results"] if r["name"] == "mart"
    )
    assert "insert_overwrite" in err and "--wap" in err


def test_wap_crash_between_stage_and_publish(spark, tmp_path, capsys):
    """A build that dies after staging but before the audit/publish
    (simulated by staging directly and abandoning it) leaves the old
    version served. The staged dir carries a _v/staged marker from the
    moment it is allocated, so a concurrent vacuum (e.g. a tasks.yml
    cron firing mid-audit) must NOT reclaim it (r9 advice,
    table_format.py:275); the next healthy build of the relation reuses
    the uncommitted version's dir, publishes, and the post-publish
    vacuum heals the marker away."""
    from dbt_on_snowflake_spark.__main__ import main
    from dbt_on_snowflake_spark.engine.project import Project
    from dbt_on_snowflake_spark.engine.runner import Runner

    root, data = _wap_project(tmp_path, "wapc", threshold=100)
    tgt = ["--project", root, "--target", "wpc"]
    assert main(["build", "--wap", *tgt]) == 0
    capsys.readouterr()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "wpc_mart")
    v1 = tf.current_version(spark, troot)

    # "crash": stage a new version and abandon the process state
    runner = Runner(spark, Project(root, target="wpc"), wap=True)
    runner.load_sources()
    df = spark.table("src_raw_t").selectExpr("id", "v")
    runner._stage_versioned(df, "wpc_mart", [], None)
    staged = [
        n for n in os.listdir(troot)
        if n.startswith("d-")
        and n != tf.read_manifest(spark, troot, v1)["data_dir"]
    ]
    assert staged  # the stage landed on disk...
    assert tf.current_version(spark, troot) == v1  # ...but NOT committed
    assert staged[0] in tf.staged_markers(spark, troot)

    # a vacuum racing the audit window leaves the staged dir intact —
    # this is exactly the window in which it holds unpublished data
    removed = tf.vacuum(spark, troot)
    assert staged[0] not in removed
    assert os.path.isdir(os.path.join(troot, staged[0]))

    # a fresh healthy build reuses the uncommitted version and publishes
    assert main(["build", "--wap", *tgt]) == 0
    capsys.readouterr()
    assert tf.current_version(spark, troot) == v1 + 1
    assert spark.table("wpc_mart").count() == 3
    # the marker is gone — healed by publish's fresh-manifest vacuum
    # (publish never unmarks eagerly; see
    # test_publish_leaves_marker_for_stale_concurrent_vacuum)
    assert tf.staged_markers(spark, troot) == {}


def test_wap_threaded_mixed_outcomes(spark, tmp_path, capsys):
    """--wap with --threads: a generation with one passing and one
    failing model publishes exactly the passing one — the staging
    bookkeeping is per-relation and lock-guarded."""
    from dbt_on_snowflake_spark.__main__ import main

    root, data = _wap_project(tmp_path, "wapt", threshold=100)
    # second, independent model whose test always fails on this data
    open(f"{root}/models/models/bad.sql", "w").write(
        "SELECT id, v FROM {{ source('raw', 't') }}"
    )
    open(f"{root}/models/models/schema.yml", "a").write(
        "  - name: bad\n    columns:\n      - name: v\n        tests:\n"
        "          - accepted_range: {min_value: 0, max_value: 5}\n"
    )
    rc = main(["build", "--wap", "--threads", "2",
               "--project", root, "--target", "wpt"])
    capsys.readouterr()
    assert rc == 1
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    assert tf.current_version(
        spark, os.path.join(wh, "wpt_mart")
    ) is not None  # passing model published
    assert tf.current_version(
        spark, os.path.join(wh, "wpt_bad")
    ) is None  # failing model never published


def test_wap_preserves_bucketed_layout(spark, tmp_path, capsys):
    """--wap + bucket_by: the staged write is the bucketed writer, so a
    published version still serves as a catalog bucketed table with the
    zero-exchange property."""
    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.__main__ import main
    from dbt_on_snowflake_spark.plans import count_shuffles, final_plan

    root, data = _wap_project(tmp_path, "wapb", threshold=100)
    open(f"{root}/models/models/mart.sql", "w").write(
        "{{ config(bucket_by='id', buckets=4) }}\n"
        "SELECT id, v FROM {{ source('raw', 't') }}"
    )
    assert main(["build", "--wap", "--project", root,
                 "--target", "wpb"]) == 0
    capsys.readouterr()
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        agg = spark.table("wpb_mart").groupBy("id").agg(
            F.sum("v").alias("s")
        )
        assert count_shuffles(final_plan(agg)) == 0
        assert agg.count() == 3
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_retry_replays_wap_flag(spark, tmp_path, capsys):
    """A retry of a failed `build --wap` stays write-audit-publish: the
    replayed model re-stages, its still-failing audit still blocks the
    publish, and the old version keeps serving — dropping the flag
    would publish the bad data before its tests."""
    from dbt_on_snowflake_spark.__main__ import main

    root, data = _wap_project(tmp_path, "wapr", threshold=100)
    tgt = ["--project", root, "--target", "wpr"]
    assert main(["build", "--wap", *tgt]) == 0
    capsys.readouterr()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "wpr_mart")
    v1 = tf.current_version(spark, troot)

    pd.DataFrame({"id": [1], "v": [999.0]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    assert main(["build", "--wap", *tgt]) == 1
    capsys.readouterr()
    # bare retry (no --wap passed): must replay WITH wap
    assert main(["retry", "--project", root]) == 1
    capsys.readouterr()
    assert tf.current_version(spark, troot) == v1  # still unpublished
    assert sorted(r.v for r in spark.table("wpr_mart").collect()) == [
        10, 20, 30,
    ]
    # data fixed: the retried build publishes
    pd.DataFrame({"id": [1], "v": [50.0]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    assert main(["retry", "--project", root]) == 0
    capsys.readouterr()
    assert tf.current_version(spark, troot) == v1 + 1
    assert [r.v for r in spark.table("wpr_mart").collect()] == [50.0]


def test_compact_sort_by_within_partitions(spark, tmp_path, capsys):
    """`compact --sort-by` on a PARTITIONED table keeps the partition
    layout and sorts WITHIN each partition's rewrite — row groups carry
    ordered min/max for the clustering column inside every partition
    dir, and values/partitioning are unchanged."""
    import glob

    import pyarrow.parquet as pq

    from dbt_on_snowflake_spark.__main__ import main

    data = str(tmp_path / "data")
    os.makedirs(data)
    ids = [(i * 29) % 128 for i in range(128)]
    pd.DataFrame(
        {
            "id": ids,
            "status": ["open" if i % 2 else "closed" for i in range(128)],
        }
    ).to_parquet(os.path.join(data, "t.parquet"), index=False)
    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write(
        "name: cpp\nmodels:\n  models:\n    materialized: table\n"
    )
    open(f"{root}/sources.yml", "w").write(
        f"sources:\n  - name: raw\n    base_path: \"{data}\"\n"
        "    tables:\n      - name: t\n"
    )
    open(f"{root}/models/models/ps.sql", "w").write(
        "{{ config(materialized='table', partition_by='status') }}\n"
        "SELECT /*+ REPARTITION(4) */ id, status "
        "FROM {{ source('raw', 't') }}"
    )
    assert main(["run", "--project", root, "--target", "cpp"]) == 0
    capsys.readouterr()
    assert main(["compact", "--project", root, "--target", "cpp",
                 "--sort-by", "id"]) == 0
    out = capsys.readouterr().out
    assert "compacted cpp_ps" in out and "sorted by id" in out
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    dp = tf.data_path(spark, os.path.join(wh, "cpp_ps"))
    part_dirs = sorted(
        d for d in os.listdir(dp) if d.startswith("status=")
    )
    assert part_dirs == ["status=closed", "status=open"]
    for d in part_dirs:
        for f in glob.glob(os.path.join(dp, d, "*.parquet")):
            md = pq.read_metadata(f)
            rg_ranges = []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == "id"
                )
                rg_ranges.append(
                    (col.statistics.min, col.statistics.max)
                )
            # within-file sort: row-group ranges are ordered
            for (lo1, hi1), (lo2, _) in zip(rg_ranges, rg_ranges[1:]):
                assert hi1 <= lo2
    got = spark.table("cpp_ps")
    assert got.count() == 128
    assert sorted(r.id for r in got.collect()) == sorted(ids)


def test_publish_commit_conflict_keeps_discard_path(spark, tmp_path):
    """publish_staged must pop the staged ledger entry only AFTER the
    manifest commit succeeds (r9 advice, runner.py:397): when the
    commit collides with a concurrent writer, the entry survives so the
    WAP gate's exception-path discard_staged still deletes the staged
    dir and re-points the relation at the committed state — instead of
    the session serving never-published staged data."""
    from dbt_on_snowflake_spark.engine.project import Project
    from dbt_on_snowflake_spark.engine.runner import Runner

    root, data = _wap_project(tmp_path, "wapx", threshold=100)
    runner = Runner(spark, Project(root, target="wpx"), wap=True)
    runner.load_sources()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "wpx_mart")

    df = spark.table("src_raw_t").selectExpr("id", "v")
    runner._stage_versioned(df, "wpx_mart", [], None)
    staged_dir = runner._staged["wpx_mart"]["data_dir"]

    # concurrent writer lands the same version first (distinct dir name)
    _mkdf(spark, [(7, "w")]).write.mode("overwrite").parquet(
        os.path.join(troot, "d-conflict")
    )
    tf.commit(spark, troot, 1, "d-conflict")

    with pytest.raises(tf.CommitConflict):
        runner.publish_staged("wpx_mart")
    # ledger entry retained -> the gate's except-path cleanup still works
    assert "wpx_mart" in runner._staged
    runner.discard_staged("wpx_mart")
    assert runner._staged == {}
    assert not os.path.isdir(os.path.join(troot, staged_dir))
    assert tf.staged_markers(spark, troot) == {}
    # the relation serves the concurrently committed state
    assert {r.v for r in spark.table("wpx_mart").collect()} == {"w"}


def test_pin_create_failure_not_swallowed(spark, tmp_path, monkeypatch):
    """pin() tolerates ONLY a verified already-exists collision (r9
    advice, table_format.py:199): a create failure whose message merely
    mentions 'exist' (e.g. "path does not exist") must propagate, not
    leave the clone's data dir silently unprotected from vacuum."""
    root = str(tmp_path / "t")
    _versioned_write(spark, root, _mkdf(spark, [(1, "a")]))

    def boom(spark_, path, data):
        raise RuntimeError(f"parent path does not exist: {path}")

    monkeypatch.setattr(tf, "fs_create_atomic", boom)
    with pytest.raises(RuntimeError, match="does not exist"):
        tf.pin(spark, root, "p1", "d-000000000001", holder="h")
    monkeypatch.undo()

    # the benign collision (pin file actually present) stays tolerated
    tf.pin(spark, root, "p1", "d-000000000001", holder="h")
    tf.pin(spark, root, "p1", "d-000000000001", holder="h")  # retry: no raise
    assert tf.pins(spark, root)["p1"]["data_dir"] == "d-000000000001"


def test_vacuum_heals_leaked_stage_marker(spark, tmp_path):
    """A marker leaked by a crash between publish-commit and unmark is
    redundant once a retained manifest references its dir: vacuum drops
    the marker (heal) while keeping the dir served."""
    root = str(tmp_path / "t")
    _versioned_write(spark, root, _mkdf(spark, [(1, "a")]))
    # simulate the crash: version 2 staged+marked, committed, unmark lost
    v, ddir = tf.next_txn(spark, root)
    tf.stage_mark(spark, root, ddir, holder="t")
    _mkdf(spark, [(1, "b")]).write.mode("overwrite").parquet(
        os.path.join(root, ddir)
    )
    tf.commit(spark, root, v, ddir)
    assert ddir in tf.staged_markers(spark, root)

    removed = tf.vacuum(spark, root)
    assert tf.staged_markers(spark, root) == {}  # healed
    assert ddir not in removed and os.path.isdir(os.path.join(root, ddir))
    assert {r.v for r in spark.read.parquet(
        tf.data_path(spark, root)
    ).collect()} == {"b"}


def test_publish_leaves_marker_for_stale_concurrent_vacuum(
    spark, tmp_path, monkeypatch
):
    """publish_staged must NOT unmark eagerly after its commit (r10
    advice, runner.py:422): a concurrent cron vacuum that listed
    manifests BEFORE the commit re-checks the stage marker at delete
    time — with an eager unmark it would see the just-committed dir as
    unreferenced AND unmarked and delete committed data. The marker
    must survive publish until a vacuum with a FRESH manifest read
    heals it."""
    from dbt_on_snowflake_spark.engine.project import Project
    from dbt_on_snowflake_spark.engine.runner import Runner

    root, data = _wap_project(tmp_path, "wapv", threshold=100)
    runner = Runner(spark, Project(root, target="wpv"), wap=True)
    runner.load_sources()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "wpv_mart")

    df = spark.table("src_raw_t").selectExpr("id", "v")
    runner._stage_versioned(df, "wpv_mart", [], None)
    staged_dir = runner._staged["wpv_mart"]["data_dir"]

    # the concurrent vacuum's manifest listing happens PRE-commit
    versions_pre = tf.list_versions(spark, troot)

    # publish with its own heal-vacuum suppressed: the marker must
    # still be there — publish itself never unmarks
    monkeypatch.setattr(tf, "vacuum", lambda *a, **k: [])
    runner.publish_staged("wpv_mart")
    monkeypatch.undo()
    assert staged_dir in tf.staged_markers(spark, troot)

    # the stale concurrent vacuum resumes: its retained set predates
    # the commit, so the new dir is unreferenced — only the marker's
    # delete-time recheck protects it
    monkeypatch.setattr(tf, "list_versions", lambda *a, **k: versions_pre)
    removed = tf.vacuum(spark, troot)
    monkeypatch.undo()
    assert staged_dir not in removed
    assert os.path.isdir(os.path.join(troot, staged_dir))

    # a fresh vacuum heals the now-redundant marker, dir still served
    tf.vacuum(spark, troot)
    assert tf.staged_markers(spark, troot) == {}
    assert os.path.isdir(os.path.join(troot, staged_dir))
    assert spark.table("wpv_mart").count() > 0


def test_stale_vacuum_cannot_reap_committed_dir_after_heal(
    spark, tmp_path, monkeypatch
):
    """r11 review of the r10-advice fix: leaving the marker on publish
    only protects the window until the first fresh vacuum HEALS it —
    a stale vacuum (manifest listing pre-commit) that resumes after
    the heal finds no marker and would reap the just-committed dir.
    vacuum's delete-time FRESH-manifest recheck must save it: the
    unmark happens only after a manifest references the dir, and the
    recheck reads manifests after the absent-marker check, so it
    always observes that manifest."""
    from dbt_on_snowflake_spark.engine.project import Project
    from dbt_on_snowflake_spark.engine.runner import Runner

    root, data = _wap_project(tmp_path, "wapsv", threshold=100)
    runner = Runner(spark, Project(root, target="wpsv"), wap=True)
    runner.load_sources()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "wpsv_mart")

    df = spark.table("src_raw_t").selectExpr("id", "v")
    # version 1 exists (else the stale vacuum has no manifests and
    # returns before its delete loop)
    runner._stage_versioned(df, "wpsv_mart", [], None)
    runner.publish_staged("wpsv_mart")
    # stage + publish version 2 — the dir the stale vacuum must not reap
    runner._stage_versioned(df, "wpsv_mart", [], None)
    staged_dir = runner._staged["wpsv_mart"]["data_dir"]
    versions_pre = tf.list_versions(spark, troot)  # the stale listing

    # publish for real: commits AND heals the marker via its own vacuum
    runner.publish_staged("wpsv_mart")
    assert tf.staged_markers(spark, troot) == {}  # healed — no marker left

    # the stale vacuum resumes: its FIRST list_versions returns the
    # pre-commit listing (its retained set misses the new dir); the
    # delete-time recheck calls list_versions again, later in time,
    # and must see the fresh state
    real_lv = tf.list_versions
    calls = {"n": 0}

    def stale_then_fresh(spark_, root_):
        calls["n"] += 1
        return versions_pre if calls["n"] == 1 else real_lv(spark_, root_)

    monkeypatch.setattr(tf, "list_versions", stale_then_fresh)
    removed = tf.vacuum(spark, troot)
    monkeypatch.undo()
    assert staged_dir not in removed
    assert os.path.isdir(os.path.join(troot, staged_dir))
    assert spark.table("wpsv_mart").count() > 0
    assert calls["n"] >= 2  # the recheck actually ran


def test_stale_vacuum_cannot_reap_freshly_pinned_dir(
    spark, tmp_path, monkeypatch
):
    """Pins are the third reference source the delete-time recheck must
    re-read (r11 review, second pass): a vacuum whose versions+pins
    snapshots predate BOTH a commit and a clone pin on that commit's
    dir — with the dir then aged out of retention by later commits —
    would otherwise reap the clone's only data dir."""
    root = str(tmp_path / "t")
    _versioned_write(spark, root, _mkdf(spark, [(1, "a")]))  # v1
    versions_pre = tf.list_versions(spark, root)

    # all AFTER the stale vacuum's snapshots: v2 lands, a clone pins
    # its dir, then two more commits age v2 out of retention (keep=2)
    _versioned_write(spark, root, _mkdf(spark, [(2, "b")]))  # v2
    pinned_dir = tf.read_manifest(spark, root, 2)["data_dir"]
    tf.pin(spark, root, "p-clone", pinned_dir, holder="clone")
    _versioned_write(spark, root, _mkdf(spark, [(3, "c")]))  # v3
    _versioned_write(spark, root, _mkdf(spark, [(4, "d")]))  # v4

    real_lv, real_pins = tf.list_versions, tf.pins
    calls = {"lv": 0, "pins": 0}

    def stale_lv(spark_, root_):
        calls["lv"] += 1
        return versions_pre if calls["lv"] == 1 else real_lv(spark_, root_)

    def stale_pins(spark_, root_):
        calls["pins"] += 1
        return {} if calls["pins"] == 1 else real_pins(spark_, root_)

    monkeypatch.setattr(tf, "list_versions", stale_lv)
    monkeypatch.setattr(tf, "pins", stale_pins)
    removed = tf.vacuum(spark, root)
    monkeypatch.undo()
    assert pinned_dir not in removed
    assert os.path.isdir(os.path.join(root, pinned_dir))
    assert {r.v for r in spark.read.parquet(
        os.path.join(root, pinned_dir)
    ).collect()} == {"b"}
    assert calls["pins"] >= 2  # the fresh pin recheck actually ran


def test_clone_survives_wap_cycles_on_source(spark, tmp_path, capsys):
    """Clone x WAP composition: a zero-copy clone of a WAP-built mart
    keeps serving its pinned snapshot through the source's later --wap
    cycles — a failed audit (stage + discard) and a published rebuild
    (commit + vacuum) on the source must neither move the clone nor
    reclaim its pinned dir."""
    from dbt_on_snowflake_spark.__main__ import main

    root, data = _wap_project(tmp_path, "wapz", threshold=100)
    tgt = ["--project", root, "--target", "wpz"]
    assert main(["build", "--wap", *tgt]) == 0
    capsys.readouterr()
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    troot = os.path.join(wh, "wpz_mart")
    dst = str(tmp_path / "mart_clone")
    m = tf.clone_table(spark, troot, dst)
    pinned_dir = tf.data_path(spark, dst)
    snapshot = sorted(
        r.v for r in spark.read.parquet(pinned_dir).collect()
    )
    assert snapshot == [10, 20, 30]

    # failed audit on the source: stage + discard, clone untouched
    pd.DataFrame({"id": [1], "v": [999]}).to_parquet(
        os.path.join(data, "t.parquet"), index=False
    )
    assert main(["build", "--wap", *tgt]) == 1
    capsys.readouterr()
    assert m["clone_pin"] in tf.pins(spark, troot)  # pin untouched

    # published rebuilds past retention: the pinned dir must survive
    for v in (50, 60, 70):
        pd.DataFrame({"id": [1], "v": [v]}).to_parquet(
            os.path.join(data, "t.parquet"), index=False
        )
        assert main(["build", "--wap", *tgt]) == 0
        capsys.readouterr()
    assert os.path.isdir(pinned_dir)
    got = sorted(r.v for r in spark.read.parquet(pinned_dir).collect())
    assert got == snapshot  # the clone's snapshot is byte-for-byte alive
    assert sorted(
        r.v for r in spark.read.parquet(tf.data_path(spark, dst)).collect()
    ) == snapshot


def test_vacuum_rechecks_marker_at_delete_time(spark, tmp_path, monkeypatch):
    """TOCTOU pin (r10 review): a stage that begins AFTER vacuum's
    staged-marker snapshot but BEFORE its directory listing must still
    survive — vacuum re-checks the marker per candidate dir at delete
    time. Simulated by injecting the stage between the two phases via a
    patched staged_markers that stages on its way out."""
    root = str(tmp_path / "t")
    _versioned_write(spark, root, _mkdf(spark, [(1, "a")]))

    real_markers = tf.staged_markers
    staged_name = {}

    def markers_then_stage(spark_, root_):
        out = real_markers(spark_, root_)
        if not staged_name:  # inject once: stage AFTER the snapshot
            v, ddir = tf.next_txn(spark_, root_)
            tf.stage_mark(spark_, root_, ddir, holder="t")
            _mkdf(spark_, [(1, "b")]).write.mode("overwrite").parquet(
                os.path.join(root_, ddir)
            )
            staged_name["d"] = ddir
        return out

    monkeypatch.setattr(tf, "staged_markers", markers_then_stage)
    removed = tf.vacuum(spark, root)
    monkeypatch.undo()

    ddir = staged_name["d"]
    assert ddir not in removed
    assert os.path.isdir(os.path.join(root, ddir))  # stage survived
    # and the in-flight stage still publishes cleanly
    tf.commit(spark, root, 2, ddir)
    tf.stage_unmark(spark, root, ddir)
    assert {r.v for r in spark.read.parquet(
        tf.data_path(spark, root)
    ).collect()} == {"b"}
