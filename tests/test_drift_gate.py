"""Codebook drift gate (r11 verdict, Next #3): PQ appends encode
against the FROZEN build-time codebook forever; the gate is what
finally decides a retrain. Contract: (1) in-distribution appends never
trip it, (2) a deliberately shifted batch trips it exactly once and the
rebuild re-arms the baseline, (3) the baseline sidecar survives
compaction's swap, (4) no baseline -> fail closed (raise, no rebuild),
(5) the `reindex` CLI sweeps every pq_codes_* family (report mode) and
gates any named family — including append-grown ones — retraining via
the generic retrain_pq_family, which fails closed on families whose
vectors the corpus cannot cover."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_on_snowflake_spark.engine.index_maintenance import (
    compact_index_table,
)
from dbt_on_snowflake_spark.operators.similarity import (
    DRIFT_REBUILD_RATIO,
    _vectors,
    build_pq_index,
    pq_index_append,
    pq_index_drift,
    reindex_pq_when_drifted,
)
from tests.conftest import SF_SMOKE

BASE_PRED = "vec_id % 10 <> 9"
HELD_PRED = "vec_id % 10 = 9"


def _shifted(e):
    """A batch the frozen codebook cannot represent: scaled + offset
    vectors under fresh ids."""
    return e.filter(F.expr(HELD_PRED)).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        "label",
        F.transform("v", lambda x: x * 3.0 + 5.0).alias("v"),
    )


def _fresh(spark, tag, pred=BASE_PRED):
    cb, cd = f"pq_codebook_{tag}", f"pq_codes_{tag}"
    e = _vectors(spark, SF_SMOKE)
    build_pq_index(
        spark, e.filter(F.expr(pred)), codebook_table=cb, codes_table=cd
    )
    return e, cb, cd


def test_in_distribution_append_stays_within_gate(spark):
    e, cb, cd = _fresh(spark, "drift_ok")
    pq_index_append(
        spark, e.filter(F.expr(HELD_PRED)), codebook_table=cb, codes_table=cd
    )
    called = {"n": 0}

    def rebuild():
        called["n"] += 1

    d = reindex_pq_when_drifted(spark, codes_table=cd, rebuild=rebuild)
    assert not d["drifted"] and not d["rebuilt"] and called["n"] == 0
    # held-out tenth of the same distribution: ratio hugs 1.0
    assert 0.8 < d["ratio"] < DRIFT_REBUILD_RATIO, d["ratio"]


def test_shifted_batch_trips_gate_and_rebuild_rearms(spark):
    e, cb, cd = _fresh(spark, "drift_bad")
    shifted = _shifted(e)
    pq_index_append(spark, shifted, codebook_table=cb, codes_table=cd)
    before = pq_index_drift(spark, codes_table=cd)
    assert before["ratio"] > DRIFT_REBUILD_RATIO, before["ratio"]

    grown = e.filter(F.expr(BASE_PRED)).unionByName(shifted)
    d = reindex_pq_when_drifted(
        spark,
        codes_table=cd,
        rebuild=lambda: build_pq_index(
            spark, grown, codebook_table=cb, codes_table=cd
        ),
    )
    assert d["drifted"] and d["rebuilt"]
    # the retrained codebook represents the grown corpus: baseline
    # re-armed, ratio back at exactly 1.0 (current == fresh baseline)
    after = pq_index_drift(spark, codes_table=cd)
    assert after["ratio"] == pytest.approx(1.0)
    assert after["n_rows"] == grown.count()
    # and the re-armed gate no longer fires
    d2 = reindex_pq_when_drifted(
        spark, codes_table=cd, rebuild=lambda: (_ for _ in ()).throw(
            AssertionError("rebuild must not re-fire")
        )
    )
    assert not d2["drifted"]


def test_drift_baseline_survives_compaction_swap(spark):
    e, cb, cd = _fresh(spark, "drift_cmp")
    # three appends -> multi-file partitions, so compaction rewrites
    for m in (9, 19, 29):
        pq_index_append(
            spark,
            e.filter(f"vec_id % 30 = {m}"),
            codebook_table=cb,
            codes_table=cd,
        )
    base = pq_index_drift(spark, codes_table=cd)
    assert compact_index_table(spark, cd) is not None
    after = pq_index_drift(spark, codes_table=cd)
    assert after == base  # sidecar carried through the drop-rename swap


def test_drift_fails_closed_without_baseline(spark):
    spark.createDataFrame(
        [(1, [{"d": 0.5, "code": 0}])],
        "vec_id long, bests array<struct<d:double,code:int>>",
    ).write.mode("overwrite").saveAsTable("pq_codes_nobase")
    with pytest.raises(ValueError, match="baseline"):
        pq_index_drift(spark, codes_table="pq_codes_nobase")
    spark.sql("DROP TABLE pq_codes_nobase")


def _proj(tmp_path):
    import os

    root = str(tmp_path / "proj")
    os.makedirs(f"{root}/models", exist_ok=True)
    open(f"{root}/project.yml", "w").write("name: reidx\n")
    return root


def test_reindex_cli_reports_and_gates(spark, tmp_path, capsys):
    from dbt_on_snowflake_spark.__main__ import main
    from dbt_on_snowflake_spark.operators.similarity import (
        ensure_pq_index,
    )

    root = _proj(tmp_path)
    # report mode sweeps every pq_codes_* family in the warehouse
    # (exit 0 even when some family has no baseline — it is a report,
    # not a gate)
    assert main(["reindex", "--project", root, "--corpus", SF_SMOKE]) == 0
    out = capsys.readouterr().out
    _, cd_t = ensure_pq_index(spark, SF_SMOKE)
    assert f"pq index {cd_t}: drift ratio" in out
    # the untouched ensure-family index is its own baseline: never
    # gated (pinned by name so other tests' families can't interfere)
    assert (
        main([
            "reindex", "--project", root, "--corpus", SF_SMOKE,
            "--when-drifted", "1.5", "--codes-table", cd_t,
        ])
        == 0
    )
    assert "within gate" in capsys.readouterr().out


def test_reindex_cli_gates_named_grown_family(spark, tmp_path, capsys):
    """--codes-table reaches families the ensure path never built — the
    append-grown/streaming growers, exactly the indexes that accumulate
    drift (r12 advice #2). Force a retrain (threshold 0) and the
    generic ``retrain_pq_family`` re-arms the family's baseline from
    the vectors it currently serves."""
    from dbt_on_snowflake_spark.__main__ import main

    e, cb, cd = _fresh(spark, "drift_cli_grown")
    pq_index_append(
        spark,
        e.filter(F.expr(HELD_PRED)),
        codebook_table=cb,
        codes_table=cd,
    )
    root = _proj(tmp_path)
    assert (
        main([
            "reindex", "--project", root, "--corpus", SF_SMOKE,
            "--when-drifted", "0.0", "--codes-table", cd,
        ])
        == 0
    )
    assert "RETRAINED" in capsys.readouterr().out
    after = pq_index_drift(spark, codes_table=cd)
    assert after["ratio"] == pytest.approx(1.0)
    assert after["n_rows"] == e.count()


def test_reindex_cli_skips_ungateable_family_fail_closed(
    spark, tmp_path, capsys
):
    """Gate mode exits nonzero when the named family cannot be gated
    (no baseline sidecar): a scheduled gate that silently skipped a
    drifting index must alarm."""
    from dbt_on_snowflake_spark.__main__ import main
    from dbt_on_snowflake_spark.operators.dedup import (
        _drop_managed_table,
    )

    spark.createDataFrame(
        [(1,)], "vec_id long"
    ).write.mode("overwrite").saveAsTable("pq_codes_nobase")
    try:
        root = _proj(tmp_path)
        assert (
            main([
                "reindex", "--project", root, "--corpus", SF_SMOKE,
                "--when-drifted", "1.5", "--codes-table",
                "pq_codes_nobase",
            ])
            == 2
        )
        assert "SKIPPED" in capsys.readouterr().err
    finally:
        _drop_managed_table(spark, "pq_codes_nobase")


def test_reindex_cli_exclude_carves_out_ephemeral_families(
    spark, tmp_path, capsys
):
    """r13 advice #3: gate mode fails closed (exit 2) on ungateable
    families, but some are legitimately ungateable forever (ephemeral
    verification leftovers, foreign-corpus families) — --exclude /
    --select (comma-separated fnmatch over qualified and bare names)
    carve them out so the scheduled sweep's alarm signals only
    actionable gaps. The same baseline-less family that alarms by name
    passes silently when excluded. A --select that matches ZERO
    families is the 'gate reports green while checking nothing' hazard
    (r14 advice #1) — gate mode alarms (exit 2), report mode warns on
    stderr — so a typo'd pattern in the weekly cron cannot silently
    disable the drift gate."""
    from dbt_on_snowflake_spark.__main__ import main
    from dbt_on_snowflake_spark.operators.dedup import (
        _drop_managed_table,
    )

    spark.createDataFrame(
        [(1,)], "vec_id long"
    ).write.mode("overwrite").saveAsTable("pq_codes_semdel_r14x")
    try:
        root = _proj(tmp_path)
        base = [
            "reindex", "--project", root, "--corpus", SF_SMOKE,
            "--when-drifted", "1.5",
            "--codes-table", "pq_codes_semdel_r14x",
        ]
        assert main(base) == 2  # alarms un-excluded (fail closed)
        assert "SKIPPED" in capsys.readouterr().err
        # the realistic cron carve-out: the sweep holds the ephemeral
        # AND a gateable family; --exclude removes the ephemeral, the
        # real family is still checked -> green with no SKIPPED alarm.
        # (The sweep is narrowed with --select rather than running the
        # full catalog so families other tests leave behind cannot flip
        # this order-dependently.)
        from dbt_on_snowflake_spark.operators.similarity import (
            ensure_pq_index,
        )

        _, real_cd = ensure_pq_index(spark, SF_SMOKE)
        carved = [
            "reindex", "--project", root, "--corpus", SF_SMOKE,
            "--when-drifted", "1.5",
            "--select", f"{real_cd},pq_codes_semdel_*",
            "--exclude", "pq_codes_semdel_*,pq_codes_mmdel_*",
        ]
        assert main(carved) == 0
        err = capsys.readouterr().err
        assert "SKIPPED" not in err and "zero index families" not in err
        # excluding the ONLY family the invocation named is a
        # contradictory command — the sweep would check nothing, so
        # gate mode alarms rather than reporting green (r15 review
        # finding 1 applies to --exclude too)
        assert (
            main(base + ["--exclude", "pq_codes_semdel_*,pq_codes_mmdel_*"])
            == 2
        )
        assert "zero index families" in capsys.readouterr().err
        # gate mode + zero-match select: alarm, with the pattern named
        assert main(base + ["--select", "no_such_family_*"]) == 2
        assert "zero index families" in capsys.readouterr().err
        # the guard runs AFTER both filters (r15 review finding 1): an
        # --exclude that eats everything --select kept must also alarm
        assert (
            main(base + ["--select", "pq_codes_*", "--exclude", "pq_*"])
            == 2
        )
        assert "zero index families" in capsys.readouterr().err
        # report mode (no --when-drifted): warn on stderr, exit 0
        report = [
            "reindex", "--project", root, "--corpus", SF_SMOKE,
            "--codes-table", "pq_codes_semdel_r14x",
            "--select", "no_such_family_*",
        ]
        assert main(report) == 0
        assert "zero index families" in capsys.readouterr().err
    finally:
        _drop_managed_table(spark, "pq_codes_semdel_r14x")


def test_retrain_refuses_out_of_corpus_families(spark):
    """``retrain_pq_family`` fails closed when live vec_ids are not
    covered by the corpus embeddings — retraining on the intersection
    would silently shrink the index."""
    from dbt_on_snowflake_spark.operators.similarity import (
        retrain_pq_family,
    )

    e, cb, cd = _fresh(spark, "drift_foreign")
    pq_index_append(spark, _shifted(e), codebook_table=cb, codes_table=cd)
    with pytest.raises(ValueError, match="not in the corpus"):
        retrain_pq_family(spark, SF_SMOKE, codes_table=cd)


def test_ivfpq_retrain_rebuilds_cell_partitioned(spark):
    """The IVFPQ family's drift-triggered rebuild must go through its
    OWN builder (r16): codes come back partitioned by TRAINED Lloyd
    cell with both quantizers retrained and the baseline re-armed —
    the generic ``retrain_pq_family`` default would silently
    re-partition them by ingest label, corrupting the serve's
    partition prune."""
    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table
    from dbt_on_snowflake_spark.operators.similarity import (
        COARSE_EXTRA,
        _assign_cells,
        _coarse_train,
        build_ivfpq_index,
        retrain_ivfpq_family,
    )

    cells_t = "ivf_cells_tivpdrift"
    cb_t = "pq_codebook_ivp_tivpdrift"
    cd_t = "pq_codes_ivp_tivpdrift"
    e = _vectors(spark, SF_SMOKE).filter(F.expr(BASE_PRED))
    try:
        build_ivfpq_index(
            spark,
            e,
            cells_table=cells_t,
            codebook_table=cb_t,
            codes_table=cd_t,
        )
        before = sorted(
            map(tuple, spark.table(cd_t).select("vec_id", "label").collect())
        )
        retrain_ivfpq_family(spark, SF_SMOKE, codes_table=cd_t)
        # deterministic training over the same live vectors: the
        # rebuild reproduces the build bit-for-bit...
        after = sorted(
            map(tuple, spark.table(cd_t).select("vec_id", "label").collect())
        )
        assert after == before
        # ...and the label column IS the trained-cell assignment, not
        # the ingest label (the generic rebuild's layout)
        coarse = _coarse_train(e)
        expect = sorted(
            (int(r.vec_id), int(r.label))
            for r in _assign_cells(
                e.select("vec_id", "label", "v"), coarse
            ).collect()
        )
        assert after == expect
        n_labels = e.select("label").distinct().count()
        assert spark.table(cells_t).count() == n_labels + COARSE_EXTRA
        # the baseline re-armed: a fresh gate reads ratio 1.0
        assert pq_index_drift(spark, codes_table=cd_t)["ratio"] == (
            pytest.approx(1.0)
        )
    finally:
        for t in (cd_t, cb_t, cells_t):
            _drop_managed_table(spark, t)


def test_reindex_cli_gate_retrains_ivp_family_cell_partitioned(
    spark, tmp_path, capsys
):
    """End-to-end CLI composition of the r16 routing: a DRIFTED
    pq_codes_ivp_* family named via --codes-table (an ad-hoc name the
    ensure registry does NOT know — the exact case an exact-name map
    mis-routed) must retrain through the cell-partitioned builder,
    re-arm its baseline, and exit 0. Drift is forced by shrinking the
    qstats baseline sidecar under the table (the gate then reads
    ratio 10 > 1.5)."""
    import json
    import posixpath

    from dbt_on_snowflake_spark.__main__ import main
    from dbt_on_snowflake_spark.engine.fs import (
        fs_read_replaceable,
        fs_replace_atomic,
    )
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        table_location,
    )
    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table
    from dbt_on_snowflake_spark.operators.similarity import (
        _assign_cells,
        _coarse_train,
        build_ivfpq_index,
        pq_index_drift,
    )

    cells_t = "ivf_cells_tcligate"
    cb_t = "pq_codebook_ivp_tcligate"
    cd_t = "pq_codes_ivp_tcligate"
    e = _vectors(spark, SF_SMOKE).filter(F.expr(BASE_PRED))
    try:
        build_ivfpq_index(
            spark, e,
            cells_table=cells_t, codebook_table=cb_t, codes_table=cd_t,
        )
        p = posixpath.join(table_location(spark, cd_t), "_qstats.json")
        base = json.loads(fs_read_replaceable(spark, p).decode())
        base["base_mean_qerr"] = base["base_mean_qerr"] / 10.0
        fs_replace_atomic(spark, p, json.dumps(base).encode())
        assert pq_index_drift(spark, codes_table=cd_t)["ratio"] > 1.5

        rc = main([
            "reindex", "--project", _proj(tmp_path), "--corpus", SF_SMOKE,
            "--codes-table", cd_t, "--when-drifted", "1.5",
        ])
        out = capsys.readouterr().out
        assert rc == 0
        assert "RETRAINED" in out, out
        # rebuilt through the family's OWN builder: codes re-labeled
        # by the trained-cell assignment, baseline re-armed
        got = sorted(
            map(tuple, spark.table(cd_t).select("vec_id", "label").collect())
        )
        expect = sorted(
            (int(r.vec_id), int(r.label))
            for r in _assign_cells(
                e.select("vec_id", "label", "v"), _coarse_train(e)
            ).collect()
        )
        assert got == expect
        assert pq_index_drift(spark, codes_table=cd_t)["ratio"] == (
            pytest.approx(1.0)
        )
    finally:
        for t in (cd_t, cb_t, cells_t):
            _drop_managed_table(spark, t)


def test_retrain_routing_is_convention_based(spark, monkeypatch):
    """The sweep's drift rebuild dispatches on the family NAMING
    CONVENTION, not an exact current-fingerprint name map (r16 review
    finding 1): a db-QUALIFIED ivp family and a STALE-generation ivp
    name must both route to the cell-partitioned builder — an exact
    map would hand them to the generic label-partitioned retrain,
    silently corrupting the layout — while plain pq_codes_* names
    stay generic. Routed-to targets are stubbed: this pins dispatch,
    the layout contract itself is pinned by
    test_ivfpq_retrain_rebuilds_cell_partitioned."""
    from dbt_on_snowflake_spark.operators import similarity as sim

    calls = []
    monkeypatch.setattr(
        sim, "retrain_ivfpq_family",
        lambda spark, sf, codes_table: calls.append(("ivp", codes_table)),
    )
    monkeypatch.setattr(
        sim, "retrain_pq_family",
        lambda spark, sf, codes_table: calls.append(("generic", codes_table)),
    )
    for fam in (
        "otherdb.pq_codes_ivp_deadbeef_00000001",  # qualified
        "pq_codes_ivp_deadbeef_00000002",  # stale generation
        "pq_codes_aps_deadbeef_00000003",  # appended family: generic
        "pq_codes_adhoc",  # ad-hoc build: generic
    ):
        sim.retrain_any_pq_family(spark, SF_SMOKE, codes_table=fam)
    assert [kind for kind, _ in calls] == [
        "ivp", "ivp", "generic", "generic"
    ], calls
    # and the sweep registry names BOTH cell-partitioned families
    # (the build-once ivp family and the append-grown ivp_aps one —
    # the aps name deliberately stays inside the routing prefix so its
    # drift retrain also rebuilds cell-partitioned)
    fams = sim.pq_ensure_families(spark, SF_SMOKE)
    assert sum(f[1].startswith("pq_codes_ivp_") for f in fams) == 2


def test_drift_handles_empty_and_zero_baseline(spark):
    """Scheduled checks must return decisions, not crash: all-deleted
    (empty live codes -> NULL avg) reports zero drift, and a perfect
    0.0 baseline only fires on genuinely positive current error (and
    the rebuild re-arms instead of firing forever)."""
    from dbt_on_snowflake_spark.operators.similarity import (
        pq_index_delete,
    )

    e, cb, cd = _fresh(spark, "drift_edge")
    pq_index_delete(
        spark, e.select("vec_id"), codes_table=cd  # delete EVERYTHING
    )
    d = pq_index_drift(spark, codes_table=cd)
    assert d["n_rows"] == 0 and d["current_mean_qerr"] == 0.0
    assert d["ratio"] <= 1.0  # never triggers a retrain

    # zero baseline: identical-perfection stays 1.0
    import json as _json

    from dbt_on_snowflake_spark.engine.fs import (
        fs_create_atomic,
        fs_delete,
    )
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        table_location,
    )
    from dbt_on_snowflake_spark.operators.similarity import _QSTATS

    import posixpath

    pth = posixpath.join(table_location(spark, cd), _QSTATS)
    fs_delete(spark, pth)
    fs_create_atomic(
        spark,
        pth,
        _json.dumps({"base_mean_qerr": 0.0, "n_rows": 0}).encode(),
    )
    assert pq_index_drift(spark, codes_table=cd)["ratio"] == 1.0


def test_appended_ensure_rebuilds_after_crash_before_append(spark):
    """ensure_appended_pq_index's commit marker: a crash between the
    base build and the append leaves the marker absent, so the next
    call re-runs the WHOLE build instead of serving base-only codes
    forever (r12 review, finding 2)."""
    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.operators.similarity import (
        _CORPUS_PRED,
        PQ_CODEBOOK_ALGO,
        build_pq_index,
        ensure_appended_pq_index,
    )
    from dbt_on_snowflake_spark.testdata import index_suffix

    suffix = index_suffix(
        spark, SF_SMOKE, "pqapps", "embeddings", algo=PQ_CODEBOOK_ALGO
    )
    cb_t, cd_t = f"pq_codebook_aps_{suffix}", f"pq_codes_aps_{suffix}"
    grown_t = f"pq_grown_aps_{suffix}"
    for t in (cb_t, cd_t, grown_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    # simulate the crashed build: base-only tables exist, no marker
    e = _vectors(spark, SF_SMOKE)
    build_pq_index(
        spark,
        e.filter(F.expr(_CORPUS_PRED)),
        codebook_table=cb_t,
        codes_table=cd_t,
    )
    assert spark.table(cd_t).filter(F.expr(HELD_PRED)).count() == 0
    ensure_appended_pq_index(spark, SF_SMOKE)
    # the probe caught the missing marker and re-ran build+append
    assert spark.table(cd_t).filter(F.expr(HELD_PRED)).count() > 0
    assert spark.catalog.tableExists(grown_t)


# ---------------------------------------------- IVF centroid drift gate


def _fresh_ivf(spark, tag, pred=BASE_PRED):
    from dbt_on_snowflake_spark.operators.similarity import build_ann_index

    ct, at = f"ann_centroids_{tag}", f"ann_assignments_{tag}"
    e = _vectors(spark, SF_SMOKE)
    build_ann_index(
        spark,
        e.filter(F.expr(pred)),
        centroids_table=ct,
        assignments_table=at,
    )
    return e, ct, at


def test_ivf_in_distribution_append_stays_within_gate(spark):
    """r12 verdict Next #6: `refresh_centroids` existed but nothing
    decided to call it — the IVF twin of the PQ codebook gate. An
    in-distribution append must not trip it."""
    from dbt_on_snowflake_spark.operators.similarity import (
        ann_index_append,
        reindex_ann_when_drifted,
    )

    e, ct, at = _fresh_ivf(spark, "ivfdrift_ok")
    ann_index_append(
        spark, e.filter(F.expr(HELD_PRED)),
        centroids_table=ct, assignments_table=at,
    )
    d = reindex_ann_when_drifted(spark, assignments_table=at)
    assert not d["drifted"] and not d["rebuilt"]
    assert d["ratio"] < DRIFT_REBUILD_RATIO


def test_ivf_shifted_batch_trips_gate_and_refresh_rearms(spark):
    """A batch the frozen centroids cannot represent trips the gate
    exactly once; the refresh (the IVF retrain: per-label means over
    the grown LIVE assignments) re-records the baseline so the gate
    re-arms at ratio 1.0."""
    from dbt_on_snowflake_spark.operators.similarity import (
        ann_index_append,
        ann_index_drift,
        reindex_ann_when_drifted,
    )

    e, ct, at = _fresh_ivf(spark, "ivfdrift_bad")
    ann_index_append(
        spark, _shifted(e), centroids_table=ct, assignments_table=at
    )
    before = ann_index_drift(spark, assignments_table=at)
    assert before["ratio"] > DRIFT_REBUILD_RATIO, before["ratio"]
    d = reindex_ann_when_drifted(spark, assignments_table=at)
    assert d["drifted"] and d["rebuilt"]
    after = ann_index_drift(spark, assignments_table=at)
    assert after["ratio"] == pytest.approx(1.0)
    assert after["n_rows"] == after["base_n_rows"]
    d2 = reindex_ann_when_drifted(spark, assignments_table=at)
    assert not d2["drifted"] and not d2["rebuilt"]


def test_ivf_drift_fails_closed_without_baseline(spark):
    """An assignments table with no _cstats sidecar (old-format build)
    raises instead of guessing a baseline — the pq_index_drift
    contract."""
    import posixpath

    from dbt_on_snowflake_spark.engine.fs import fs_delete
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        table_location,
    )
    from dbt_on_snowflake_spark.operators.similarity import (
        ann_index_drift,
    )

    _e, _ct, at = _fresh_ivf(spark, "ivfdrift_nobase")
    fs_delete(
        spark, posixpath.join(table_location(spark, at), "_cstats.json")
    )
    with pytest.raises(ValueError, match="no _cstats.json baseline"):
        ann_index_drift(spark, assignments_table=at)


def test_reindex_cli_gates_ivf_family(spark, tmp_path, capsys):
    """The reindex CLI reaches IVF families by name and through the
    sweep: gate mode refreshes a drifted family's centroids and
    re-arms; the report sweep lists it."""
    from dbt_on_snowflake_spark.__main__ import main
    from dbt_on_snowflake_spark.operators.similarity import (
        ann_index_append,
        ann_index_drift,
    )

    e, ct, at = _fresh_ivf(spark, "ivfdrift_cli")
    ann_index_append(
        spark, _shifted(e), centroids_table=ct, assignments_table=at
    )
    root = _proj(tmp_path)
    assert (
        main([
            "reindex", "--project", root, "--corpus", SF_SMOKE,
            "--when-drifted", "1.5", "--codes-table", at,
        ])
        == 0
    )
    assert f"ivf index {at}" in capsys.readouterr().out
    after = ann_index_drift(spark, assignments_table=at)
    assert after["ratio"] == pytest.approx(1.0)
    # the report sweep lists the family too
    assert main(["reindex", "--project", root, "--corpus", SF_SMOKE]) == 0
    assert f"ivf index {at}: drift ratio" in capsys.readouterr().out


def test_reindex_sweep_ignores_temp_views(spark, tmp_path, capsys):
    """r13 review pass 2, finding 3: listTables returns session temp
    views for every database; a same-prefixed view must not enter the
    sweep as an unresolvable db-qualified entry."""
    from dbt_on_snowflake_spark.__main__ import main

    spark.range(1).createOrReplaceTempView("pq_codes_tempview")
    try:
        root = _proj(tmp_path)
        assert (
            main(["reindex", "--project", root, "--corpus", SF_SMOKE])
            == 0
        )
        out = capsys.readouterr().out
        assert "pq_codes_tempview" not in out
    finally:
        spark.catalog.dropTempView("pq_codes_tempview")


def test_ivf_refresh_baseline_ignores_tombstoned_rows(spark):
    """r13 review, finding 1: the baseline must be recorded over the
    LIVE rows — the same population the drift check measures and the
    refresh trains on. With tombstones present, a full-table baseline
    would leave every post-refresh ratio off 1.0 (masking drift or
    retraining on every sweep)."""
    from dbt_on_snowflake_spark.operators.similarity import (
        ann_index_append,
        ann_index_delete,
        ann_index_drift,
        refresh_centroids,
    )

    e, ct, at = _fresh_ivf(spark, "ivfdrift_tomb")
    ann_index_append(
        spark, _shifted(e), centroids_table=ct, assignments_table=at
    )
    # tombstone the shifted rows WITHOUT folding: dead rows still sit
    # in the table, far from any refreshed centroid
    ann_index_delete(
        spark,
        _shifted(e).select("vec_id"),
        assignments_table=at,
    )
    refresh_centroids(spark, centroids_table=ct, assignments_table=at)
    after = ann_index_drift(spark, assignments_table=at)
    assert after["ratio"] == pytest.approx(1.0)
    # and base_n_rows counts live rows only
    assert after["n_rows"] == after["base_n_rows"]
