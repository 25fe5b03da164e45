"""DELETE propagation for the persisted indexes (engine/index_delete.py):
tombstone appends gate every serve immediately, and the ``compact
--indexes`` fold physically rewrites the member tables, converging
bit-exactly to a rebuild without the deleted rows. The contract is
(1) a serve after delete equals a recompute over the shrunken corpus,
(2) the fold leaves every member table row-identical to a filtered
build (bucket/partition layout preserved), (3) replays and re-folds are
no-ops, (4) every unsafe fold path fails CLOSED — tombstones retained,
serves still gated."""

from __future__ import annotations

import posixpath

import pytest
from pyspark.sql import functions as F

from dbt_on_snowflake_spark.engine.index_delete import (
    fold_tombstone_families,
    fold_tombstones,
    index_delete,
    live_rows,
)
from dbt_on_snowflake_spark.engine.index_maintenance import (
    _bucket_spec,
    table_location,
)
from dbt_on_snowflake_spark.operators.dedup import (
    _drop_managed_table,
    _mh_tombstones,
    build_minhash_index,
    minhash_band_keys,
    minhash_index_delete,
)
from dbt_on_snowflake_spark.operators.similarity import (
    _live_codes,
    _pq_tombstones,
    build_pq_index,
    pq_index_delete,
)
from dbt_on_snowflake_spark.operators.textops import (
    BM25_TOP_N,
    _text_tombstones,
    bm25_topn_indexed,
    build_text_index,
    text_index_delete,
)
from dbt_on_snowflake_spark.testdata import table
from tests.conftest import SF_SMOKE

DEL_PRED = "doc_id % 10 = 9"
KEEP_PRED = "doc_id % 10 <> 9"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _docs(spark):
    return table(spark, SF_SMOKE, "documents")


def _build_text(spark, tag, pred=None):
    t = (f"bm25_stats_{tag}", f"bm25_postings_{tag}", f"bm25_doclen_{tag}")
    d = _docs(spark)
    if pred:
        d = d.filter(F.expr(pred))
    build_text_index(
        spark, d, stats_table=t[0], postings_table=t[1], doclen_table=t[2]
    )
    return t


def test_text_delete_then_fold_converges_to_filtered_build(spark):
    """Serve-after-delete == serve-after-fold == a from-scratch build
    over the shrunken corpus, and the folded member tables are
    row-identical (stats bit-identical) to that build's."""
    full = _build_text(spark, "tdel_full")
    ref = _build_text(spark, "tdel_ref", pred=KEEP_PRED)
    text_index_delete(
        spark,
        _docs(spark).filter(F.expr(DEL_PRED)).select("doc_id"),
        stats_table=full[0],
        postings_table=full[1],
        doclen_table=full[2],
    )
    served_gated = _rows(bm25_topn_indexed(spark, SF_SMOKE, BM25_TOP_N, tables=full))
    served_ref = _rows(bm25_topn_indexed(spark, SF_SMOKE, BM25_TOP_N, tables=ref))
    assert served_gated == served_ref

    tomb = _text_tombstones(full[1])
    r = fold_tombstones(spark, tomb)
    assert r is not None and r[0] == 2  # both members rewritten
    # member tables converge row-identically; stats bit-identical
    for folded_t, ref_t in zip(full, ref):
        assert _rows(spark.table(folded_t)) == _rows(spark.table(ref_t)), (
            folded_t
        )
    # fully folded: the tombstone table itself is dropped, so the
    # serves return to their PRISTINE plans (no anti-join, persisted
    # one-row stats read again — r12 review, finding 6)
    assert not spark.catalog.tableExists(tomb)
    from dbt_on_snowflake_spark.plans import explain_str

    post = bm25_topn_indexed(spark, SF_SMOKE, BM25_TOP_N, tables=full)
    assert "LeftAnti" not in explain_str(post)
    assert _rows(post) == served_ref


def test_text_delete_replay_is_noop(spark):
    full = _build_text(spark, "tdel_replay")
    ids = _docs(spark).filter(F.expr(DEL_PRED)).select("doc_id")
    kw = dict(
        stats_table=full[0], postings_table=full[1], doclen_table=full[2]
    )
    text_index_delete(spark, ids, **kw)
    tomb = _text_tombstones(full[1])
    n1 = spark.table(tomb).count()
    text_index_delete(spark, ids, **kw)  # at-least-once redelivery
    assert spark.table(tomb).count() == n1


def test_live_gate_is_exact_noop_without_tombstones(spark):
    """The pristine serve plan is unchanged — live_rows returns the
    SAME DataFrame (no anti-join node) when the family has never seen
    a delete; after a delete the gate appears."""
    full = _build_text(spark, "tdel_plan")
    doclen = spark.table(full[2])
    assert live_rows(spark, doclen, _text_tombstones(full[1]), "doc_id") is doclen
    from dbt_on_snowflake_spark.plans import explain_str

    plan0 = explain_str(bm25_topn_indexed(spark, SF_SMOKE, BM25_TOP_N, tables=full))
    assert "LeftAnti" not in plan0
    text_index_delete(
        spark,
        _docs(spark).filter("doc_id % 50 = 3").select("doc_id"),
        stats_table=full[0],
        postings_table=full[1],
        doclen_table=full[2],
    )
    plan1 = explain_str(bm25_topn_indexed(spark, SF_SMOKE, BM25_TOP_N, tables=full))
    assert "LeftAnti" in plan1


def test_rebuild_resets_tombstone_slate(spark):
    """A full build reads the corpus of record — prior serving-level
    deletes must not leak into the fresh index as silent row drops."""
    full = _build_text(spark, "tdel_reset")
    text_index_delete(
        spark,
        _docs(spark).filter(F.expr(DEL_PRED)).select("doc_id"),
        stats_table=full[0],
        postings_table=full[1],
        doclen_table=full[2],
    )
    assert spark.catalog.tableExists(_text_tombstones(full[1]))
    _build_text(spark, "tdel_reset")  # rebuild at the same names
    assert not spark.catalog.tableExists(_text_tombstones(full[1]))
    full_rows = _rows(bm25_topn_indexed(spark, SF_SMOKE, BM25_TOP_N, tables=full))
    ref = _build_text(spark, "tdel_reset_ref")
    assert full_rows == _rows(
        bm25_topn_indexed(spark, SF_SMOKE, BM25_TOP_N, tables=ref)
    )


def test_pq_delete_fold_converges_frozen_codebook(spark):
    """Codes are per-row facts of (vector, frozen codebook): the folded
    codes table equals the full encode minus the deleted rows, and the
    gated serve equals the folded serve."""
    from dbt_on_snowflake_spark.operators.similarity import (
        TOP_K,
        _adc_serve,
        _vectors,
    )

    cb, cd = "pq_codebook_tdel", "pq_codes_tdel"
    e = _vectors(spark, SF_SMOKE)
    build_pq_index(spark, e, codebook_table=cb, codes_table=cd)
    full_codes = _rows(
        spark.table(cd).select("vec_id", F.to_json("bests"))
    )
    ids = e.filter("vec_id % 10 = 9").select("vec_id")
    pq_index_delete(spark, ids, codes_table=cd)
    served_gated = _rows(
        _adc_serve(spark, e, cb, _live_codes(spark, cd), TOP_K)
    )
    tomb = _pq_tombstones(cd)
    assert fold_tombstones(spark, tomb)[0] == 1
    folded_codes = _rows(
        spark.table(cd).select("vec_id", F.to_json("bests"))
    )
    deleted = {r.vec_id for r in ids.collect()}  # bounded: test-sized slice
    assert folded_codes == [r for r in full_codes if r[0] not in deleted]
    assert (
        _rows(_adc_serve(spark, e, cb, _live_codes(spark, cd), TOP_K))
        == served_gated
    )


def test_minhash_delete_fold_preserves_bucket_layout(spark):
    """The bucketed band index (and its verified-pairs side output)
    folds in place: bucket spec identical after the swap, rows equal a
    filtered rebuild, pairs with a deleted endpoint gone."""
    idx, pairs = "mh_band_index_tdel", "mh_corpus_pairs_tdel"
    d = _docs(spark)
    build_minhash_index(spark, d, index_table=idx, pairs_table=pairs)
    spec_before = _bucket_spec(spark, idx)
    assert spec_before is not None
    minhash_index_delete(
        spark,
        d.filter(F.expr(DEL_PRED)).select("doc_id"),
        index_table=idx,
        pairs_table=pairs,
    )
    assert fold_tombstones(spark, _mh_tombstones(idx))[0] == 2
    assert _bucket_spec(spark, idx) == spec_before
    # index rows == a rebuild over the shrunken corpus (band keys are
    # per-doc facts)
    ref_rows = _rows(minhash_band_keys(d.filter(F.expr(KEEP_PRED))))
    assert _rows(spark.table(idx)) == ref_rows
    # no surviving pair touches a deleted doc
    assert (
        spark.table(pairs)
        .filter("doc_a % 10 = 9 OR doc_b % 10 = 9")
        .count()
        == 0
    )
    _drop_managed_table(spark, idx)
    _drop_managed_table(spark, pairs)


def test_fold_fails_closed_on_unknown_refresh_kind(spark):
    """An uninterpretable sidecar must skip the family — tombstones
    retained, members untouched — never truncate."""
    spark.createDataFrame([(1,)], "doc_id long").write.mode(
        "overwrite"
    ).saveAsTable("tdel_member")
    index_delete(
        spark,
        spark.createDataFrame([(1,)], "doc_id long"),
        tombstones_table="x_tombstones_badkind",
        id_col="doc_id",
        members=[{"table": "tdel_member", "id_cols": ["doc_id"]}],
        refresh={"kind": "no_such_kind"},
    )
    done, skipped = fold_tombstone_families(spark)
    assert any(
        n == "x_tombstones_badkind" and "unknown refresh kind" in why
        for n, why in skipped
    )
    assert spark.table("x_tombstones_badkind").count() == 1
    assert spark.table("tdel_member").count() == 1
    _drop_managed_table(spark, "x_tombstones_badkind")
    _drop_managed_table(spark, "tdel_member")


def test_fold_fails_closed_on_missing_member_and_sidecar(spark):
    spark.createDataFrame([(2,)], "doc_id long").write.mode(
        "overwrite"
    ).saveAsTable("tdel_member2")
    index_delete(
        spark,
        spark.createDataFrame([(2,)], "doc_id long"),
        tombstones_table="x_tombstones_missing",
        id_col="doc_id",
        members=[{"table": "tdel_member_gone", "id_cols": ["doc_id"]}],
    )
    with pytest.raises(ValueError, match="missing"):
        fold_tombstones(spark, "x_tombstones_missing")
    assert spark.table("x_tombstones_missing").count() == 1
    # a tombstone table whose sidecar is gone is equally unfoldable
    spark.createDataFrame([(3,)], "doc_id long").write.mode(
        "append"
    ).saveAsTable("x_tombstones_nosidecar")
    with pytest.raises(ValueError, match="sidecar"):
        fold_tombstones(spark, "x_tombstones_nosidecar")
    _drop_managed_table(spark, "x_tombstones_missing")
    _drop_managed_table(spark, "x_tombstones_nosidecar")
    _drop_managed_table(spark, "tdel_member2")


def test_fold_retry_after_partial_crash_converges(spark):
    """A fold that crashed after rewriting ONE member (tombstones still
    present) re-runs to the same converged state: the anti-join is
    idempotent over an already-folded member."""
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        rewrite_index_table,
    )

    full = _build_text(spark, "tdel_crash")
    ref = _build_text(spark, "tdel_crash_ref", pred=KEEP_PRED)
    ids_df = _docs(spark).filter(F.expr(DEL_PRED)).select("doc_id")
    text_index_delete(
        spark,
        ids_df,
        stats_table=full[0],
        postings_table=full[1],
        doclen_table=full[2],
    )
    # simulate the crash: fold member 1 by hand, then "die" before the
    # rest — tombstones are untouched, so serves stay exact meanwhile
    ids = [r.doc_id for r in ids_df.collect()]  # bounded: test slice
    rewrite_index_table(
        spark,
        full[1],
        lambda df: df.filter(~F.col("doc_id").isin(ids)),
    )
    assert (
        _rows(bm25_topn_indexed(spark, SF_SMOKE, BM25_TOP_N, tables=full))
        == _rows(bm25_topn_indexed(spark, SF_SMOKE, BM25_TOP_N, tables=ref))
    )
    # the retry folds everything (re-rewriting member 1 is a no-op)
    assert fold_tombstones(spark, _text_tombstones(full[1]))[0] == 2
    for folded_t, ref_t in zip(full, ref):
        assert _rows(spark.table(folded_t)) == _rows(spark.table(ref_t))


def test_mid_fold_delete_survives_truncate(spark):
    """A tombstone append landing after the fold snapshotted its files
    must survive the truncate (the fold deletes only what it read)."""
    full = _build_text(spark, "tdel_race")
    kw = dict(
        stats_table=full[0], postings_table=full[1], doclen_table=full[2]
    )
    text_index_delete(
        spark, _docs(spark).filter(F.expr(DEL_PRED)).select("doc_id"), **kw
    )
    tomb = _text_tombstones(full[1])
    # a second delete lands "mid-fold": fold_tombstones snapshots at
    # entry, so appending before the call and asserting both outcomes
    # needs the snapshot boundary — emulate by folding, then deleting,
    # then checking the new tombstones are intact and re-foldable
    fold_tombstones(spark, tomb)
    text_index_delete(
        spark, _docs(spark).filter("doc_id % 10 = 8").select("doc_id"), **kw
    )
    assert spark.table(tomb).count() > 0
    assert fold_tombstones(spark, tomb)[0] == 2
    ref = _build_text(spark, "tdel_race_ref", pred="doc_id % 10 NOT IN (8, 9)")
    for folded_t, ref_t in zip(full, ref):
        assert _rows(spark.table(folded_t)) == _rows(spark.table(ref_t))


def test_fold_resolves_members_in_the_familys_database(spark):
    """A family living in a non-current database folds ITS OWN member
    tables, resolved via the tombstone table's database — never the
    sweep's current database (r12 review, finding 1: a same-named
    member in the current db would otherwise be folded with foreign
    ids, and the family itself would never fold)."""
    spark.sql("CREATE DATABASE IF NOT EXISTS folddb")
    # decoy in the CURRENT database with the same member name
    spark.createDataFrame(
        [(9, "keep")], "doc_id long, v string"
    ).write.mode("overwrite").saveAsTable("xdel_member")
    spark.createDataFrame(
        [(9, "drop"), (10, "keep")], "doc_id long, v string"
    ).write.mode("overwrite").saveAsTable("folddb.xdel_member")
    index_delete(
        spark,
        spark.createDataFrame([(9,)], "doc_id long"),
        tombstones_table="folddb.x_tombstones_db",
        id_col="doc_id",
        members=[{"table": "xdel_member", "id_cols": ["doc_id"]}],
    )
    done, skipped = fold_tombstone_families(spark)
    assert any(n == "folddb.x_tombstones_db" for n, *_ in done), (
        done,
        skipped,
    )
    # the family's member lost its row; the decoy kept its doc_id=9
    assert _rows(spark.table("folddb.xdel_member")) == [(10, "keep")]
    assert _rows(spark.table("xdel_member")) == [(9, "keep")]
    _drop_managed_table(spark, "xdel_member")
    spark.sql("DROP TABLE IF EXISTS folddb.xdel_member")
    spark.sql("DROP DATABASE folddb CASCADE")


def test_delete_retry_heals_missing_sidecar(spark):
    """A first delete that crashed between table creation and sidecar
    write leaves an uninterpretable family; the RETRY must rewrite the
    sidecar (it is re-merged on every call), after which the fold
    works (r12 review, finding 3)."""
    from dbt_on_snowflake_spark.engine.fs import fs_delete
    from dbt_on_snowflake_spark.engine.index_delete import (
        SIDECAR,
        tombstone_spec,
    )

    spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, v string"
    ).write.mode("overwrite").saveAsTable("heal_member")
    ids = spark.createDataFrame([(1,)], "doc_id long")
    kw = dict(
        tombstones_table="x_tombstones_heal",
        id_col="doc_id",
        members=[{"table": "heal_member", "id_cols": ["doc_id"]}],
    )
    index_delete(spark, ids, **kw)
    # simulate the crash aftermath: sidecar gone, table + ids remain
    fs_delete(
        spark,
        posixpath.join(
            table_location(spark, "x_tombstones_heal"), SIDECAR
        ),
    )
    with pytest.raises(ValueError, match="sidecar"):
        fold_tombstones(spark, "x_tombstones_heal")
    index_delete(spark, ids, **kw)  # the redelivered delete heals it
    assert tombstone_spec(spark, "x_tombstones_heal") is not None
    assert fold_tombstones(spark, "x_tombstones_heal")[0] == 1
    assert _rows(spark.table("heal_member")) == [(2, "b")]
    _drop_managed_table(spark, "heal_member")


def test_later_delete_widens_member_set(spark):
    """Member declarations ACCRETE across delete calls (r12 review,
    finding 4): a second minhash delete that also names the pairs side
    output must make the fold rewrite the pairs too — the first call's
    narrower declaration cannot pin the family's scope."""
    idx, pairs = "mh_band_index_widen", "mh_corpus_pairs_widen"
    d = _docs(spark)
    build_minhash_index(spark, d, index_table=idx, pairs_table=pairs)
    minhash_index_delete(
        spark,
        d.filter("doc_id % 20 = 9").select("doc_id"),
        index_table=idx,  # pairs_table NOT declared here
    )
    minhash_index_delete(
        spark,
        d.filter("doc_id % 20 = 19").select("doc_id"),
        index_table=idx,
        pairs_table=pairs,  # widened on the second call
    )
    assert fold_tombstones(spark, _mh_tombstones(idx))[0] == 2
    assert (
        spark.table(pairs)
        .filter("doc_a % 10 = 9 OR doc_b % 10 = 9")
        .count()
        == 0
    )
    assert spark.table(idx).filter("doc_id % 10 = 9").count() == 0
    _drop_managed_table(spark, idx)
    _drop_managed_table(spark, pairs)


def test_narrower_later_delete_still_covers_pairs(spark):
    """After a full fold DROPS the tombstone table (sidecar included),
    a later delete that omits pairs_table must still scrub the pairs:
    minhash_index_delete auto-includes the conventional pairs sibling
    whenever it exists (r12 review pass 2)."""
    idx, pairs = "mh_band_index_narrow", "mh_corpus_pairs_narrow"
    d = _docs(spark)
    build_minhash_index(spark, d, index_table=idx, pairs_table=pairs)
    minhash_index_delete(
        spark,
        d.filter("doc_id % 20 = 9").select("doc_id"),
        index_table=idx,
        pairs_table=pairs,
    )
    assert fold_tombstones(spark, _mh_tombstones(idx))[0] == 2
    assert not spark.catalog.tableExists(_mh_tombstones(idx))
    # the narrower call pattern after the reset
    minhash_index_delete(
        spark,
        d.filter("doc_id % 20 = 19").select("doc_id"),
        index_table=idx,  # pairs_table omitted
    )
    assert fold_tombstones(spark, _mh_tombstones(idx))[0] == 2
    assert (
        spark.table(pairs)
        .filter("doc_a % 20 = 19 OR doc_b % 20 = 19")
        .count()
        == 0
    )
    _drop_managed_table(spark, idx)
    _drop_managed_table(spark, pairs)


def test_create_path_reattaches_previous_sessions_tombstones(spark, tmp_path):
    """A catalog-less tombstone dir holding LIVE ids (a previous
    session's deletes — the in-memory catalog forgot the table, the
    files persist) must be RE-ATTACHED by the next delete, never
    deleted: wiping it would resurrect the prior session's deletes
    (r12 review pass 4)."""
    import os

    from dbt_on_snowflake_spark.engine.index_delete import tombstone_spec

    name = "x_tombstones_prevsess"
    spark.createDataFrame(
        [(5, "a"), (6, "b"), (7, "c")], "doc_id long, v string"
    ).write.mode("overwrite").saveAsTable("prevsess_member")
    kw = dict(
        tombstones_table=name,
        id_col="doc_id",
        members=[{"table": "prevsess_member", "id_cols": ["doc_id"]}],
    )
    index_delete(spark, spark.createDataFrame([(5,)], "doc_id long"), **kw)
    loc = table_location(spark, name)
    # simulate the session boundary: forget the catalog entry but keep
    # the files (a managed DROP would delete them, so move them aside)
    import shutil

    stash = str(tmp_path / "stash")
    local = loc.removeprefix("file:")
    shutil.copytree(local, stash)
    spark.sql(f"DROP TABLE {name}")
    shutil.copytree(stash, local)
    assert not spark.catalog.tableExists(name)

    # the next session's delete re-attaches and ACCRETES
    index_delete(spark, spark.createDataFrame([(6,)], "doc_id long"), **kw)
    got = {r.doc_id for r in spark.table(name).collect()}
    assert got == {5, 6}  # the prior session's id 5 survived
    assert tombstone_spec(spark, name) is not None
    assert fold_tombstones(spark, name)[0] == 1
    assert _rows(spark.table("prevsess_member")) == [(7, "c")]
    _drop_managed_table(spark, "prevsess_member")


def test_create_path_heals_filesfree_leftover_dir(spark):
    """The sidecar-only leftover of a fold that crashed between DROP
    and its dir delete is cleared so CREATE succeeds (no wedge), while
    holding zero data files (nothing to lose)."""
    import json as _json
    import posixpath as pp

    from dbt_on_snowflake_spark.engine.fs import (
        fs_create_atomic,
        fs_exists,
    )
    from dbt_on_snowflake_spark.engine.index_delete import SIDECAR

    name = "x_tombstones_leftover"
    wh = spark.conf.get("spark.sql.warehouse.dir")
    fs_create_atomic(
        spark,
        pp.join(wh, name, SIDECAR),
        _json.dumps({"id_col": "doc_id", "members": []}).encode(),
    )
    assert fs_exists(spark, pp.join(wh, name))
    spark.createDataFrame([(1, "a")], "doc_id long, v string").write.mode(
        "overwrite"
    ).saveAsTable("leftover_member")
    index_delete(
        spark,
        spark.createDataFrame([(1,)], "doc_id long"),
        tombstones_table=name,
        id_col="doc_id",
        members=[{"table": "leftover_member", "id_cols": ["doc_id"]}],
    )
    assert spark.table(name).count() == 1
    assert fold_tombstones(spark, name)[0] == 1
    _drop_managed_table(spark, "leftover_member")


def test_create_path_leaves_foreign_location_dirs_alone(spark, tmp_path):
    """A database created with an OUTSIDE location may hold someone
    else's data (the index-GC convention): the create-path heal must
    not touch a colliding dir there — the CREATE fails loudly
    instead of a silent recursive delete (r12 review pass 4)."""
    import os

    import pytest as _pytest

    floc = str(tmp_path / "foreigndb")
    spark.sql(f"CREATE DATABASE foreigndb LOCATION '{floc}'")
    try:
        victim = os.path.join(floc, "x_tombstones_foreign")
        os.makedirs(victim)
        open(os.path.join(victim, "precious.txt"), "w").write("keep me")
        spark.createDataFrame(
            [(1, "a")], "doc_id long, v string"
        ).write.mode("overwrite").saveAsTable("foreign_member")
        with _pytest.raises(Exception):
            index_delete(
                spark,
                spark.createDataFrame([(1,)], "doc_id long"),
                tombstones_table="foreigndb.x_tombstones_foreign",
                id_col="doc_id",
                members=[
                    {"table": "foreign_member", "id_cols": ["doc_id"]}
                ],
            )
        assert os.path.exists(os.path.join(victim, "precious.txt"))
        _drop_managed_table(spark, "foreign_member")
    finally:
        spark.sql("DROP DATABASE IF EXISTS foreigndb CASCADE")


def _stage_file(spark, table_dir: str, name: str = "part-staged.parquet"):
    """Plant an uncommitted staged parquet under <dir>/_temporary —
    what a crashed/in-flight FileOutputCommitter write leaves."""
    import pandas as pd

    local = table_dir.removeprefix("file:")
    staged_dir = f"{local}/_temporary/0"
    import os

    os.makedirs(staged_dir, exist_ok=True)
    pd.DataFrame({"doc_id": [999_999]}).to_parquet(
        f"{staged_dir}/{name}", index=False
    )
    return f"{staged_dir}/{name}"


def test_fold_keeps_tombstone_table_while_staging_present(spark):
    """The drop-when-empty decision must SEE an in-flight staged
    delete: the fold rewrites and truncates, but the table survives so
    the racing writer's commit keeps its gate (r12 review pass 6)."""
    full = _build_text(spark, "tdel_staged")
    kw = dict(
        stats_table=full[0], postings_table=full[1], doclen_table=full[2]
    )
    text_index_delete(
        spark, _docs(spark).filter(F.expr(DEL_PRED)).select("doc_id"), **kw
    )
    tomb = _text_tombstones(full[1])
    tomb_loc = table_location(spark, tomb)
    _stage_file(spark, tomb_loc)
    assert fold_tombstones(spark, tomb)[0] == 2
    assert spark.catalog.tableExists(tomb)  # NOT dropped
    # the maintenance reclaim clears the (abandoned) staging; the next
    # fold has nothing to rewrite but observes true emptiness and
    # returns the family to pristine (r12 review passes 8/9)
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        reclaim_abandoned_staging,
    )

    reclaimed, _ = reclaim_abandoned_staging(spark, min_age_ms=0)
    assert f"{tomb}/_temporary" in reclaimed  # THIS table's staging
    assert fold_tombstones(spark, tomb) is None
    assert not spark.catalog.tableExists(tomb)


def test_heal_raises_on_staged_only_dir_and_reclaim_unblocks(spark):
    """A catalog-less tombstone dir holding ONLY staged files fails
    the delete loudly (deleting could destroy a commit landing in the
    window; re-attach can't infer a schema) — and the maintenance
    sweep's age-gated staging reclaim unblocks it (r12 review pass 7)."""
    import os

    from dbt_on_snowflake_spark.engine.index_maintenance import (
        reclaim_abandoned_staging,
    )

    name = "x_tombstones_stagedonly"
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    _stage_file(spark, os.path.join(wh, name))
    spark.createDataFrame([(1, "a")], "doc_id long, v string").write.mode(
        "overwrite"
    ).saveAsTable("stagedonly_member")
    kw = dict(
        tombstones_table=name,
        id_col="doc_id",
        members=[{"table": "stagedonly_member", "id_cols": ["doc_id"]}],
    )
    ids = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError, match="staged"):
        index_delete(spark, ids, **kw)
    # a RECENT staged file is protected by the age gate...
    fresh_reclaimed, _ = reclaim_abandoned_staging(spark)
    assert f"{name}/_temporary" not in fresh_reclaimed
    # ...but abandoned staging (age floor 0 models day-old mtimes)
    # is reclaimed, unblocking the delete
    reclaimed, _ = reclaim_abandoned_staging(spark, min_age_ms=0)
    assert f"{name}/_temporary" in reclaimed
    index_delete(spark, ids, **kw)
    assert spark.table(name).count() == 1
    _drop_managed_table(spark, "stagedonly_member")
    _drop_managed_table(spark, name)


def test_reclaim_covers_custom_location_database(spark, tmp_path):
    """A database created with an explicit under-warehouse LOCATION is
    swept too, and a table dir NAMED `*.db` under it is treated as a
    table (not expanded as a database) — its staging is reclaimed at
    the right depth (r12 review passes 10/11)."""
    import os

    from dbt_on_snowflake_spark.engine.index_maintenance import (
        reclaim_abandoned_staging,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    floc = os.path.join(wh, "customloc")
    spark.sql(f"CREATE DATABASE customdb LOCATION '{floc}'")
    try:
        # a table dir whose NAME ends in .db, holding abandoned staging
        tdir = os.path.join(floc, "events.db")
        _stage_file(spark, tdir)
        reclaimed, _ = reclaim_abandoned_staging(spark, min_age_ms=0)
        assert "events.db/_temporary" in reclaimed
        assert not os.path.exists(os.path.join(tdir, "_temporary"))
    finally:
        spark.sql("DROP DATABASE customdb CASCADE")


def test_derive_tombstones_name_preserves_db_qualifier():
    """Database-qualified index tables must derive database-qualified
    tombstone (and pairs-sibling) names: naive prefix surgery on
    'db.pq_codes_x' yields 'pq_tombstones_db.pq_codes_x', which parses
    as table pq_codes_x in database pq_tombstones_db — the delete would
    fail loudly there, but gated serves would silently read UNGATED
    (r12 advice #4)."""
    from dbt_on_snowflake_spark.operators.dedup import _mh_tombstones
    from dbt_on_snowflake_spark.operators.similarity import (
        _ann_tombstones,
    )
    from dbt_on_snowflake_spark.operators.textops import _text_tombstones

    assert _pq_tombstones("pq_codes_x") == "pq_tombstones_x"
    assert _pq_tombstones("db.pq_codes_x") == "db.pq_tombstones_x"
    assert _ann_tombstones("db.ann_assignments_y") == "db.ann_tombstones_y"
    assert _mh_tombstones("db.mh_band_index_z") == "db.mh_tombstones_z"
    assert (
        _text_tombstones("db.bm25_postings_w") == "db.bm25_tombstones_w"
    )


def test_qualified_family_delete_and_gate_roundtrip(spark):
    """End-to-end over a database-qualified minhash family: the delete
    resolves the tombstone table inside the family's database and the
    gated probe read excludes the doc (the r12-advice #4 failure mode
    was exactly this pair diverging)."""
    from dbt_on_snowflake_spark.operators.dedup import _live_index

    spark.sql("CREATE DATABASE IF NOT EXISTS tombq")
    try:
        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(30))),
                (2, " ".join(f"z{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        build_minhash_index(
            spark, docs, index_table="tombq.mh_band_index_q"
        )
        minhash_index_delete(
            spark,
            spark.createDataFrame([(1,)], "doc_id long"),
            index_table="tombq.mh_band_index_q",
        )
        assert spark.catalog.tableExists("tombq.mh_tombstones_q")
        live = {
            r.doc_id
            for r in _live_index(spark, "tombq.mh_band_index_q")
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert live == {2}
    finally:
        spark.sql("DROP DATABASE tombq CASCADE")


def test_reattach_tombstones_triage(spark, tmp_path):
    """``reattach_tombstones`` (the attach_* hook): re-attaches over a
    committed catalog-less tombstone dir, and attaches NOTHING for
    staged-only or empty dirs (no committed delete exists — and a
    reader must neither destroy nor block on another session's
    in-flight write)."""
    import os
    import shutil

    from dbt_on_snowflake_spark.engine.index_delete import (
        reattach_tombstones,
    )

    name = "x_tombstones_reattach"
    spark.createDataFrame(
        [(5, "a")], "doc_id long, v string"
    ).write.mode("overwrite").saveAsTable("reattach_member")
    index_delete(
        spark,
        spark.createDataFrame([(5,)], "doc_id long"),
        tombstones_table=name,
        id_col="doc_id",
        members=[{"table": "reattach_member", "id_cols": ["doc_id"]}],
    )
    # already attached -> True, no-op
    assert reattach_tombstones(spark, name) is True

    # simulate the session boundary (files survive, catalog forgets)
    loc = table_location(spark, name).removeprefix("file:")
    stash = str(tmp_path / "stash")
    shutil.copytree(loc, stash)
    spark.sql(f"DROP TABLE {name}")
    shutil.copytree(stash, loc)
    assert not spark.catalog.tableExists(name)
    assert reattach_tombstones(spark, name) is True
    assert {r.doc_id for r in spark.table(name).collect()} == {5}
    spark.sql(f"DROP TABLE {name}")

    # staged-only dir: in-flight delete, not committed -> no attach
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    sdir = os.path.join(wh, "x_tombstones_staged", "_temporary", "0")
    os.makedirs(sdir, exist_ok=True)
    with open(os.path.join(sdir, "part-0"), "w") as f:
        f.write("x")
    assert reattach_tombstones(spark, "x_tombstones_staged") is False
    assert not spark.catalog.tableExists("x_tombstones_staged")
    # the dir is left for the writer (a reader never reclaims)
    assert os.path.exists(sdir)
    shutil.rmtree(os.path.join(wh, "x_tombstones_staged"))

    # absent dir -> False
    assert reattach_tombstones(spark, "x_tombstones_never") is False
    _drop_managed_table(spark, "reattach_member")
    _drop_managed_table(spark, name)


def test_attach_helpers_restore_delete_gate(spark, tmp_path):
    """attach_minhash_index / attach_pq_index in a fresh catalog must
    re-attach the family's persisted tombstones, or the re-attached
    index serves UNGATED and resurrects deleted rows (r12 advice #1,
    medium). Session boundary simulated as in
    test_create_path_reattaches_previous_sessions_tombstones; the
    genuine two-JVM proof is tests/test_index_durability.py."""
    import shutil

    from dbt_on_snowflake_spark.operators.dedup import (
        _live_index,
        attach_minhash_index,
    )
    from dbt_on_snowflake_spark.operators.similarity import (
        attach_pq_index,
    )

    def forget(table):
        loc = table_location(spark, table).removeprefix("file:")
        stash = str(tmp_path / table)
        shutil.copytree(loc, stash)
        spark.sql(f"DROP TABLE {table}")
        shutil.copytree(stash, loc)
        assert not spark.catalog.tableExists(table)

    # minhash family
    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(30))),
            (2, " ".join(f"z{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    build_minhash_index(spark, docs, index_table="mh_band_index_att")
    minhash_index_delete(
        spark,
        spark.createDataFrame([(1,)], "doc_id long"),
        index_table="mh_band_index_att",
    )
    for t in ("mh_band_index_att", "mh_tombstones_att"):
        forget(t)
    attach_minhash_index(spark, "mh_band_index_att")
    assert spark.catalog.tableExists("mh_tombstones_att")
    live = {
        r.doc_id
        for r in _live_index(spark, "mh_band_index_att")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert live == {2}
    _drop_managed_table(spark, "mh_tombstones_att")
    _drop_managed_table(spark, "mh_band_index_att")

    # PQ family
    from dbt_on_snowflake_spark.operators.similarity import _vectors

    vecs = _vectors(spark, SF_SMOKE)
    build_pq_index(
        spark,
        vecs,
        codebook_table="pq_codebook_att",
        codes_table="pq_codes_att",
    )
    pq_index_delete(
        spark,
        spark.createDataFrame([(3,)], "vec_id long"),
        codes_table="pq_codes_att",
    )
    for t in ("pq_codebook_att", "pq_codes_att", "pq_tombstones_att"):
        forget(t)
    attach_pq_index(
        spark,
        codebook_table="pq_codebook_att",
        codes_table="pq_codes_att",
    )
    assert spark.catalog.tableExists("pq_tombstones_att")
    live = {
        r.vec_id for r in _live_codes(spark, "pq_codes_att").collect()
    }
    everyone = {r.vec_id for r in vecs.select("vec_id").collect()}
    assert live == everyone - {3}
    for t in ("pq_tombstones_att", "pq_codebook_att", "pq_codes_att"):
        _drop_managed_table(spark, t)


def test_qualified_family_rebuild_resets_tombstone_dir(spark):
    """r13 review, finding 2: for a database-qualified family the
    builder's slate reset must delete the tombstone DIR at the
    database's location (wh/<db>.db/<table>), not wh/'db.table' — a
    survivor would be re-attached by the next attach/delete triage and
    resurrect pre-rebuild deletes onto the fresh index."""
    import os

    spark.sql("CREATE DATABASE IF NOT EXISTS tombr")
    try:
        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(30))),
                (2, " ".join(f"z{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        build_minhash_index(
            spark, docs, index_table="tombr.mh_band_index_r"
        )
        minhash_index_delete(
            spark,
            spark.createDataFrame([(1,)], "doc_id long"),
            index_table="tombr.mh_band_index_r",
        )
        tomb_loc = table_location(
            spark, "tombr.mh_tombstones_r"
        ).removeprefix("file:")
        assert os.path.exists(tomb_loc)
        # full rebuild: slate reset must remove table AND dir
        build_minhash_index(
            spark, docs, index_table="tombr.mh_band_index_r"
        )
        assert not spark.catalog.tableExists("tombr.mh_tombstones_r")
        assert not os.path.exists(tomb_loc)
        # doc 1 serves again (the rebuild read the corpus of record)
        from dbt_on_snowflake_spark.operators.dedup import _live_index

        live = {
            r.doc_id
            for r in _live_index(spark, "tombr.mh_band_index_r")
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert live == {1, 2}
    finally:
        spark.sql("DROP DATABASE tombr CASCADE")


def test_reattach_tombstones_covers_custom_location_database(
    spark, tmp_path
):
    """r13 review, finding 4: a family in a custom-LOCATION database
    keeps its tombstones at that database's managed location; the
    read-side re-attach must cover it (the _under_warehouse guard
    protects deletion, not attachment) or fresh-session serves of that
    family resurrect deleted docs silently."""
    import os
    import shutil

    from dbt_on_snowflake_spark.engine.index_delete import (
        reattach_tombstones,
    )
    from dbt_on_snowflake_spark.operators.dedup import _live_index

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    floc = os.path.join(wh, "tombcustomloc")
    spark.sql(f"CREATE DATABASE tombc LOCATION '{floc}'")
    try:
        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(30))),
                (2, " ".join(f"z{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        build_minhash_index(
            spark, docs, index_table="tombc.mh_band_index_c"
        )
        minhash_index_delete(
            spark,
            spark.createDataFrame([(1,)], "doc_id long"),
            index_table="tombc.mh_band_index_c",
        )
        loc = table_location(
            spark, "tombc.mh_tombstones_c"
        ).removeprefix("file:")
        stash = str(tmp_path / "stash")
        shutil.copytree(loc, stash)
        spark.sql("DROP TABLE tombc.mh_tombstones_c")
        shutil.copytree(stash, loc)
        assert not spark.catalog.tableExists("tombc.mh_tombstones_c")
        assert reattach_tombstones(spark, "tombc.mh_tombstones_c")
        live = {
            r.doc_id
            for r in _live_index(spark, "tombc.mh_band_index_c")
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert live == {2}
    finally:
        spark.sql("DROP DATABASE tombc CASCADE")


def test_drop_managed_table_leaves_foreign_location_dirs(spark, tmp_path):
    """r13 review pass 2, finding 1: the slate reset's catalog-less
    leftover sweep must respect the shared deletion guard — a database
    created with an outside LOCATION may hold someone else's data
    under the derived name; leave it (the next CREATE fails loudly on
    the non-empty location instead)."""
    import os

    floc = str(tmp_path / "foreign_loc")
    os.makedirs(floc)
    spark.sql(f"CREATE DATABASE tombf LOCATION '{floc}'")
    try:
        alien = os.path.join(floc, "mh_tombstones_f")
        os.makedirs(alien)
        open(os.path.join(alien, "somebody-elses.parquet"), "w").write("x")
        _drop_managed_table(spark, "tombf.mh_tombstones_f")
        assert os.path.exists(
            os.path.join(alien, "somebody-elses.parquet")
        )
    finally:
        spark.sql("DROP DATABASE tombf CASCADE")
        import shutil

        shutil.rmtree(floc, ignore_errors=True)


def test_drop_managed_table_spares_unrelated_temp_view(spark):
    """r13 advice #2 + r14 review finding 3: a user temp view over a
    name NO index family occupies (no cataloged table at the qualified
    name, no engine-owned dir) is session state the rebuild has no
    claim on — ``_drop_managed_table`` must not destroy it. But the
    caller is about to build a table the view would then shadow on
    every later read, so the reset fails LOUDLY (view intact) rather
    than silently dropping it or letting a build serve the view's
    rows. When the view DOES shadow a cataloged table it is still
    removed so the real table (not the view) is what gets located and
    dropped (r13 review pass 5, finding 2). Names with nothing behind
    them at all stay a quiet no-op."""
    spark.range(3).createOrReplaceTempView("free_name_r14adv2")
    try:
        with pytest.raises(ValueError, match="shadows the index family"):
            _drop_managed_table(spark, "free_name_r14adv2")
        assert spark.catalog.tableExists("free_name_r14adv2"), (
            "unrelated temp view destroyed by a no-op slate reset"
        )
    finally:
        spark.catalog.dropTempView("free_name_r14adv2")

    # nothing behind the name at all: quiet no-op
    _drop_managed_table(spark, "free_name_r14adv2_absent")

    spark.createDataFrame([(1,)], "a long").write.mode(
        "overwrite"
    ).saveAsTable("shadowed_tbl_r14adv2")
    spark.range(3).createOrReplaceTempView("shadowed_tbl_r14adv2")
    _drop_managed_table(spark, "shadowed_tbl_r14adv2")
    assert not spark.catalog.tableExists("shadowed_tbl_r14adv2"), (
        "shadowing view must be dropped WITH the real table so the "
        "slate reset reaches the cataloged entry"
    )


def test_reattach_refuses_sidecarless_foreign_dir(spark, tmp_path):
    """r13 review pass 2, finding 5: committed parquet at the derived
    tombstone location WITHOUT the _tombstones.json sidecar is not
    state this engine wrote (index_delete writes the sidecar before
    any id row lands) — adopting it would let later delete/fold calls
    write into and truncate a foreign directory."""
    import os

    from dbt_on_snowflake_spark.engine.index_delete import (
        reattach_tombstones,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    alien = os.path.join(wh, "x_tombstones_alien")
    spark.createDataFrame(
        [(1,)], "doc_id long"
    ).write.mode("overwrite").parquet(alien)
    spark.sql("DROP TABLE IF EXISTS x_tombstones_alien")
    try:
        assert (
            reattach_tombstones(spark, "x_tombstones_alien") is False
        )
        assert not spark.catalog.tableExists("x_tombstones_alien")
    finally:
        import shutil

        shutil.rmtree(alien, ignore_errors=True)


def test_reattach_refuses_foreign_name_colliding_sidecar(spark, tmp_path):
    """r14 review pass 2, finding 2: a foreign tool sharing a
    custom-LOCATION dir can write its OWN generically named
    `_tombstones.json` — name presence alone must not adopt the dir
    (the same content-signature rule engine_owned_dir applies, r13
    advice #1). An unparseable or key-mismatched sidecar demotes to
    the no-sidecar triage: refused at a foreign location."""
    import os

    from dbt_on_snowflake_spark.engine.index_delete import (
        reattach_tombstones,
    )

    floc = str(tmp_path / "foreign_sc")
    os.makedirs(floc)
    spark.sql(f"CREATE DATABASE tombfsc LOCATION '{floc}'")
    try:
        alien = os.path.join(floc, "x_tombstones_collide")
        spark.createDataFrame(
            [(1,)], "doc_id long"
        ).write.mode("overwrite").parquet(alien)
        for body in (b"not json at all", b'{"their_key": 1}'):
            open(os.path.join(alien, "_tombstones.json"), "wb").write(body)
            assert (
                reattach_tombstones(spark, "tombfsc.x_tombstones_collide")
                is False
            )
            assert not spark.catalog.tableExists(
                "tombfsc.x_tombstones_collide"
            )
    finally:
        spark.sql("DROP DATABASE tombfsc CASCADE")
        import shutil

        shutil.rmtree(floc, ignore_errors=True)


def test_attach_resolves_qualified_index_locations(spark, tmp_path):
    """r13 review pass 2, finding 4: attach_minhash_index on a
    database-qualified family must re-attach over the REAL dir
    (wh/<db>.db/<table>), not the naive wh/'db.table' join — the
    latter silently serves an empty index."""
    import shutil

    from dbt_on_snowflake_spark.operators.dedup import (
        attach_minhash_index,
    )

    spark.sql("CREATE DATABASE IF NOT EXISTS tombq2")
    try:
        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(30))),
                (2, " ".join(f"z{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        build_minhash_index(
            spark, docs, index_table="tombq2.mh_band_index_q2"
        )
        loc = table_location(
            spark, "tombq2.mh_band_index_q2"
        ).removeprefix("file:")
        stash = str(tmp_path / "stash_q2")
        shutil.copytree(loc, stash)
        spark.sql("DROP TABLE tombq2.mh_band_index_q2")
        shutil.copytree(stash, loc)
        attach_minhash_index(spark, "tombq2.mh_band_index_q2")
        n = (
            spark.table("tombq2.mh_band_index_q2")
            .select("doc_id")
            .distinct()
            .count()
        )
        assert n == 2  # not an empty table over a nonexistent dir
    finally:
        spark.sql("DROP DATABASE tombq2 CASCADE")


def test_reattach_adopts_sidecarless_ids_by_schema(spark, tmp_path):
    """r13 review pass 3, finding 1: _write_sidecar is delete-then-
    create, so a rewrite crash leaves committed tombstone ids with NO
    sidecar. The attach path must still adopt them (schema fallback:
    exactly the family's id column) or a fresh session serves ungated
    and resurrects the deletes; the next delete call heals the
    sidecar, per index_delete's documented retry contract."""
    import os
    import shutil

    from dbt_on_snowflake_spark.engine.index_delete import (
        tombstone_spec,
    )
    from dbt_on_snowflake_spark.operators.dedup import (
        _live_index,
        attach_minhash_index,
    )

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"w{i}" for i in range(30))),
            (2, " ".join(f"z{i}" for i in range(30))),
        ],
        "doc_id long, text string",
    )
    build_minhash_index(spark, docs, index_table="mh_band_index_scw")
    minhash_index_delete(
        spark,
        spark.createDataFrame([(1,)], "doc_id long"),
        index_table="mh_band_index_scw",
    )
    tomb = "mh_tombstones_scw"
    tomb_loc = table_location(spark, tomb).removeprefix("file:")
    # the crash window: committed ids, sidecar gone mid-rewrite
    os.remove(os.path.join(tomb_loc, "_tombstones.json"))
    # session boundary
    for t in ("mh_band_index_scw", tomb):
        loc = table_location(spark, t).removeprefix("file:")
        stash = str(tmp_path / t)
        shutil.copytree(loc, stash)
        spark.sql(f"DROP TABLE {t}")
        shutil.copytree(stash, loc)
    attach_minhash_index(spark, "mh_band_index_scw")
    assert spark.catalog.tableExists(tomb)  # adopted via schema
    live = {
        r.doc_id
        for r in _live_index(spark, "mh_band_index_scw")
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert live == {2}  # the gate held across the crash window
    # the next delete heals the sidecar
    minhash_index_delete(
        spark,
        spark.createDataFrame([(2,)], "doc_id long"),
        index_table="mh_band_index_scw",
    )
    assert tombstone_spec(spark, tomb) is not None
    _drop_managed_table(spark, tomb)
    _drop_managed_table(spark, "mh_band_index_scw")


def test_rebuild_after_attach_in_custom_location_database(spark, tmp_path):
    """r13 review pass 3, finding 2: the attach paths re-register
    persisted families as EXTERNAL tables, whose dirs a plain DROP
    leaves behind — a rebuild of an attached custom-LOCATION family
    must still reset the slate (resolve the real location before
    dropping) instead of wedging on 'location already exists'."""
    import os
    import shutil

    from dbt_on_snowflake_spark.operators.dedup import (
        _live_index,
        attach_minhash_index,
    )

    # OUTSIDE the warehouse: this is the wedge scenario — under the
    # warehouse root the ownership gate passes trivially (r13 review
    # pass 5 noted the earlier placement under wh pinned nothing)
    floc = str(tmp_path / "tombrebuildloc")
    spark.sql(f"CREATE DATABASE tombrb LOCATION '{floc}'")
    try:
        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(30))),
                (2, " ".join(f"z{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        name = "tombrb.mh_band_index_rb"
        build_minhash_index(spark, docs, index_table=name)
        minhash_index_delete(
            spark,
            spark.createDataFrame([(1,)], "doc_id long"),
            index_table=name,
        )
        # session boundary, then re-attach (EXTERNAL tables now)
        for t in (name, "tombrb.mh_tombstones_rb"):
            loc = table_location(spark, t).removeprefix("file:")
            stash = str(tmp_path / t.replace(".", "_"))
            shutil.copytree(loc, stash)
            spark.sql(f"DROP TABLE {t}")
            shutil.copytree(stash, loc)
        attach_minhash_index(spark, name)
        assert spark.catalog.tableExists("tombrb.mh_tombstones_rb")
        # the rebuild must succeed AND reset the tombstone slate
        build_minhash_index(spark, docs, index_table=name)
        assert not spark.catalog.tableExists("tombrb.mh_tombstones_rb")
        live = {
            r.doc_id
            for r in _live_index(spark, name)
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert live == {1, 2}  # rebuilt from the corpus of record
    finally:
        spark.sql("DROP DATABASE tombrb CASCADE")


def test_drop_owned_external_dirs_only(spark, tmp_path):
    """r13 review pass 4, finding 1: a cataloged EXTERNAL table over a
    FOREIGN dir (outside the warehouse, no engine sidecar) must not be
    recursively deleted by the slate reset — only dirs the engine can
    prove it owns are. The engine-owned case (a sidecar-carrying
    tombstone dir outside the warehouse) IS reset."""
    import os

    floc = str(tmp_path / "shared_loc")
    os.makedirs(floc)
    spark.sql(f"CREATE DATABASE tombext LOCATION '{floc}'")
    try:
        # foreign dir that merely collides on the derived name
        alien = os.path.join(floc, "mh_band_index_e")
        os.makedirs(alien)
        open(os.path.join(alien, "not-ours.txt"), "w").write("x")
        spark.sql(
            "CREATE TABLE tombext.mh_band_index_e (doc_id BIGINT, "
            f"band_key STRING) USING parquet LOCATION '{alien}'"
        )
        _drop_managed_table(spark, "tombext.mh_band_index_e")
        assert os.path.exists(os.path.join(alien, "not-ours.txt"))

        # engine-owned: a tombstone dir (sidecar) attached externally
        docs = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(30)))],
            "doc_id long, text string",
        )
        # build under the default db (managed), then move the
        # tombstone dir into the external database and attach it there
        build_minhash_index(spark, docs, index_table="mh_band_index_mv")
        minhash_index_delete(
            spark,
            spark.createDataFrame([(1,)], "doc_id long"),
            index_table="mh_band_index_mv",
        )
        src = table_location(
            spark, "mh_tombstones_mv"
        ).removeprefix("file:")
        import shutil

        dst = os.path.join(floc, "mh_tombstones_e")
        shutil.copytree(src, dst)
        spark.sql(
            "CREATE TABLE tombext.mh_tombstones_e (doc_id BIGINT) "
            f"USING parquet LOCATION '{dst}'"
        )
        _drop_managed_table(spark, "tombext.mh_tombstones_e")
        assert not os.path.exists(dst)  # sidecar proved ownership
        _drop_managed_table(spark, "mh_tombstones_mv")
        _drop_managed_table(spark, "mh_band_index_mv")
    finally:
        spark.sql("DROP DATABASE tombext CASCADE")


def test_drop_tolerates_temp_view_shadow(spark):
    """r13 review pass 4 finding 5 + pass 5 finding 2, amended by r13
    advice #2 / r14 review finding 3: a temp view shadowing a name with
    NOTHING real behind it is no longer silently consumed — the reset
    fails loudly with the view intact (building under the name would
    otherwise serve the view's rows); a REAL table behind the shadow
    must still be the thing that gets dropped (view-first resolution
    would otherwise leave the table cataloged while the sweep destroys
    its dir)."""
    import os

    spark.range(3).createOrReplaceTempView("mh_band_index_shadow")
    with pytest.raises(ValueError, match="shadows the index family"):
        _drop_managed_table(spark, "mh_band_index_shadow")
    assert any(
        v.name == "mh_band_index_shadow"
        for v in spark.catalog.listTables()
    )
    spark.catalog.dropTempView("mh_band_index_shadow")

    # shadowed REAL table: both view and table go, dir included
    spark.createDataFrame([(1,)], "doc_id long").write.mode(
        "overwrite"
    ).saveAsTable("mh_band_index_shadow")
    loc = table_location(
        spark, "mh_band_index_shadow"
    ).removeprefix("file:")
    spark.range(3).createOrReplaceTempView("mh_band_index_shadow")
    _drop_managed_table(spark, "mh_band_index_shadow")
    assert not spark.catalog.tableExists("mh_band_index_shadow")
    assert not os.path.exists(loc)


def test_reattach_schema_fallback_is_warehouse_only(spark, tmp_path):
    """r13 review pass 4, finding 2: the sidecar-less schema fallback
    applies only inside the warehouse namespace — at a foreign
    location a one-column parquet is a plausible name collision, so
    the attach refuses. (No crash window needs the fallback there
    anymore: _write_sidecar replaces via fs_replace_atomic, so a real
    family always presents the canonical sidecar or its complete .new
    twin — test_reattach_survives_sidecar_crash_at_foreign_location.)"""
    import os

    from dbt_on_snowflake_spark.engine.index_delete import (
        reattach_tombstones,
    )

    floc = str(tmp_path / "foreign_sf")
    os.makedirs(floc)
    spark.sql(f"CREATE DATABASE tombsf LOCATION '{floc}'")
    try:
        spark.createDataFrame(
            [(5,)], "doc_id long"
        ).write.parquet(os.path.join(floc, "mh_tombstones_sf"))
        assert (
            reattach_tombstones(
                spark, "tombsf.mh_tombstones_sf", id_col="doc_id"
            )
            is False
        )
        assert not spark.catalog.tableExists("tombsf.mh_tombstones_sf")
    finally:
        spark.sql("DROP DATABASE tombsf CASCADE")


def test_reattach_raises_on_unreadable_warehouse_state(spark):
    """r13 review pass 5, finding 1: inside the warehouse an
    unreadable committed *.parquet at a tombstone path is corrupt
    ENGINE state (or a transient I/O failure) — the attach must fail
    LOUDLY, because silently refusing would serve the index ungated
    and resurrect the deletes. (The foreign-garbage refuse case is
    handled by the warehouse-only restriction on the schema fallback —
    test_reattach_schema_fallback_is_warehouse_only.)"""
    import os
    import shutil

    from dbt_on_snowflake_spark.engine.index_delete import (
        reattach_tombstones,
    )

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    bad = os.path.join(wh, "x_tombstones_garbled")
    os.makedirs(bad, exist_ok=True)
    open(os.path.join(bad, "part-0.parquet"), "w").write("not parquet")
    try:
        with pytest.raises(Exception):
            reattach_tombstones(
                spark, "x_tombstones_garbled", id_col="doc_id"
            )
        assert not spark.catalog.tableExists("x_tombstones_garbled")
    finally:
        shutil.rmtree(bad, ignore_errors=True)


def test_ownership_marker_rollout_is_complete(spark):
    """r13 review passes 5-7: every persisted index dir must carry an
    ownership proof (its own sidecar or ENGINE_MARK) so rebuilds of
    custom-LOCATION families can reset their slate. Pins the rollout
    per family AND across the operations that rewrite dirs (append's
    stats overwrite, the fold's stats refresh) — the two spots a
    marker was silently stripped during review."""
    from dbt_on_snowflake_spark.engine.fs import fs_list
    from dbt_on_snowflake_spark.engine.index_delete import ENGINE_MARK
    from dbt_on_snowflake_spark.operators.textops import (
        text_index_append,
    )

    PROOFS = {
        ENGINE_MARK,
        "_tombstones.json",
        "_qstats.json",
        "_cstats.json",
    }

    def proof(table):
        loc = table_location(spark, table)
        assert set(fs_list(spark, loc)) & PROOFS, table

    d = _docs(spark)
    # minhash family (index + tombstones)
    build_minhash_index(spark, d, index_table="mh_band_index_mk")
    minhash_index_delete(
        spark,
        spark.createDataFrame([(1,)], "doc_id long"),
        index_table="mh_band_index_mk",
    )
    for t in ("mh_band_index_mk", "mh_tombstones_mk"):
        proof(t)
        _drop_managed_table(spark, t)

    # text family through build -> append -> delete -> fold: the stats
    # dir is OVERWRITTEN twice (append refresh, fold refresh) and must
    # keep its proof both times
    names = ("bm25_stats_mk", "bm25_postings_mk", "bm25_doclen_mk")
    kw = dict(
        stats_table=names[0], postings_table=names[1],
        doclen_table=names[2],
    )
    build_text_index(spark, d.filter(F.expr(KEEP_PRED)), **kw)
    for t in names:
        proof(t)
    text_index_append(spark, d.filter(F.expr(DEL_PRED)), **kw)
    proof(names[0])  # append's stats overwrite re-marked (pass 7)
    text_index_delete(
        spark,
        d.filter(F.expr(DEL_PRED)).select("doc_id"),
        **kw,
    )
    assert fold_tombstones(spark, _text_tombstones(names[1]))
    proof(names[0])  # fold's stats refresh re-marked (pass 6 #2)
    for t in names:
        proof(t)
        _drop_managed_table(spark, t)

    # PQ + IVF families (codes/assignments carry their own baselines,
    # codebook/centroids the marker)
    from dbt_on_snowflake_spark.operators.similarity import _vectors

    e = _vectors(spark, SF_SMOKE)
    build_pq_index(
        spark, e, codebook_table="pq_codebook_mk", codes_table="pq_codes_mk"
    )
    for t in ("pq_codebook_mk", "pq_codes_mk"):
        proof(t)
        _drop_managed_table(spark, t)
    from dbt_on_snowflake_spark.operators.similarity import (
        build_ann_index,
    )

    build_ann_index(
        spark,
        e,
        centroids_table="ann_centroids_mk",
        assignments_table="ann_assignments_mk",
    )
    for t in ("ann_centroids_mk", "ann_assignments_mk"):
        proof(t)
        _drop_managed_table(spark, t)


def test_marked_leftover_rebuilds_without_attach(spark, tmp_path):
    """r13 review pass 6, finding 1: a MARKED family in a custom-
    LOCATION database must rebuild across sessions WITHOUT an attach
    first — the catalog-less fall-through proves ownership via the
    marker and clears the leftover dirs."""
    import os
    import shutil

    floc = str(tmp_path / "tombmarkloc")
    spark.sql(f"CREATE DATABASE tombmk LOCATION '{floc}'")
    try:
        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(30))),
                (2, " ".join(f"z{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        name = "tombmk.mh_band_index_mkl"
        build_minhash_index(spark, docs, index_table=name)
        # session boundary WITHOUT re-attach: files survive, catalog
        # forgets
        loc = table_location(spark, name).removeprefix("file:")
        stash = str(tmp_path / "stash_mkl")
        shutil.copytree(loc, stash)
        spark.sql(f"DROP TABLE {name}")
        shutil.copytree(stash, loc)
        assert not spark.catalog.tableExists(name)
        assert os.path.exists(os.path.join(loc, "_spark_graft_index.json"))
        # the rebuild clears the marked leftover and succeeds
        build_minhash_index(spark, docs, index_table=name)
        assert spark.table(name).select("doc_id").distinct().count() == 2
    finally:
        spark.sql("DROP DATABASE tombmk CASCADE")


def test_fs_replace_atomic_crash_windows(spark, tmp_path):
    """fs_replace_atomic (r13 verdict Next #4): every crash point of
    the create-new -> delete-old -> rename protocol leaves a complete
    copy readable via fs_read_replaceable, and the next writer heals
    the leftovers."""
    import os

    from dbt_on_snowflake_spark.engine.fs import (
        fs_read_replaceable,
        fs_replace_atomic,
    )

    p = str(tmp_path / "spec.json")
    fs_replace_atomic(spark, p, b"v1")
    assert fs_read_replaceable(spark, p) == b"v1"
    assert not os.path.exists(p + ".new")

    # crash during the .new create: partial twin alongside a live
    # canonical -> reader uses the canonical. A FRESH twin is
    # indistinguishable from a CONCURRENT writer mid-protocol, so the
    # next writer raises contention instead of deleting it out from
    # under that writer (r14 review, finding 1); once it ages past the
    # stale gate it is provably a crash leftover and heals away.
    open(p + ".new", "w").write("torn")
    assert fs_read_replaceable(spark, p) == b"v1"
    # the contention error names the remaining stale-gate wait so an
    # operator retrying a crashed run knows the horizon (r14 advice #4)
    with pytest.raises(OSError, match=r"concurrent rewrite.*clears in <= \d+ s"):
        fs_replace_atomic(spark, p, b"v2")
    assert fs_read_replaceable(spark, p) == b"v1"  # nothing stranded
    from dbt_on_snowflake_spark.engine.fs import REPLACE_STALE_MS

    old_ts = (os.path.getmtime(p + ".new") * 1000 - REPLACE_STALE_MS
              - 60_000) / 1000
    os.utime(p + ".new", (old_ts, old_ts))
    fs_replace_atomic(spark, p, b"v2")
    assert fs_read_replaceable(spark, p) == b"v2"
    assert not os.path.exists(p + ".new")

    # crash between delete and rename: canonical gone, .new complete
    # (it only ever vanishes AFTER the create+close finished) ->
    # reader resolves the twin immediately. A writer, though, cannot
    # distinguish a FRESH orphan twin from a live writer milliseconds
    # from promoting it (r14 review pass 7, finding 1) — contention
    # until the stale gate proves it abandoned, then heal + replace.
    os.rename(p, p + ".new")
    assert fs_read_replaceable(spark, p) == b"v2"
    with pytest.raises(OSError, match="concurrent rewrite"):
        fs_replace_atomic(spark, p, b"v3")
    assert fs_read_replaceable(spark, p) == b"v2"  # twin untouched
    old3 = (os.path.getmtime(p + ".new") * 1000 - REPLACE_STALE_MS
            - 60_000) / 1000
    os.utime(p + ".new", (old3, old3))
    fs_replace_atomic(spark, p, b"v3")
    assert fs_read_replaceable(spark, p) == b"v3"
    assert os.path.exists(p) and not os.path.exists(p + ".new")

    # crash mid-create of the FIRST-ever write: the bytes go to a
    # `.new.tmp` nobody reads, so no torn `.new` can ever be visible
    # (r14 review pass 2, finding 1) — the reader sees nothing, and
    # the next writer clears the leftover and succeeds
    p2 = str(tmp_path / "first.json")
    open(p2 + ".new.tmp", "w").write("torn-first-write")
    assert fs_read_replaceable(spark, p2) is None
    # a FRESH tmp is indistinguishable from a concurrent writer's
    # exclusive claim (deleting it would hand that writer's rename
    # another writer's bytes — r14 review pass 3, finding 1) ...
    with pytest.raises(OSError, match="concurrent rewrite"):
        fs_replace_atomic(spark, p2, b"w1")
    # ... and once stale it is provably a crash leftover: cleared,
    # claimed, and the write goes through
    old2 = (os.path.getmtime(p2 + ".new.tmp") * 1000 - REPLACE_STALE_MS
            - 60_000) / 1000
    os.utime(p2 + ".new.tmp", (old2, old2))
    fs_replace_atomic(spark, p2, b"w1")
    assert fs_read_replaceable(spark, p2) == b"w1"
    assert not os.path.exists(p2 + ".new.tmp")
    assert not os.path.exists(p2 + ".new")


def test_fs_exception_classified_by_java_class_not_message():
    """r14 advice #2: a create-refusal must be recognized by the JAVA
    exception class even when the message text carries none of the
    known substrings — otherwise the 'partial write is ours' branch
    deletes a competing writer's live tmp claim. The cause chain is
    walked (Hadoop often wraps the refusal in a RemoteException /
    IOException), and the vanish classifier gets the same treatment."""
    from dbt_on_snowflake_spark.engine.fs import _java_exc_is, _vanished

    class _JE:
        def __init__(self, name, cause=None):
            self._n, self._c = name, cause

        def getClass(self):
            outer = self

            class _C:
                def getName(self):
                    return outer._n

            return _C()

        def getCause(self):
            return self._c

    class _Wrapped(Exception):
        def __init__(self, je):
            # message deliberately carries NO recognizable substring
            super().__init__("remote store refused the operation")
            self.java_exception = je

    direct = _Wrapped(_JE("org.apache.hadoop.fs.FileAlreadyExistsException"))
    assert _java_exc_is(direct, "FileAlreadyExistsException")
    wrapped = _Wrapped(
        _JE(
            "java.io.IOException",
            _JE(
                "org.apache.hadoop.hdfs.protocol."
                "AlreadyBeingCreatedException"
            ),
        )
    )
    assert _java_exc_is(
        wrapped, "FileAlreadyExistsException", "AlreadyBeingCreatedException"
    )
    assert not _java_exc_is(wrapped, "FileNotFoundException")
    # plain python exceptions (no gateway object) classify as False
    assert not _java_exc_is(ValueError("x"), "FileAlreadyExistsException")
    # the vanish classifier accepts the class even with an opaque message
    assert _vanished(_Wrapped(_JE("java.io.FileNotFoundException")))


def test_reattach_survives_sidecar_crash_at_foreign_location(
    spark, tmp_path
):
    """r13 verdict Next #4's Done criterion: a family in a FOREIGN
    (outside-warehouse custom-LOCATION) database whose sidecar rewrite
    was killed between delete and rename must still re-attach in a
    fresh session — the complete `.new` twin fs_replace_atomic leaves
    is the proof — so the delete gate holds where the old
    delete-then-create protocol served resurrected deletes (the
    deleted :249 residual trade)."""
    import os
    import shutil

    from dbt_on_snowflake_spark.engine.index_delete import (
        reattach_tombstones,
    )
    from dbt_on_snowflake_spark.operators.dedup import _live_index

    floc = str(tmp_path / "foreign_cw")
    os.makedirs(floc)
    spark.sql(f"CREATE DATABASE tombcw LOCATION '{floc}'")
    try:
        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(30))),
                (2, " ".join(f"z{i}" for i in range(30))),
            ],
            "doc_id long, text string",
        )
        build_minhash_index(
            spark, docs, index_table="tombcw.mh_band_index_cw"
        )
        minhash_index_delete(
            spark,
            spark.createDataFrame([(1,)], "doc_id long"),
            index_table="tombcw.mh_band_index_cw",
        )
        tomb_loc = table_location(
            spark, "tombcw.mh_tombstones_cw"
        ).removeprefix("file:")
        # kill between delete-old and rename: canonical gone, the
        # complete .new twin still present
        os.rename(
            os.path.join(tomb_loc, "_tombstones.json"),
            os.path.join(tomb_loc, "_tombstones.json.new"),
        )
        # session boundary: catalog forgets, files persist
        for t in ("tombcw.mh_band_index_cw", "tombcw.mh_tombstones_cw"):
            loc = table_location(spark, t).removeprefix("file:")
            stash = str(tmp_path / t.replace(".", "_"))
            shutil.copytree(loc, stash)
            spark.sql(f"DROP TABLE {t}")
            shutil.copytree(stash, loc)
        from dbt_on_snowflake_spark.operators.dedup import (
            attach_minhash_index,
        )

        attach_minhash_index(spark, "tombcw.mh_band_index_cw")
        assert spark.catalog.tableExists("tombcw.mh_tombstones_cw")
        # the direct hook agrees (idempotent on the attached table)
        assert reattach_tombstones(spark, "tombcw.mh_tombstones_cw")
        live = {
            r.doc_id
            for r in _live_index(spark, "tombcw.mh_band_index_cw")
            .select("doc_id")
            .distinct()
            .collect()
        }
        assert live == {2}  # the gate held across the crash window
        # a write retry while the twin is FRESH is indistinguishable
        # from a live concurrent writer: loud contention, gate intact
        # (r14 review pass 7, finding 1)
        with pytest.raises(OSError, match="concurrent rewrite"):
            minhash_index_delete(
                spark,
                spark.createDataFrame([(2,)], "doc_id long"),
                index_table="tombcw.mh_band_index_cw",
            )
        # past the stale gate the twin is provably abandoned: the next
        # delete heals it into place, replaces the sidecar, clears it
        from dbt_on_snowflake_spark.engine.fs import REPLACE_STALE_MS

        twin = os.path.join(tomb_loc, "_tombstones.json.new")
        ts = (os.path.getmtime(twin) * 1000 - REPLACE_STALE_MS
              - 60_000) / 1000
        os.utime(twin, (ts, ts))
        minhash_index_delete(
            spark,
            spark.createDataFrame([(2,)], "doc_id long"),
            index_table="tombcw.mh_band_index_cw",
        )
        assert os.path.exists(os.path.join(tomb_loc, "_tombstones.json"))
        assert not os.path.exists(twin)
    finally:
        spark.sql("DROP DATABASE tombcw CASCADE")


def test_fold_resolves_sidecar_crash_twin(spark):
    """A fold arriving after a mid-rewrite crash (canonical sidecar
    gone, complete .new twin present) must still fold — refusing would
    wedge the family on 'no sidecar' until an unrelated delete healed
    it."""
    import os

    stats, postings, doclen = _build_text(spark, "cwfold")
    text_index_delete(
        spark,
        _docs(spark).filter(F.expr(DEL_PRED)).select("doc_id"),
        stats_table=stats,
        postings_table=postings,
        doclen_table=doclen,
    )
    tomb = _text_tombstones(postings)
    tomb_loc = table_location(spark, tomb).removeprefix("file:")
    os.rename(
        os.path.join(tomb_loc, "_tombstones.json"),
        os.path.join(tomb_loc, "_tombstones.json.new"),
    )
    assert fold_tombstones(spark, tomb) is not None
    # folded members match a from-scratch filtered build
    s2, p2, d2 = _build_text(spark, "cwfold_ref", pred=KEEP_PRED)
    assert _rows(
        spark.table(postings).orderBy("term", "doc_id")
    ) == _rows(spark.table(p2).orderBy("term", "doc_id"))
    for t in (stats, postings, doclen, s2, p2, d2, tomb):
        _drop_managed_table(spark, t)


def test_engine_owned_dir_validates_content_outside_warehouse(
    spark, tmp_path
):
    """r13 advice #1: outside the warehouse, the mere PRESENCE of a
    generically-named file (_merge.json, _qstats.json, _cstats.json)
    is not ownership — other tooling sharing a custom-LOCATION
    database dir could plausibly write those names. The gate must
    parse each candidate and require the engine writer's key
    signature, failing toward NOT deleting on any mismatch."""
    import json as _json
    import os

    from dbt_on_snowflake_spark.engine.index_delete import (
        ENGINE_MARK,
        engine_owned_dir,
    )

    d = str(tmp_path / "shared")
    os.makedirs(d)
    assert not engine_owned_dir(spark, d)  # empty

    # name collisions without the writer's signature: NOT proof
    open(os.path.join(d, "_merge.json"), "w").write(
        _json.dumps({"tool": "someone-else", "v": 3})
    )
    open(os.path.join(d, "_qstats.json"), "w").write("not json {")
    open(os.path.join(d, "_cstats.json"), "w").write(
        _json.dumps(["a", "list"])
    )
    open(os.path.join(d, ENGINE_MARK), "w").write(
        _json.dumps({"owner": "other-engine"})
    )
    assert not engine_owned_dir(spark, d)

    # the real signatures ARE proof — each alone suffices
    for name, body in [
        ("_merge.json", {"keys": ["k"], "merge": {"n": "sum"}}),
        ("_qstats.json", {"base_mean_qerr": 0.1, "n_rows": 10}),
        ("_cstats.json", {"base_mean_cdist": 0.2, "n_rows": 10}),
        (ENGINE_MARK, {"owner": "dbt_on_snowflake_spark"}),
        (
            "_tombstones.json",
            {"id_col": "doc_id", "members": [], "refresh": None},
        ),
    ]:
        d2 = str(tmp_path / f"own_{name.strip('_').split('.')[0]}")
        os.makedirs(d2)
        open(os.path.join(d2, name), "w").write(_json.dumps(body))
        assert engine_owned_dir(spark, d2), name

    # a .new twin from a crashed replace proves ownership the same way
    d3 = str(tmp_path / "own_twin")
    os.makedirs(d3)
    open(os.path.join(d3, ENGINE_MARK + ".new"), "w").write(
        _json.dumps({"owner": "dbt_on_snowflake_spark"})
    )
    assert engine_owned_dir(spark, d3)
