"""Watermark / late-data handling (SURVEY §2.7 extension surface), driven
through two checkpointed availableNow runs — batch boundaries via restart,
which also exercises state-store recovery:

run 1 sees hours 10-11 (watermark -> 11:20, [10:00,11:00) expires);
run 2 adds a 13:00 event AND a too-late 10:20 event whose window is
already expired -> the late row is dropped from the append output.
"""

from __future__ import annotations

import os
import shutil
import uuid

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _write_batch(d: str, name: str, rows) -> None:
    pd.DataFrame(
        {"ts": pd.to_datetime([r[0] for r in rows]), "v": [r[1] for r in rows]}
    ).to_parquet(f"{d}/{name}.parquet", index=False, coerce_timestamps="us")


def _run_stream(spark, src: str, out: str, ckpt: str) -> None:
    schema = "ts timestamp_ntz, v double"
    s = (
        spark.readStream.schema(schema)
        .format("parquet")
        .load(src)
        # watermarks require TIMESTAMP (with zone); parquet from pandas
        # reads as TIMESTAMP_NTZ
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        s.withWatermark("ts", "30 minutes")
        # group on the window struct itself: projecting window().start
        # inside groupBy severs event-time lineage and append mode then
        # rejects the aggregation as un-watermarked
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.sum("v").alias("total"))
        .select(F.col("w.start").alias("hour_start"), "total")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_watermark_drops_late_event(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # run 1: hours 10-11; max 11:50 puts the watermark at 11:20, fully
    # expiring the [10:00, 11:00) window (nothing emitted yet — append
    # emits a window in the batch AFTER the watermark passes it)
    _write_batch(src, "b0", [
        ("2026-01-01 10:05:00", 1.0),
        ("2026-01-01 10:40:00", 2.0),
        ("2026-01-01 11:50:00", 4.0),
    ])
    _run_stream(spark, src, out, ckpt)

    # run 2 (recovered from checkpoint, watermark 11:20): a 13:00 event
    # advances time, and a 10:20 event arrives behind an expired window
    # (end 11:00 <= watermark) -> dropped, not merged into the emitted 3.0
    _write_batch(src, "b1", [
        ("2026-01-01 13:00:00", 8.0),
        ("2026-01-01 10:20:00", 100.0),
    ])
    _run_stream(spark, src, out, ckpt)

    got = {
        r["hour_start"].strftime("%H"): r["total"]
        for r in spark.read.parquet(out).collect()
    }
    # 10:00 emitted with the on-time total only; 11:00 emitted once the
    # 12:30 watermark passed it; the 13:00 window is still open
    assert got == {"10": 3.0, "11": 4.0}
    shutil.rmtree(ckpt)


def test_stream_dedup_cross_batch_pair_found_once(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): a near-dup pair split
    across batches is discovered exactly once — in the LATER doc's
    batch, via the index grown by the earlier one. No stream state is
    involved; the durable index is the only cross-batch memory."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.operators.dedup import build_minhash_index
    from dbt_on_snowflake_spark.streaming import dedup_stream_against_index

    words = " ".join(f"w{i}" for i in range(30))
    corpus = pd.DataFrame(
        {"doc_id": [1], "text": [" ".join(f"z{i}" for i in range(30))]}
    )
    batch_dir = str(tmp_path / "incoming")
    os.makedirs(batch_dir)
    pd.DataFrame({"doc_id": [5], "text": [words]}).to_parquet(
        os.path.join(batch_dir, "b1.parquet"), index=False
    )
    pd.DataFrame({"doc_id": [10], "text": [words + " tail"]}).to_parquet(
        os.path.join(batch_dir, "b2.parquet"), index=False
    )

    build_minhash_index(
        spark, spark.createDataFrame(corpus), index_table="mh_sdtest_idx"
    )
    cand_dir = str(tmp_path / "cand")
    schema = spark.read.parquet(batch_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(batch_dir)
    )
    dedup_stream_against_index(spark, stream, "mh_sdtest_idx", cand_dir)

    cand = spark.read.parquet(cand_dir).collect()  # NO distinct: raw finds
    assert [(r.doc_a, r.doc_b) for r in cand] == [(5, 10)]
    # the index grew by both batches' band keys
    idx_docs = {
        r.doc_id
        for r in spark.table("mh_sdtest_idx").select("doc_id").distinct().collect()
    }
    assert idx_docs == {1, 5, 10}


def test_stream_dedup_honors_index_bucket_spec(spark, tmp_path):
    """An index built with a NON-default bucket count streams batches
    through without a bucket-spec mismatch: the per-batch append reads
    the table's own spec from the catalog instead of assuming the
    module constant, and the table keeps that spec afterwards."""
    import os

    import pandas as pd

    from dbt_on_snowflake_spark.operators.dedup import (
        INDEX_N_BUCKETS,
        build_minhash_index,
    )
    from dbt_on_snowflake_spark.streaming import (
        _table_bucket_count,
        dedup_stream_against_index,
    )

    n_buckets = 4
    assert n_buckets != INDEX_N_BUCKETS
    words = " ".join(f"w{i}" for i in range(30))
    batch_dir = str(tmp_path / "incoming")
    os.makedirs(batch_dir)
    pd.DataFrame({"doc_id": [5], "text": [words]}).to_parquet(
        os.path.join(batch_dir, "b1.parquet"), index=False
    )
    pd.DataFrame({"doc_id": [10], "text": [words + " tail"]}).to_parquet(
        os.path.join(batch_dir, "b2.parquet"), index=False
    )
    corpus = pd.DataFrame(
        {"doc_id": [1], "text": [" ".join(f"z{i}" for i in range(30))]}
    )
    build_minhash_index(
        spark,
        spark.createDataFrame(corpus),
        index_table="mh_sdtest_idx4",
        n_buckets=n_buckets,
    )
    assert _table_bucket_count(spark, "mh_sdtest_idx4") == n_buckets

    cand_dir = str(tmp_path / "cand")
    schema = spark.read.parquet(batch_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(batch_dir)
    )
    dedup_stream_against_index(spark, stream, "mh_sdtest_idx4", cand_dir)
    cand = spark.read.parquet(cand_dir).collect()
    assert [(r.doc_a, r.doc_b) for r in cand] == [(5, 10)]
    assert _table_bucket_count(spark, "mh_sdtest_idx4") == n_buckets


def test_streaming_funnel_matches_batch_across_batches(spark, tmp_path):
    """applyInPandasWithState funnel: events split into two TIME-ORDERED
    micro-batches (maxFilesPerTrigger=1) — a user whose view lands in
    batch 1 and whose click/purchase land in batch 2 converts ONLY via
    carried state; the final snapshot's counts equal the batch
    MIN-cascade on the union."""
    import os

    import pandas as pd

    from dbt_on_snowflake_spark.streaming import (
        funnel_final_counts,
        funnel_stream_states,
    )

    t0 = pd.Timestamp("2026-01-01 10:00:00")

    def ev(uid, et, minutes):
        return {"user_id": uid, "event_type": et,
                "ts": t0 + pd.Timedelta(minutes=minutes)}

    batch1 = pd.DataFrame([
        ev(1, "view", 0),          # converts across batches
        ev(2, "view", 1), ev(2, "click", 2),   # converts within+across
        ev(3, "click", 3),         # click before any view: never converts
        ev(4, "view", 4),          # views only
    ])
    batch2 = pd.DataFrame([
        ev(1, "click", 10), ev(1, "purchase", 11),
        ev(2, "purchase", 12),
        ev(3, "view", 13),         # view after the click — too late
        ev(5, "purchase", 14),     # purchase only, no funnel
    ])
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    batch1.to_parquet(os.path.join(feed, "b1.parquet"), index=False)
    batch2.to_parquet(os.path.join(feed, "b2.parquet"), index=False)

    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(feed)
        .select("user_id", "event_type", "ts")
    )
    out_dir = str(tmp_path / "snap")
    funnel_stream_states(spark, stream, out_dir)
    got = funnel_final_counts(spark, out_dir).collect()[0]

    # batch MIN-cascade on the union, computed independently in pandas
    assert got.n_users == 5
    assert got.n_viewed == 4          # users 1, 2, 3, 4
    assert got.n_clicked_after_view == 2   # users 1, 2 (user 3's click precedes its view)
    assert got.n_purchased_after_click == 2  # users 1, 2

    # cross-batch carry specifically: user 1's click arrived in batch 2,
    # after its view-only batch-1 state
    snap = spark.read.parquet(out_dir)
    u1 = {r.batch_id: (r.v is not None, r.c is not None, r.p is not None)
          for r in snap.filter(F.col("user_id") == 1).collect()}
    assert u1[0] == (True, False, False)
    assert u1[1] == (True, True, True)


def test_dedup_within_watermark_bounds_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark's contract, pinned honestly across
    two checkpointed runs: a duplicate arriving within the watermark
    delay is dropped; once the watermark passes a key's event time its
    state is evicted, so a beyond-delay duplicate is RE-EMITTED — the
    price of bounded state, and exactly why the dedup key embeds its
    hour bucket in t_events_dedup_wm_streaming."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def run():
        schema = "ts timestamp_ntz, k string"
        s = (
            spark.readStream.schema(schema)
            .format("parquet")
            .load(src)
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        dedup = s.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
            ["k"]
        )
        q = (
            dedup.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: key A at 10:00, duplicate at 10:10 (within delay) -> one row;
    # watermark advances to 10:10 - 30min = 09:40 (state for A alive)
    _write_batch(src, "b1", [("2024-01-01 10:00:00", 1.0)])
    pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 10:10:00"]),
            "k": ["A", "A"],
        }
    ).to_parquet(f"{src}/b1.parquet", index=False, coerce_timestamps="us")
    run()
    got1 = spark.read.parquet(out).collect()
    assert len(got1) == 1 and got1[0].k == "A"

    # run 2: watermark moves far past A (12:00 event), then run 3 replays
    # A beyond the delay -> state was evicted, A re-emitted
    pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 12:00:00"]), "k": ["B"]}
    ).to_parquet(f"{src}/b2.parquet", index=False, coerce_timestamps="us")
    run()
    pd.DataFrame(
        {"ts": pd.to_datetime(["2024-01-01 12:05:00"]), "k": ["A"]}
    ).to_parquet(f"{src}/b3.parquet", index=False, coerce_timestamps="us")
    run()
    rows = [(r.k, str(r.ts)) for r in spark.read.parquet(out).collect()]
    ks = sorted(k for k, _ in rows)
    assert ks == ["A", "A", "B"]  # A twice: evicted state, honest re-emit


def test_ingest_multi_batch_cross_dedup(spark, tmp_path):
    """The ingest loop's CROSS-BATCH dedup: two micro-batches (forced
    via maxFilesPerTrigger=1 over two doc_id-ordered files) — a
    duplicate arriving in batch 2 must be dropped by the index grown in
    batch 1, and batch-2-only content must land. The registered query's
    oracle only exercises the single-batch case; this pins the index
    growth path."""
    import os

    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table
    from dbt_on_snowflake_spark.operators.textops import quality_score
    from dbt_on_snowflake_spark.streaming import (
        INGEST_INDEX_BUCKETS,
        make_ingest_handler,
    )

    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    # texts that PASS the quality gate: find some from real testdata
    real = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(quality_score("text") > 0)
        .select("text")
        .limit(3)
        .collect()
    )
    assert len(real) == 3
    t1, t2, t3 = (r.text for r in real)
    b1 = spark.createDataFrame(
        [(1, "en", "s1", t1), (2, "en", "s1", t2)],
        "doc_id long, lang string, source string, text string",
    )
    b2 = spark.createDataFrame(
        [(3, "en", "s1", t1), (4, "en", "s1", t3)],  # 3 dups batch-1's t1
        "doc_id long, lang string, source string, text string",
    )
    b1.coalesce(1).write.parquet(os.path.join(src, "f1"))
    b2.coalesce(1).write.parquet(os.path.join(src, "f2"))

    index_table = "ingest_mb_idx_t"
    kept_dir = str(tmp_path / "kept")
    _drop_managed_table(spark, index_table)
    (
        spark.createDataFrame([], "h string, doc_id long")
        .write.format("parquet")
        .bucketBy(INGEST_INDEX_BUCKETS, "h")
        .sortBy("h")
        .saveAsTable(index_table)
    )
    handle = make_ingest_handler(spark, index_table, kept_dir)
    # drive the two batches in arrival order (the handler is the unit
    # under test; foreachBatch supplies exactly these calls)
    handle(spark.read.parquet(os.path.join(src, "f1")), 0)
    handle(spark.read.parquet(os.path.join(src, "f2")), 1)

    kept = {r.doc_id for r in spark.read.parquet(kept_dir).collect()}
    assert kept == {1, 2, 4}  # 3 deduped against batch 1's t1
    n_idx = spark.table(index_table).count()
    assert n_idx == 3  # one index row per distinct kept text


def test_ingest_out_of_order_doc_ids_reconcile_to_min(spark, tmp_path):
    """advice r7: a multi-file source may deliver a SMALLER doc_id for
    an already-indexed hash in a later batch. The probe must keep the
    improvement and the read-side reconcile must yield the global
    min-doc_id canon — arrival order can't change the kept set."""
    import os

    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table
    from dbt_on_snowflake_spark.operators.textops import quality_score
    from dbt_on_snowflake_spark.streaming import (
        INGEST_INDEX_BUCKETS,
        ingest_reconcile,
        make_ingest_handler,
    )

    real = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(quality_score("text") > 0)
        .select("text")
        .limit(2)
        .collect()
    )
    t1, t2 = (r.text for r in real)
    # batch 1 carries doc 10 for t1; batch 2 carries doc 2 for the SAME
    # text (out-of-order ids across files) plus doc 11 for t2
    b1 = spark.createDataFrame(
        [(10, "en", "s1", t1)],
        "doc_id long, lang string, source string, text string",
    )
    b2 = spark.createDataFrame(
        [(2, "en", "s2", t1), (11, "en", "s1", t2)],
        "doc_id long, lang string, source string, text string",
    )

    index_table = "ingest_ooo_idx_t"
    kept_dir = str(tmp_path / "kept_ooo")
    _drop_managed_table(spark, index_table)
    (
        spark.createDataFrame([], "h string, doc_id long")
        .write.format("parquet")
        .bucketBy(INGEST_INDEX_BUCKETS, "h")
        .sortBy("h")
        .saveAsTable(index_table)
    )
    handle = make_ingest_handler(spark, index_table, kept_dir)
    handle(b1, 0)
    handle(b2, 1)

    # raw kept holds both the first arrival (10) and the improvement (2)
    raw = {r.doc_id for r in spark.read.parquet(kept_dir).collect()}
    assert raw == {10, 2, 11}
    # reconcile collapses to the global min per hash
    out = {
        (r.doc_id, r.source)
        for r in ingest_reconcile(spark.read.parquet(kept_dir)).collect()
    }
    assert out == {(2, "s2"), (11, "s1")}
    # a LATER larger doc_id for t1 still dedups against the improved min
    b3 = spark.createDataFrame(
        [(5, "en", "s3", t1)],
        "doc_id long, lang string, source string, text string",
    )
    handle(b3, 2)
    assert {
        r.doc_id for r in spark.read.parquet(kept_dir).collect()
    } == {10, 2, 11}


def test_semantic_ingest_multi_batch_and_order_enforcement(spark, tmp_path):
    """Streaming SemDeDup's cross-batch contract: a later batch's vector
    dedups against the DURABLE kept set grown by earlier batches; new
    cells open independently; and an out-of-order batch (vec_id <= the
    indexed max) is REJECTED — the registered oracle's vec_id-order
    assumption is enforced at the handler, never silently violated
    (advice-r7 discipline)."""
    import math

    import pytest as _pytest

    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table
    from dbt_on_snowflake_spark.streaming import make_semantic_ingest_handler

    def unit(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    from dbt_on_snowflake_spark.streaming import SEM_INGEST_BUCKETS

    kept_table = "sem_ingest_mb_t"
    out_dir = str(tmp_path / "sem_out")
    _drop_managed_table(spark, kept_table)
    (
        spark.createDataFrame([], "vec_id long, label long, v array<double>")
        .write.format("parquet")
        .bucketBy(SEM_INGEST_BUCKETS, "label")
        .sortBy("label")
        .saveAsTable(kept_table)
    )
    handle = make_semantic_ingest_handler(spark, kept_table, out_dir)

    schema = "vec_id long, label long, embedding array<double>"
    # batch 1, cell 0: 0deg and 80deg are dissimilar (cos80 < 0.35) ->
    # both kept
    b1 = spark.createDataFrame(
        [(1, 0, unit(0)), (2, 0, unit(80))], schema
    )
    # batch 2: 5deg dups batch-1's 0deg vector (cross-batch, via the
    # index); 170deg is dissimilar to both kept cell-0 rows; cell 1 is
    # a brand-new cell
    b2 = spark.createDataFrame(
        [(3, 0, unit(5)), (4, 0, unit(170)), (5, 1, unit(30))], schema
    )
    handle(b1, 0)
    handle(b2, 1)

    kept = {r.vec_id for r in spark.read.parquet(out_dir).collect()}
    assert kept == {1, 2, 4, 5}
    idx = {(r.vec_id, r.label) for r in spark.table(kept_table).collect()}
    assert idx == {(1, 0), (2, 0), (4, 0), (5, 1)}

    # out-of-order batch: vec_id 2 is already indexed -> loud rejection
    b3 = spark.createDataFrame([(2, 0, unit(20))], schema)
    with _pytest.raises(Exception, match="vec_id-ordered arrival"):
        handle(b3, 2)


def test_streaming_warehouse_paths_use_fs_helpers():
    """Warehouse manipulation in the streaming module must go through
    the engine fs helpers, never os/shutil on a stripped 'file:' path
    (r10 advice, streaming/__init__.py:623): the warehouse may be an
    object store — the same posture the maintenance sweep already
    takes. Pin the code-level invariant: no 'file:'-stripping of the
    warehouse dir conf remains in the module."""
    from pathlib import Path

    import dbt_on_snowflake_spark.streaming as streaming

    src = Path(streaming.__file__).read_text()
    assert 'warehouse.dir").removeprefix' not in src
    # tempdir staging may use os/shutil; warehouse dirs may not
    for line in src.splitlines():
        code = line.split("#", 1)[0]
        if "warehouse" in code:
            assert "shutil" not in code and "os.makedirs" not in code, line


def test_update_mode_trending_merges_versions(spark, tmp_path):
    """The update-mode trending sink is a versioned key LOG: each
    micro-batch appends only the keys it changed, so a key counted in
    several batches appears several times with increasing values.
    Merge-on-read (MAX per key — windowed counts are monotone) must
    reconstruct exactly the batch counts, and the ranked result must
    equal the complete-mode form's. Three files fed one per trigger
    force genuine cross-batch updates."""
    from dbt_on_snowflake_spark.streaming import (
        _rank_trending,
        _trending_counts,
        run_update_log,
    )

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for i in range(90):
        rows.append(
            {
                "event_id": i,
                "ts": base + pd.Timedelta(minutes=i),  # spans 2 hours
                "event_type": ["view", "click", "buy"][i % 3],
                "user_id": i % 7,
            }
        )
    df = pd.DataFrame(rows)
    src = str(tmp_path / "ev_src")
    os.makedirs(src)
    # interleaved TRIPLES (not % 3 — that would coincide with the
    # event_type assignment and give each batch a disjoint key set):
    # every batch touches all (hour, type) keys, forcing real
    # cross-batch version updates in the log
    for part in range(3):
        df[(df.event_id // 3) % 3 == part].to_parquet(
            os.path.join(src, f"part{part}.parquet"), index=False
        )

    def fix_ts(d):
        # pandas writes TIMESTAMP(NANOS): arrives as bigint (or NTZ),
        # convert exactly like streaming.events_stream does
        if dict(d.dtypes).get("ts") == "bigint":
            return d.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        if dict(d.dtypes).get("ts") == "timestamp_ntz":
            return d.withColumn("ts", F.col("ts").cast("timestamp"))
        return d

    schema = spark.read.parquet(src).schema
    stream = fix_ts(
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src)
    )
    raw = run_update_log(_trending_counts(stream), spark, tag=src)

    keys = raw.select("hour_start", "event_type").distinct().count()
    assert raw.count() > keys  # stale versions really are in the log

    merged = raw.groupBy("hour_start", "event_type").agg(
        F.max("n_events").alias("n_events")
    )
    batch = (
        fix_ts(spark.read.parquet(src))
        .groupBy(
            F.window("ts", "1 hour").start.alias("hour_start"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    got = {
        (r.hour_start, r.event_type): r.n_events for r in merged.collect()
    }
    want = {
        (r.hour_start, r.event_type): r.n_events for r in batch.collect()
    }
    assert got == want
    ranked = sorted(map(tuple, _rank_trending(merged).collect()))
    ranked_batch = sorted(map(tuple, _rank_trending(batch).collect()))
    assert ranked == ranked_batch and ranked


def test_text_index_stream_multi_batch_converges(spark, tmp_path):
    """Streaming text-index maintenance across REAL micro-batch
    boundaries: the held-out docs arrive in 3 files fed one per
    trigger, each batch growing the index; the final index must equal a
    from-scratch full-corpus build row-for-row in all three tables."""
    from dbt_on_snowflake_spark.operators.textops import (
        build_text_index,
    )
    from dbt_on_snowflake_spark.streaming import text_index_stream_ingest

    docs = pd.DataFrame(
        {
            "doc_id": range(60),
            "text": [
                " ".join(f"w{(i * 7 + j) % 13}" for j in range(5 + i % 9))
                for i in range(60)
            ],
            "lang": ["en"] * 60,
            "source": ["s"] * 60,
        }
    )
    full = ("tis_f_stats", "tis_f_post", "tis_f_dl")
    grown = ("tis_g_stats", "tis_g_post", "tis_g_dl")

    src_full = str(tmp_path / "docs_full")
    os.makedirs(src_full)
    docs.to_parquet(os.path.join(src_full, "documents.parquet"), index=False)
    fdf = spark.read.parquet(src_full)
    build_text_index(
        spark, fdf, stats_table=full[0], postings_table=full[1],
        doclen_table=full[2],
    )

    base = docs[docs.doc_id % 2 == 0]
    held = docs[docs.doc_id % 2 == 1]
    src_base = str(tmp_path / "docs_base")
    os.makedirs(src_base)
    base.to_parquet(os.path.join(src_base, "documents.parquet"), index=False)
    build_text_index(
        spark, spark.read.parquet(src_base),
        stats_table=grown[0], postings_table=grown[1],
        doclen_table=grown[2],
    )

    src_stream = str(tmp_path / "docs_stream")
    os.makedirs(src_stream)
    for part in range(3):
        held[held.doc_id % 6 == 2 * part + 1].to_parquet(
            os.path.join(src_stream, f"p{part}.parquet"), index=False
        )
    schema = spark.read.parquet(src_stream).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_stream)
    )
    text_index_stream_ingest(spark, stream, grown)

    for f_tbl, g_tbl in zip(full, grown):
        f_rows = sorted(map(tuple, spark.table(f_tbl).collect()))
        g_rows = sorted(map(tuple, spark.table(g_tbl).collect()))
        assert f_rows == g_rows, f_tbl


def test_pq_index_stream_multi_batch_converges(spark, tmp_path):
    """Streaming PQ-codes maintenance across REAL micro-batch
    boundaries: the held-out vectors arrive in 3 files fed one per
    trigger, each batch encoding against the FROZEN codebook; the final
    codes table must equal a from-scratch encode of the FULL corpus
    against that same codebook, row for row (the frozen-codebook
    convergence contract — the batch-append twin pins the same
    equality)."""
    from dbt_on_snowflake_spark.operators.similarity import (
        _codebook_row,
        _pq_encode,
        _vectors,
        build_pq_index,
    )
    from dbt_on_snowflake_spark.streaming import pq_index_stream_ingest
    from tests.conftest import SF_SMOKE

    emb = pd.read_parquet(os.path.join(SF_SMOKE, "embeddings.parquet"))
    cb_t, cd_t = "pqs_cb", "pqs_cd"
    for t in (cb_t, cd_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")

    src_base = str(tmp_path / "emb_base")
    os.makedirs(src_base)
    emb[emb.vec_id % 2 == 0].to_parquet(
        os.path.join(src_base, "embeddings.parquet"), index=False
    )
    build_pq_index(
        spark, _vectors(spark, src_base),
        codebook_table=cb_t, codes_table=cd_t,
    )

    held = emb[emb.vec_id % 2 == 1]
    src_stream = str(tmp_path / "emb_stream")
    os.makedirs(src_stream)
    for part in range(3):
        held[held.vec_id % 6 == 2 * part + 1].to_parquet(
            os.path.join(src_stream, f"p{part}.parquet"), index=False
        )
    schema = spark.read.parquet(src_stream).schema
    stream = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(src_stream)
        .select(
            "vec_id", "label",
            F.col("embedding").cast("array<double>").alias("v"),
        )
    )
    pq_index_stream_ingest(
        spark, stream, codebook_table=cb_t, codes_table=cd_t
    )

    spark.catalog.refreshTable(cd_t)
    grown = sorted(
        (r.vec_id, tuple((b.d, b.code) for b in r.bests))
        for r in spark.table(cd_t).select("vec_id", "bests").collect()
    )
    rebuilt = sorted(
        (r.vec_id, tuple((b.d, b.code) for b in r.bests))
        for r in _pq_encode(
            _vectors(spark, SF_SMOKE).select("vec_id", "label", "v"),
            _codebook_row(spark.table(cb_t)),
        ).collect()
    )
    assert grown == rebuilt
    for t in (cb_t, cd_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_text_index_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """A restarted ingest with a durable checkpoint must NOT reprocess
    already-ingested source files (a checkpoint-less restart re-appends
    every doc): the second run leaves the index byte-count-identical,
    while a file arriving AFTER the restart is still picked up."""
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        table_location,
    )
    from dbt_on_snowflake_spark.engine.fs import fs_count_files
    from dbt_on_snowflake_spark.operators.textops import build_text_index
    from dbt_on_snowflake_spark.streaming import text_index_stream_ingest

    docs = pd.DataFrame(
        {
            "doc_id": range(40),
            "text": [
                " ".join(f"w{(i * 5 + j) % 11}" for j in range(4 + i % 7))
                for i in range(40)
            ],
            "lang": ["en"] * 40,
            "source": ["s"] * 40,
        }
    )
    ti = ("tir_stats", "tir_post", "tir_dl")
    base = docs[docs.doc_id % 2 == 0]
    held = docs[docs.doc_id % 2 == 1]
    src_base = str(tmp_path / "base")
    os.makedirs(src_base)
    base.to_parquet(os.path.join(src_base, "documents.parquet"), index=False)
    build_text_index(
        spark, spark.read.parquet(src_base),
        stats_table=ti[0], postings_table=ti[1], doclen_table=ti[2],
    )
    src = str(tmp_path / "stream")
    os.makedirs(src)
    held[held.doc_id % 4 == 1].to_parquet(
        os.path.join(src, "p0.parquet"), index=False
    )
    schema = spark.read.parquet(src).schema

    def run():
        stream = (
            spark.readStream.schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        text_index_stream_ingest(
            spark, stream, ti, checkpoint_dir=str(tmp_path / "ckpt")
        )

    run()
    post_loc = table_location(spark, ti[1])
    files1 = fs_count_files(spark, post_loc)
    stats1 = spark.table(ti[0]).collect()
    rows1 = spark.table(ti[2]).count()

    run()  # the restart: checkpoint says p0 is done
    assert fs_count_files(spark, post_loc) == files1
    assert spark.table(ti[2]).count() == rows1
    assert spark.table(ti[0]).collect() == stats1

    # new data after the restart is still ingested
    held[held.doc_id % 4 == 3].to_parquet(
        os.path.join(src, "p1.parquet"), index=False
    )
    run()
    assert spark.table(ti[2]).count() == len(base) + len(held)
    n_docs = spark.table(ti[0]).collect()[0].n_docs
    assert n_docs == len(docs)
