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
