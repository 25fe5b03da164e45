"""Small-file compaction for the persisted INDEX tables.

The serving indexes (BM25 postings/doclen — ``textops.build_text_index``,
ANN assignments — ``similarity.build_ann_index``, PQ codes —
``similarity.build_pq_index``, the minhash band index — ``dedup``) are
Spark-managed tables, deliberately OUTSIDE the engine's versioned table
format: their maintenance path is per-batch ``.mode("append")`` growth
(``text_index_append``, ``ann_index_append``, streaming ingest via
``foreachBatch``), and the versioned format publishes whole immutable
data dirs — an append there would rewrite the table. The cost of that
choice is the classic streaming-ingest pathology: every micro-batch adds
~1 file per touched partition, so after N batches a K-partition index
carries up to N x K files and the serve path's pruned reads degrade into
many-small-file scans. The ``compact`` CLI's versioned-table sweep
explicitly skips these (no ``_v`` manifest dir); this module is their
counterpart — ``compact --indexes`` runs both.

Rewrite protocol (managed tables have no manifest to swap, so this is a
rename swap, not an atomic commit):

1. write the compacted layout to ``<name>__compacting`` (one file per
   partition dir via repartition on the partition columns; ~128 MB
   files for unpartitioned tables);
2. ``DROP TABLE <name>``; ``ALTER TABLE <name>__compacting RENAME TO
   <name>`` (the catalog moves the data dir);
3. ``MSCK REPAIR`` + ``refreshTable`` — the rename leaves per-partition
   catalog locations and the session's file-listing cache pointing at
   the old path; without both, reads silently return 0 rows.

Crash window: a failure between (2)'s drop and rename loses the table's
catalog entry but not the data (it sits in ``<name>__compacting``). That
is acceptable for THESE tables only because every index is a derived
artifact with a rebuild path (``ensure_text_index`` /
``ensure_ann_index`` / ``build_pq_index`` behind ``tableExists``): the
next serve rebuilds from the corpus, and the sweep heals the leftover
``__compacting`` dir. Durable-of-record tables get the versioned
format's manifest commit instead — never this protocol.

Results are bit-identical by construction: compaction only re-buckets
rows into fewer files, and every index consumer aggregates or joins
(order-independent); ``tests/test_index_maintenance.py`` pins
serve-result equality across a streaming-grown-then-compacted index.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import SparkSession

TARGET_FILE_BYTES = 128 * 1024 * 1024


def table_location(spark: SparkSession, name: str) -> str:
    """The table's data directory, resolved from the catalog (works for
    any warehouse scheme — file://, s3a://, ...)."""
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect():
        if row.col_name == "Location":
            return row.data_type
    raise ValueError(f"no location for table {name}")


def _is_bucketed(spark: SparkSession, name: str) -> bool:
    return any(
        row.col_name == "Num Buckets"
        for row in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    )


def compact_index_table(
    spark: SparkSession,
    name: str,
    *,
    target_bytes: int = TARGET_FILE_BYTES,
) -> tuple[int, int] | None:
    """Compact one managed index table toward one file per partition dir
    (or ~``target_bytes`` files when unpartitioned). Returns
    ``(files_before, files_after)``, or ``None`` when skipped — already
    compact, or bucketed (a blind rewrite would destroy the bucket-file
    naming the catalog scan relies on, same skip as the versioned
    ``compact``)."""
    from dbt_on_snowflake_spark.engine.fs import (
        fs_count_files,
        fs_delete,
        fs_list,
        fs_size,
    )

    if _is_bucketed(spark, name):
        return None
    loc = table_location(spark, name)
    parts = [c.name for c in spark.catalog.listColumns(name) if c.isPartition]
    before = fs_count_files(spark, loc)
    if parts:
        n_dirs = sum(1 for d in fs_list(spark, loc) if "=" in d)
        already = before <= n_dirs
    else:
        n_files = max(1, -(-fs_size(spark, loc) // target_bytes))
        already = before <= n_files
    if already:
        return None

    tmp = f"{name}__compacting"
    # heal a crashed prior attempt: the catalog may still carry the tmp
    # table (same session) or only its directory may remain (the
    # in-memory catalog forgets tables across sessions but their dirs
    # persist, and saveAsTable refuses a non-empty managed location)
    spark.sql(f"DROP TABLE IF EXISTS {tmp}")
    fs_delete(spark, posixpath.join(posixpath.dirname(loc), tmp))

    df = spark.table(name)
    if parts:
        writer = (
            df.repartition(*parts)
            .write.mode("overwrite")
            .partitionBy(*parts)
        )
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.saveAsTable(tmp)
    spark.sql(f"DROP TABLE {name}")
    spark.sql(f"ALTER TABLE {tmp} RENAME TO {name}")
    if parts:
        # the rename keeps the OLD per-partition locations in the
        # catalog; recover them from the moved directory layout
        spark.sql(f"MSCK REPAIR TABLE {name}")
    spark.catalog.refreshTable(name)
    return before, fs_count_files(spark, table_location(spark, name))


_IDEMPOTENT_MERGES = {"max", "min"}


def fold_update_log(
    spark: SparkSession, log_dir: str
) -> tuple[int, int] | None:
    """Fold a merge-on-read update log (``streaming.run_update_log``)
    to one row per key: read the current parquet segments, apply the
    merge the log's ``_merge.json`` sidecar declares, append the folded
    segment, then delete the segments that were read. Returns
    ``(files_before, files_after)``; ``None`` when the dir is not a
    self-describing log or is already folded.

    Crash-safe WITHOUT a commit protocol, because only idempotent
    merges (max/min — a non-listed agg is refused) are folded: a crash
    after the append leaves folded rows coexisting with the originals,
    and the reader's merge collapses the duplicates to the identical
    result; the next fold pass finishes the delete. Concurrent
    streaming appends are also safe — the fold touches only the
    segment snapshot it read, never files a batch lands mid-fold.
    A SUM-of-deltas log would double-count under both properties; such
    a log needs the versioned format's manifest commit, not this."""
    import json

    from dbt_on_snowflake_spark.engine.fs import (
        fs_delete,
        fs_exists,
        fs_list,
        fs_read,
    )

    spec_path = posixpath.join(log_dir, "_merge.json")
    if not fs_exists(spark, spec_path):
        return None
    spec = json.loads(fs_read(spark, spec_path).decode())
    bad = set(spec["merge"].values()) - _IDEMPOTENT_MERGES
    if bad:
        raise ValueError(
            f"update log {log_dir} declares non-idempotent merge(s) "
            f"{sorted(bad)}; folding would change the merged read"
        )
    snapshot = [
        f for f in fs_list(spark, log_dir) if f.endswith(".parquet")
    ]
    if len(snapshot) <= 1:
        return None
    df = spark.read.parquet(
        *[posixpath.join(log_dir, f) for f in snapshot]
    )
    if set(spec["keys"]) | set(spec["merge"]) != set(df.columns):
        raise ValueError(
            f"update log {log_dir}: sidecar columns "
            f"{sorted(set(spec['keys']) | set(spec['merge']))} do not "
            f"cover the log's {sorted(df.columns)}"
        )
    from pyspark.sql import functions as F

    folded = (
        df.groupBy(*spec["keys"])
        .agg(
            *[
                getattr(F, fn)(col).alias(col)
                for col, fn in spec["merge"].items()
            ]
        )
        .select(df.columns)
    )
    folded.write.mode("append").parquet(log_dir)
    for f in snapshot:
        fs_delete(spark, posixpath.join(log_dir, f))
    after = sum(
        1 for f in fs_list(spark, log_dir) if f.endswith(".parquet")
    )
    return len(snapshot), after


def fold_update_logs(spark: SparkSession) -> list[tuple[str, int, int]]:
    """Sweep the warehouse for self-describing update logs and fold
    each; returns ``(dir_name, files_before, files_after)`` per log."""
    from dbt_on_snowflake_spark.engine.fs import fs_list

    wh = spark.conf.get("spark.sql.warehouse.dir")
    done: list[tuple[str, int, int]] = []
    for d in fs_list(spark, wh):
        r = fold_update_log(spark, posixpath.join(wh, d))
        if r is not None:
            done.append((d, *r))
    return done


def compact_index_tables(
    spark: SparkSession,
) -> list[tuple[str, int, int]]:
    """Sweep every managed (index) table in the current database —
    versioned-format tables are temp views, never MANAGED catalog
    entries, so they are excluded by construction. Returns the
    ``(name, files_before, files_after)`` of each table rewritten."""
    done: list[tuple[str, int, int]] = []
    for t in spark.catalog.listTables():
        if t.isTemporary or t.tableType != "MANAGED":
            continue
        if t.name.endswith("__compacting"):
            continue  # crashed leftover; healed by its owner's compact
        r = compact_index_table(spark, t.name)
        if r is not None:
            done.append((t.name, *r))
    return done
