"""Empirical 10x scale probe (r13 verdict Next #6): derive a 10x
key-shifted copy of $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1
-> sf-equivalent 1.0) with dbt_on_snowflake_spark.scale, run the top
headline queries at BOTH scales, and print ONE JSON line:

  {"factor": 10, "queries": {name: {"base_sec": .., "scaled_sec": ..,
   "ratio": .., "stages_base": .., "stages_scaled": ..}}, ...}

What the numbers mean: SCALING.md argues each headliner's plan
survives a 100x scale-up; this measures the first decade of that claim
on real executions — wall-time should grow ~linearly with the data
(ratio ~ factor, minus fixed overheads), and the stage counts must not
drift (a broadcast flip to SMJ on a fixed dim, a skew stall, or a plan
degeneration shows up as extra stages before it shows up as a
wall-time cliff). The scaled dir is cached under .scratch/ (gitignored)
keyed on (base, factor).

Timing protocol matches bench.py: noop sink, warm pass under a job
group (stage counts), then interleaved min-of-2 timing rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbt_on_snowflake_spark.registry import all_queries
from dbt_on_snowflake_spark.scale import derive_scaled_dir
from dbt_on_snowflake_spark.session import get_spark

# the five headliners the r13 verdict names — the 6-way join, the
# two-level agg, banded LSH, the PQ ADC serve, the BM25 index serve —
# plus the event-time bucketing headliner (10x density over the same
# window: group count constant, per-group values 10x)
PROBE_QUERIES = (
    "j1_orders_denorm",
    "a1_loyalty_metrics",
    "dedup_minhash_lsh",
    "ann_pq_adc_topk",
    "text_bm25_topk_indexed",
    "t_events_hourly",
    # r16 (VERDICT r15 Next #4): the partition-pruned persisted IVFPQ
    # serve — the flagship sublinear 100 TB path; its pruned-read
    # fraction is additionally measured below (ivfpq_prune)
    "ann_ivfpq_indexed",
    # r18 (VERDICT r17 Next #6): the two r17 lineage-cut paths whose
    # checkpoint sizes were O(|batch|)/O(|Q|) by argument only — the
    # incremental dedup probe (batch fixed by _NEW_DOCS_PRED, so its
    # wall should track the batch + the pruned index read, not the
    # corpus) and the per-query hybrid serve (bounded query set; its
    # lexical half reads pruned postings)
    "dedup_incremental_index",
    "retrieval_hybrid_rrf_perquery_indexed",
)

# Index BUILDS probed at 10x (r14 verdict Next #6): the serve paths
# above are where queries spend time, but build is where a 100 TB
# deployment actually spends its shuffles — the one-time token explode
# + (term, doc) groupBy, the bucketed band-index write, the
# label-partitioned assignment/codes writes. Each runs end-to-end into
# throwaway probe tables at both scales.
PROBE_BUILDERS = (
    "build_pq_index",
    "build_ann_index",
    "build_text_index",
    "build_minhash_index",
)


def probe_tables(name: str, tag: str) -> list[str]:
    """The throwaway table names ``run_builder`` writes for (builder,
    tag) — known BEFORE the build so a failed run can still be cleaned
    in a finally (r15 advice #4: a mid-probe crash between build and
    drop leaked pq_codes_probe_* into the warehouse, where the reindex
    sweep later alarms on it as a baseline-less family)."""
    sfx = f"probe_{tag}"
    return {
        "build_pq_index": [f"pq_codebook_{sfx}", f"pq_codes_{sfx}"],
        "build_ann_index": [f"ann_centroids_{sfx}", f"ann_assignments_{sfx}"],
        "build_text_index": [
            # bm25_df_: the r18 persisted per-term df sibling the build
            # now writes — without it here a mid-probe crash would leak
            # it past the finally-drop (the r15 advice #4 class)
            f"bm25_stats_{sfx}", f"bm25_postings_{sfx}",
            f"bm25_doclen_{sfx}", f"bm25_df_{sfx}",
        ],
        "build_minhash_index": [
            f"mh_band_index_{sfx}", f"mh_corpus_pairs_{sfx}"
        ],
    }[name]


def run_builder(spark, name: str, sf_dir: str, tag: str) -> list[str]:
    """Run one index builder end-to-end into throwaway probe tables;
    returns the table names so the caller can drop them between
    timing rounds."""
    from dbt_on_snowflake_spark.testdata import table

    t = probe_tables(name, tag)
    if name == "build_pq_index":
        from dbt_on_snowflake_spark.operators.similarity import (
            _vectors,
            build_pq_index,
        )

        build_pq_index(
            spark,
            _vectors(spark, sf_dir),
            codebook_table=t[0],
            codes_table=t[1],
        )
        return t
    if name == "build_ann_index":
        from dbt_on_snowflake_spark.operators.similarity import (
            _vectors,
            build_ann_index,
        )

        build_ann_index(
            spark,
            _vectors(spark, sf_dir),
            centroids_table=t[0],
            assignments_table=t[1],
        )
        return t
    if name == "build_text_index":
        from dbt_on_snowflake_spark.operators.textops import (
            build_text_index,
        )

        build_text_index(
            spark,
            table(spark, sf_dir, "documents"),
            stats_table=t[0],
            postings_table=t[1],
            doclen_table=t[2],
        )
        return t
    if name == "build_minhash_index":
        from dbt_on_snowflake_spark.operators.dedup import (
            build_minhash_index,
        )
        from dbt_on_snowflake_spark.testdata import fan_out_scan

        build_minhash_index(
            spark,
            fan_out_scan(spark, table(spark, sf_dir, "documents")),
            index_table=t[0],
            pairs_table=t[1],
        )
        return t
    raise ValueError(name)


def _drop_all(spark, tables: list[str]) -> None:
    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table

    for t in tables:
        _drop_managed_table(spark, t)


def drop_ivfpq_family(spark, sf_dir: str) -> None:
    """Drop the persisted IVFPQ families keyed on ``sf_dir`` — the
    probe must not leave an index over the throwaway SCALED corpus in
    the shared warehouse (r16 review finding 2): the reindex sweep
    gates every pq_codes_* family, and one whose corpus lives in a
    regenerable .scratch dir would alarm (or fail-closed retrain)
    every scheduled sweep after the scratch rotates. Covers BOTH
    cell-partitioned families (build-once 'ivfpq' and append-grown
    'ivfpqaps') so promoting the appended serve into the probe can't
    re-open the leak (r16 review pass 2, finding 3)."""
    from dbt_on_snowflake_spark.operators.similarity import IVFPQ_ALGO
    from dbt_on_snowflake_spark.testdata import index_suffix

    for tag, names in (
        ("ivfpq", ("ivf_cells_{s}", "pq_codebook_ivp_{s}",
                   "pq_codes_ivp_{s}", "pq_tombstones_ivp_{s}")),
        ("ivfpqaps", ("ivf_cells_aps_{s}", "pq_codebook_ivp_aps_{s}",
                      "pq_codes_ivp_aps_{s}", "pq_tombstones_ivp_aps_{s}",
                      "ivp_grown_aps_{s}")),
    ):
        sfx = index_suffix(spark, sf_dir, tag, "embeddings", algo=IVFPQ_ALGO)
        _drop_all(spark, [n.format(s=sfx) for n in names])


# The append probe's FIXED batch size: the base corpus's lowest
# vec_ids. The scale derivation key-shifts the extra copies' ids past
# the base id domain, so a cutoff measured on the BASE corpus selects
# the IDENTICAL rows at every scale — which is the point: append cost
# must track the (constant) batch, not the corpus.
APPEND_BATCH = 512


def append_batch_pred(spark, base_dir: str) -> str:
    """The batch predicate, derived from the BASE corpus: the
    APPEND_BATCH smallest vec_ids, capped at HALF the corpus so the
    family is always built over a real remainder (the smoke dir's 500
    rows would otherwise all land in the batch and train an empty
    quantizer). Copies' shifted ids all exceed the base maximum, so
    the same predicate picks the same rows at any scale."""
    from dbt_on_snowflake_spark.operators.similarity import _vectors

    e = _vectors(spark, base_dir).select("vec_id")
    n = min(APPEND_BATCH, max(e.count() // 2, 1))
    ids = e.orderBy("vec_id").limit(n).collect()
    if not ids:
        raise ValueError(
            f"append probe: {base_dir} has an empty embeddings corpus"
        )
    return f"vec_id <= {int(ids[-1].vec_id)}"


def ivfpq_append_tables(tag: str) -> list[str]:
    """Throwaway append-probe family names INSIDE the ``pq_codes_ivp_``
    convention (r17 review finding 1): a hard crash between build and
    the finally-drop leaves the family in the warehouse, where the
    reindex sweep's ``retrain_any_pq_family`` routes by name — a
    non-conforming ``pq_codes_apbe_*`` would take the flat
    label-partitioned rebuild and corrupt the cell-partitioned layout
    (the exact mis-route r16 review finding 1 closed)."""
    return [
        f"ivf_cells_apbe_{tag}",
        f"pq_codebook_ivp_apbe_{tag}",
        f"pq_codes_ivp_apbe_{tag}",
        f"pq_tombstones_ivp_apbe_{tag}",
    ]


def ivfpq_append_measure(spark, sf_dir: str, tag: str, pred: str,
                         rounds: int = 2) -> dict:
    """Measured O(|batch|) append (r17, VERDICT r16 Next #4): build a
    throwaway IVFPQ family over corpus-minus-batch, then time
    ``ivfpq_index_append`` of the FIXED batch (``pred`` — derive it
    once from the BASE corpus with ``append_batch_pred``).
    The family is rebuilt between timing rounds so every timed append
    is a real first delivery — a replay would no-op through the
    idempotence probe and time nothing. Also records the grown
    family's serve read fractions (the appended rows must not degrade
    the prune). Returns min-of-``rounds`` wall, first-round stage
    count, batch size, and the grown-serve fractions; the probe tables
    are dropped on every exit path (the r15 advice #4 discipline)."""
    import time as _time

    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.operators.similarity import (
        _vectors,
        build_ivfpq_index,
        ivfpq_index_append,
    )

    t = ivfpq_append_tables(tag)
    e = _vectors(spark, sf_dir)
    batch = e.filter(F.expr(pred))
    rest = e.filter(~F.expr(pred))
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    walls: list[float] = []
    stages = None
    batch_rows = batch.count()  # untimed: the fixed batch's size
    try:
        for i in range(rounds):
            build_ivfpq_index(
                spark,
                rest,
                cells_table=t[0],
                codebook_table=t[1],
                codes_table=t[2],
            )
            group = f"probe-append:ivfpq:{tag}:{i}"
            sc.setJobGroup(group, group)
            s = _time.perf_counter()
            try:
                ivfpq_index_append(
                    spark,
                    batch,
                    cells_table=t[0],
                    codebook_table=t[1],
                    codes_table=t[2],
                )
            finally:
                sc.setJobGroup(None, None)
            walls.append(round(_time.perf_counter() - s, 3))
            if stages is None:
                stages = jobs = 0
                for job_id in tracker.getJobIdsForGroup(group):
                    info = tracker.getJobInfo(job_id)
                    if info is not None:
                        jobs += 1
                        stages += len(info.stageIds)
                # exchanges = stages - jobs (the builders-pin metric):
                # the raw job count grows with the file count (1-stage
                # file-LISTING jobs past the parallel-discovery
                # threshold) — scan bookkeeping, not plan shape
                shuffle_depth = stages - jobs
        grown = ivfpq_read_fractions(spark, t[0], t[2], sf_dir)
        per_q = grown.pop("per_query_read_fracs")
        grown["mean_query_read_frac"] = (
            round(sum(per_q) / len(per_q), 4) if per_q else None
        )
        return {
            "append_sec": min(walls),
            "runs": walls,
            "stages": stages,
            "shuffle_depth": shuffle_depth,
            "batch_rows": batch_rows,
            "grown_serve": grown,
        }
    finally:
        _drop_all(spark, t)


def ivfpq_read_fractions(spark, cells_table: str, codes_table: str,
                         sf_dir: str) -> dict:
    """The IVFPQ serve's measured read fractions — ONE definition
    shared by the probe's ivfpq_prune record and the 10x pytest pin
    (r16 review finding 5): per query, which trained cells it probes
    and what fraction of the cell-partitioned codes those cells hold
    (the O(nprobe/cells) claim); plus the scan-level fraction of the
    probed-cell UNION (the partition filter a batched serve pushes
    down)."""
    from collections import Counter

    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.operators.similarity import (
        _QUERY_PRED,
        _ivf_probes,
        _vectors,
    )

    probes: dict[int, list[int]] = {}
    for r in _ivf_probes(
        _vectors(spark, sf_dir).filter(F.expr(_QUERY_PRED)),
        spark.table(cells_table),
    ).collect():
        probes.setdefault(int(r.query_id), []).append(int(r.plabel))
    per_cell = Counter(
        {
            int(r["label"]): int(r["n"])
            for r in spark.table(codes_table)
            .groupBy("label")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    )
    total = sum(per_cell.values())
    union = {c for cells in probes.values() for c in cells}
    per_q = (
        [
            sum(per_cell.get(c, 0) for c in cells) / total
            for cells in probes.values()
        ]
        if total
        else []
    )
    return {
        "cells_probed_union": len(union),
        "cells_total": spark.table(cells_table).count(),
        "scan_read_frac": (
            round(sum(per_cell.get(c, 0) for c in union) / total, 4)
            if total
            else None
        ),
        "per_query_read_fracs": per_q,
    }


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    sf = base.rstrip("/").rsplit("sf", 1)[-1]
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        ".scratch",
        f"scale{factor}_sf{sf}",
    )
    spark = get_spark("scale_probe")
    t0 = time.perf_counter()
    derive_scaled_dir(spark, base, out, factor=factor)
    derive_sec = round(time.perf_counter() - t0, 3)
    try:
        _probe(spark, base, out, factor, sf, derive_sec)
    finally:
        # the scaled corpus is a regenerable .scratch cache: the
        # ann_ivfpq_indexed runs (and the prune measurement) ensure-
        # build a persisted IVFPQ family keyed on it — drop it so the
        # reindex sweep never gates an index over throwaway data
        # (r16 review finding 2; the base-dir family serves the real
        # corpus and stays). Best-effort: a dead session or unreadable
        # scratch must not mask _probe's own traceback (pass 2,
        # finding 4).
        try:
            drop_ivfpq_family(spark, out)
        except Exception as exc:  # noqa: BLE001 — cleanup only
            print(f"warning: ivfpq probe-family cleanup failed: {exc}",
                  file=sys.stderr)


def _probe(spark, base, out, factor, sf, derive_sec) -> None:
    sc = spark.sparkContext
    qs = all_queries()
    tracker = sc.statusTracker()

    def run(name: str, sf_dir: str) -> None:
        qs[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # warm + stage counts per (query, scale)
    stages: dict[tuple[str, str], int] = {}
    for name in PROBE_QUERIES:
        for tag, d in (("base", base), ("scaled", out)):
            group = f"probe:{name}:{tag}"
            sc.setJobGroup(group, group)
            try:
                run(name, d)
            finally:
                sc.setJobGroup(None, None)
            n = 0
            for job_id in tracker.getJobIdsForGroup(group):
                info = tracker.getJobInfo(job_id)
                if info is not None:
                    n += len(info.stageIds)
            stages[(name, tag)] = n

    runs: dict[tuple[str, str], list[float]] = {
        (n, t): [] for n in PROBE_QUERIES for t in ("base", "scaled")
    }
    for _ in range(2):
        for name in PROBE_QUERIES:
            for tag, d in (("base", base), ("scaled", out)):
                s = time.perf_counter()
                run(name, d)
                runs[(name, tag)].append(
                    round(time.perf_counter() - s, 3)
                )

    # quality at scale: mean PQ recall@k against brute force, base vs
    # 10x. The derivation's per-copy dimension rotation makes the extra
    # vectors genuinely new directions (not near-exact ties), so this
    # measures real 10x-distractor pressure on the quantized index.
    from pyspark.sql import functions as F

    recall = {}
    for tag, d in (("base", base), ("scaled", out)):
        df = qs["ann_pq_recall_eval"].fn(spark, d)
        row = df.agg(F.avg("recall_at_k").alias("r")).collect()[0]
        recall[tag] = round(float(row["r"]), 4)

    # sublinearity of the persisted IVFPQ serve, made quantitative
    # (r15 verdict Next #4): the plan pin proves the probed-cell union
    # reaches the scan as a partition filter; THIS measures how much of
    # the cell-partitioned codes a serve actually reads. Two numbers:
    # the scan-level fraction (the partition filter is the UNION across
    # the query batch — on isotropic data it saturates as queries
    # spread) and the mean PER-QUERY fraction (the kernel's per-query
    # cell masks — the O(nprobe/cells) scaling claim). Both should hold
    # or shrink at 10x, never grow toward 1.0.
    from dbt_on_snowflake_spark.operators.similarity import (
        ensure_ivfpq_index,
    )

    ivfpq_prune = {}
    for tag, d in (("base", base), ("scaled", out)):
        cells_t, _, cd_t = ensure_ivfpq_index(spark, d)
        m = ivfpq_read_fractions(spark, cells_t, cd_t, d)
        per_q = m.pop("per_query_read_fracs")
        m["mean_query_read_frac"] = (
            round(sum(per_q) / len(per_q), 4) if per_q else None
        )
        ivfpq_prune[tag] = m

    # the production ingest path at scale (r17, VERDICT r16 Next #4):
    # a FIXED 512-vector batch appended to a family built over
    # corpus-minus-batch at both scales — O(|batch|) means the wall
    # ratio sits near 1.0 while the builders above sit near the data
    # factor; the grown family's read fractions prove the appended
    # rows keep the prune intact.
    ivfpq_append = {}
    bpred = append_batch_pred(spark, base)
    for tag, d in (("base", base), ("scaled", out)):
        ivfpq_append[tag] = ivfpq_append_measure(spark, d, tag, bpred)
    ab, asld = (
        ivfpq_append["base"]["append_sec"],
        ivfpq_append["scaled"]["append_sec"],
    )
    ivfpq_append["ratio"] = round(asld / ab, 2) if ab > 0 else None

    # index BUILDS at both scales: warm pass for stage counts (the
    # tables are dropped between passes so every run is a full
    # from-scratch build), then min-of-2 timing
    b_stages: dict[tuple[str, str], int] = {}
    b_runs: dict[tuple[str, str], list[float]] = {
        (n, t): [] for n in PROBE_BUILDERS for t in ("base", "scaled")
    }
    # every build is try/finally-dropped by its PRE-computed table list
    # (r15 advice #4): a failed build mid-probe must not leak
    # pq_codes_probe_* / ann_assignments_probe_* into the warehouse
    # where the reindex sweep alarms on them as baseline-less families
    for name in PROBE_BUILDERS:
        for tag, d in (("base", base), ("scaled", out)):
            group = f"probe-build:{name}:{tag}"
            try:
                sc.setJobGroup(group, group)
                try:
                    run_builder(spark, name, d, tag)
                finally:
                    sc.setJobGroup(None, None)
                n = 0
                for job_id in tracker.getJobIdsForGroup(group):
                    info = tracker.getJobInfo(job_id)
                    if info is not None:
                        n += len(info.stageIds)
                b_stages[(name, tag)] = n
            finally:
                _drop_all(spark, probe_tables(name, tag))
    for _ in range(2):
        for name in PROBE_BUILDERS:
            for tag, d in (("base", base), ("scaled", out)):
                s = time.perf_counter()
                try:
                    run_builder(spark, name, d, tag)
                    b_runs[(name, tag)].append(
                        round(time.perf_counter() - s, 3)
                    )
                finally:
                    _drop_all(spark, probe_tables(name, tag))

    queries = {}
    for name in PROBE_QUERIES:
        b = min(runs[(name, "base")])
        s = min(runs[(name, "scaled")])
        queries[name] = {
            "base_sec": b,
            "scaled_sec": s,
            "ratio": round(s / b, 2) if b > 0 else None,
            "stages_base": stages[(name, "base")],
            "stages_scaled": stages[(name, "scaled")],
        }
    builders = {}
    for name in PROBE_BUILDERS:
        b = min(b_runs[(name, "base")])
        s = min(b_runs[(name, "scaled")])
        builders[name] = {
            "base_sec": b,
            "scaled_sec": s,
            "ratio": round(s / b, 2) if b > 0 else None,
            "stages_base": b_stages[(name, "base")],
            "stages_scaled": b_stages[(name, "scaled")],
        }
    print(
        json.dumps(
            {
                "metric": "scale_probe",
                "factor": factor,
                "sf": sf,
                "derive_sec": derive_sec,
                "queries": queries,
                "builders": builders,
                "pq_recall_at_k": recall,
                "ivfpq_prune": ivfpq_prune,
                "ivfpq_append": ivfpq_append,
            }
        )
    )


if __name__ == "__main__":
    main()
