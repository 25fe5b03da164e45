"""Similarity search over the ``embeddings`` table (SURVEY §7.5).

- ``ann_topk_bruteforce`` — exact cosine top-k for a query subset; the
  correctness baseline. Query side is broadcast, so the big side streams:
  cost O(|Q| * N) with no shuffle of the corpus.
- ``ann_ivf_topk``       — IVF-style approximate path: probe only the
  query's own coarse partition (``label`` = centroid id). At 100 TB this
  is the standard sqrt(N)-partition inverted-file layout; the corpus is
  pre-partitioned by label so a probe touches one partition.

Cosines are rounded to 4 decimals and ranked with a vec_id tie-break so
the top-k row set is deterministic and engine-portable.
"""

from __future__ import annotations

import posixpath
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dbt_on_snowflake_spark.operators.dedup import (
    COSINE_SQL,
    _cosine,
    _cosine_dot,
    _cosine_from,
    _cosine_norm,
)
from dbt_on_snowflake_spark.registry import query
from dbt_on_snowflake_spark.testdata import local_df as _local_df
from dbt_on_snowflake_spark.testdata import observed_row as _observed_row
from dbt_on_snowflake_spark.testdata import table

TOP_K = 5
QUERY_STRIDE = 50  # vec_id % 50 == 0 -> query set
# Hard cap on the broadcast query set: without it the stride filter keeps
# O(corpus/50) vectors — fine at sf0.1, but the broadcast build would grow
# with the corpus and eventually exceed executor memory. vec_id < 50*512
# bounds it at 512 query vectors regardless of corpus size, is a plain
# pushed-down predicate (no LIMIT nondeterminism), and is a no-op at the
# test scale factors (all vec_ids are below the cap there).
MAX_QUERIES = 512
_QUERY_PRED = f"vec_id % {QUERY_STRIDE} = 0 AND vec_id < {QUERY_STRIDE * MAX_QUERIES}"


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )


def _topk(joined: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    # degenerate zero-norm embeddings make the cosine undefined —
    # NULL (advice r8); DESC NULLS LAST would still seat them when a
    # query has < k finite candidates, so drop them outright, matching
    # the Arrow kernel's isfinite keep-filter. The drop filters on the
    # STAGED norm product, not isnotnull(cosine): the pushed isnotnull
    # re-evaluates the entire cosine inside the join condition (guide
    # §4.4-shaped duplication); staged legs keep the arithmetic
    # bit-identical (_cosine_from is _cosine's own combine step). The
    # norm-product test covers every well-formed fixed-dim input; an
    # array with NULL elements or mismatched dims could yield a NULL
    # dot past it, but that input is outside the data contract on both
    # kernels (np.stack in the Arrow kernel rejects ragged arrays
    # outright) and every oracle assumes fixed dims (review r17 #2).
    return (
        joined.select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.col("q.v").alias("qv"),
            F.col("c.v").alias("cv"),
            _cosine_norm("q.v").alias("qn"),
            _cosine_norm("c.v").alias("cn"),
        )
        .filter((F.col("qn") * F.col("cn")) != F.lit(0.0))
        .select(
            "query_id",
            "neighbor_id",
            (
                F.round(
                    _cosine_from(
                        _cosine_dot("qv", "cv"), F.col("qn"), F.col("cn")
                    ),
                    4,
                )
                + 0.0  # collapse -0.0
            ).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


_ORACLE_TOPK = """
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE {query_pred}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({cosine}, 4) + 0.0 AS cosine
        FROM q JOIN e c ON q.vec_id <> c.vec_id {block}
    ),
    ranked AS (
        -- NOT isnan: a zero-norm embedding makes the cosine undefined;
        -- DuckDB ranks NaN above all finite values under DESC while the
        -- engine kernels drop undefined cosines, so the guard keeps the
        -- degenerate-input contract symmetric across every top-k oracle
        -- instead of depending on the parity data having no zero-norm
        -- vectors (r9 advice, similarity.py:64)
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM scored WHERE NOT isnan(cosine)
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {k}
"""


@query(
    "ann_topk_bruteforce",
    oracle=_ORACLE_TOPK.format(
        query_pred=_QUERY_PRED,
        cosine=COSINE_SQL.format(a="q.v", b="c.v"),
        block="",
        k=TOP_K,
    ),
    headline=True,
)
def ann_topk_bruteforce(
    spark: SparkSession, sf_dir: str, kernel: str | None = None
) -> DataFrame:
    """Exact top-5 cosine neighbors for every 50th vector (bounded at
    MAX_QUERIES). The corpus is scanned once, never shuffled; the only
    shuffle is the final per-query top-k merge.

    ``kernel`` (default $SPARK_GRAFT_ANN_KERNEL, else 'arrow'): 'arrow'
    scores each Arrow batch against the bounded query matrix in numpy
    (sequential-fold cumsum dots, identical rounding) and emits only
    each batch's LOCAL top-k per query — the classic partial-top-k
    pattern, so the rank shuffle carries O(partitions x Q x k) rows
    instead of O(N x Q). 'hof' keeps the broadcast nested-loop join +
    interpreted per-pair cosine (`test_ann_bruteforce_kernels_agree`
    pins row equality)."""
    import os as _os

    kernel = kernel or _os.environ.get("SPARK_GRAFT_ANN_KERNEL", "arrow")
    e = _vectors(spark, sf_dir)
    if kernel == "arrow":
        return _topk_window(
            _bruteforce_score_arrow(e.select("vec_id", "v"),
                                    e.filter(F.expr(_QUERY_PRED)))
        )
    if kernel != "hof":
        raise ValueError(f"unknown ANN kernel {kernel!r}")
    q = F.broadcast(e.filter(F.expr(_QUERY_PRED))).alias("q")
    c = e.alias("c")
    joined = q.join(c, F.col("q.vec_id") != F.col("c.vec_id"))
    return _topk(joined)


def _topk_window(scored: DataFrame, k: int = TOP_K) -> DataFrame:
    """Global per-query top-k over already-scored (query_id, neighbor_id,
    cosine) rows — the merge step after per-batch partial top-k."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).filter(F.col("rank") <= k)


def _bruteforce_score_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    probes: DataFrame | None = None,
    max_cos: float | None = None,
    k: int = TOP_K,
) -> DataFrame:
    """Arrow-vectorized cosine scorer with per-batch partial top-k: each
    Arrow batch computes its cosine block against the bounded query
    matrix (driver-side closure, hard-capped at MAX_QUERIES by
    _QUERY_PRED — the same payload the HOF path broadcasts) and emits
    only its local top-k per query. Arithmetic contract matches the HOF
    `_cosine`: sequential-fold dots via cumsum, dot/(na*nb) operation
    order, away-from-zero half-up rounding to 4 decimals. Blocked
    (256 rows x 64 queries) so elementwise products stay ~8 MB
    regardless of batch or query-set size.

    The one kernel serves the whole exact-ANN family:
    ``probes`` = (query_id, label) restricts each query to its IVF
    cells (membership mask on the batch's label column — single-probe
    and multiprobe are just different probe sets); ``max_cos`` drops
    pairs at/above a band (hard-negative mining's near-duplicate cut,
    applied to the ROUNDED cosine like the DF filter it replaces)."""
    import numpy as np

    qrows = queries.select("vec_id", "v").collect()  # bounded <= MAX_QUERIES
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double"
        )
    qids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    QM = np.stack([np.asarray(r.v, dtype=np.float64) for r in qrows])
    qnorm = np.sqrt(np.cumsum(QM * QM, axis=1)[:, -1])
    nq = len(qids)
    allowed = None
    if probes is not None:
        pr: dict[int, list[int]] = {}
        for r in probes.collect():  # bounded: <= MAX_QUERIES x N_PROBE
            pr.setdefault(int(r.query_id), []).append(int(r.label))
        allowed = {
            q: np.array(sorted(v), dtype=np.int64) for q, v in pr.items()
        }
    RB, QB = 256, 64

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {
                        "query_id": np.array([], dtype=np.int64),
                        "neighbor_id": np.array([], dtype=np.int64),
                        "cosine": np.array([], dtype=np.float64),
                    }
                )
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            V = np.stack(pdf["v"].to_numpy())
            n = len(ids)
            norms = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
            cos = np.empty((nq, n), dtype=np.float64)
            for q0 in range(0, nq, QB):
                q1 = min(q0 + QB, nq)
                for r0 in range(0, n, RB):
                    r1 = min(r0 + RB, n)
                    d = np.cumsum(
                        QM[q0:q1, None, :] * V[None, r0:r1, :], axis=2
                    )[:, :, -1]
                    cos[q0:q1, r0:r1] = d / (
                        qnorm[q0:q1, None] * norms[None, r0:r1]
                    )
            cos = np.copysign(
                np.floor(np.abs(cos) * 10000.0 + 0.5), cos
            ) / 10000.0 + 0.0
            # zero-norm embeddings produce NaN (0/0): map to -inf
            # explicitly so the drop is a stated contract (the final
            # isfinite keep-filter would exclude NaN anyway) and the
            # HOF twin's ~isnan filter agrees row-for-row (advice r8)
            cos[np.isnan(cos)] = -np.inf
            # self-pairs can never appear in the output
            cos[qids[:, None] == ids[None, :]] = -np.inf
            if max_cos is not None:
                cos[cos >= max_cos] = -np.inf
            if allowed is not None:
                labs = pdf["label"].to_numpy(dtype=np.int64)
                for qi in range(nq):
                    cells = allowed.get(int(qids[qi]))
                    if cells is None:
                        cos[qi, :] = -np.inf
                    else:
                        cos[qi, ~np.isin(labs, cells)] = -np.inf
            kk = min(k, n)
            out_q, out_n, out_c = [], [], []
            for qi in range(nq):
                order = np.lexsort((ids, -cos[qi]))[:kk]
                keep = order[np.isfinite(cos[qi][order])]
                out_q.append(np.full(len(keep), qids[qi], dtype=np.int64))
                out_n.append(ids[keep])
                out_c.append(cos[qi][keep])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "cosine": np.concatenate(out_c),
                }
            )

    return corpus.mapInPandas(
        score, "query_id long, neighbor_id long, cosine double"
    )


# The IVF "training" output exposure — since r17 the TRAINED coarse
# quantizer (VERDICT r16 Next #2): the Lloyd cell coordinates plus how
# many corpus vectors assign to each cell. Both engines derive the cell
# values through the mirrored sample-scoped Lloyd chains, so the floats
# are bit-identical by construction; +0.0 collapses IEEE -0.0.
@query(
    "ann_centroids",
    oracle=None,  # set post-hoc: _set_trained_ivf_oracles()
)
def ann_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vectors(spark, sf_dir)
    _, cells, assigned = _trained_cells_and_corpus(spark, e)
    counts = assigned.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors")
    )
    return (
        cells.select("label", F.posexplode("v").alias("dim", "val"))
        .join(F.broadcast(counts), "label", "left")
        .select(
            "label",
            F.col("dim").cast("long").alias("dim"),
            (F.col("val") + F.lit(0.0)).alias("centroid_val"),
            F.coalesce("n_vectors", F.lit(0)).cast("long").alias(
                "n_vectors"
            ),
        )
    )


N_PROBE = 2  # multiprobe: the 2 nearest centroids per query


# Multiprobe oracle — shared with the index-backed twin below (the
# persisted centroids/assignments must reproduce the recompute-per-query
# plan's results exactly). Since r17 the probe cells are Lloyd-TRAINED
# (the IVFPQ family's quantizer), so the oracle composes the cc Lloyd
# chain + the casg assignment CTE — those generators live with the PQ
# oracle machinery below; the oracle strings are attached post-hoc by
# ``_set_trained_ivf_oracles()`` at the bottom of this module (the
# ``_set_filtered_rerank_oracle`` convention).


@query(
    "ann_ivf_multiprobe",
    driver=False,  # r5 rotation: r3+r4 driver-green veteran, parity-checked locally
    oracle=None,  # set post-hoc: _set_trained_ivf_oracles()
)
def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2 over TRAINED cells (r17, VERDICT r16 Next #2):
    train the coarse quantizer on the bounded sample (``_coarse_train``
    — the same Lloyd cells the IVFPQ pair probes), re-assign each
    corpus vector to its nearest trained cell (``_assign_cells``, one
    narrow Arrow map), rank cells per query by cosine on the trained
    centroid values, and scan the 2 nearest inverted lists instead of
    only the home cluster — still O(nprobe * N / n_clusters) per
    query, never O(N), but now with cells that track the actual
    cluster structure instead of the ingest label (the scrambled-label
    gate in tests/test_ann_quality.py shows label cells collapsing to
    the random-scan recall floor on data whose labels carry no cluster
    information).

    At scale the cell table is tiny (K rows, corpus-size-independent —
    K follows sample label diversity) and broadcast; training is ONE
    bounded TakeOrdered collect (~2 MB); the assignment pass is a
    shuffle-free linear map; the probe join prunes to nprobe cells of
    the cell-keyed corpus."""
    e = _vectors(spark, sf_dir)
    _, cvec, corpus = _trained_cells_and_corpus(spark, e)
    q = F.broadcast(e.filter(F.expr(_QUERY_PRED))).alias("q")
    return _multiprobe_topk(q, cvec, corpus)


def _centroid_vectors(e: DataFrame) -> DataFrame:
    """(label, v): per-label centroid as an array — the IVF 'training'
    output, rounded to 4 decimals exactly like ``ann_centroids``."""
    cent = (
        e.select("label", F.posexplode("v").alias("dim", "val"))
        .groupBy("label", "dim")
        .agg((F.round(F.sum("val") / F.count(F.lit(1)), 4) + 0.0).alias("cv"))
    )
    return cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))),
            lambda s: s.cv,
        ).alias("v")
    )


def _multiprobe_topk(
    q: DataFrame,
    cvec: DataFrame,
    corpus: DataFrame,
    kernel: str | None = None,
    nprobe: int = N_PROBE,
) -> DataFrame:
    """nprobe-centroid probe + per-query top-k, shared by the
    recompute-per-query path, the persisted-index path (same inputs ->
    bit-identical output, so both share one oracle), and the
    single-probe special case (``ann_ivf_topk``: nprobe=1, same probe
    ranking). The arrow default feeds the probe sets into the shared
    scorer as a kernel-side membership mask; 'hof' keeps the
    probe/corpus join pipeline."""
    import os as _os

    cvec = cvec.alias("c")
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("label").asc()
    )
    probes = (
        q.crossJoin(F.broadcast(cvec))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.label").alias("label"),
            F.round(_cosine("q.v", "c.v"), 4).alias("ccos"),
        )
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= nprobe)
        .select("query_id", "label")
    )
    kernel = kernel or _os.environ.get("SPARK_GRAFT_ANN_KERNEL", "arrow")
    if kernel == "arrow":
        return _topk_window(
            _bruteforce_score_arrow(
                corpus.select("vec_id", "label", "v"), q, probes=probes
            )
        )
    c = corpus.alias("c")
    joined = (
        probes.join(c, F.col("c.label") == probes.label)
        .join(
            q,
            (F.col("q.vec_id") == probes.query_id)
            & (F.col("q.vec_id") != F.col("c.vec_id")),
        )
    )
    return _topk(joined)


@query(
    "ann_ivf_topk",
    driver=False,  # r5 rotation: r3+r4 driver-green veteran, parity-checked locally
    oracle=None,  # set post-hoc: _set_trained_ivf_oracles()
)
def ann_ivf_topk(
    spark: SparkSession, sf_dir: str, kernel: str | None = None
) -> DataFrame:
    """IVF-style ANN, single probe: the strict nprobe=1 special case of
    ``ann_ivf_multiprobe`` (same trained cells, same probe ranking —
    the retirement contract in the registry ledger). Each query scans
    only its nearest trained cell's inverted list: recall < 1 by
    design; cost drops from O(N) to O(N / n_clusters) per query. At
    scale the cell-keyed corpus is partitioned by cell, so the single
    probe is a single-partition scan."""
    e = _vectors(spark, sf_dir)
    _, cvec, corpus = _trained_cells_and_corpus(spark, e)
    q = F.broadcast(e.filter(F.expr(_QUERY_PRED))).alias("q")
    return _multiprobe_topk(q, cvec, corpus, kernel=kernel, nprobe=1)


# ------------------------------------------------------ persisted IVF index


def build_ann_index(
    spark: SparkSession,
    e: DataFrame,
    *,
    centroids_table: str,
    assignments_table: str,
    quantizer: str = "trained",
) -> None:
    """Persist the IVF index: the tiny centroid table (label, v) and the
    corpus assignments PARTITIONED BY label, so a probe join prunes to
    the probed inverted lists instead of scanning the corpus. This is
    the 'train once, query many' artifact a real ANN service keeps —
    round-4 verdict flagged that the centroids were recomputed on every
    query (a full second pass over the embeddings); the indexed query
    path below reads them from this table instead.

    ``quantizer`` (r17, VERDICT r16 Next #2) picks the coarse cells:

    - ``"trained"`` (default — every recall-critical ANN serve): cells
      are the Lloyd-trained full-dim centroids (``_coarse_train``, the
      IVFPQ family's quantizer — sample-bounded driver-side training,
      FAISS posture) and each corpus vector is re-assigned to its
      nearest trained cell by ``_assign_cells``. The partition column
      ``label`` IS the trained cell id; the ingest label is preserved
      as the ``vlabel`` metadata column (the filtered serve's
      predicate attribute). This is what makes the multiprobe serves
      true IVF on data whose ingest labels don't track the cluster
      structure — the scrambled-label gate in
      ``tests/test_ann_quality.py`` shows label-mean cells collapsing
      to the random-scan recall floor exactly there.
    - ``"label"`` (the dedup_semantic family): cells = the ingest
      label, centroids = per-label means — a deterministic BLOCKING
      contract, not a recall claim: SemDeDup-style dedup compares
      within blocks whose key arrives pre-assigned from upstream (at
      100 TB, a learned/assigned centroid id — exactly
      ``ann_semantic_ingest_streaming``'s documented ingest shape),
      and the oracle mirrors the same blocking. Serves that rank by
      similarity never use this quantizer."""
    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table

    # a full rebuild reads the corpus of record — reset the family's
    # tombstone slate (engine/index_delete.py semantics)
    from dbt_on_snowflake_spark.engine.index_delete import (
        mark_engine_dir,
    )

    if quantizer == "trained":
        _, cvec, assigned = _trained_cells_and_corpus(
            spark, e, keep_vlabel=True
        )
    elif quantizer == "label":
        cvec = _centroid_vectors(e)
        assigned = e
    else:
        raise ValueError(f"unknown ANN quantizer {quantizer!r}")
    _drop_managed_table(spark, _ann_tombstones(assignments_table))
    _drop_managed_table(spark, centroids_table)
    cvec.write.mode("overwrite").saveAsTable(centroids_table)
    mark_engine_dir(spark, centroids_table)  # ownership proof (pass 5 #3)
    _drop_managed_table(spark, assignments_table)
    # The BUILD-TIME centroid-distance baseline (the IVF drift gate's
    # reference — ``ann_index_drift``) is recorded UNCONDITIONALLY:
    # every build leaves a catalog-visible ann_assignments_* table the
    # scheduled ``reindex --when-drifted`` sweep will find — a
    # baseline-less family would make every sweep exit nonzero with no
    # operator remedy (r13 review pass 2, finding 2). Since r17 the
    # baseline aggregate is FOLDED INTO the assignments write itself
    # via ``observe`` (CollectMetrics): the displacement column rides
    # the write plan (a broadcast join against the tiny just-written
    # centroid table, dropped before the sink) and the rounded mean
    # falls out of the same pass — the separate post-write
    # ``_mean_cdist_row`` scan of the full assignments (one whole extra
    # corpus pass per build; guide §1.2 "don't compute things you throw
    # away") is gone. Arithmetic is the exact ``_mean_cdist_row``
    # expression — zip_with squared-diff sequential fold, avg rounded
    # to 6 — so the sidecar value matches a recompute bit for bit; the
    # LEFT join + count of matched rows reproduces the inner-join
    # population without being able to drop (or duplicate) written
    # rows.
    from pyspark.sql import Observation

    obs = Observation()
    acols = [F.col(f"a.{c}") for c in assigned.columns]
    cfrozen = F.broadcast(spark.table(centroids_table)).alias("c")
    dist2 = F.aggregate(
        F.zip_with("a.v", "c.v", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    observed = (
        assigned.alias("a")
        .join(cfrozen, F.col("a.label") == F.col("c.label"), "left")
        .select(
            *acols,
            dist2.alias("_cdist2"),
            F.col("c.label").alias("_matched"),
        )
        .observe(
            obs,
            (F.round(F.avg("_cdist2"), 6) + 0.0).alias("mean_cdist"),
            F.count("_matched").alias("n_rows"),
        )
        .drop("_cdist2", "_matched")
    )
    (
        # cluster by the partition column before the partitioned write:
        # unclustered partitionBy emits |input partitions| x |labels|
        # small files (the classic small-file explosion — at corpus
        # scale that is millions of KB files and a metadata-bound read
        # path); one hash shuffle on label collapses it to ~1 file per
        # inverted list, which is also the read unit a probe prunes to
        observed.repartition("label")
        .write.mode("overwrite")
        .partitionBy("label")
        .saveAsTable(assignments_table)
    )
    # empty-build fallback: a zero-task write posts no metrics row
    # (testdata.observed_row) — re-derive over the (empty) table, the
    # pre-fold recompute semantics
    m = _observed_row(
        obs,
        lambda: _mean_cdist_row(
            spark, spark.table(assignments_table), centroids_table
        ),
    )
    _write_cstats_sidecar(
        spark, assignments_table, m["mean_cdist"], m["n_rows"]
    )


def ensure_ann_index(
    spark: SparkSession,
    e: DataFrame | Callable[[], DataFrame],
    *,
    centroids_table: str,
    assignments_table: str,
    job_group: str,
    gc_suffix: str | None = None,
    quantizer: str = "trained",
) -> None:
    """Build the persisted IVF index if absent — probing BOTH tables of
    the family, not just the assignments: a crashed compaction swap
    (index_maintenance.py's drop-to-rename window) can lose the
    centroid table while the assignments survive, and an
    assignments-only probe would then skip the rebuild and leave every
    serve throwing TABLE_OR_VIEW_NOT_FOUND on the centroids until the
    next maintenance sweep resumes the swap. ``build_ann_index`` writes
    ``mode("overwrite")``, so a partial rebuild replaces the survivor.
    Runs under its own job group so bench stage counts show the serve
    path only (the ``ensure_text_index``/``ensure_pq_index``
    convention).

    ``e`` may be a zero-arg callable producing the corpus DataFrame: a
    serve path whose steady state never touches the corpus passes a
    thunk so the ``spark.read.parquet`` footer job (a real 1-task Spark
    job at DataFrame-construction time, not action time) is paid only
    when a build actually runs — the r10 eager-argument refactor made
    every ``dedup_semantic_served`` call schedule that job, the bench's
    4->5 stage-count anomaly (r10 verdict What's wrong #3; pinned by
    ``test_semantic_served_steady_state_no_corpus_read``).

    ``gc_suffix``: when the caller keys its table names on a
    fingerprinted ``index_suffix``, passing that suffix drops the
    superseded-fingerprint siblings inside the build branch (the
    ``ensure_pq_index`` GC posture; r11 review — each corpus
    regeneration would otherwise leak a full index copy)."""
    from dbt_on_snowflake_spark.testdata import ensure_index_tables

    ensure_index_tables(
        spark,
        tables=(assignments_table, centroids_table),
        job_group=job_group,
        gc_prefixes=(
            "ann_centroids_",
            "ann_assignments_",
            "ann_tombstones_",
        ),
        gc_suffix=gc_suffix,
        build=lambda: build_ann_index(
            spark,
            e() if callable(e) else e,
            centroids_table=centroids_table,
            assignments_table=assignments_table,
            quantizer=quantizer,
        ),
    )


@query(
    "ann_ivf_multiprobe_indexed",
    oracle=None,  # set post-hoc: _set_trained_ivf_oracles()
)
def ann_ivf_multiprobe_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_ivf_multiprobe`` served from the PERSISTED index: trained
    cells and cell-partitioned assignments are read from saved tables — the
    query plan's only pass over the embeddings parquet is the (bounded,
    broadcast) query-vector filter; no centroid recomputation anywhere
    (plan-pinned by ``test_ann_indexed_no_centroid_recompute``). Shares
    the recompute path's oracle: persisting the index must not change a
    single result row."""
    import hashlib

    suffix = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    centroids_table = f"ann_centroids_{suffix}"
    assignments_table = f"ann_assignments_{suffix}"
    e = _vectors(spark, sf_dir)
    build_ann_index(
        spark,
        e,
        centroids_table=centroids_table,
        assignments_table=assignments_table,
    )
    q = F.broadcast(e.filter(F.expr(_QUERY_PRED))).alias("q")
    cvec = spark.table(centroids_table)
    corpus = _live_assignments(spark, assignments_table).select(
        "vec_id", "label", "v"
    )
    return _multiprobe_topk(q, cvec, corpus)


# ------------------------------------------------- incremental index append

# Deterministic corpus/new-batch split for the registered query: every
# 10th vector arrives "later" and is appended against the index built
# from the rest.
_NEW_BATCH_PRED = "vec_id % 10 = 9"
_CORPUS_PRED = "vec_id % 10 <> 9"


def _drop_already_indexed(
    spark: SparkSession, new_e: DataFrame, index_table: str
) -> DataFrame:
    """The ONE at-least-once idempotence probe every index append uses
    (r16 review finding 2 — it existed as three verbatim copies across
    the IVF / PQ / IVFPQ appends, where a future fix to the snapshot
    semantics applied to one copy would leave the others replaying
    duplicates): vec_ids the index already holds are dropped via a
    broadcast join streaming only the index's vec_id column, read
    through a FILE-LIST SNAPSHOT (driver-side metadata listing) so the
    lazily returned batch rows stay stable when re-evaluated after the
    caller's own append lands — a table-name read would re-run the
    probe against the grown index and filter the batch out of its own
    result. No index-side shuffle; a fully re-delivered batch comes
    back empty."""
    from dbt_on_snowflake_spark.engine.fs import fs_list_files
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        table_location,
    )

    snap = fs_list_files(spark, table_location(spark, index_table))
    if not snap:
        return new_e
    dup_ids = (
        spark.read.parquet(*snap)
        .select("vec_id")
        .join(F.broadcast(new_e.select("vec_id")), "vec_id")
    )
    return new_e.join(F.broadcast(dup_ids), "vec_id", "left_anti")


def ann_index_append(
    spark: SparkSession,
    new_e: DataFrame,
    *,
    centroids_table: str,
    assignments_table: str,
) -> DataFrame:
    """Append NEW embeddings to a persisted IVF index built by
    ``build_ann_index`` — the incremental-maintenance path a 100 TB
    embedding store runs per ingest batch, mirroring
    ``dedup_incremental_candidates``'s probe-then-grow contract:

    - assignment = nearest FROZEN trained cell by rounded squared L2,
      lowest-cell tie-break — the SAME ``_assign_cells`` convention the
      build uses (r17: the append and the build share one assignment
      kernel, so an append converges bit-exactly to a rebuild against
      the same frozen cells — the ``ivfpq_index_append`` contract).
      The bounded persisted cell table rides in as a driver-side
      closure onto one narrow Arrow map over the batch; the corpus
      embeddings are NEVER re-read and the cells are NEVER retrained
      (plan-pinned by ``test_ann_incremental_no_corpus_repass``);
    - the new (vec_id, label, vlabel, v) rows land in the
      cell-partitioned assignments table via dynamic partition append —
      only the probed partitions gain files, existing partitions are
      untouched;
    - per-batch cost is O(|batch| x n_cells), independent of corpus
      size. Cell REFRESH (recomputing means from the grown assignments
      table) is a separate periodic offline job — exposed as
      ``refresh_centroids`` below, reading the assignments TABLE,
      still never the raw parquet.

    The batch is first made IDEMPOTENT (at-least-once ingest: a stream
    retry or checkpoint-less restart re-delivers vectors the index
    already holds): vec_ids already assigned are dropped via a
    broadcast join streaming only the index's vec_id column plus a
    broadcast anti-join back onto the batch — the
    ``text_index_append`` probe shape, no index-side shuffle, and a
    fully re-delivered batch appends nothing
    (``test_ann_index_append_replay_is_noop``). The probe reads the
    index through a FILE-LIST SNAPSHOT (driver-side metadata listing),
    so the lazily returned assignment rows stay stable when they are
    re-evaluated after this call's own append lands — a table-name
    read would re-run the probe against the grown index and filter the
    batch out of its own result.

    Requires a TRAINED-quantizer family (the only kind with an append
    lifecycle; label-blocked dedup families never append — their block
    key arrives pre-assigned). Returns the assignment rows
    (vec_id, assigned_label, l2sq)."""
    if "vlabel" not in spark.table(assignments_table).columns:
        raise ValueError(
            f"{assignments_table} is a label-quantizer (blocking) family;"
            " ann_index_append requires a trained-cell index"
        )
    new_e = _drop_already_indexed(spark, new_e, assignments_table)

    frozen_cells = [
        (int(r.label), list(r.v))
        for r in spark.table(centroids_table).collect()  # bounded: K x D
    ]
    assigned = _assign_cells(
        new_e.select("vec_id", F.col("label").alias("vlabel"), "v"),
        frozen_cells,
        with_dist=True,
    )
    (
        assigned.select("vec_id", "label", "vlabel", "v")
        # cluster by label before the partitioned append (see
        # build_ann_index): per-batch appends otherwise compound the
        # small-file count by |input partitions| x |labels| every batch
        .repartition("label")
        .write.mode("append")
        .partitionBy("label")
        .saveAsTable(assignments_table)
    )
    return assigned.select(
        "vec_id",
        F.col("label").alias("assigned_label"),
        F.col("d").alias("l2sq"),
    )


def refresh_centroids(spark: SparkSession, *, centroids_table: str,
                      assignments_table: str) -> None:
    """Periodic centroid refresh from the GROWN assignments table (never
    the raw embeddings parquet): recompute per-cell means of the LIVE
    assignments and overwrite the tiny centroid table in place.

    Semantics per quantizer: for a label-blocked family the block key
    is fixed, so this is simply the up-to-date per-label mean. For a
    TRAINED family it is one Lloyd half-step — cells recenter on their
    current population, assignments keep their cell ids (vectors are
    NOT reassigned; the cell-partitioned layout is a physical fact,
    rewriting it is a rebuild). Probes then rank the recentered cells
    — the same refresh-without-reassign posture as the IVFPQ family's
    drift retrain (COVERAGE.md, aps ledger entry); a full retrain +
    re-layout is ``build_ann_index`` over the corpus of record."""
    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table

    # live rows only: a tombstoned vector must not keep pulling the
    # refreshed centroids toward itself (engine/index_delete.py)
    e = _live_assignments(spark, assignments_table).select(
        "vec_id", "label", "v"
    )
    from dbt_on_snowflake_spark.engine.index_delete import (
        mark_engine_dir,
    )

    fresh = _centroid_vectors(e)
    _drop_managed_table(spark, centroids_table)
    fresh.write.mode("overwrite").saveAsTable(centroids_table)
    mark_engine_dir(spark, centroids_table)
    # the refresh is the IVF family's retrain: re-record the drift
    # baseline against the fresh centroids so the gate re-arms
    # (``ann_index_drift``/``reindex_ann_when_drifted``)
    _write_ann_cstats(
        spark,
        centroids_table=centroids_table,
        assignments_table=assignments_table,
    )


@query(
    "ann_incremental_assign",
    driver=False,  # born r6: parity-checked; rotate into the r7 export
    oracle=None,  # set post-hoc: _set_trained_ivf_oracles() — the cc
    # Lloyd chain trained on the corpus slice (frozen cells) + the casg
    # nearest-cell assignment over the held-out batch
)
def ann_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered incremental-append exercise: build the IVF index from
    the corpus slice (vec_id %% 10 != 9) — training the coarse cells on
    that slice's bounded sample — then append the held-out batch via
    ``ann_index_append`` against the FROZEN trained cells. The returned
    (vec_id, assigned_label, l2sq) assignments are oracle-checked
    against DuckDB's mirrored Lloyd chain + nearest-cell recompute; the
    append itself is verified by
    ``test_ann_index_append_grows_only_new_partition_rows``."""
    import hashlib

    suffix = hashlib.md5(f"incr:{sf_dir}".encode()).hexdigest()[:8]
    centroids_table = f"ann_centroids_{suffix}"
    assignments_table = f"ann_assignments_{suffix}"
    e = _vectors(spark, sf_dir)
    build_ann_index(
        spark,
        e.filter(F.expr(_CORPUS_PRED)),
        centroids_table=centroids_table,
        assignments_table=assignments_table,
    )
    return ann_index_append(
        spark,
        e.filter(F.expr(_NEW_BATCH_PRED)),
        centroids_table=centroids_table,
        assignments_table=assignments_table,
    )


# --------------------------------------------------- semantic (SemDeDup)

SEM_THRESHOLD = 0.35  # within-cluster cosine above which vectors are dups


@query(
    "dedup_semantic",
    headline=True,  # r7: the most expensive r6-born shape (index build +
    # label-blocked self-join) — regressions in the IVF/semantic path
    # must be visible in the per-round bench
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
        SELECT label, dim, ROUND(SUM(val) / COUNT(*), 4) + 0.0 AS cv
        FROM (
            SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS dim
            FROM e
        )
        GROUP BY label, dim
    ),
    cvec AS (SELECT label, list(cv ORDER BY dim) AS v FROM cent GROUP BY label),
    scored AS (
        SELECT e.vec_id, e.label, e.v,
               ROUND({COSINE_SQL.format(a="e.v", b="c.v")}, 4) + 0.0 AS ccos
        FROM e JOIN cvec c ON e.label = c.label
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id
        FROM scored a
        JOIN scored b ON a.label = b.label
         AND (a.ccos < b.ccos OR (a.ccos = b.ccos AND a.vec_id < b.vec_id))
         AND ROUND({COSINE_SQL.format(a="a.v", b="b.v")}, 4) >= {SEM_THRESHOLD}
    )
    SELECT s.vec_id, s.label, s.ccos, d.vec_id IS NULL AS kept
    FROM scored s LEFT JOIN dropped d ON s.vec_id = d.vec_id
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC (cluster-level) dedup, SemDeDup-shaped — the operator
    large corpus curation actually runs: compose the persisted IVF index
    (coarse clusters + centroid table from ``build_ann_index``) with
    WITHIN-cluster cosine pruning, emitting a keep/drop decision per
    vector.

    Keep rule (deterministic, engine-portable): order each cluster by
    (centroid-cosine ASC, vec_id ASC) — most-diverse-first, SemDeDup's
    keep-the-low-centroid-similarity preference — and drop a vector iff
    some EARLIER vector in its cluster has cosine >= SEM_THRESHOLD with
    it. This is the parallel one-pass relaxation of SemDeDup's
    sequential greedy scan: no ordering dependence between drops, so it
    is a pure self-join instead of an inherently serial fold.

    Scale: clusters are IVF cells (~sqrt(N) of them), so the pair join
    is label-blocked — never all-pairs; the centroid table is tiny and
    broadcast; the assignments side arrives label-partitioned from the
    persisted index, so the self-join co-locates by partition key. The
    pair count per cell is the SemDeDup working set by construction
    (cells cap it at |cell|^2, with |cell| ~ sqrt(N))."""
    import hashlib

    suffix = hashlib.md5(f"sem:{sf_dir}".encode()).hexdigest()[:8]
    centroids_table = f"ann_centroids_{suffix}"
    assignments_table = f"ann_assignments_{suffix}"
    e = _vectors(spark, sf_dir)
    # label quantizer BY CONTRACT (r17, VERDICT r16 Next #2 option (b)
    # for dedup): SemDeDup blocking compares within pre-assigned cells
    # — at 100 TB the block key is a learned/assigned centroid id
    # arriving with the ingest (ann_semantic_ingest_streaming's shape);
    # the oracle mirrors the same blocking, so this is a deterministic
    # partition contract, not a recall claim. Similarity-ranking serves
    # use the TRAINED quantizer (build_ann_index's default).
    build_ann_index(
        spark,
        e,
        centroids_table=centroids_table,
        assignments_table=assignments_table,
        quantizer="label",
    )
    return _semantic_prune(spark, centroids_table, assignments_table)


def _round4_away(x):
    """numpy half-up-away-from-zero rounding to 4 decimals on the
    1e4-scaled value — C/DuckDB ROUND semantics, matching the engine's
    F.round contract on this data (see _pq_encode_arrow)."""
    import numpy as np

    return np.copysign(np.floor(np.abs(x) * 10000.0 + 0.5), x) / 10000.0 + 0.0


def _semantic_prune_arrow(
    spark: SparkSession, centroids_table: str, assignments_table: str
) -> DataFrame:
    """Per-cell vectorized serve path (r8): ONE shuffle (groupBy label)
    + an applyInPandas kernel that scores and prunes each IVF cell in
    numpy — replacing the broadcast-join + pair self-join + distinct +
    join-back pipeline (4 exchanges, interpreted per-pair HOF cosines)
    with the SemDeDup-canonical per-cluster matrix computation. Same
    arithmetic contract as the HOF path: sequential-fold dots (cumsum),
    dot/(na*nb) operation order, away-from-zero half-up rounding,
    (ccos, vec_id) ordering, drop iff an earlier row's rounded cosine
    >= SEM_THRESHOLD (`test_semantic_kernels_agree`).

    Memory posture: pairwise cosines are computed in fixed 256x256 row
    blocks (block x block x dim float64 ~= 33 MB at dim 64), so a cell
    larger than memory still streams; the centroid table rides into the
    UDF as a bounded driver-side closure (|cells| x dim — the same
    payload the HOF path broadcasts)."""
    import numpy as np

    cents = {
        int(r.label): np.asarray(r.v, dtype=np.float64)
        for r in spark.table(centroids_table).collect()
    }
    a = _live_assignments(spark, assignments_table).select(
        "vec_id", "label", "v"
    )
    label_field = a.schema["label"]
    out_schema = (
        f"vec_id long, label {label_field.dataType.simpleString()}, "
        "ccos double, kept boolean"
    )
    thr = float(SEM_THRESHOLD)
    BLK = 256

    def prune(pdf):
        import pandas as pd

        V = np.stack(pdf["v"].to_numpy())
        c = cents[int(pdf["label"].iloc[0])]
        vv = np.cumsum(V * V, axis=1)[:, -1]
        norms = np.sqrt(vv)
        cnorm = np.sqrt(np.cumsum(c * c)[-1])
        dot_c = np.cumsum(V * c[None, :], axis=1)[:, -1]
        ccos = _round4_away(dot_c / (norms * cnorm))
        ids = pdf["vec_id"].to_numpy()
        order = np.lexsort((ids, ccos))  # (ccos, vec_id) ascending
        Vo, no = V[order], norms[order]
        n = len(order)
        dropped_o = np.zeros(n, dtype=bool)
        for j0 in range(1, n, BLK):
            j1 = min(j0 + BLK, n)
            for i0 in range(0, j1, BLK):
                i1 = min(i0 + BLK, j1)
                # sequential-fold pairwise dots for the (i, j) block
                d = np.cumsum(
                    Vo[i0:i1, None, :] * Vo[None, j0:j1, :], axis=2
                )[:, :, -1]
                cos = _round4_away(
                    d / (no[i0:i1, None] * no[None, j0:j1])
                )
                hit = cos >= thr
                # only strictly-earlier rows drop a later one
                ii = np.arange(i0, i1)[:, None]
                jj = np.arange(j0, j1)[None, :]
                dropped_o[j0:j1] |= (hit & (ii < jj)).any(axis=0)
        kept = np.ones(len(ids), dtype=bool)
        kept[order] = ~dropped_o
        return pd.DataFrame(
            {
                "vec_id": ids,
                "label": pdf["label"].to_numpy(),
                "ccos": ccos,
                "kept": kept,
            }
        )

    return a.groupBy("label").applyInPandas(prune, out_schema)


def _semantic_prune(
    spark: SparkSession,
    centroids_table: str,
    assignments_table: str,
    kernel: str | None = None,
) -> DataFrame:
    """The SERVE path of semantic dedup: within-cluster cosine pruning
    over an already-persisted IVF index — no index construction (the
    100 TB operating mode, where the index is built once and reused
    across curation runs). ``kernel`` (default $SPARK_GRAFT_SEM_KERNEL,
    else 'arrow') selects the per-cell vectorized applyInPandas kernel
    or the r7 join pipeline ('hof'); both produce identical rows."""
    import os as _os

    kernel = kernel or _os.environ.get("SPARK_GRAFT_SEM_KERNEL", "arrow")
    if kernel == "arrow":
        return _semantic_prune_arrow(spark, centroids_table, assignments_table)
    if kernel != "hof":
        raise ValueError(f"unknown semantic kernel {kernel!r}")
    cvec = F.broadcast(spark.table(centroids_table)).alias("c")
    a = _live_assignments(spark, assignments_table).select(
        "vec_id", "label", "v"
    )
    scored = (
        a.alias("e")
        .join(cvec, "label")
        .select(
            F.col("e.vec_id").alias("vec_id"),
            "label",
            F.col("e.v").alias("v"),
            (F.round(_cosine("e.v", "c.v"), 4) + 0.0).alias("ccos"),
        )
    )
    sa, sb = scored.alias("a"), scored.alias("b")
    earlier = (F.col("a.ccos") < F.col("b.ccos")) | (
        (F.col("a.ccos") == F.col("b.ccos"))
        & (F.col("a.vec_id") < F.col("b.vec_id"))
    )
    dropped = (
        sa.join(
            sb,
            (F.col("a.label") == F.col("b.label"))
            & earlier
            & (F.round(_cosine("a.v", "b.v"), 4) >= SEM_THRESHOLD),
        )
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        scored.join(dropped.alias("d"), "vec_id", "left")
        .select(
            "vec_id",
            "label",
            "ccos",
            F.col("d.vec_id").isNull().alias("kept"),
        )
    )


@query(
    "dedup_semantic_served",
    driver=False,  # shares dedup_semantic's oracle; parity-verified
    headline=True,  # r8: the serve-path bench twin — dedup_semantic's
    # headline number conflates index build with dedup; this one reuses
    # the persisted index so serve-path regressions aren't masked
    oracle=None,  # set below: shares dedup_semantic's oracle verbatim
)
def dedup_semantic_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_semantic`` in its 100 TB operating mode: the IVF index is
    persisted (built once on first call, under its own job group so
    bench stage counts show the serve path only) and every subsequent
    call is just the within-cluster prune — broadcast centroids + one
    label-blocked self-join over the already-partitioned assignments."""
    from dbt_on_snowflake_spark.testdata import index_suffix

    # fingerprinted suffix: a regenerated corpus rotates the tables
    # (rebuild, not stale serve) and the old pair is GC'd at build
    suffix = index_suffix(spark, sf_dir, "semserved", "embeddings")
    centroids_table = f"ann_centroids_{suffix}"
    assignments_table = f"ann_assignments_{suffix}"
    # thunk, not DataFrame: steady-state serves must not pay the
    # corpus parquet footer job (stage A/B, r10 verdict Next #2)
    ensure_ann_index(
        spark,
        lambda: _vectors(spark, sf_dir),
        centroids_table=centroids_table,
        assignments_table=assignments_table,
        job_group="dedup_semantic_served",
        gc_suffix=suffix,
        quantizer="label",  # blocking contract (see dedup_semantic)
    )
    return _semantic_prune(spark, centroids_table, assignments_table)


def _set_semantic_served_oracle() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    QUERIES["dedup_semantic_served"].oracle = QUERIES["dedup_semantic"].oracle


_set_semantic_served_oracle()


def _semantic_deleted_oracle() -> str:
    """``dedup_semantic``'s oracle with the PRUNE side restricted to
    the surviving vectors while the centroid CTE stays over the FULL
    corpus — exactly the frozen-at-build posture the engine serves
    (centroids are the IVF codebook; a delete never retrains them,
    the drift gate decides that)."""
    from dbt_on_snowflake_spark.registry import QUERIES

    base = QUERIES["dedup_semantic"].oracle
    needle = "FROM e JOIN cvec c ON e.label = c.label"
    out = base.replace(
        needle,
        f"FROM (SELECT * FROM e WHERE {_CORPUS_PRED}) e "
        "JOIN cvec c ON e.label = c.label",
    )
    assert out != base
    return out


@query(
    "dedup_semantic_deleted",
    driver=False,  # r13-born: R14_ROTATE_IN
    oracle=_semantic_deleted_oracle(),
)
def dedup_semantic_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_semantic`` served AFTER a delete (r12 verdict, Next #5 —
    the semantic serve path had no registered delete proof): the IVF
    index is built from the FULL corpus (centroids frozen from
    everything), every 10th vector is then deleted via
    ``ann_index_delete`` (tombstones only, no rewrite), and the
    within-cluster prune over the gated assignments must match the
    oracle that recomputes the dedup over ONLY the surviving vectors —
    against the same full-corpus centroids. Deleted vectors must
    disappear from the output AND stop suppressing near-duplicate
    survivors they previously outranked (the resurrection-adjacent
    failure mode a row-filter alone would miss). Rebuilt from scratch
    each call — the build+delete verification posture of
    ``ann_pq_adc_deleted``; the steady-state serve cost is benched by
    ``dedup_semantic_served``."""
    import hashlib

    suffix = hashlib.md5(f"semdel:{sf_dir}".encode()).hexdigest()[:8]
    centroids_table = f"ann_centroids_semdel_{suffix}"
    assignments_table = f"ann_assignments_semdel_{suffix}"
    e = _vectors(spark, sf_dir)
    # the build resets the family's tombstone slate (builder contract)
    build_ann_index(
        spark,
        e,
        centroids_table=centroids_table,
        assignments_table=assignments_table,
        quantizer="label",  # blocking contract (see dedup_semantic)
    )
    ann_index_delete(
        spark,
        e.filter(F.expr(_NEW_BATCH_PRED)).select("vec_id"),
        assignments_table=assignments_table,
    )
    return _semantic_prune(spark, centroids_table, assignments_table)


def _semantic_greedy_prune(e: DataFrame, cvec: DataFrame) -> DataFrame:
    """Per-cell SEQUENTIAL greedy prune (the literal SemDeDup scan):
    rows ordered by (centroid-cosine ASC, vec_id ASC); a row is kept iff
    no ALREADY-KEPT earlier row has rounded cosine >= SEM_THRESHOLD with
    it. Differs from dedup_semantic's one-pass relaxation exactly on
    similarity chains (a~b, b~c, a!~c: the relaxation drops b AND c, the
    greedy keeps c because its only similar predecessor b was itself
    dropped) — `test_semantic_greedy_vs_relaxation_chain` pins the
    difference. Same arithmetic contract as every cosine kernel here
    (cumsum sequential folds, dot/(na*nb), half-up rounding).

    The scan is BLOCK-VECTORIZED: cosine columns for each 256-row block
    are built in one chunked cumsum pass (the heavy numpy work), and
    the inherently sequential keep decisions then run over the
    precomputed block as O(prefix) boolean reductions — no per-row
    kernel invocations. O(|cell|^2 x dim) compute like the relaxation's
    pair join, O(|cell| x block) matrix memory — cells are IVF-sized
    (~sqrt(N)) by construction, the same bound the pair-join relaxation
    relies on."""
    import numpy as np

    cents = {
        int(r.label): np.asarray(r.v, dtype=np.float64)
        for r in cvec.collect()  # bounded: |cells| rows
    }
    label_field = e.schema["label"]
    out_schema = (
        f"vec_id long, label {label_field.dataType.simpleString()}, "
        "ccos double, kept boolean"
    )
    thr = float(SEM_THRESHOLD)
    BLK = 256

    def prune(pdf):
        import pandas as pd

        V = np.stack(pdf["v"].to_numpy())
        c = cents[int(pdf["label"].iloc[0])]
        vv = np.cumsum(V * V, axis=1)[:, -1]
        norms = np.sqrt(vv)
        cnorm = np.sqrt(np.cumsum(c * c)[-1])
        dot_c = np.cumsum(V * c[None, :], axis=1)[:, -1]
        ccos = _round4_away(dot_c / (norms * cnorm))
        ids = pdf["vec_id"].to_numpy()
        order = np.lexsort((ids, ccos))
        Vo, no = V[order], norms[order]
        n = len(order)
        kept_o = np.zeros(n, dtype=bool)
        for j0 in range(0, n, BLK):
            j1 = min(j0 + BLK, n)
            # all-rows x block cosine columns, chunked so the elementwise
            # product stays ~8 MB whatever the cell size
            M = np.empty((j1, j1 - j0), dtype=np.float64)
            for i0 in range(0, j1, BLK):
                i1 = min(i0 + BLK, j1)
                d = np.cumsum(
                    Vo[i0:i1, None, :] * Vo[None, j0:j1, :], axis=2
                )[:, :, -1]
                M[i0:i1] = _round4_away(
                    d / (no[i0:i1, None] * no[None, j0:j1])
                )
            for j in range(j0, j1):
                col = M[:j, j - j0]
                if not (col[kept_o[:j]] >= thr).any():
                    kept_o[j] = True
        kept = np.zeros(len(ids), dtype=bool)
        kept[order] = kept_o
        return pd.DataFrame(
            {
                "vec_id": ids,
                "label": pdf["label"].to_numpy(),
                "ccos": ccos,
                "kept": kept,
            }
        )

    return e.select("vec_id", "label", "v").groupBy("label").applyInPandas(
        prune, out_schema
    )


@query(
    "dedup_semantic_greedy",
    driver=False,  # r8-born: rotates into the r9 driver export
    oracle=f"""
    WITH RECURSIVE e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cent AS (
        SELECT label, dim, ROUND(SUM(val) / COUNT(*), 4) + 0.0 AS cv
        FROM (
            SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS dim
            FROM e
        )
        GROUP BY label, dim
    ),
    cvec AS (SELECT label, list(cv ORDER BY dim) AS v FROM cent GROUP BY label),
    scored AS (
        SELECT e.vec_id, e.label, e.v,
               ROUND({COSINE_SQL.format(a="e.v", b="c.v")}, 4) + 0.0 AS ccos
        FROM e JOIN cvec c ON e.label = c.label
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY label ORDER BY ccos ASC, vec_id ASC
        ) AS rnk
        FROM scored
    ),
    g AS (
        SELECT label, 0::BIGINT AS rnk, []::BIGINT[] AS kept_ids
        FROM (SELECT DISTINCT label FROM ranked)
        UNION ALL
        SELECT r.label, g.rnk + 1,
               CASE WHEN EXISTS (
                    SELECT 1 FROM ranked k
                    WHERE k.label = r.label
                      AND list_contains(g.kept_ids, k.vec_id)
                      AND ROUND({COSINE_SQL.format(a="k.v", b="r.v")}, 4)
                          >= {SEM_THRESHOLD}
               ) THEN g.kept_ids
               ELSE list_append(g.kept_ids, r.vec_id) END
        FROM g JOIN ranked r ON r.label = g.label AND r.rnk = g.rnk + 1
    ),
    final_g AS (
        SELECT label, kept_ids FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY label ORDER BY rnk DESC
            ) AS rr FROM g
        ) WHERE rr = 1
    )
    SELECT s.vec_id, s.label, s.ccos,
           list_contains(f.kept_ids, s.vec_id) AS kept
    FROM scored s JOIN final_g f ON f.label = s.label
    """,
)
def dedup_semantic_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-sequential SemDeDup (the paper's greedy scan, not the
    parallel relaxation): per IVF cell, walk rows most-diverse-first and
    keep each row unless an already-KEPT predecessor is similar. The
    inherently sequential keep-set recursion runs inside a per-cell
    applyInPandas kernel (one groupBy exchange); the DuckDB oracle
    replays the identical recursion as a recursive CTE over per-cell
    rank, so the transitive-chain semantics — where greedy and
    relaxation genuinely differ — are hash-checked across engines."""
    e = _vectors(spark, sf_dir)
    return _semantic_greedy_prune(e, _centroid_vectors(e))


# ---------------------------------------------------- int8 quantization

QUANT_LEVELS = 127  # symmetric int8 range


@query(
    "ann_quantize_int8",
    driver=False,  # born r6: parity-checked; rotate into the r7 export
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    s AS (
        SELECT vec_id, v,
               greatest(list_max(list_transform(v, x -> abs(x))), 1e-12)
                   / {QUANT_LEVELS} AS scale
        FROM e
    ),
    q AS (
        SELECT vec_id, scale,
               list_transform(v, x -> CAST(ROUND(x / scale) AS INTEGER)) AS qv,
               v
        FROM s
    )
    SELECT vec_id,
           ROUND(scale, 6) + 0.0 AS scale,
           md5(array_to_string(qv, '|')) AS q_md5,
           ROUND(sqrt(greatest(
               list_dot_product(v, v)
               - 2 * scale * list_dot_product(v, qv::DOUBLE[])
               + scale * scale * list_dot_product(qv::DOUBLE[], qv::DOUBLE[]),
               0.0)), 4) + 0.0 AS l2_error
    FROM q
    """,
)
def ann_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector INT8 quantization of the embedding column —
    the storage/bandwidth path a 100 TB ANN deployment actually serves
    from (4x smaller than float32, 8x smaller than the float64 compute
    form; IVF distance kernels run on int8 with one dequant multiply).
    Per vector: scale = max|v|/127, q_i = round(v_i/scale); emitted as a
    content hash plus the exact reconstruction L2 error so the oracle
    checks VALUES, not just shapes. Pure narrow map on the scan — zero
    shuffle at any scale; zero vectors guarded by the 1e-12 floor."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    maxabs = F.array_max(F.transform("v", lambda x: F.abs(x)))
    scale = F.greatest(maxabs, F.lit(1e-12)) / QUANT_LEVELS
    s = e.select("vec_id", "v", scale.alias("scale"))
    qv = F.transform(
        "v", lambda x: F.round(x / F.col("scale")).cast("int")
    )
    q = s.select(
        "vec_id",
        "scale",
        "v",
        qv.alias("qv"),
        qv.cast("array<double>").alias("qd"),
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # dot-product formulation (||v||^2 - 2s·(v.q) + s^2·||q||^2): the
    # same sequential-fold / list_dot_product pairing every cosine
    # operator already parity-matches — elementwise square-and-sum
    # drifted from DuckDB's list_sum at the 1e-6 bit level
    err_sq = F.greatest(
        dot(F.col("v"), F.col("v"))
        - 2 * F.col("scale") * dot(F.col("v"), F.col("qd"))
        + F.col("scale") * F.col("scale") * dot(F.col("qd"), F.col("qd")),
        F.lit(0.0),
    )
    return q.select(
        "vec_id",
        (F.round("scale", 6) + 0.0).alias("scale"),
        F.md5(F.array_join("qv", "|")).alias("q_md5"),
        (F.round(F.sqrt(err_sq), 4) + 0.0).alias("l2_error"),
    )


# ------------------------------------------------------ recall evaluation

@query(
    "ann_recall_eval",
    driver=False,  # born r7: parity-checked; rotate into the r8 export
    oracle=None,  # set post-hoc: _set_trained_ivf_oracles() — the IVF
    # leg now rides the trained-cell multiprobe (r17), so the oracle
    # composes the cc Lloyd chain + casg into the recall comparison
)
def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL@K EVALUATION of the IVF multiprobe index against exact
    brute force — the acceptance gate every approximate index ships
    behind ('is nprobe=2 recall good enough to deploy'). Per query: the
    overlap count of the two top-K sets and its recall fraction.

    Plan: both retrievals run as their own (already plan-audited)
    shapes; the comparison is a join on (query_id, neighbor_id) over
    two K x |queries| tables — negligible next to retrieval. The same
    pattern evaluates ANY index variant against the exact baseline."""
    b = ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    i = ann_ivf_multiprobe(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        b.join(i, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    qs = (
        _vectors(spark, sf_dir)
        .filter(F.expr(_QUERY_PRED))
        .select(F.col("vec_id").alias("query_id"))
    )
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / TOP_K,
                4,
            )
            + F.lit(0.0)
        ).alias("recall_at_k"),
    )


# ------------------------------------------------------ product quantization
#
# PQ splits each vector into PQ_M contiguous subvectors and encodes every
# subvector as the id of its nearest codebook entry — D floats become
# PQ_M small ints (here 64 doubles -> 4 codes: a 128x serving-format
# shrink). Search then never touches the original vectors: a query
# precomputes its dot product against every codebook entry once (the
# "lookup table"), and each corpus vector's approximate score is PQ_M
# table lookups + adds — the asymmetric distance computation (ADC) from
# Jegou et al., "Product Quantization for Nearest Neighbor Search"
# (TPAMI 2011). Codebook training (upgraded r15, VERDICT r14 Next #1):
# K = |labels| + PQ_LLOYD_EXTRA entries per subspace, refined with
# PQ_LLOYD_ITERS deterministic in-subspace Lloyd (k-means) iterations.
# The r7-r14 convention — entries = the per-`label` subvector means —
# is exactly this codebook's SEED (iteration 0), kept as entries
# 0..L-1; it gave every same-label vector identical codes, so raw ADC
# could not rank within a cell (measured recall@5 0.05, SCALING.md).
# Extra seeds come from a deterministic strided sample of the corpus
# (Forgy init on the lowest-vec_id PQ_TRAIN_CAP prefix), every step
# rounds to 4 decimals with explicit tie-breaks, and the whole
# iteration is mirrored CTE-for-CTE in the DuckDB oracle
# (_pq_lloyd_sql) — so both engines still derive bit-identical
# codebooks, now with within-cell resolution (K > |cells| splits each
# cell's residual variance across entries).

PQ_M = 4  # subspaces
# Lloyd entries beyond the |labels| mean seeds: K = |labels| + EXTRA.
# Sized empirically on the clustered quality corpus (test_ann_quality):
# vs the DOT-product truth ADC approximates, recall@5 went 0.12 (label
# means) -> 0.22 (K=32) -> 0.40 (K=64), saturating there (K=96: 0.38);
# against the COSINE truth K=64 reaches 0.30 vs the 0.32 ceiling that
# EXACT dot scoring gets on that corpus — i.e. the codebook now
# expresses nearly everything an inner-product ADC can, and the
# residual is the dot-vs-cosine metric gap the exact rerank serve
# closes. K stays bounded control-plane data (64 x 64 doubles).
PQ_LLOYD_EXTRA = 54
PQ_LLOYD_ITERS = 4  # fixed iteration count (determinism + bounded SQL)
# Training-sample cap: the lowest-vec_id prefix — deterministic,
# oracle-mirrorable (ORDER BY vec_id LIMIT cap), and a TakeOrdered
# (map-side partial top-k, no sort shuffle) at 100 TB. Covers the full
# corpus at every test SF (2000 embeddings at sf0.1); at scale PQ
# training on a bounded sample is the standard posture (FAISS trains
# IVFPQ codebooks on ~1e5-1e6 sampled vectors, not the corpus).
PQ_TRAIN_CAP = 4096
# Codebook-algorithm version, folded into every persisted PQ family's
# index_suffix fingerprint: bump the NAME on any change to the training
# ALGORITHM so a persistent warehouse rotates (and GCs) its pre-change
# tables instead of serving codes every updated oracle no longer
# matches (r15 review finding 1). The training CONSTANTS are folded in
# mechanically (r15 review pass 3, finding 1) — retuning
# PQ_LLOYD_EXTRA/ITERS/TRAIN_CAP/PQ_M rotates the fingerprint without
# anyone remembering to bump anything.
PQ_CODEBOOK_ALGO = (
    f"lloyd1:{PQ_M}:{PQ_LLOYD_EXTRA}:{PQ_LLOYD_ITERS}:{PQ_TRAIN_CAP}"
)

# IVF COARSE quantizer (r16, VERDICT r15 Next #2): full-dim Lloyd cells
# via the SAME shared trainer (n_sub=1). Cells = |labels| + EXTRA —
# more cells than ingest labels, so nprobe=2 probes a SMALLER corpus
# fraction (2/16 vs 2/10 on the testdata) while trained boundaries
# track the actual cluster structure (the scrambled-label gate in
# tests/test_ann_quality.py is the proof the ingest-label quantizer
# could never pass). Iterations match the PQ trainer's bounded-SQL
# unroll.
COARSE_EXTRA = 6
COARSE_ITERS = 4
# Folded into the IVFPQ family's index_suffix (constants mechanically,
# like PQ_CODEBOOK_ALGO): any algo/constant change rotates the
# persisted cells/codebook/codes generation instead of serving
# pre-change artifacts under updated oracles.
IVFPQ_ALGO = f"ivfpq1:{COARSE_EXTRA}:{COARSE_ITERS}:{PQ_CODEBOOK_ALGO}"

# Algorithm token for the plain-IVF trained-cell families (r17, the
# index_suffix contract): bump when the coarse quantizer or its
# constants change, so a persistent warehouse rotates (and GCs) the
# pre-change generation instead of serving stale cells under updated
# oracles — the exact failure mode the IVFPQ token closed at r15.
ANN_ALGO = f"annivf1:{COARSE_EXTRA}:{COARSE_ITERS}"


def _dot_col(a, b):
    """Sequential-fold dot product of two array<double> Columns — the
    same left-to-right order DuckDB's list_dot_product uses, so both
    engines see bit-identical IEEE sums."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subvec(col, m: int):
    """m-th (1-based) of PQ_M equal contiguous slices of an array column."""
    sub_len = (F.size(col) / F.lit(PQ_M)).cast("int")
    return F.slice(col, F.lit(m - 1) * sub_len + F.lit(1), sub_len)


def _l2sq(a, b):
    """Squared L2 distance via the dot-product identity — three
    sequential folds, mirroring the oracle's list_dot_product calls."""
    return _dot_col(a, a) - 2 * _dot_col(a, b) + _dot_col(b, b)


def _codebook_row(cvec: DataFrame) -> DataFrame:
    """Collapse the tiny (label, centroid) table into ONE row holding the
    full codebook — the broadcast side of every PQ step. Bounded by
    construction: |labels| entries of fixed dim, independent of corpus
    size (same collapsed-vocabulary pattern as text_unigram_rarity)."""
    return cvec.agg(
        F.collect_list(
            F.struct(F.col("label").cast("long").alias("label"), F.col("v").alias("v"))
        ).alias("cb")
    )


def _round4_signed(x):
    """numpy mirror of DuckDB ROUND(x, 4) on signed values:
    round-half-away-from-zero on the BINARY double (the distance
    kernels' floor(x*1e4+0.5) trick is half-up, correct only for
    nonnegatives). ``+ 0.0`` normalizes -0.0 exactly like the SQL
    side's ``+ 0.0``.

    NOT a mirror of Spark F.round: that goes through
    BigDecimal.valueOf's shortest-DECIMAL-string repr and disagrees on
    decimal-boundary doubles (F.round(0.00015, 4) -> 0.0002 while this
    and DuckDB yield 0.0001, the binary value being below the
    boundary). PQ training must therefore stay on the numpy/DuckDB
    pair — do NOT refactor it into a Spark-side aggregate on the
    strength of an assumed F.round equivalence (r15 review pass 2,
    finding 3)."""
    import numpy as np

    return np.copysign(np.floor(np.abs(x) * 10000.0 + 0.5), x) / 10000.0 + 0.0


def _seq_fold_dot(A, B):
    """(n, d) x (K, d) -> (n, K) dot products accumulated left-to-right
    over the d dims — bit-identical to list_dot_product's sequential
    fold / the HOF ``F.aggregate``, without materializing an (n, K, d)
    prefix tensor. ONE definition shared by the Lloyd trainer and the
    Arrow encode kernel so the fold convention cannot diverge (r15
    review finding 4)."""
    acc = A[:, 0][:, None] * B[None, :, 0]
    for j in range(1, A.shape[1]):
        acc = acc + A[:, j][:, None] * B[None, :, j]
    return acc


def _round4_mean_checked(x):
    """``_round4_signed`` for TRAINED centroid means, with the r15
    advice #1 guard: numpy accumulates the per-dim sums pairwise while
    DuckDB's SUM accumulates in scan order, so a mean landing exactly
    on a 4th-decimal rounding boundary could round DIFFERENTLY between
    the engines — and the divergence then amplifies through the Lloyd
    iterations into wholesale parity failure. Chasing bit-identical
    accumulation order is not possible (DuckDB's group-aggregate scan
    order is not defined), so instead assert every mean sits farther
    from its rounding boundary than any accumulation-order discrepancy
    can reach: the worst-case pairwise-vs-sequential gap on the
    1e4-scaled value is ~n_terms * eps * |scaled| ~= 3e-9 at
    PQ_TRAIN_CAP=4096 terms and |mean| <= O(1); the 1e-7 gate leaves
    ~30x margin while firing spuriously with probability ~2e-7 per
    value. A fire means THIS corpus genuinely cannot be trained
    engine-deterministically at 4 decimals — loud beats silent."""
    import numpy as np

    scaled = np.abs(np.asarray(x, dtype=np.float64)) * 10000.0 + 0.5
    dist = np.abs(scaled - np.rint(scaled))
    if np.any(dist < 1e-7):
        raise AssertionError(
            "Lloyd centroid mean within 1e-7 of a 4th-decimal rounding "
            "boundary: cross-engine accumulation order could flip the "
            "rounded codebook (r15 advice #1) — retune the training "
            "constants for this corpus"
        )
    return _round4_signed(x)


def _train_sample(e: DataFrame) -> list:
    """The ONE bounded training-sample collect both quantizer trainers
    share — <= PQ_TRAIN_CAP rows x D doubles (~2 MB at cap) via
    TakeOrdered (map-side partial top-k, no sort shuffle), independent
    of corpus size. Callers that train BOTH the coarse cells and the
    PQ codebook (the IVFPQ pair) collect once and hand the rows to
    ``_lloyd_train_rows`` twice instead of paying two identical Spark
    jobs (r16 review finding 3)."""
    return sorted(
        e.select("vec_id", "label", "v")
        .orderBy("vec_id")
        .limit(PQ_TRAIN_CAP)
        .collect(),
        key=lambda r: r["vec_id"],
    )


def collect_legs(*legs: DataFrame) -> list[list]:
    """Run N BOUNDED driver-side collects as ONE Spark job (guide §5
    driver round-trips: each extra collect is a full scheduling round,
    ~0.1-0.2 s at serve granularity): every leg is pre-projected by the
    caller to a COMMON column set; the helper tags each with a ``_leg``
    index, unions them, collects once, and returns each leg's rows in
    leg order. Row order within a leg is the collect order — exactly
    what that leg's separate ``collect()`` produced. One definition of
    the tagged-union pattern the r17 review found hand-rolled in three
    serve paths (ledgered finding 4)."""
    tagged = [
        leg.withColumn("_leg", F.lit(i)) for i, leg in enumerate(legs)
    ]
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    out: list[list] = [[] for _ in legs]
    for r in u.collect():
        out[r["_leg"]].append(r)
    return out


def _sample_and_query_rows(e: DataFrame) -> tuple[list, list]:
    """The TWO bounded driver-side collects every recompute-per-run PQ
    serve needs — the training sample (``_train_sample``'s TakeOrdered
    contract, <= PQ_TRAIN_CAP rows) and the ``_QUERY_PRED`` query rows
    (hard-capped by the predicate) — as ONE ``collect_legs`` job. Row
    content of each half is exactly what the separate collects
    produced: the sample is re-sorted by vec_id driver-side, the query
    rows keep their collect order (consumers are per-query
    independent)."""
    s = e.select("vec_id", "label", "v").orderBy("vec_id").limit(
        PQ_TRAIN_CAP
    )
    q = e.filter(F.expr(_QUERY_PRED)).select("vec_id", "label", "v")
    samp_rows, qrows = collect_legs(s, q)
    return sorted(samp_rows, key=lambda r: r["vec_id"]), qrows


def _lloyd_train(
    e: DataFrame,
    *,
    n_sub: int = PQ_M,
    extra: int = PQ_LLOYD_EXTRA,
    iters: int = PQ_LLOYD_ITERS,
) -> list[tuple[int, list[float]]]:
    """``_lloyd_train_rows`` over a fresh ``_train_sample`` collect —
    the single-quantizer entry point."""
    return _lloyd_train_rows(
        _train_sample(e), n_sub=n_sub, extra=extra, iters=iters
    )


def _lloyd_train_rows(
    samp_rows: list,
    *,
    n_sub: int = PQ_M,
    extra: int = PQ_LLOYD_EXTRA,
    iters: int = PQ_LLOYD_ITERS,
) -> list[tuple[int, list[float]]]:
    """Seeded-deterministic Lloyd k-means over ``n_sub`` equal
    contiguous subspaces — ONE trainer shared by the PQ codebook
    (n_sub=PQ_M: per-subspace entries, r15) and the IVF COARSE
    quantizer (n_sub=1: full-dim cells, r16 — VERDICT r15 Next #2).
    K = |labels| + ``extra`` entries; ``label`` is the opaque entry id
    0..K-1 (entries 0..L-1 seed from the per-label sample means in
    label order; L..K-1 from the strided sample — Forgy init).

    Runs driver-side on the BOUNDED ``_train_sample`` rows. Seed means
    are computed from the SAME sample (training is sample-scoped end
    to end; at every test SF the cap covers the whole corpus, so the
    values equal full-corpus means bit-for-bit). The arithmetic
    mirrors the oracle's CTEs (_lloyd_sql) step for step:
    sequential-fold dot products (an in-order accumulation loop),
    distances rounded half-up to 4 decimals, argmin with lowest-entry
    tie-break, per-dim means rounded to 4 (half-away-from-zero,
    signed, boundary-guarded — r15 advice #1), empty clusters carrying
    the previous entry forward."""
    import numpy as np

    if not samp_rows:
        return []
    S = np.stack([np.asarray(r["v"], dtype=np.float64) for r in samp_rows])
    labs = np.array([int(r["label"]) for r in samp_rows])
    n = S.shape[0]
    cb = [
        _round4_mean_checked(S[labs == lab].mean(axis=0))
        for lab in sorted(set(labs.tolist()))
    ]
    for j in range(extra):
        # strided Forgy seeds: sample rank (j * n) // EXTRA, 0-based —
        # the oracle's s.rn = (j * n) // EXTRA + 1 (1-based)
        cb.append(S[(j * n) // extra])
    C = np.stack(cb)  # (K, D)
    K, D = C.shape
    sub = D // n_sub
    for m in range(n_sub):
        lo, hi = m * sub, (m + 1) * sub
        B = C[:, lo:hi].copy()  # (K, sub)
        A = S[:, lo:hi]  # (n, sub)
        aa = np.cumsum(A * A, axis=1)[:, -1]
        for _ in range(iters):
            ab = _seq_fold_dot(A, B)
            bb = np.cumsum(B * B, axis=1)[:, -1]
            d = aa[:, None] - 2 * ab + bb[None, :]
            d = np.floor(d * 10000.0 + 0.5) / 10000.0  # nonneg round
            assign = np.argmin(d, axis=1)  # first min = lowest entry
            for k in range(K):
                mask = assign == k
                if mask.any():
                    B[k] = _round4_mean_checked(
                        A[mask].sum(axis=0) / mask.sum()
                    )
                # else: carry the previous entry (oracle's COALESCE)
        C[:, lo:hi] = B
    return [(k, [float(x) for x in C[k]]) for k in range(K)]


def _pq_train(e: DataFrame) -> list[tuple[int, list[float]]]:
    """The PQ codebook: K = |labels| + PQ_LLOYD_EXTRA full-dim entries
    whose m-th subvector slice is the m-th subspace's Lloyd-refined
    centroid (the shared trainer at its PQ defaults)."""
    return _lloyd_train(e)


def _coarse_train_rows(samp_rows: list) -> list[tuple[int, list[float]]]:
    """The IVF COARSE quantizer from an already-collected sample:
    K = |labels| + COARSE_EXTRA full-dim Lloyd-trained CELL centroids
    (n_sub=1 — one 'subspace' spanning the whole vector). Until r15
    the coarse cells were frozen ingest-label means, making IVFPQ a
    label-partition prune; training the cells is what makes it a true
    IVF on data whose labels don't track the actual cluster structure
    (VERDICT r15 Next #2; FAISS trains its IVF coarse quantizer the
    same way, on a bounded sample)."""
    return _lloyd_train_rows(
        samp_rows, n_sub=1, extra=COARSE_EXTRA, iters=COARSE_ITERS
    )


def _coarse_train(e: DataFrame) -> list[tuple[int, list[float]]]:
    """``_coarse_train_rows`` over a fresh sample collect."""
    return _coarse_train_rows(_train_sample(e))


def _trained_cells_and_corpus(
    spark: SparkSession, e: DataFrame, *, keep_vlabel: bool = False
):
    """The trained-cell setup every plain-IVF path shares (r17 review
    pass 2, finding 2 — it existed as four inline copies): train the
    coarse cells on the bounded sample, materialize them as the
    broadcastable (label, v) relation, and re-key the corpus to its
    nearest cell. ``keep_vlabel`` preserves the ingest label as the
    ``vlabel`` passthrough column (the persisted build's metadata
    contract). Returns (coarse_entries, cells_df, assigned_corpus)."""
    coarse = _coarse_train(e)
    cvec = _local_df(spark, coarse, _PQ_CB_SCHEMA)
    src = (
        e.select("vec_id", F.col("label").alias("vlabel"), "v")
        if keep_vlabel
        else e.select("vec_id", "label", "v")
    )
    return coarse, cvec, _assign_cells(src, coarse)


_PQ_CB_SCHEMA = "label long, v array<double>"




def _pq_codebook_vectors(e: DataFrame) -> DataFrame:
    """The trained PQ codebook as a K-row (label, v) DataFrame — the
    persistable form ``build_pq_index`` writes; downstream it is
    consumed exactly like the old per-label-mean codebook."""
    return _local_df(e.sparkSession, _pq_train(e), _PQ_CB_SCHEMA)


def _entries_cb_row(spark: SparkSession, entries) -> DataFrame:
    """``entries`` (list of (label, vector)) collapsed into the ONE
    broadcast row every PQ step consumes — a local relation: no
    aggregate job, nothing to checkpoint, bit-identical to
    ``_codebook_row`` over the same rows."""
    payload = [{"label": int(k), "v": list(v)} for k, v in entries]
    return _local_df(
        spark,
        [(payload,)],
        "cb array<struct<label: long, v: array<double>>>",
    )


def _pq_cb_row(e: DataFrame) -> DataFrame:
    """Train + collapse in one step (callers that need only the 1-row
    broadcast form)."""
    return _entries_cb_row(e.sparkSession, _pq_train(e))


def _qlut_rows(
    queries: DataFrame | list, entries
) -> list[tuple[int, list[dict]]]:
    """The per-query ADC lookup tables, computed driver-side from the
    trained/persisted codebook ``entries`` and the BOUNDED query
    relation — |queries| x PQ_M x K int64, the same payload the
    interpreted expression path broadcasts, returned as the plain
    (query_id, luts) payload ``_adc_score_arrow`` closes over directly
    (no DataFrame roundtrip — the data never needs to leave the driver;
    r15 review finding 5). At K = |labels| + PQ_LLOYD_EXTRA the HOF LUT
    build had become the serve's dominant cost. Arithmetic mirrors the
    expression path AND the oracle: sequential in-order dot over each
    subspace, then round-half-away-from-zero on dot*10000
    (F.round(x) / DuckDB ROUND(x)) cast to int64."""
    import numpy as np

    if isinstance(queries, list):
        qrows = queries  # pre-collected (the _sample_and_query_rows job)
    else:
        qrows = queries.select("vec_id", "v").collect()  # bounded (callers)
    if not qrows or not entries:
        return []
    labels = [int(k) for k, _ in entries]
    C = np.stack([np.asarray(v, dtype=np.float64) for _, v in entries])
    sub = C.shape[1] // PQ_M
    out = []
    for r in qrows:
        qv = np.asarray(r["v"], dtype=np.float64)
        luts = []
        for m in range(PQ_M):
            lo, hi = m * sub, (m + 1) * sub
            acc = qv[lo] * C[:, lo]
            for j in range(lo + 1, hi):
                acc = acc + qv[j] * C[:, j]
            p = np.copysign(
                np.floor(np.abs(acc * 10000.0) + 0.5), acc
            ).astype(np.int64)
            luts.append(dict(zip(labels, (int(x) for x in p))))
        out.append((int(r["vec_id"]), luts))
    return out


def _qlut_expr(queries: DataFrame, cb_row: DataFrame) -> DataFrame:
    """The per-query LUT relation built with Catalyst HOF expressions —
    the INTERPRETED path's LUT builder (the arrow path computes the
    same payload driver-side in ``_qlut_rows``). One definition shared
    by every interpreted serve so the rounding convention cannot
    diverge across them (r15 review finding 4)."""

    def lut_entry(m: int, qsv):
        def entry(c):
            return F.struct(
                c["label"].alias("k"),
                F.round(_dot_col(qsv, _subvec(c["v"], m)) * 10000)
                .cast("long")
                .alias("p"),
            )

        return entry

    luts = []
    for m in range(1, PQ_M + 1):
        qsv = _subvec(F.col("v"), m)
        luts.append(
            F.map_from_entries(F.transform(F.col("cb"), lut_entry(m, qsv)))
        )
    return queries.crossJoin(F.broadcast(cb_row)).select(
        F.col("vec_id").alias("query_id"), F.array(*luts).alias("luts")
    )


def _pq_encode_hof(corpus: DataFrame, cb_row: DataFrame) -> DataFrame:
    """Catalyst higher-order-function encode kernel: JVM-side and
    shuffle-free, but the aggregate/zip_with expressions run through the
    interpreted evaluator (no codegen) — the reference baseline the
    Arrow kernel is A/B'd against (`ann_pq_adc_topk_hof` in bench)."""
    enc = corpus.crossJoin(F.broadcast(cb_row))

    # PySpark infers lambda arity from the signature, so loop variables
    # must close over a factory, not default args.
    def nearest(m: int, sv):
        def entry(c):
            return F.struct(
                (F.round(_l2sq(sv, _subvec(c["v"], m)), 4) + 0.0).alias("d"),
                c["label"].alias("code"),
            )

        return entry

    bests = []
    for m in range(1, PQ_M + 1):
        sv = _subvec(F.col("v"), m)
        bests.append(F.array_min(F.transform(F.col("cb"), nearest(m, sv))))
    keep = [c for c in corpus.columns if c != "v"]
    return enc.select(*keep, F.array(*bests).alias("bests"))


def _pq_encode_arrow(corpus: DataFrame, cb_row: DataFrame) -> DataFrame:
    """Arrow-batched vectorized encode kernel (SCALING.md seam, built in
    r8): the same arithmetic as the HOF kernel — sequential-fold dot
    products (numpy cumsum is a left-to-right scan, bit-identical to the
    fold), the identity l2sq = aa - 2*ab + bb in the same operation
    order, half-up rounding on the 1e4-scaled value (DuckDB's ROUND
    method), ascending-label argmin tie-break — but evaluated in numpy
    over Arrow record batches instead of the interpreted expression
    walker. The codebook is collected driver-side: bounded control-plane
    data (|labels| entries of fixed dim, same payload the HOF path
    broadcasts) closed over into the UDF. Per-partition cost is one
    narrow map; no shuffle, no corpus collect."""
    import numpy as np
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    entries = sorted(
        (int(ent["label"]), np.asarray(ent["v"], dtype=np.float64))
        for ent in (cb_row.collect()[0]["cb"] or [])
    )
    if not entries:
        # degenerate empty codebook (empty input): the HOF plan already
        # yields the right empty/NULL shape — reuse it
        return _pq_encode_hof(corpus, cb_row)
    labels = np.array([lab for lab, _ in entries], dtype=np.int64)
    C = np.stack([v for _, v in entries])  # (L, D)
    sub = C.shape[1] // PQ_M
    Bs = [C[:, m * sub:(m + 1) * sub] for m in range(PQ_M)]
    bbs = [np.cumsum(b * b, axis=1)[:, -1] for b in Bs]

    keep_fields = [f for f in corpus.schema.fields if f.name != "v"]
    keep_names = [f.name for f in keep_fields]
    out_schema = StructType(
        keep_fields
        + [
            StructField(
                "bests",
                ArrayType(
                    StructType(
                        [
                            StructField("d", DoubleType()),
                            StructField("code", LongType()),
                        ]
                    )
                ),
            )
        ]
    )

    def encode(batches):
        for pdf in batches:
            out = pdf[keep_names].copy()
            if len(pdf) == 0:
                out["bests"] = []
                yield out
                continue
            V = np.stack(pdf["v"].to_numpy())
            n = V.shape[0]
            best_code = np.empty((n, PQ_M), dtype=np.int64)
            best_d = np.empty((n, PQ_M), dtype=np.float64)
            rows = np.arange(n)
            for m in range(PQ_M):
                A = V[:, m * sub:(m + 1) * sub]  # (n, sub)
                aa = np.cumsum(A * A, axis=1)[:, -1]
                ab = _seq_fold_dot(A, Bs[m])  # (n, L), sequential
                d = aa[:, None] - 2 * ab + bbs[m][None, :]
                d = np.floor(d * 10000.0 + 0.5) / 10000.0 + 0.0
                idx = np.argmin(d, axis=1)  # first min = lowest label
                best_code[:, m] = labels[idx]
                best_d[:, m] = d[rows, idx]
            out["bests"] = [
                [
                    {"d": float(best_d[i, m]), "code": int(best_code[i, m])}
                    for m in range(PQ_M)
                ]
                for i in range(n)
            ]
            yield out

    return corpus.mapInPandas(encode, out_schema)


def _pq_encode(
    corpus: DataFrame, cb_row: DataFrame, kernel: str | None = None
) -> DataFrame:
    """(vec_id, bests: array<struct<d,code>>) — per subspace the nearest
    codebook entry (distance rounded to 4 decimals, label tie-break via
    lexicographic min). One pass over the corpus, never shuffled.

    ``kernel`` selects the evaluator (default from
    $SPARK_GRAFT_PQ_KERNEL, else 'arrow'): 'arrow' = numpy over Arrow
    batches (vectorized — the 100 TB encode path); 'hof' = Catalyst
    higher-order functions (interpreted; kept as the A/B reference).
    Both produce bit-identical rows (`test_pq_kernels_agree` +  the
    shared DuckDB oracle on each)."""
    import os as _os

    kernel = kernel or _os.environ.get("SPARK_GRAFT_PQ_KERNEL", "arrow")
    if kernel == "arrow":
        return _pq_encode_arrow(corpus, cb_row)
    if kernel == "hof":
        return _pq_encode_hof(corpus, cb_row)
    raise ValueError(f"unknown PQ kernel {kernel!r}: use 'arrow' or 'hof'")


def _assign_cells(
    corpus: DataFrame, entries, *, with_dist: bool = False
) -> DataFrame:
    """(vec_id, label, *passthrough): each corpus vector re-labeled with
    its nearest TRAINED coarse cell — the IVF list assignment (replaces
    the ingest label as the cell key for BOTH trained-cell families:
    the IVFPQ pair since r16, the plain IVF family since r17).
    ``entries`` is the driver-side ``_coarse_train`` output (bounded:
    K cells x D doubles), closed over into an Arrow kernel; the pass is
    one narrow map over the corpus, no shuffle — the same linear-scan
    posture as the PQ encode it feeds. Non-``label`` input columns
    (``vlabel``, the preserved ingest label, for the metadata-filtered
    serve) pass through untouched; ``with_dist`` appends the rounded
    squared L2 to the winning cell as ``d`` (the append lifecycle's
    reportable assignment score).

    Arithmetic mirrors the oracle's ``casg`` CTE bit for bit (the
    ``_pq_encode_arrow`` discipline): squared L2 via the aa - 2ab + bb
    identity with sequential-fold dots, half-up rounding on the
    1e4-scaled value, argmin with lowest-cell tie-break (cells are
    sorted, so numpy's first-min IS the lowest cell)."""
    import numpy as np
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    keep_fields = [f for f in corpus.schema.fields if f.name != "label"]
    names = [f.name for f in keep_fields]
    out_cols = ["vec_id", "label"] + [n for n in names if n != "vec_id"]
    if with_dist:
        out_cols.append("d")
    cells = sorted((int(k), np.asarray(v, dtype=np.float64)) for k, v in entries)
    if not cells:
        # degenerate empty quantizer (empty training input => empty
        # corpus): no cell exists to assign — the oracle's casg CTE is
        # empty too
        ddl = StructType(
            [StructField("label", LongType())]
            + keep_fields
            + ([StructField("d", DoubleType())] if with_dist else [])
        )
        return corpus.sparkSession.createDataFrame([], ddl).select(*out_cols)
    labels = np.array([k for k, _ in cells], dtype=np.int64)
    C = np.stack([v for _, v in cells])  # (K, D)
    bb = np.cumsum(C * C, axis=1)[:, -1]

    out_schema = StructType(
        [StructField("label", LongType())]
        + keep_fields
        + ([StructField("d", DoubleType())] if with_dist else [])
    )

    def assign(batches):
        for pdf in batches:
            out = pdf[names].copy()
            if len(pdf) == 0:
                out.insert(0, "label", np.array([], dtype=np.int64))
                if with_dist:
                    out["d"] = np.array([], dtype=np.float64)
                yield out
                continue
            V = np.stack(pdf["v"].to_numpy())
            aa = np.cumsum(V * V, axis=1)[:, -1]
            ab = _seq_fold_dot(V, C)  # (n, K), sequential fold
            d = aa[:, None] - 2 * ab + bb[None, :]
            d = np.floor(d * 10000.0 + 0.5) / 10000.0  # nonneg round
            idx = np.argmin(d, axis=1)  # first min = lowest cell
            out.insert(0, "label", labels[idx])
            if with_dist:
                out["d"] = d[np.arange(len(idx)), idx] + 0.0
            yield out

    return corpus.mapInPandas(assign, out_schema).select(*out_cols)


# Shared oracle fragments. list_slice bounds are 1-based inclusive;
# len(v)//PQ_M is the subspace width.
_PQ_SUB_SQL = "list_slice({v}, ({m} - 1) * (len({v}) // 4) + 1, {m} * (len({v}) // 4))"
_PQ_L2SQ_SQL = (
    "(list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b})"
    " + list_dot_product({b}, {b}))"
)

_SUB_SQL_N = (
    "list_slice({v}, ({m} - 1) * (len({v}) // {n}) + 1,"
    " {m} * (len({v}) // {n}))"
)


def _lloyd_sql(
    cent_where: str,
    *,
    prefix: str = "pq",
    n_sub: int = PQ_M,
    extra: int = PQ_LLOYD_EXTRA,
    iters: int = PQ_LLOYD_ITERS,
) -> str:
    """The Lloyd-training CTE chain ending in ``{prefix}cb(label, v)``
    — the oracle mirror of ``_lloyd_train``, unrolled to ``iters``
    fixed iterations (recursive CTEs can't carry the list-typed state
    portably; a generated chain keeps every step a plain aggregate
    DuckDB and the reader can inspect). ONE generator for both trained
    quantizers (r16): the PQ codebook (prefix='pq', n_sub=PQ_M) and
    the full-dim IVF coarse cells (prefix='cc', n_sub=1) — distinct
    prefixes let both chains coexist in a single oracle query.
    Training is sample-scoped end to end — seeds (per-label means +
    strided Forgy) and assignments all come from the bounded
    ``{prefix}samp`` prefix; ``cent_where`` restricts the sample for
    the frozen-codebook variant. Self-contained: emits its own
    ``{prefix}ms`` subspace relation."""
    p = prefix
    sub = _SUB_SQL_N
    asg_l2 = _PQ_L2SQ_SQL.format(a="t.sv", b="c.sv")
    ms_list = ", ".join(str(m) for m in range(1, n_sub + 1))
    parts = [
        f"""{p}ms AS (SELECT unnest([{ms_list}]) AS m),
    {p}samp AS (
        SELECT vec_id, label, v, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn
        FROM (
            SELECT vec_id, label, embedding::DOUBLE[] AS v
            FROM embeddings{cent_where}
            ORDER BY vec_id LIMIT {PQ_TRAIN_CAP}
        )
    ),
    {p}n AS (SELECT COUNT(*) AS n FROM {p}samp),
    {p}sub AS (
        SELECT s.vec_id, {p}ms.m,
               {sub.format(v="s.v", m=f"{p}ms.m", n=n_sub)} AS sv
        FROM {p}samp s CROSS JOIN {p}ms
    ),
    {p}lab AS (
        SELECT label,
               CAST(ROW_NUMBER() OVER (ORDER BY label) - 1 AS BIGINT) AS entry
        FROM (SELECT DISTINCT label FROM {p}samp)
    ),
    {p}nl AS (SELECT COUNT(*) AS l FROM {p}lab),
    {p}cvec AS (
        -- per-label SAMPLE means (training is sample-scoped end to
        -- end; the cap covers the whole corpus at every test SF, so
        -- these equal the pre-r15 full-corpus means bit-for-bit)
        SELECT label, list(cv ORDER BY dim) AS v FROM (
            SELECT label, dim, ROUND(SUM(val) / COUNT(*), 4) + 0.0 AS cv
            FROM (
                SELECT label, unnest(v) AS val,
                       generate_subscripts(v, 1) AS dim
                FROM {p}samp
            )
            GROUP BY label, dim
        ) GROUP BY label
    ),
    {p}cb0 AS (
        -- entries 0..L-1: the per-label means (the pre-r15 codebook,
        -- now Lloyd's seed)
        SELECT pl.entry, {p}ms.m,
               {sub.format(v="c.v", m=f"{p}ms.m", n=n_sub)} AS sv
        FROM {p}cvec c JOIN {p}lab pl ON pl.label = c.label
        CROSS JOIN {p}ms
        UNION ALL
        -- entries L..K-1: strided Forgy seeds off the sample
        SELECT nl.l + js.j AS entry, {p}ms.m,
               {sub.format(v="s.v", m=f"{p}ms.m", n=n_sub)} AS sv
        FROM (SELECT unnest(generate_series(0, {extra - 1})) AS j) js
        CROSS JOIN {p}nl nl
        CROSS JOIN {p}n n
        JOIN {p}samp s ON s.rn = (js.j * n.n) // {extra} + 1
        CROSS JOIN {p}ms
    )"""
    ]
    for i in range(1, iters + 1):
        prev = f"{p}cb{i - 1}"
        parts.append(
            f"""{p}asg{i} AS (
        SELECT vec_id, m, sv, entry FROM (
            SELECT t.vec_id, t.m, t.sv, c.entry,
                   ROW_NUMBER() OVER (
                       PARTITION BY t.vec_id, t.m
                       ORDER BY ROUND({asg_l2}, 4) ASC, c.entry ASC
                   ) AS arn
            FROM {p}sub t JOIN {prev} c ON c.m = t.m
        ) WHERE arn = 1
    ),
    {p}new{i} AS (
        SELECT entry, m, list(cv ORDER BY dim) AS sv FROM (
            SELECT entry, m, dim,
                   ROUND(SUM(val) / COUNT(*), 4) + 0.0 AS cv
            FROM (
                SELECT entry, m, unnest(sv) AS val,
                       generate_subscripts(sv, 1) AS dim
                FROM {p}asg{i}
            )
            GROUP BY entry, m, dim
        ) GROUP BY entry, m
    ),
    {p}cb{i} AS (
        -- empty clusters carry the previous entry forward
        SELECT c.entry, c.m, COALESCE(nw.sv, c.sv) AS sv
        FROM {prev} c
        LEFT JOIN {p}new{i} nw ON nw.entry = c.entry AND nw.m = c.m
    )"""
        )
    parts.append(
        f"""{p}cb AS (
        SELECT entry AS label, flatten(list(sv ORDER BY m)) AS v
        FROM {p}cb{iters} GROUP BY entry
    )"""
    )
    return ",\n    ".join(parts)


def _pq_lloyd_sql(cent_where: str) -> str:
    """The PQ-codebook chain (``pqcb``) at the shared generator's PQ
    defaults — kept as the name every PQ oracle composes."""
    return _lloyd_sql(cent_where)


def _coarse_lloyd_sql(cent_where: str = "") -> str:
    """The IVF coarse-cell chain (``cccb(label, v)``): full-dim Lloyd,
    K = |labels| + COARSE_EXTRA — the oracle mirror of
    ``_coarse_train``."""
    return _lloyd_sql(
        cent_where,
        prefix="cc",
        n_sub=1,
        extra=COARSE_EXTRA,
        iters=COARSE_ITERS,
    )


# The IVF list-assignment CTE every trained-cell oracle composes after
# the cc chain: each corpus vector's nearest TRAINED cell (rounded L2,
# lowest-cell tie-break — the ``_assign_cells`` mirror). ONE definition
# shared by the IVFPQ pair (r16) and the plain-IVF family (r17).
_CASG_SQL = f"""casg AS (
        SELECT vec_id, cell FROM (
            SELECT e.vec_id, c.label AS cell,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY ROUND({{l2}},
                                      4) ASC, c.label ASC
                   ) AS arn
            FROM e CROSS JOIN cccb c
        ) WHERE arn = 1
    )""".format(l2=_PQ_L2SQ_SQL.format(a="e.v", b="c.v"))


_PQ_CODES_CTE_TMPL = """
    e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    cent AS (
        SELECT label, dim, ROUND(SUM(val) / COUNT(*), 4) + 0.0 AS cv
        FROM (
            SELECT label,
                   unnest(embedding::DOUBLE[]) AS val,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings{cent_where}
        )
        GROUP BY label, dim
    ),
    cvec AS (SELECT label, list(cv ORDER BY dim) AS v FROM cent GROUP BY label),
    ms AS (SELECT unnest([1, 2, 3, 4]) AS m),
    {lloyd},
    pq_dist AS (
        SELECT e.vec_id, e.label AS vlabel, ms.m, c.label,
               ROUND({l2sq}, 4) + 0.0 AS d
        FROM e CROSS JOIN ms CROSS JOIN pqcb c
    ),
    pq_codes AS (
        SELECT vec_id, vlabel, m, label AS code, d,
               ROW_NUMBER() OVER (
                   PARTITION BY vec_id, m ORDER BY d ASC, label ASC
               ) AS rn
        FROM pq_dist
    )
"""
_PQ_L2SQ = _PQ_L2SQ_SQL.format(
    a=_PQ_SUB_SQL.format(v="e.v", m="ms.m"),
    b=_PQ_SUB_SQL.format(v="c.v", m="ms.m"),
)
_PQ_CODES_CTE = _PQ_CODES_CTE_TMPL.format(
    cent_where="", l2sq=_PQ_L2SQ, lloyd=_pq_lloyd_sql("")
)
# FROZEN-codebook variant for the incremental append path: seeds AND
# the Lloyd training sample come from the base corpus only (the
# codebook persisted at build time stays frozen while batches append;
# the ann_incremental_assign oracle precedent), while codes/ADC still
# cover every vector.
_PQ_CODES_CTE_FROZEN = _PQ_CODES_CTE_TMPL.format(
    cent_where=f" WHERE {_CORPUS_PRED}",
    l2sq=_PQ_L2SQ,
    lloyd=_pq_lloyd_sql(f" WHERE {_CORPUS_PRED}"),
)

# One source of truth for the per-query LUT + ADC-scoring CTE pair —
# every PQ oracle (plain ADC, appended, rerank, filtered, multimodal)
# composes these instead of hand-copying the chain (r11 review: four
# drifting copies of the same SQL).
_PQ_DEFAULT_CODES_SRC = "SELECT vec_id, m, code FROM pq_codes WHERE rn = 1"


def _pq_lut_adc_sql(lut_from: str, codes_src: str) -> str:
    return f"""lut AS (
        SELECT qv.vec_id AS query_id, ms.m, c.label,
               CAST(ROUND(list_dot_product({_PQ_SUB_SQL.format(v='qv.v', m='ms.m')},
                                           {_PQ_SUB_SQL.format(v='c.v', m='ms.m')})
                          * 10000) AS BIGINT) AS p
        FROM {lut_from}
        CROSS JOIN ms CROSS JOIN pqcb c
    ),
    adc AS (
        SELECT l.query_id, cd.vec_id AS neighbor_id,
               CAST(SUM(l.p) AS BIGINT) AS approx_dot_scaled
        FROM ({codes_src}) cd
        JOIN lut l ON l.m = cd.m AND l.label = cd.code
        WHERE cd.vec_id <> l.query_id
        GROUP BY 1, 2
    )"""


def _pq_adc_topk_oracle(
    codes_cte: str, k: int, codes_src: str = _PQ_DEFAULT_CODES_SRC
) -> str:
    """ADC top-k tail over the lut/adc chain — shared by
    ``ann_pq_adc_topk`` (full-corpus codebook), ``ann_pq_adc_appended``
    (frozen codebook), and ``ann_pq_adc_deleted`` (full codebook,
    ``codes_src`` restricted to the surviving vectors)."""
    return f"""
    WITH {codes_cte},
    {_pq_lut_adc_sql(
        f"(SELECT * FROM e WHERE {_QUERY_PRED}) qv", codes_src
    )},
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY approx_dot_scaled DESC, neighbor_id ASC
        ) AS rank
        FROM adc
    )
    SELECT query_id, neighbor_id, approx_dot_scaled,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _pq_rerank_oracle(
    *,
    codes_cte: str,
    lut_from: str,
    codes_src: str = _PQ_DEFAULT_CODES_SRC,
    rr_query_join: str = "JOIN e qe ON qe.vec_id = s.query_id",
    final_select: str = "query_id, neighbor_id, cosine",
    depth: int,
    k: int,
) -> str:
    """The ADC-shortlist + exact-rerank oracle chain shared by
    ``ann_pq_rerank_topk`` (and its indexed twin), the filtered rerank,
    and the multimodal indexed serve — parameterized on the query
    relation, the codes pruning, and the final projection."""
    return f"""
    WITH {codes_cte},
    {_pq_lut_adc_sql(lut_from, codes_src)},
    shortlist AS (
        SELECT query_id, neighbor_id
        FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id
                ORDER BY approx_dot_scaled DESC, neighbor_id ASC
            ) AS arank
            FROM adc
        ) WHERE arank <= {depth}
    ),
    rr AS (
        SELECT s.query_id, s.neighbor_id,
               ROUND({COSINE_SQL.format(a="qe.v", b="ne.v")}, 4) + 0.0
                   AS cosine
        FROM shortlist s
        {rr_query_join}
        JOIN e ne ON ne.vec_id = s.neighbor_id
    )
    SELECT {final_select}, CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM rr WHERE NOT isnan(cosine)
    ) WHERE rank <= {k}
    """


@query(
    "ann_pq_codes",
    driver=False,  # r7-born; in the r8 driver export (R8_EXPORT)
    headline=True,  # r8: encode-stage A/B anchor (vs ann_pq_codes_hof)
    oracle=f"""
    WITH {_PQ_CODES_CTE}
    SELECT vec_id, CAST(m AS BIGINT) AS m, CAST(code AS BIGINT) AS code,
           d AS dist
    FROM pq_codes WHERE rn = 1
    """,
)
def ann_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding of the whole corpus: per vector and subspace, the
    nearest codebook entry and its (rounded) squared distance.

    Plan: codebook = one tiny label-keyed aggregate; encoding = corpus
    scan x broadcast 1-row codebook — narrow, zero corpus shuffle, so it
    scales as a single pass at 100 TB. The long (vec_id, m) output shape
    is the persistable codes table an ADC searcher serves from."""
    e = _vectors(spark, sf_dir)
    wide = _pq_encode(e.select("vec_id", "v"), _pq_cb_row(e))
    return wide.select(
        "vec_id", F.posexplode("bests").alias("pos", "b")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("m"),
        F.col("b.code").alias("code"),
        F.col("b.d").alias("dist"),
    )


@query(
    "ann_pq_adc_topk",
    driver=False,  # r7-born; rotates into the r8 driver export
    headline=True,  # r7: newest heavy shape (2x codebook build + ADC scan)
    oracle=_pq_adc_topk_oracle(_PQ_CODES_CTE, TOP_K),
)
def ann_pq_adc_topk(
    spark: SparkSession,
    sf_dir: str,
    kernel: str | None = None,
    k: int = TOP_K,
) -> DataFrame:
    """ADC top-k over PQ codes: each query dots its subvectors against
    every codebook entry ONCE (the lookup table, scaled to exact int64
    so the 4-term sum is order-free and engine-exact), then every corpus
    vector scores as PQ_M map lookups + integer adds — never touching
    the original floats. 16x less multiply-add than brute force at
    D=64/M=4, and the scan side reads only the codes.

    Plan: queries+LUTs are a bounded broadcast (MAX_QUERIES x PQ_M x
    |labels| longs); the codes table streams through one narrow
    crossJoin; the only shuffle is the per-query top-k window — the
    same posture as ann_topk_bruteforce. At 100 TB this composes with
    the IVF probe (restrict codes to probed cells, then ADC). Both the
    encode stage and the ADC scoring scan run Arrow-vectorized kernels
    by default (r8; `ann_pq_adc_topk_hof` keeps the all-interpreted
    pipeline benched as the A/B reference)."""
    import os as _os

    kernel = kernel or _os.environ.get("SPARK_GRAFT_PQ_KERNEL", "arrow")
    e = _vectors(spark, sf_dir)
    # the codebook feeds BOTH the encode side and the query LUTs; the
    # Lloyd trainer hands its entries over as local relations — nothing
    # to checkpoint, both consumers reuse the same in-memory rows. The
    # training sample and the (arrow path's) query rows ride ONE
    # collect job (_sample_and_query_rows — the non-default hof branch
    # carries the bounded query rows unused rather than keeping a
    # second collect shape alive).
    samp, qrows = _sample_and_query_rows(e)
    entries = _lloyd_train_rows(samp)
    cb_row = _entries_cb_row(spark, entries)
    codes = _pq_encode(e.select("vec_id", "v"), cb_row, kernel=kernel)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot_scaled").desc(), F.col("neighbor_id").asc()
    )
    if kernel == "arrow":
        scored = _adc_score_arrow(codes, _qlut_rows(qrows, entries), k=k)
    else:
        qlut = _qlut_expr(e.filter(F.expr(_QUERY_PRED)), cb_row)
        score = None
        for m in range(PQ_M):
            term = F.element_at(F.col("luts")[m], F.col("bests")[m]["code"])
            score = term if score is None else score + term
        scored = (
            codes.crossJoin(F.broadcast(qlut))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                score.alias("approx_dot_scaled"),
            )
        )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _adc_score_arrow(
    codes: DataFrame,
    qlut: DataFrame | list,
    probes: DataFrame | list | None = None,
    k: int = TOP_K,
) -> DataFrame:
    """Arrow-vectorized ADC scoring scan (r8): the per-(row, query)
    ``element_at`` map lookups + integer adds of the interpreted path
    become one numpy gather-and-sum per Arrow batch, and each batch
    emits only its LOCAL top-k per query (partial top-k — the rank
    shuffle carries O(partitions x Q x k) rows, not O(N x Q)). The
    query LUTs are collected driver-side — bounded by construction at
    MAX_QUERIES x PQ_M x |labels| int64 (the _QUERY_PRED hard cap; the
    same payload the interpreted path broadcasts) — and closed over
    into the UDF. Scores are sums of the SAME int64 LUT entries, so the
    arithmetic is exact and engine-portable; the per-query top-k merge
    window stays in Spark (the plan's only shuffle).

    ``probes`` (IVF+PQ composition): a (query_id, plabel) DataFrame
    restricting each query to its probed cells — collected too (bounded
    at Q x N_PROBE) and applied as a membership mask against the
    batch's ``label`` column, the kernel-side equivalent of the probe
    join."""
    import numpy as np

    if isinstance(qlut, DataFrame):
        # interpreted-path relation handed in: collect the bounded rows
        # (<= MAX_QUERIES, see _QUERY_PRED)
        pairs = [(r.query_id, r.luts) for r in qlut.collect()]
    else:
        # the driver-side _qlut_rows payload, used directly
        pairs = qlut
    if not pairs:
        return codes.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, approx_dot_scaled long"
        )
    labels = np.array(
        sorted(int(k) for k in pairs[0][1][0].keys()), dtype=np.int64
    )
    qids = np.array([q for q, _ in pairs], dtype=np.int64)
    # LUT tensor (Q, M, L): gather target for the code matrix
    lut = np.array(
        [
            [[lu[m][int(lab)] for lab in labels] for m in range(PQ_M)]
            for _, lu in pairs
        ],
        dtype=np.int64,
    )
    nq = len(qids)
    allowed = None
    if probes is not None:
        # DataFrame (collected; bounded <= MAX_QUERIES x N_PROBE) or an
        # already-collected list of (query_id, plabel) pairs
        prows = (
            [(int(r.query_id), int(r.plabel)) for r in probes.collect()]
            if isinstance(probes, DataFrame)
            else probes
        )
        pr: dict[int, list[int]] = {}
        for qid, lab in prows:
            pr.setdefault(int(qid), []).append(int(lab))
        allowed = {
            q: np.array(sorted(v), dtype=np.int64) for q, v in pr.items()
        }

    def _empty():
        import pandas as pd

        return pd.DataFrame(
            {
                "query_id": np.array([], dtype=np.int64),
                "neighbor_id": np.array([], dtype=np.int64),
                "approx_dot_scaled": np.array([], dtype=np.int64),
            }
        )

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                yield _empty()
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            code_mat = np.array(
                [[b["code"] for b in row] for row in pdf["bests"]],
                dtype=np.int64,
            )  # (n, M)
            idx = np.searchsorted(labels, code_mat)  # label -> position
            n = len(ids)
            scores = np.zeros((nq, n), dtype=np.int64)
            for m in range(PQ_M):
                scores += lut[:, m, :][:, idx[:, m]]
            valid = qids[:, None] != ids[None, :]
            if allowed is not None:
                labs = pdf["label"].to_numpy(dtype=np.int64)
                for qi in range(nq):
                    cells = allowed.get(int(qids[qi]))
                    if cells is None:
                        valid[qi, :] = False
                    else:
                        valid[qi] &= np.isin(labs, cells)
            kk = min(k, n)
            out_q, out_n, out_s = [], [], []
            for qi in range(nq):
                cand = np.flatnonzero(valid[qi])
                if len(cand) == 0:
                    continue
                sub = scores[qi][cand]
                order = cand[np.lexsort((ids[cand], -sub))[:kk]]
                out_q.append(np.full(len(order), qids[qi], dtype=np.int64))
                out_n.append(ids[order])
                out_s.append(scores[qi][order])
            if not out_q:
                yield _empty()
                continue
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "approx_dot_scaled": np.concatenate(out_s),
                }
            )

    return codes.mapInPandas(
        score, "query_id long, neighbor_id long, approx_dot_scaled long"
    )


@query(
    "ann_pq_adc_topk_hof",
    driver=False,  # kernel A/B twin — verified by the local parity replica
    # headline until r14; demoted r15: the Lloyd codebook grew K from
    # |labels| to |labels| + PQ_LLOYD_EXTRA, a ~6x workload increase
    # that is linear in entries for the INTERPRETED evaluator — benching
    # it would read as a regression when it is the same kernel on a
    # legitimately larger codebook. The A/B is recorded once in
    # SCALING.md (r15 measurement); parity still verifies it per run.
    oracle=None,  # set below: shares ann_pq_adc_topk's oracle verbatim
)
def ann_pq_adc_topk_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_pq_adc_topk`` pinned to the interpreted HOF kernels (encode
    AND scoring): the A/B reference for the Arrow kernels (same oracle,
    same rows — the pipelines differ only in evaluator)."""
    return ann_pq_adc_topk(spark, sf_dir, kernel="hof")


@query(
    "ann_pq_codes_hof",
    driver=False,  # kernel A/B twin — verified by the local parity replica
    # headline until r14; demoted r15 with its full-query twin (see
    # ann_pq_adc_topk_hof: the Lloyd codebook's larger K makes the
    # interpreted evaluator's linear-in-entries cost read as a bench
    # regression). SCALING.md records the r15 encode-stage A/B.
    oracle=None,  # set below: shares ann_pq_codes' oracle verbatim
)
def ann_pq_codes_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_pq_codes`` pinned to the interpreted HOF encode kernel —
    the encode-stage A/B isolates the kernel speedup the full-query
    pair blends with LUT build + scoring + ranking."""
    e = _vectors(spark, sf_dir)
    wide = _pq_encode(e.select("vec_id", "v"), _pq_cb_row(e), kernel="hof")
    return wide.select(
        "vec_id", F.posexplode("bests").alias("pos", "b")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("m"),
        F.col("b.code").alias("code"),
        F.col("b.d").alias("dist"),
    )


def _set_pq_hof_oracles() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    QUERIES["ann_pq_adc_topk_hof"].oracle = QUERIES["ann_pq_adc_topk"].oracle
    QUERIES["ann_pq_codes_hof"].oracle = QUERIES["ann_pq_codes"].oracle


_set_pq_hof_oracles()


# ------------------------------------------------------ filtered ANN search

# Candidate-side metadata predicate — the "filtered vector search" shape
# (search only docs matching a filter: a language, a license, a source).
# Parity label predicate here; any pushdown-able predicate works the same.
ANN_FILTER_PRED = "label % 2 = 0"
# The same metadata predicate against a trained-cell assignments table,
# where the ingest label survives as the ``vlabel`` column (the
# partition key ``label`` is the trained cell id there). DERIVED, not
# hand-copied (r17 review finding 2): an edit to ANN_FILTER_PRED must
# reach the indexed serve and its oracle in lockstep.
_ANN_FILTER_PRED_VLABEL = f"v{ANN_FILTER_PRED}"
assert _ANN_FILTER_PRED_VLABEL.startswith("vlabel ")


@query(
    "ann_filtered_topk",
    oracle=_ORACLE_TOPK.format(
        query_pred=_QUERY_PRED,
        cosine=COSINE_SQL.format(a="q.v", b="c.v"),
        block=f"AND c.{ANN_FILTER_PRED}",
        k=TOP_K,
    ),
)
def ann_filtered_topk(
    spark: SparkSession, sf_dir: str, kernel: str | None = None
) -> DataFrame:
    """Filtered vector search: exact top-k restricted to candidates
    matching a metadata predicate (PRE-filtering — the filter narrows
    the scan before any scoring, so the top-k is over the filtered set;
    post-filtering an unfiltered top-k would under-fill k). The
    predicate reaches the parquet scan as a pushed filter, so at 100 TB
    a selective filter skips row groups before a single dot product
    runs — the same plan posture as ann_topk_bruteforce over a smaller
    scan."""
    import os as _os

    kernel = kernel or _os.environ.get("SPARK_GRAFT_ANN_KERNEL", "arrow")
    e = _vectors(spark, sf_dir)
    corpus = e.filter(F.expr(ANN_FILTER_PRED))
    if kernel == "arrow":
        return _topk_window(
            _bruteforce_score_arrow(
                corpus.select("vec_id", "v"), e.filter(F.expr(_QUERY_PRED))
            )
        )
    if kernel != "hof":
        raise ValueError(f"unknown ANN kernel {kernel!r}")
    q = F.broadcast(e.filter(F.expr(_QUERY_PRED))).alias("q")
    c = corpus.alias("c")
    joined = q.join(c, F.col("q.vec_id") != F.col("c.vec_id"))
    return _topk(joined)


# Filtered search over the PERSISTED IVF index, with deterministic
# probe widening: probe the smallest prefix of each query's
# cell-cosine ranking whose TRAINED cells cumulatively hold >= k
# filter-matching vectors (all cells if the corpus has fewer), floored
# at N_PROBE. A fixed nprobe under a selective filter UNDER-FILLS k —
# the classic filtered-ANN failure; widening by the index's own
# per-cell match counts fixes it without ever scanning a non-probed
# cell. The spec is pure arithmetic over (Q x cells) rows, so the
# oracle expresses it exactly — built post-hoc by
# ``_set_trained_ivf_oracles()`` from the cc Lloyd chain + casg (the
# filter predicate applies to the INGEST label, preserved as the
# ``vlabel`` metadata column in the assignments table).


def _widened_probes(
    q: DataFrame, cvec: DataFrame, cellcnt: DataFrame, k: int
) -> DataFrame:
    """(query_id, label) probe sets under the widening spec above. All
    arithmetic runs on Q x |cells| rows — bounded by construction (the
    query set is capped, the cell count is the index's cluster count)."""
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("label").asc()
    )
    ranked = (
        q.crossJoin(F.broadcast(cvec.alias("c")))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.label").alias("label"),
            F.round(_cosine("q.v", "c.v"), 4).alias("ccos"),
        )
        .withColumn("crank", F.row_number().over(wq))
        .join(F.broadcast(cellcnt), "label", "left")
        .select(
            "query_id", "label", "crank",
            F.coalesce("m", F.lit(0)).alias("m"),
        )
    )
    wcum = (
        Window.partitionBy("query_id")
        .orderBy("crank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("query_id")
    cum = ranked.withColumn("cm", F.sum("m").over(wcum))
    widened = cum.withColumn(
        "width",
        F.greatest(
            F.coalesce(
                F.min(F.when(F.col("cm") >= k, F.col("crank"))).over(wall),
                F.max("crank").over(wall),
            ),
            F.lit(N_PROBE),
        ),
    )
    return widened.filter(F.col("crank") <= F.col("width")).select(
        "query_id", "label"
    )


@query(
    "ann_filtered_indexed",
    driver=False,  # r10-born: R11_ROTATE_IN
    oracle=None,  # set post-hoc: _set_trained_ivf_oracles()
)
def ann_filtered_indexed(
    spark: SparkSession, sf_dir: str, kernel: str | None = None
) -> DataFrame:
    """``ann_filtered_topk``'s pre-filter composed with the PERSISTED
    IVF index (the production filtered-vector-search shape, closing r9
    verdict Missing #3 — both halves existed separately): candidates
    come from the label-partitioned assignments table, the metadata
    predicate prunes those partitions/row-groups before any dot
    product, and each query probes its widened nearest-cell prefix (see
    the widening spec above) so a selective filter cannot under-fill k.
    The per-cell match counts that drive the widening are a tiny
    index-side aggregate (|cells| rows, broadcast). Index built once on
    first call (the dedup_semantic_served convention: tableExists guard
    + its own job group), serving is pure index reads after that."""
    import os as _os

    from dbt_on_snowflake_spark.testdata import index_suffix

    # fingerprinted suffix: a regenerated corpus rotates the tables
    # (rebuild, not stale serve) and the old pair is GC'd at build
    suffix = index_suffix(spark, sf_dir, "fidx", "embeddings", algo=ANN_ALGO)
    centroids_table = f"ann_centroids_{suffix}"
    assignments_table = f"ann_assignments_{suffix}"
    e = _vectors(spark, sf_dir)
    ensure_ann_index(
        spark,
        e,
        centroids_table=centroids_table,
        assignments_table=assignments_table,
        job_group="ann_filtered_indexed",
        gc_suffix=suffix,
    )
    from dbt_on_snowflake_spark.engine.index_delete import live_rows

    # metadata filter first (partition prune at the scan), then the
    # tombstone gate (exact no-op until the family's first delete)
    matching = live_rows(
        spark,
        # the metadata predicate applies to the INGEST label (vlabel);
        # the partition key is the trained cell, so the filter is a
        # row-group predicate pushed to the scan, and the probe prune
        # stays a partition prune on the cell key
        spark.table(assignments_table).filter(
            F.expr(_ANN_FILTER_PRED_VLABEL)
        ),
        _ann_tombstones(assignments_table),
        "vec_id",
    )
    cellcnt = matching.groupBy("label").agg(F.count(F.lit(1)).alias("m"))
    qdf = e.filter(F.expr(_QUERY_PRED))
    probes = _widened_probes(
        F.broadcast(qdf).alias("q"),
        spark.table(centroids_table),
        cellcnt,
        TOP_K,
    )
    corpus = matching.select("vec_id", "label", "v")
    kernel = kernel or _os.environ.get("SPARK_GRAFT_ANN_KERNEL", "arrow")
    if kernel == "arrow":
        return _topk_window(
            _bruteforce_score_arrow(corpus, qdf, probes=probes)
        )
    if kernel != "hof":
        raise ValueError(f"unknown ANN kernel {kernel!r}")
    c = corpus.alias("c")
    joined = probes.join(c, F.col("c.label") == probes.label).join(
        F.broadcast(qdf).alias("q"),
        (F.col("q.vec_id") == probes.query_id)
        & (F.col("q.vec_id") != F.col("c.vec_id")),
    )
    return _topk(joined)


# --------------------------------------------------- two-stage PQ serve path

RERANK_SHORTLIST = 4 * TOP_K  # ADC candidates carried into exact rerank


@query(
    "ann_pq_rerank_topk",
    headline=True,  # r9: the end-to-end PQ SERVE shape (ADC + exact rerank)
    oracle=_pq_rerank_oracle(
        codes_cte=_PQ_CODES_CTE,
        lut_from=f"(SELECT * FROM e WHERE {_QUERY_PRED}) qv",
        depth=RERANK_SHORTLIST,
        k=TOP_K,
    ),
)
def ann_pq_rerank_topk(
    spark: SparkSession, sf_dir: str, kernel: str | None = None
) -> DataFrame:
    """Two-stage ANN serving — the production PQ pattern (IVFADC +
    reranking, cf. Jégou et al. 2011 §V): stage 1 scores the WHOLE
    corpus from its compact PQ codes (ADC — map lookups + integer adds,
    never touching the floats) and keeps a {RERANK_SHORTLIST}-deep
    shortlist per query; stage 2 re-scores ONLY the shortlist with exact
    cosines over the original vectors and keeps the top {TOP_K}. The
    quantization error PQ introduces is confined to shortlist
    *selection*; the returned scores and order are exact over it.

    Plan: stage 1 is ann_pq_adc_topk's posture (bounded query-LUT
    broadcast, one narrow codes scan, partial-top-k rank shuffle at
    shortlist depth); stage 2 broadcasts the tiny Q x {RERANK_SHORTLIST}
    shortlist against ONE more corpus scan to gather neighbor vectors
    (at 100 TB: a broadcast-hash semi-join — a point-lookup serving
    store would replace this scan, the batch engine does it in one
    pass), attaches the bounded query vectors the same way, then ranks
    Q x {RERANK_SHORTLIST} rows. No shuffle ever carries corpus-sized
    data."""
    e = _vectors(spark, sf_dir)
    shortlist = ann_pq_adc_topk(
        spark, sf_dir, kernel=kernel, k=RERANK_SHORTLIST
    ).select("query_id", "neighbor_id")
    return _exact_rerank(e, shortlist)


def _exact_rerank(
    e: DataFrame,
    shortlist: DataFrame,
    queries: DataFrame | None = None,
    k: int = TOP_K,
) -> DataFrame:
    """Stage 2 of two-stage serving, shared by the recompute and the
    persisted-index variants: broadcast the tiny Q x shortlist-depth
    pair list against ONE corpus scan to gather neighbor vectors,
    attach the bounded query vectors the same way, exact-cosine and
    rank. Zero-norm vectors make the rerank cosine undefined (NULL from
    _cosine; NaN in the oracle) — both engines drop the pair, the same
    degenerate-input contract as _topk (advice r8). ``queries``
    overrides the query-vector relation — any bounded (vec_id, v), the
    multimodal twin's payload-derived vectors; defaults to the corpus
    rows under ``_QUERY_PRED``."""
    if queries is None:
        queries = e.filter(F.expr(_QUERY_PRED))
    # norms STAGED as columns (q-side once per bounded broadcast row,
    # neighbor side once per joined row): a pushed isnotnull(cosine)
    # filter re-evaluates the whole cosine inside the broadcast-join
    # condition (plans/r17/ann_pq_rerank_topk_before op 24/25 — the
    # join condition is evaluated per probed row, outside codegen);
    # the staged filter costs one multiply and the cosine is built
    # once from the staged legs, bit-identically (_cosine_from)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        _cosine_norm("v").alias("qn"),
    )
    pairs = (
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv"))
        .join(F.broadcast(shortlist), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("vn", _cosine_norm("nv"))
        .filter((F.col("qn") * F.col("vn")) != F.lit(0.0))
    )
    rr = pairs.select(
        "query_id",
        "neighbor_id",
        (
            F.round(
                _cosine_from(_cosine_dot("qv", "nv"), F.col("qn"), F.col("vn")),
                4,
            )
            + 0.0
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rr.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


@query(
    "ann_pq_rerank_indexed",
    driver=False,  # shares ann_pq_rerank_topk's oracle (set below)
    oracle=None,
)
def ann_pq_rerank_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_pq_rerank_topk`` SERVED from the persisted PQ index: the
    shortlist comes from build_pq_index's codebook/codes tables (no
    re-encoding — the 100 TB operating mode, where the index is built
    once per corpus version), then the shared exact-rerank stage
    re-scores it. Serving from the index must not change a single
    result row, so it shares the recompute path's oracle verbatim."""
    shortlist = ann_pq_adc_indexed(
        spark, sf_dir, k=RERANK_SHORTLIST
    ).select("query_id", "neighbor_id")
    return _exact_rerank(_vectors(spark, sf_dir), shortlist)


def _pq_family_suffix(spark: SparkSession, sf_dir: str, tag: str) -> str:
    """The persisted PQ families' index-table suffix — corpus
    fingerprint x codebook-algorithm token (see PQ_CODEBOOK_ALGO)."""
    from dbt_on_snowflake_spark.testdata import index_suffix

    return index_suffix(
        spark, sf_dir, tag, "embeddings", algo=PQ_CODEBOOK_ALGO
    )


def pq_ensure_families(spark: SparkSession, sf_dir: str):
    """``(ensure_fn, codes_table, family_stem)`` for each persisted PQ
    family the reindex sweep secures — the ONE place their naming is
    spelled, shared by the ensures themselves and the sweep's
    filter-relevance prediction so the two cannot drift (r15 review
    pass 5, finding 4). ``family_stem`` is the fingerprint-independent
    ``<prefix><path8>`` half: a sweep filter that names ANY
    fingerprint generation of the family (e.g. a superseded one left
    by an algo/corpus rotation) makes the ensure relevant, because the
    ensure's build-time GC is what reclaims that dead generation.
    (Drift-retrain ROUTING is deliberately not carried here: it keys
    on the family naming convention — ``retrain_any_pq_family`` — so a
    db-qualified or superseded-generation ``pq_codes_ivp_*`` family
    still rebuilds through the cell-partitioned builder, r16 review
    finding 1.)"""
    out = []
    from dbt_on_snowflake_spark.testdata import family_half, index_suffix

    for ensure, tag, prefix in (
        (ensure_pq_index, "pq", "pq_codes_"),
        (ensure_appended_pq_index, "pqapps", "pq_codes_aps_"),
    ):
        sfx = _pq_family_suffix(spark, sf_dir, tag)
        out.append((ensure, f"{prefix}{sfx}", f"{prefix}{family_half(sfx)}"))
    for ensure, tag, prefix in (
        (ensure_ivfpq_index, "ivfpq", "pq_codes_ivp_"),
        (ensure_appended_ivfpq_index, "ivfpqaps", "pq_codes_ivp_aps_"),
    ):
        sfx = index_suffix(
            spark, sf_dir, tag, "embeddings", algo=IVFPQ_ALGO
        )
        out.append((ensure, f"{prefix}{sfx}", f"{prefix}{family_half(sfx)}"))
    return out


def ensure_pq_index(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build the persisted PQ index for ``sf_dir`` if absent and return
    ``(codebook_table, codes_table)`` — ONE encode-once artifact per
    corpus, shared by the plain ADC serve, the two-stage rerank serve,
    and the filtered rerank serve (the ``ensure_text_index``
    convention; previously the filtered path persisted a second
    byte-identical copy of the codes under its own suffix). Probes
    BOTH tables: a crashed compaction swap can drop the codebook while
    the codes survive, and a codes-only probe would then skip the
    rebuild and leave every ADC serve broken until the next
    maintenance sweep. The build runs under its own job group so bench
    stage counts show the serve path only.

    The suffix keys on a (path, size, mtime) fingerprint of the corpus
    files, not the path alone: regenerating the corpus at the same path
    (or under a persistent metastore) changes the fingerprint, so the
    next serve rebuilds against the new data instead of silently
    returning stale results (r10 advice, similarity.py:2323); tables of
    superseded fingerprints are GC'd when the rebuild runs."""
    from dbt_on_snowflake_spark.testdata import ensure_index_tables

    suffix = _pq_family_suffix(spark, sf_dir, "pq")
    codebook_table = f"pq_codebook_{suffix}"
    codes_table = f"pq_codes_{suffix}"
    ensure_index_tables(
        spark,
        tables=(codes_table, codebook_table),
        job_group="pq_index",
        gc_prefixes=("pq_codebook_", "pq_codes_", "pq_tombstones_"),
        gc_suffix=suffix,
        build=lambda: build_pq_index(
            spark,
            _vectors(spark, sf_dir),
            codebook_table=codebook_table,
            codes_table=codes_table,
        ),
    )
    return codebook_table, codes_table


def _set_rerank_indexed_oracle() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    QUERIES["ann_pq_rerank_indexed"].oracle = QUERIES[
        "ann_pq_rerank_topk"
    ].oracle


_set_rerank_indexed_oracle()


# -------------------------------------------------- hybrid retrieval (RRF)

RRF_K = 60  # the standard reciprocal-rank-fusion constant
RRF_DEPTH = 20  # per-retriever list depth carried into fusion
HYBRID_TOP_N = 10
DENSE_QUERY_ID = 0  # "more like doc 0" — the dense half's fixed query


def _hybrid_oracle() -> str:
    from dbt_on_snowflake_spark.operators.textops import bm25_ranked_cte

    cos = COSINE_SQL.format(a="eq.qv", b="e.v")
    return f"""
    WITH {bm25_ranked_cte(RRF_DEPTH)},
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    eq AS (
        SELECT embedding::DOUBLE[] AS qv FROM embeddings
        WHERE vec_id = {DENSE_QUERY_ID}
    ),
    d_scored AS (
        SELECT e.vec_id AS doc_id, ROUND({cos}, 4) + 0.0 AS cosine
        FROM e CROSS JOIN eq
        WHERE e.vec_id <> {DENSE_QUERY_ID}
    ),
    d_ranked AS (
        SELECT doc_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (
                ORDER BY cosine DESC, doc_id ASC
            ) AS rank
            FROM d_scored WHERE NOT isnan(cosine)
        ) WHERE rank <= {RRF_DEPTH}
    ),
    fused AS (
        SELECT COALESCE(b.doc_id, d.doc_id) AS doc_id,
               b.rank AS bm25_rank,
               d.rank AS dense_rank,
               ROUND(
                   COALESCE(1.0::DOUBLE / ({RRF_K} + b.rank), 0.0::DOUBLE)
                   + COALESCE(1.0::DOUBLE / ({RRF_K} + d.rank), 0.0::DOUBLE),
                   6) + 0.0 AS rrf_score
        FROM b_ranked b FULL JOIN d_ranked d ON b.doc_id = d.doc_id
    )
    SELECT doc_id, bm25_rank, dense_rank, rrf_score,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            ORDER BY rrf_score DESC, doc_id ASC
        ) AS rank FROM fused
    ) WHERE rank <= {HYBRID_TOP_N}
    """


@query(
    "retrieval_hybrid_rrf",
    headline=True,  # r9: the lexical+dense fusion serve shape
    oracle=_hybrid_oracle(),
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.
    2009): the lexical list (BM25 over documents, fixed terms) and the
    dense list (exact cosine against doc {DENSE_QUERY_ID}'s embedding)
    each contribute 1/(60 + rank); lists fuse on doc_id (docs and
    corpus vectors share the id space), missing membership contributes
    0. The standard zero-tuning way to combine keyword and semantic
    search — exactly what a retrieval-augmented curation pipeline runs.

    Plan: each retriever is its own bounded top-DEPTH
    (TakeOrderedAndProject over one corpus scan — see bm25_topn and the
    dense twin below); fusion then touches only 2 x DEPTH rows — the
    full-outer join, RRF arithmetic, and final rank are all on
    constant-size data, so the whole query stays two corpus scans with
    no corpus-sized shuffle."""
    from dbt_on_snowflake_spark.operators.textops import bm25_topn

    b = bm25_topn(spark, sf_dir, RRF_DEPTH).select(
        "doc_id", F.col("rank").alias("bm25_rank")
    )
    return _rrf_fuse(b, _dense_topn(_vectors(spark, sf_dir)))


def _dense_topn(e: DataFrame) -> DataFrame:
    """The fusion's dense retriever: exact-cosine top-RRF_DEPTH against
    doc {DENSE_QUERY_ID}'s embedding — one bounded corpus scan, shared
    by the recompute and the indexed-BM25 hybrid twins."""
    # norms STAGED as columns (q-side once per broadcast build, corpus
    # side once per row): filtering the undefined-cosine rows on
    # isnotnull(cosine) instead pushes the ENTIRE cosine expression into
    # the BroadcastNestedLoopJoin condition, evaluating the fold
    # pipeline twice per corpus row (plans/r17/..._before op 41/42);
    # the staged filter costs one multiply and the cosine is built once
    # from the staged legs — bit-identical arithmetic (_cosine_from is
    # _cosine's own combine step over its own sub-expressions)
    qv = F.broadcast(
        e.filter(F.col("vec_id") == DENSE_QUERY_ID).select(
            F.col("v").alias("qv"), _cosine_norm("v").alias("qn")
        )
    )
    d_scored = (
        e.filter(F.col("vec_id") != DENSE_QUERY_ID)
        .select("vec_id", "v", _cosine_norm("v").alias("vn"))
        .crossJoin(qv)
        # zero-norm embeddings: undefined cosine (NULL) never enters
        # the dense list — same contract as the rerank/_topk paths
        .filter((F.col("qn") * F.col("vn")) != F.lit(0.0))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                F.round(
                    _cosine_from(
                        _cosine_dot("qv", "v"), F.col("qn"), F.col("vn")
                    ),
                    4,
                )
                + 0.0
            ).alias("cosine"),
        )
    )
    d_top = d_scored.orderBy(
        F.col("cosine").desc(), F.col("doc_id").asc()
    ).limit(RRF_DEPTH)
    # unpartitioned window is BOUNDED: it runs over the limit's
    # RRF_DEPTH rows, never the corpus
    wd = Window.orderBy(F.col("cosine").desc(), F.col("doc_id").asc())
    return d_top.withColumn(
        "rank", F.row_number().over(wd).cast("long")
    ).select("doc_id", F.col("rank").alias("dense_rank"))


def _rrf_fuse(b: DataFrame, d: DataFrame) -> DataFrame:
    """RRF fusion of the two bounded top-DEPTH lists: full-outer join,
    1/(60+rank) arithmetic, final rank — all on <= 2 x RRF_DEPTH rows."""
    fused = b.join(d, "doc_id", "full")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
        ),
        6,
    ) + 0.0
    # unpartitioned window is BOUNDED: fused holds <= 2 x RRF_DEPTH rows
    wf = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (
        fused.select(
            "doc_id", "bm25_rank", "dense_rank", rrf.alias("rrf_score")
        )
        .withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= HYBRID_TOP_N)
    )


@query(
    "retrieval_hybrid_rrf_indexed",
    driver=False,  # r10-born: R11_ROTATE_IN; shares the recompute oracle
    oracle=None,  # set below
    headline=True,  # benched: serve-vs-scan twin of retrieval_hybrid_rrf
)
def retrieval_hybrid_rrf_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``retrieval_hybrid_rrf`` with its lexical half SERVED from the
    persisted text index (``build_text_index``): the BM25 list comes
    from term_part-pruned posting lists + the narrow doclen table — no
    re-tokenizing documents.parquet — closing the r9 gap where every
    hybrid query paid two full corpus scans. The dense half stays the
    one bounded embeddings scan (its exact-cosine contract has no
    approximation-free index form). Serving must not change a single
    result row: shares the recompute oracle verbatim."""
    from dbt_on_snowflake_spark.operators.textops import (
        bm25_topn_indexed,
        ensure_text_index,
    )

    # reuse (or first-build) the same persisted index the lexical twin
    # serves from — one artifact per corpus, shared across queries;
    # serve the exact tables ensure probed (fingerprint TOCTOU)
    tables = ensure_text_index(spark, sf_dir)
    b = bm25_topn_indexed(spark, sf_dir, RRF_DEPTH, tables=tables).select(
        "doc_id", F.col("rank").alias("bm25_rank")
    )
    return _rrf_fuse(b, _dense_topn(_vectors(spark, sf_dir)))


def _set_hybrid_indexed_oracle() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    QUERIES["retrieval_hybrid_rrf_indexed"].oracle = QUERIES[
        "retrieval_hybrid_rrf"
    ].oracle


_set_hybrid_indexed_oracle()


# ------------------------------------------- per-query hybrid retrieval

# r9 verdict "What's wrong" #3: the hybrid's dense half served ONE
# fixed query (DENSE_QUERY_ID) — the narrowest oracle surface in the
# retrieval family. This variant fuses per query over the bounded
# _QUERY_PRED set like every other ANN entry: each query doc
# contributes its own term list (the first TERMS_PER_QUERY distinct
# tokens of its text — a deterministic, oracle-expressible stand-in for
# a real query string) to the lexical half and its own embedding to the
# dense half. The lexical list is Lucene match-only (docs containing
# >= 1 query term): with per-query candidate sets the all-docs
# zero-score filler of the single-query form stops being meaningful.
TERMS_PER_QUERY = 3
_QUERY_PRED_DOC = _QUERY_PRED.replace("vec_id", "doc_id")


def _perquery_hybrid_oracle() -> str:
    from dbt_on_snowflake_spark.operators.textops import (
        BM25_B,
        BM25_K1,
    )

    cos = COSINE_SQL.format(a="qe.v", b="e.v")
    terms = " + ".join(
        f"""(ln((s.n_docs - COALESCE(f.df_{i}, 0) + 0.5::DOUBLE)
             / (COALESCE(f.df_{i}, 0) + 0.5::DOUBLE) + 1.0::DOUBLE)
         * (COALESCE(m.tf_{i}, 0) * {BM25_K1 + 1.0}::DOUBLE)
         / (COALESCE(m.tf_{i}, 0) + {BM25_K1}::DOUBLE
            * ({1.0 - BM25_B}::DOUBLE
               + {BM25_B}::DOUBLE * m.dl / s.avgdl)))"""
        for i in range(TERMS_PER_QUERY)
    )
    tf_cols = ", ".join(
        f"MAX(CASE WHEN ti = {i} THEN tf END) AS tf_{i}"
        for i in range(TERMS_PER_QUERY)
    )
    df_cols = ", ".join(
        f"SUM(CASE WHEN ti = {i} THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(TERMS_PER_QUERY)
    )
    return f"""
    WITH q_tok AS (
        SELECT doc_id AS query_id,
               unnest(string_split(text, ' ')) AS term,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents WHERE {_QUERY_PRED_DOC}
    ),
    q_first AS (
        SELECT query_id, term, MIN(pos) AS p FROM q_tok GROUP BY 1, 2
    ),
    qt AS (
        SELECT query_id, term, ti FROM (
            SELECT query_id, term, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY p
            ) - 1 AS ti FROM q_first
        ) WHERE ti < {TERMS_PER_QUERY}
    ),
    b_tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term,
               len(string_split(text, ' ')) AS dl
        FROM documents
    ),
    b_m AS (
        SELECT doc_id, term, COUNT(*) AS tf, MIN(dl) AS dl
        FROM b_tok WHERE term IN (SELECT term FROM qt)
        GROUP BY 1, 2
    ),
    b_j AS (
        SELECT qt.query_id, qt.ti, m.doc_id, m.tf, m.dl
        FROM b_m m JOIN qt ON qt.term = m.term
    ),
    b_qd AS (
        SELECT query_id, doc_id, MIN(dl) AS dl, {tf_cols}
        FROM b_j GROUP BY 1, 2
    ),
    b_df AS (SELECT query_id, {df_cols} FROM b_j GROUP BY 1),
    b_stats AS (
        SELECT COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                   / COUNT(*) AS avgdl
        FROM documents
    ),
    b_scored AS (
        SELECT m.query_id, m.doc_id, ROUND({terms}, 4) + 0.0 AS score
        FROM b_qd m
        JOIN b_df f ON f.query_id = m.query_id
        CROSS JOIN b_stats s
    ),
    b_ranked AS (
        SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY score DESC, doc_id ASC
            ) AS rank FROM b_scored
        ) WHERE rank <= {RRF_DEPTH}
    ),
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    qe AS (SELECT vec_id AS query_id, v FROM e WHERE {_QUERY_PRED}),
    d_scored AS (
        SELECT qe.query_id, e.vec_id AS doc_id,
               ROUND({cos}, 4) + 0.0 AS cosine
        FROM qe JOIN e ON e.vec_id <> qe.query_id
    ),
    d_ranked AS (
        SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, doc_id ASC
            ) AS rank FROM d_scored WHERE NOT isnan(cosine)
        ) WHERE rank <= {RRF_DEPTH}
    ),
    fused AS (
        SELECT COALESCE(b.query_id, d.query_id) AS query_id,
               COALESCE(b.doc_id, d.doc_id) AS doc_id,
               b.rank AS bm25_rank,
               d.rank AS dense_rank,
               ROUND(
                   COALESCE(1.0::DOUBLE / ({RRF_K} + b.rank), 0.0::DOUBLE)
                   + COALESCE(1.0::DOUBLE / ({RRF_K} + d.rank), 0.0::DOUBLE),
                   6) + 0.0 AS rrf_score
        FROM b_ranked b FULL JOIN d_ranked d
          ON b.query_id = d.query_id AND b.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, bm25_rank, dense_rank, rrf_score,
           CAST(rank AS BIGINT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC
        ) AS rank FROM fused
    ) WHERE rank <= {HYBRID_TOP_N}
    """


@query(
    "retrieval_hybrid_rrf_perquery",
    driver=False,  # r10-born: R11_ROTATE_IN
    oracle=None,  # set below (needs textops constants at import time)
)
def retrieval_hybrid_rrf_perquery(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-query hybrid retrieval over the bounded query set: for each
    query doc, RRF-fuse its own BM25 list (terms = the doc's first
    {TERMS_PER_QUERY} distinct tokens; candidates = docs matching >= 1
    term, the Lucene match-only form) with its own exact-cosine dense
    list. Row counts scale with |Q| and the oracle partitions by
    query_id — the generalization the r9 verdict asked for.

    Plan: the per-query term table is bounded (TERMS_PER_QUERY x |Q|
    rows) and broadcast; the corpus token stream broadcast-semi-joins
    against the distinct terms, so only matching tokens ever reach the
    (doc_id, term) aggregation — the inverted-match shape of
    text_contamination, never a corpus x query blowup. Per-query df and
    the tf pivot are aggregates over those matches; the global stats
    row is one narrow agg. Dense half is the shared Arrow brute-force
    scorer at depth {RRF_DEPTH}. Fusion and final rank run on
    <= 2 x DEPTH x |Q| rows."""
    docs = table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    qt = _perquery_terms(docs)
    matched = (
        docs.select(
            "doc_id",
            F.size(toks).alias("dl"),
            F.explode(toks).alias("term"),
        )
        .join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.min("dl").alias("dl"))
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum(F.size(toks)).cast("double") / F.count(F.lit(1))).alias(
            "avgdl"
        ),
    )
    b = _perquery_lexical(matched, qt, stats)
    d = _perquery_dense(spark, sf_dir)
    return _perquery_fuse(b, d)


def _perquery_terms(docs: DataFrame) -> DataFrame:
    """(query_id, term, ti): each query doc's first TERMS_PER_QUERY
    distinct tokens in first-appearance order — bounded (|Q| x terms).

    localCheckpointed: both hybrid twins reference the relation 2-3
    times (distinct-term probe, part collect, the ti join), and the
    uncut lineage re-ran the query-doc explode+agg+window per
    reference (the r17 incremental-dedup recipe — guide §3.3/§5;
    bounded rows, so the materialization is tiny)."""
    toks = F.split("text", " ")
    q_first = (
        docs.filter(F.expr(_QUERY_PRED_DOC))
        .select(
            F.col("doc_id").alias("query_id"),
            F.posexplode(toks).alias("pos", "term"),
        )
        .groupBy("query_id", "term")
        .agg(F.min("pos").alias("p"))
    )
    wq = Window.partitionBy("query_id").orderBy("p")
    return (
        q_first.withColumn("ti", F.row_number().over(wq) - 1)
        .filter(F.col("ti") < TERMS_PER_QUERY)
        .select("query_id", "term", "ti")
        .localCheckpoint()
    )


def _perquery_lexical(
    matched: DataFrame, qt: DataFrame, stats: DataFrame
) -> DataFrame:
    """Per-query BM25 lists from a (doc_id, term, tf, dl) match
    relation — shared verbatim by the recompute path (matches from a
    corpus token scan) and the indexed path (matches from pruned
    posting lists), so both produce bit-identical scores. Every
    aggregate is duplicate-idempotent (MAX/MIN per doc, df counted
    over the per-doc collapsed rows), so a posting list carrying
    exact duplicates from a retried at-least-once ingest batch scores
    identically to a clean one."""
    from dbt_on_snowflake_spark.operators.textops import BM25_B, BM25_K1

    joined = matched.join(F.broadcast(qt), "term")
    per_qd = joined.groupBy("query_id", "doc_id").agg(
        F.min("dl").alias("dl"),
        *[
            F.max(F.when(F.col("ti") == i, F.col("tf"))).alias(f"tf_{i}")
            for i in range(TERMS_PER_QUERY)
        ],
    )
    # per-query df as a WINDOW over per_qd, not a groupBy + broadcast
    # join-back (r17): the join-back referenced per_qd twice, re-running
    # the whole corpus-token match subtree for the aggregate; the
    # window's partitionBy(query_id) is the SAME key the rank window
    # below shuffles on, so both ride one exchange (guide §2.4) and
    # the match subtree is evaluated once. COUNT over the partition
    # equals the grouped COUNT bit-for-bit (exact integers).
    wdf = Window.partitionBy("query_id")
    scored = per_qd.select(
        "*",
        *[
            F.count(F.col(f"tf_{i}")).over(wdf).alias(f"df_{i}")
            for i in range(TERMS_PER_QUERY)
        ],
    ).crossJoin(F.broadcast(stats))
    expr = None
    for i in range(TERMS_PER_QUERY):
        df_i = F.coalesce(F.col(f"df_{i}"), F.lit(0))
        tf_i = F.coalesce(F.col(f"tf_{i}"), F.lit(0))
        idf = F.log(
            (F.col("n_docs") - df_i + 0.5) / (df_i + 0.5) + 1.0
        )
        term = idf * (tf_i * (BM25_K1 + 1.0)) / (
            tf_i
            + BM25_K1 * (1.0 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
        )
        expr = term if expr is None else expr + term
    b_scored = scored.select(
        "query_id", "doc_id", (F.round(expr, 4) + 0.0).alias("score")
    )
    wb = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        b_scored.withColumn("rank", F.row_number().over(wb).cast("long"))
        .filter(F.col("rank") <= RRF_DEPTH)
        .select("query_id", "doc_id", F.col("rank").alias("bm25_rank"))
    )


def _perquery_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _vectors(spark, sf_dir)
    qdf = e.filter(F.expr(_QUERY_PRED))
    return _topk_window(
        _bruteforce_score_arrow(e.select("vec_id", "v"), qdf, k=RRF_DEPTH),
        k=RRF_DEPTH,
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("dense_rank"),
    )


def _perquery_fuse(b: DataFrame, d: DataFrame) -> DataFrame:
    fused = b.join(d, ["query_id", "doc_id"], "full")
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("bm25_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(RRF_K) + F.col("dense_rank")), F.lit(0.0)
        ),
        6,
    ) + 0.0
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id").asc()
    )
    return (
        fused.select(
            "query_id", "doc_id", "bm25_rank", "dense_rank",
            rrf.alias("rrf_score"),
        )
        .withColumn("rank", F.row_number().over(wf).cast("long"))
        .filter(F.col("rank") <= HYBRID_TOP_N)
    )


@query(
    "retrieval_hybrid_rrf_perquery_indexed",
    driver=False,  # r10-born: R11_ROTATE_IN; shares the recompute oracle
    oracle=None,  # set below with the recompute twin's
)
def retrieval_hybrid_rrf_perquery_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """``retrieval_hybrid_rrf_perquery`` with the lexical half SERVED
    from the persisted text index — the payoff of a real inverted
    index: ARBITRARY per-query terms resolve to pruned posting-list
    reads. The corpus text is never re-tokenized: the only
    documents.parquet scan is the bounded query-doc side (doc_id
    predicate pushed to the scan, the ANN indexed-query precedent),
    term matches come from <= |distinct terms| posting partitions
    (term_part pruning via the same bounded-collect probe the
    fixed-term serve uses), tf/dl ride the postings rows, and
    n_docs/avgdl is the persisted one-row stats table (built with the
    identical expression, so the double is bit-equal). Because the
    per-query spec is Lucene match-only, NO corpus-width doclen join
    is needed — the whole lexical half is index reads + broadcast
    joins over bounded relations. Shares the recompute oracle
    verbatim.

    At-least-once caveat (the price of skipping the doclen gate): in
    the window between a crash after ``text_index_append``'s postings
    write and the batch's redelivery, the orphaned docs ARE visible
    here (as candidates and in per-query df) while n_docs/avgdl
    excludes them — unlike ``bm25_topn_indexed``, whose doclen spine
    makes uncommitted postings fully invisible. The window is bounded
    by the ingest's retry; duplicates from the retry itself are still
    absorbed (MAX/MIN aggregates)."""
    from dbt_on_snowflake_spark.operators.textops import (
        _term_part,
        ensure_text_index,
    )

    stats_t, postings_t, _doclen_t = ensure_text_index(spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    qt = _perquery_terms(docs)
    terms = qt.select("term").distinct()
    # bounded collect (<= TERMS_PER_QUERY x |Q| <= 16 part values):
    # the probe's partition list, dedup.py:1220 precedent
    parts = [
        r.p
        for r in terms.select(_term_part().alias("p")).distinct().collect()
    ]
    matched = (
        spark.table(postings_t)
        .filter(F.col("term_part").isin(parts))
        .join(F.broadcast(terms), "term")
        .select("doc_id", "term", "tf", "dl")
    )
    stats = spark.table(stats_t)
    b = _perquery_lexical(matched, qt, stats)
    return _perquery_fuse(b, _perquery_dense(spark, sf_dir))


def _set_perquery_indexed_oracle() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    QUERIES["retrieval_hybrid_rrf_perquery_indexed"].oracle = QUERIES[
        "retrieval_hybrid_rrf_perquery"
    ].oracle


def _set_perquery_hybrid_oracle() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    QUERIES["retrieval_hybrid_rrf_perquery"].oracle = (
        _perquery_hybrid_oracle()
    )


_set_perquery_hybrid_oracle()
_set_perquery_indexed_oracle()  # after the recompute oracle it shares


# ---------------------------------------------------- MMR diversified top-k


def _mmr_oracle() -> str:
    """Chained-CTE DuckDB oracle for the sequential MMR greedy (the
    textops BPE-trainer precedent: a bounded recursion unrolls to TOP_K
    materialized step states, each a plain windowed SELECT). All scores
    are scaled int64 (rel4 / sim4 = round(cos * 10000)) so the
    argmax-per-step comparison is bit-free on both engines; lambda=0.5
    makes ranking by rel4 - maxsim4 equivalent to the textbook
    0.5*rel - 0.5*maxsim."""
    cos_qc = COSINE_SQL.format(a="q.v", b="c.v")
    cos_ab = COSINE_SQL.format(a="ea.v", b="eb.v")
    parts = [
        f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE {_QUERY_PRED}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS nid,
               CAST(ROUND({cos_qc} * 10000, 0) AS BIGINT) AS rel4
        FROM q JOIN e c ON q.vec_id <> c.vec_id
        WHERE NOT isnan({cos_qc})
    ),
    shortlist AS (
        SELECT query_id, nid, rel4 FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY rel4 DESC, nid ASC
            ) AS rn FROM scored
        ) WHERE rn <= {RERANK_SHORTLIST}
    ),
    pairs AS (
        SELECT s1.query_id, s1.nid AS a, s2.nid AS b,
               CAST(ROUND({cos_ab} * 10000, 0) AS BIGINT) AS sim4
        FROM shortlist s1
        JOIN shortlist s2
          ON s1.query_id = s2.query_id AND s1.nid <> s2.nid
        JOIN e ea ON ea.vec_id = s1.nid
        JOIN e eb ON eb.vec_id = s2.nid
    ),
    p1 AS (
        SELECT query_id, nid, rel4 AS score4, 1 AS mmr_rank FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY rel4 DESC, nid ASC
            ) AS rn FROM shortlist
        ) WHERE rn = 1
    ),
    sel1 AS (SELECT query_id, nid FROM p1)"""
    ]
    for k in range(2, TOP_K + 1):
        parts.append(f""",
    c{k} AS (
        SELECT s.query_id, s.nid, s.rel4 - MAX(pr.sim4) AS score4
        FROM shortlist s
        JOIN pairs pr ON pr.query_id = s.query_id AND pr.a = s.nid
        JOIN sel{k - 1} sl
          ON sl.query_id = pr.query_id AND sl.nid = pr.b
        WHERE NOT EXISTS (
            SELECT 1 FROM sel{k - 1} x
            WHERE x.query_id = s.query_id AND x.nid = s.nid
        )
        GROUP BY s.query_id, s.nid, s.rel4
    ),
    p{k} AS (
        SELECT query_id, nid, score4, {k} AS mmr_rank FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY score4 DESC, nid ASC
            ) AS rn FROM c{k}
        ) WHERE rn = 1
    ),
    sel{k} AS (
        SELECT query_id, nid FROM sel{k - 1}
        UNION ALL SELECT query_id, nid FROM p{k}
    )""")
    picks = "\n        UNION ALL ".join(
        f"SELECT * FROM p{k}" for k in range(1, TOP_K + 1)
    )
    parts.append(f"""
    SELECT p.query_id, p.nid AS neighbor_id,
           CAST(p.mmr_rank AS BIGINT) AS mmr_rank,
           s.rel4 / 10000.0 + 0.0 AS cosine,
           p.score4 AS score_scaled
    FROM ({picks}) p
    JOIN shortlist s ON s.query_id = p.query_id AND s.nid = p.nid""")
    return "".join(parts)


def mmr_greedy(ids, rel4, sim4, k):
    """The sequential MMR selection on SCALED-INT scores (lambda=0.5 =>
    rank by rel4 - maxsim4; ties to the smallest neighbor id): the pure
    kernel behind ann_mmr_topk's per-query applyInPandas, exposed so a
    property test can pit the vectorized selection against an
    independent textbook implementation over random inputs
    (tests/test_properties.py)."""
    import numpy as np

    n = len(ids)
    picked: list[int] = []
    scores_out: list[int] = []
    remaining = np.ones(n, dtype=bool)
    for _ in range(min(k, n)):
        if not picked:
            step = rel4.astype(np.int64)
        else:
            step = rel4 - sim4[:, picked].max(axis=1)
        cand = np.flatnonzero(remaining)
        sub = step[cand]
        best = int(cand[np.lexsort((ids[cand], -sub))[0]])
        picked.append(best)
        scores_out.append(int(step[best]))
        remaining[best] = False
    return picked, scores_out


@query(
    "ann_mmr_topk",
    headline=True,  # r9: the diversified-serving heavyweight
    oracle=_mmr_oracle(),
)
def ann_mmr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell & Goldstein 1998): a
    diversified top-k for retrieval-augmented training-data selection —
    greedily pick the candidate maximizing lambda*rel(q,d) -
    (1-lambda)*max_{s in S} sim(d,s), so near-duplicate neighbors don't
    crowd the result. lambda=0.5; scores are scaled int64, ties break
    to the smallest neighbor_id (deterministic on both engines).

    Plan: the exact shortlist comes from the shared partial-top-k arrow
    scorer (one corpus scan, rank shuffle at shortlist depth); member
    vectors are gathered with ONE more broadcast-join corpus scan (same
    posture as ann_pq_rerank_topk); the inherently sequential greedy
    then runs per query over its own Q x {RERANK_SHORTLIST} shortlist
    inside applyInPandas — O(k * shortlist^2) on tiny groups, never on
    corpus-sized data."""
    import numpy as np
    import pandas as pd

    e = _vectors(spark, sf_dir)
    short = _topk_window(
        _bruteforce_score_arrow(
            e.select("vec_id", "v"),
            e.filter(F.expr(_QUERY_PRED)),
            k=RERANK_SHORTLIST,
        ),
        k=RERANK_SHORTLIST,
    ).select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine") * 10000).cast("long").alias("rel4"),
    )
    withv = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")
    ).join(F.broadcast(short), "neighbor_id")

    out_schema = (
        "query_id long, neighbor_id long, mmr_rank long, "
        "cosine double, score_scaled long"
    )

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
        rel4 = pdf["rel4"].to_numpy(dtype=np.int64)
        V = np.stack(pdf["nv"].to_numpy()).astype(np.float64)
        # pairwise cosines with the engine-exact arithmetic contract:
        # sequential-fold cumsum dots, dot/(na*nb), half-away rounding
        norms = np.sqrt(np.cumsum(V * V, axis=1)[:, -1])
        dots = np.cumsum(V[:, None, :] * V[None, :, :], axis=2)[:, :, -1]
        cos = dots / (norms[:, None] * norms[None, :])
        sim4 = np.copysign(
            np.floor(np.abs(cos) * 10000.0 + 0.5), cos
        ).astype(np.int64)
        qid = int(pdf["query_id"].iloc[0])
        picked, scores_out = mmr_greedy(ids, rel4, sim4, TOP_K)
        pi = np.array(picked, dtype=np.int64)
        return pd.DataFrame(
            {
                "query_id": np.full(len(pi), qid, dtype=np.int64),
                "neighbor_id": ids[pi],
                "mmr_rank": np.arange(1, len(pi) + 1, dtype=np.int64),
                "cosine": rel4[pi] / 10000.0 + 0.0,
                "score_scaled": np.array(scores_out, dtype=np.int64),
            }
        )

    return withv.groupBy("query_id").applyInPandas(mmr, out_schema)


# ------------------------------------------------------ hard-negative mining

HARD_NEG_POS_BAND = 0.95  # cosine >= this is a near-duplicate, not a negative


@query(
    "ann_hard_negatives",
    driver=False,  # r7-born; rotates into the r8 driver export
    oracle=f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    q AS (SELECT * FROM e WHERE {_QUERY_PRED}),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({COSINE_SQL.format(a="q.v", b="c.v")}, 4) + 0.0 AS cosine
        FROM q JOIN e c ON q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM scored
        WHERE cosine < {HARD_NEG_POS_BAND}
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """,
)
def ann_hard_negatives(
    spark: SparkSession, sf_dir: str, kernel: str | None = None
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar corpus vectors AFTER excluding the near-duplicate
    band (cosine >= 0.95 is a positive/duplicate, not a negative — the
    standard 'filter false negatives' step in dense-retrieval training,
    cf. DPR/ANCE). Identical plan posture to ann_topk_bruteforce; the
    arrow default applies the band cut inside the shared scorer, so
    excluded positives never enter any sort."""
    import os as _os

    kernel = kernel or _os.environ.get("SPARK_GRAFT_ANN_KERNEL", "arrow")
    e = _vectors(spark, sf_dir)
    if kernel == "arrow":
        return _topk_window(
            _bruteforce_score_arrow(
                e.select("vec_id", "v"),
                e.filter(F.expr(_QUERY_PRED)),
                max_cos=HARD_NEG_POS_BAND,
            )
        )
    q = F.broadcast(e.filter(F.expr(_QUERY_PRED))).alias("q")
    c = e.alias("c")
    cos = F.round(_cosine("q.v", "c.v"), 4) + 0.0
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        q.join(c, F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") < HARD_NEG_POS_BAND)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


@query(
    "ann_pq_recall_eval",
    driver=False,  # r7-born; rotates into the r8 driver export
    oracle=f"""
    WITH {_PQ_CODES_CTE},
    q AS (SELECT * FROM e WHERE {_QUERY_PRED}),
    bscored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({COSINE_SQL.format(a="q.v", b="c.v")}, 4) + 0.0 AS cosine
        FROM q JOIN e c ON q.vec_id <> c.vec_id
    ),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
            ) AS rank FROM bscored
        ) WHERE rank <= {TOP_K}
    ),
    lut AS (
        SELECT qv.vec_id AS query_id, ms.m, c.label,
               CAST(ROUND(list_dot_product({_PQ_SUB_SQL.format(v='qv.v', m='ms.m')},
                                           {_PQ_SUB_SQL.format(v='c.v', m='ms.m')})
                          * 10000) AS BIGINT) AS p
        FROM q qv CROSS JOIN ms CROSS JOIN pqcb c
    ),
    adc AS (
        SELECT l.query_id, cd.vec_id AS neighbor_id,
               CAST(SUM(l.p) AS BIGINT) AS score
        FROM (SELECT vec_id, m, code FROM pq_codes WHERE rn = 1) cd
        JOIN lut l ON l.m = cd.m AND l.label = cd.code
        WHERE cd.vec_id <> l.query_id
        GROUP BY 1, 2
    ),
    pqtop AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC
            ) AS rank FROM adc
        ) WHERE rank <= {TOP_K}
    ),
    hits AS (
        SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM brute b JOIN pqtop p
          ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
        GROUP BY b.query_id
    )
    SELECT q.vec_id AS query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {TOP_K}, 4) + 0.0
               AS recall_at_k
    FROM q LEFT JOIN hits h ON h.query_id = q.vec_id
    """,
)
def ann_pq_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECALL@K of PQ/ADC retrieval against exact brute force — the PQ
    acceptance gate ('is M=4 quantization loss tolerable'), mirroring
    ann_recall_eval's pattern so every index variant (IVF, PQ, IVF+PQ)
    evaluates through one shape. Both retrievals run as their own
    plan-audited shapes; the comparison joins two K x |queries| tables."""
    b = ann_topk_bruteforce(spark, sf_dir).select("query_id", "neighbor_id")
    p = ann_pq_adc_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        b.join(p, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    qs = (
        _vectors(spark, sf_dir)
        .filter(F.expr(_QUERY_PRED))
        .select(F.col("vec_id").alias("query_id"))
    )
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        (
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double") / TOP_K,
                4,
            )
            + F.lit(0.0)
        ).alias("recall_at_k"),
    )


def _ivfpq_oracle(codes_cte: str, coarse_where: str = "") -> str:
    """The trained-coarse IVFPQ oracle (r16), parameterized like the
    flat-ADC pair: ``codes_cte`` is the PQ codes chain (the plain
    ``_PQ_CODES_CTE`` or the frozen-codebook append variant) and
    ``coarse_where`` restricts the coarse training sample the same way
    (frozen cells for the append family). The coarse chain, the
    ``casg`` cell assignment, probes, LUT and ADC are identical across
    variants — one definition, two instantiations."""
    return f"""
    WITH {codes_cte},
    {_coarse_lloyd_sql(coarse_where)},
    {_CASG_SQL},
    q AS (SELECT * FROM e WHERE {_QUERY_PRED}),
    qc AS (
        SELECT q.vec_id AS query_id, c.label,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND({COSINE_SQL.format(a="q.v", b="c.v")}, 4)
                            DESC, c.label ASC
               ) AS crank
        FROM q CROSS JOIN cccb c
    ),
    probes AS (SELECT query_id, label FROM qc WHERE crank <= {N_PROBE}),
    lut AS (
        SELECT qv.vec_id AS query_id, ms.m, c.label,
               CAST(ROUND(list_dot_product({_PQ_SUB_SQL.format(v='qv.v', m='ms.m')},
                                           {_PQ_SUB_SQL.format(v='c.v', m='ms.m')})
                          * 10000) AS BIGINT) AS p
        FROM q qv CROSS JOIN ms CROSS JOIN pqcb c
    ),
    adc AS (
        SELECT l.query_id, cd.vec_id AS neighbor_id,
               CAST(SUM(l.p) AS BIGINT) AS approx_dot_scaled
        FROM (SELECT vec_id, m, code FROM pq_codes WHERE rn = 1) cd
        JOIN casg a ON a.vec_id = cd.vec_id
        JOIN probes pr ON pr.label = a.cell
        JOIN lut l ON l.query_id = pr.query_id
                  AND l.m = cd.m AND l.label = cd.code
        WHERE cd.vec_id <> l.query_id
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY approx_dot_scaled DESC, neighbor_id ASC
        ) AS rank
        FROM adc
    )
    SELECT query_id, neighbor_id, approx_dot_scaled,
           CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """


@query(
    "ann_ivfpq_topk",
    driver=False,  # r16 EVIDENCE RESET: exported via R16_EXPORT (the
    # coarse quantizer is Lloyd-trained this round — prior driver
    # greens evidence the retired label-cell semantics)
    oracle=_ivfpq_oracle(_PQ_CODES_CTE),
)
def ann_ivfpq_topk(
    spark: SparkSession, sf_dir: str, kernel: str | None = None
) -> DataFrame:
    """IVF+PQ — the production ANN composition (FAISS's IVFPQ): the
    coarse quantizer restricts each query to its nprobe=2 nearest cells,
    and ADC scores ONLY those cells' codes. Per query the scan cost
    drops from O(N) code rows to O(nprobe * N / cells); with the codes
    table cell-partitioned on disk (build_ivfpq_index layout) the probe
    becomes a literal partition prune. Probes + LUTs ride one bounded
    broadcast (arrow default: a bounded kernel closure with the probe
    sets as a membership mask + per-batch partial top-k); the rank
    window is again the only corpus-sized shuffle.

    r16 (VERDICT r15 Next #2): the coarse quantizer is now the
    Lloyd-TRAINED full-dim cell set (``_coarse_train`` — K = |labels| +
    COARSE_EXTRA), not the frozen ingest-label means: corpus vectors
    are re-assigned to their nearest trained cell (``_assign_cells``)
    and queries probe trained cells, which is what makes this a true
    IVF on data whose labels don't track the cluster structure (the
    scrambled-label gate in tests/test_ann_quality.py). The PQ codebook
    side is unchanged (r15's in-subspace Lloyd)."""
    import os as _os

    kernel = kernel or _os.environ.get("SPARK_GRAFT_PQ_KERNEL", "arrow")
    e = _vectors(spark, sf_dir)
    # BOTH quantizers train driver-side on ONE bounded sample collect
    # (r16 review finding 3): the coarse cells (full-dim Lloyd) and
    # the PQ codebook (in-subspace Lloyd) — each a local relation
    # downstream. The query rows for the arrow path's LUTs ride the
    # same collect job (_sample_and_query_rows); the probe ranking
    # stays plan-side over the query RELATION.
    samp, qrows = _sample_and_query_rows(e)
    coarse = _coarse_train_rows(samp)
    cvec = _local_df(spark, coarse, _PQ_CB_SCHEMA)
    entries = _lloyd_train_rows(samp)
    cb_row = _entries_cb_row(spark, entries)
    codes = _pq_encode(
        _assign_cells(e.select("vec_id", "label", "v"), coarse), cb_row
    )
    q = e.filter(F.expr(_QUERY_PRED))
    probes = _ivf_probes(q, cvec)

    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot_scaled").desc(), F.col("neighbor_id").asc()
    )
    if kernel == "arrow":
        scored = _adc_score_arrow(
            codes.select("vec_id", "label", "bests"),
            _qlut_rows(qrows, entries),
            probes=probes,
        )
    else:
        scored = _ivfpq_hof_scored(
            codes, probes.join(_qlut_expr(q, cb_row), "query_id")
        )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


def _ivf_probes(q: DataFrame, cvec: DataFrame) -> DataFrame:
    """(query_id, plabel): rank the coarse-quantizer cells per query by
    rounded cosine and keep the nprobe nearest — ONE definition of the
    probe rounding/tie-break shared by the inline and persisted IVFPQ
    twins, which share an oracle verbatim and must stay bit-identical
    (r15 review pass 7, finding 1)."""
    wq = Window.partitionBy("query_id").orderBy(
        F.col("ccos").desc(), F.col("clabel").asc()
    )
    return (
        q.alias("q")
        .crossJoin(F.broadcast(cvec.alias("c")))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.label").alias("clabel"),
            F.round(_cosine("q.v", "c.v"), 4).alias("ccos"),
        )
        .withColumn("crank", F.row_number().over(wq))
        .filter(F.col("crank") <= N_PROBE)
        .select("query_id", F.col("clabel").alias("plabel"))
    )


def _ivfpq_hof_scored(codes: DataFrame, probe_lut: DataFrame) -> DataFrame:
    """The interpreted IVFPQ scoring join — codes x the broadcast
    (probe, LUT) relation, per-subspace map lookups summed — shared by
    both twins (same bit-identity requirement as ``_ivf_probes``)."""
    score = None
    for m in range(PQ_M):
        term = F.element_at(F.col("luts")[m], F.col("bests")[m]["code"])
        score = term if score is None else score + term
    return (
        codes.join(F.broadcast(probe_lut), F.col("label") == F.col("plabel"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            score.alias("approx_dot_scaled"),
        )
    )


def _collect_codebook_entries(spark: SparkSession, codebook_table: str):
    """The persisted codebook as the sorted (label, vector) entries
    list the driver-side LUT builder consumes — bounded control-plane
    data (K = |labels| + PQ_LLOYD_EXTRA rows)."""
    return sorted(
        (int(r["label"]), list(r["v"]))
        for r in spark.table(codebook_table).collect()
    )


def _cb_and_query_rows(
    spark: SparkSession, codebook_table: str, queries: DataFrame
) -> tuple[list, list]:
    """The persisted-serve pair of bounded driver-side collects — the
    codebook entries (``_collect_codebook_entries``'s contract) and the
    query rows — as ONE ``collect_legs`` job. Content of each half is
    identical to the two separate collects; entries are sorted
    driver-side exactly as before."""
    cb_leg = spark.table(codebook_table).select(
        F.col("label").cast("long").alias("vec_id"),
        F.col("v").cast("array<double>").alias("v"),
    )
    q_leg = queries.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("v").cast("array<double>").alias("v"),
    )
    cb_rows, qrows = collect_legs(cb_leg, q_leg)
    entries = sorted((int(r["vec_id"]), list(r["v"])) for r in cb_rows)
    return entries, qrows


def ensure_ivfpq_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Build the persisted IVFPQ family for ``sf_dir`` if absent and
    return ``(cells_table, codebook_table, codes_table)`` — the three
    artifacts a loaded FAISS IVFPQ index holds: the trained coarse
    CELLS (K full-dim centroids, bounded), the trained PQ codebook
    (bounded), and the encoded corpus codes PARTITIONED BY trained
    cell. Its own family — NOT ensure_pq_index's flat codes: the flat
    PQ index (IndexPQ) and the inverted-list index (IndexIVFPQ) are
    different on-disk layouts serving different read paths, and
    reusing the flat family would force every ivfpq ensure to also
    build an index it never reads. Suffix keys on the corpus
    fingerprint x IVFPQ_ALGO so algo/constant changes rotate (and GC)
    the pre-change generation (r15 review finding 1)."""
    import hashlib

    from dbt_on_snowflake_spark.testdata import (
        ensure_index_tables,
        gc_superseded_index_tables,
        index_suffix,
    )

    sfx = index_suffix(spark, sf_dir, "ivfpq", "embeddings", algo=IVFPQ_ALGO)
    cells_table = f"ivf_cells_{sfx}"
    codebook_table = f"pq_codebook_ivp_{sfx}"
    codes_table = f"pq_codes_ivp_{sfx}"

    def _build() -> None:
        # reclaim the RETIRED pre-r16 'ivfpqc' centroids-only family
        # (the serve's coarse quantizer was a ONE-table frozen
        # label-mean centroid list before the cells were trained): its
        # path8 keys on the old tag, so the regular suffix GC above
        # can never reach it — sweep the whole family with a
        # fingerprint no real table carries
        dead8 = hashlib.md5(f"ivfpqc:{sf_dir}".encode()).hexdigest()[:8]
        gc_superseded_index_tables(
            spark, ("ann_centroids_",), f"{dead8}_dead"
        )
        build_ivfpq_index(
            spark,
            _vectors(spark, sf_dir),
            cells_table=cells_table,
            codebook_table=codebook_table,
            codes_table=codes_table,
        )

    ensure_index_tables(
        spark,
        tables=(codes_table, codebook_table, cells_table),
        job_group="ivfpq_index",
        gc_prefixes=(
            "ivf_cells_",
            "pq_codebook_ivp_",
            "pq_codes_ivp_",
            "pq_tombstones_ivp_",
        ),
        gc_suffix=sfx,
        build=_build,
    )
    return cells_table, codebook_table, codes_table


def _ivfpq_serve(
    spark: SparkSession,
    sf_dir: str,
    cells_t: str,
    cb_t: str,
    cd_t: str,
    kernel: str | None = None,
) -> DataFrame:
    """The persisted-IVFPQ read path over an already-ensured family —
    shared by the build-once serve and the append-grown serve (one
    definition of the probe/prune/score pipeline, the
    ``_adc_serve`` convention)."""
    import os as _os

    kernel = kernel or _os.environ.get("SPARK_GRAFT_PQ_KERNEL", "arrow")
    e = _vectors(spark, sf_dir)
    q = e.filter(F.expr(_QUERY_PRED))
    probes = _ivf_probes(q, spark.table(cells_t))
    # bounded: <= MAX_QUERIES x N_PROBE rows — collected once, feeding
    # the partition-prune filter, the arrow kernel's per-query masks,
    # AND the interpreted branch's probe relation (no lineage re-run).
    # Arrow path: the probe pairs, the codebook entries, and the query
    # rows are ALL bounded driver-side relations — one collect_legs
    # job replaces three back-to-back collects (guide §5 driver
    # round-trips); each leg's content is exactly what its separate
    # collect produced.
    if kernel == "arrow":
        probe_leg = probes.select(
            F.col("query_id").cast("long").alias("vec_id"),
            F.col("plabel").cast("long").alias("plabel"),
            F.lit(None).cast("array<double>").alias("v"),
        )
        cb_leg = spark.table(cb_t).select(
            F.col("label").cast("long").alias("vec_id"),
            F.lit(None).cast("long").alias("plabel"),
            F.col("v").cast("array<double>").alias("v"),
        )
        q_leg = q.select(
            F.col("vec_id").cast("long").alias("vec_id"),
            F.lit(None).cast("long").alias("plabel"),
            F.col("v").cast("array<double>").alias("v"),
        )
        probe_raw, cb_rows, qrows = collect_legs(probe_leg, cb_leg, q_leg)
        probe_rows = [
            (int(r["vec_id"]), int(r["plabel"])) for r in probe_raw
        ]
        entries = sorted(
            (int(r["vec_id"]), list(r["v"])) for r in cb_rows
        )
    else:
        probe_rows = [
            (int(r.query_id), int(r.plabel)) for r in probes.collect()
        ]
    cells = sorted({lab for _, lab in probe_rows})
    # the label-CARRYING tombstone-gated read (_live_codes projects the
    # partition column away for the full-scan serves; the prune needs it)
    from dbt_on_snowflake_spark.engine.index_delete import live_rows

    pruned = live_rows(
        spark, spark.table(cd_t), _pq_tombstones(cd_t), "vec_id"
    ).filter(F.col("label").isin(cells))
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot_scaled").desc(), F.col("neighbor_id").asc()
    )
    if kernel == "arrow":
        scored = _adc_score_arrow(
            pruned.select("vec_id", "label", "bests"),
            _qlut_rows(qrows, entries),
            probes=probe_rows,
        )
    else:
        qlut = _qlut_expr(q, _codebook_row(spark.table(cb_t)))
        probe_lut = spark.createDataFrame(
            probe_rows, "query_id long, plabel long"
        ).join(qlut, "query_id")
        scored = _ivfpq_hof_scored(pruned, probe_lut)
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
    )


@query(
    "ann_ivfpq_indexed",
    driver=False,  # r15-born: R16_ROTATE_IN (first driver row due r16)
    oracle=None,  # set below: shares ann_ivfpq_topk's oracle verbatim
    headline=True,  # r16 (VERDICT r15 Next #6): the partition-pruned
    # serve is the flagship 100 TB ANN path — tracked round-over-round
    # beside the linear ann_pq_adc_topk it supersedes at scale
)
def ann_ivfpq_indexed(
    spark: SparkSession, sf_dir: str, kernel: str | None = None
) -> DataFrame:
    """``ann_ivfpq_topk`` served from PERSISTED artifacts — the
    production IVFPQ read path (what FAISS serves from a loaded index):
    trained coarse cells, trained PQ codebook, and CELL-PARTITIONED
    codes from ``ensure_ivfpq_index`` (steady state is a tableExists
    probe), so the per-query scan is a LITERAL partition prune: the
    codes scan is restricted to the union of probed cells before the
    kernel runs (a pushed-down partition filter on the bounded
    collected probe set), and per-query cell masks apply inside the
    kernel. The only pass over the embeddings parquet is the bounded
    query side — no re-encode, no retraining (plan-pinned by
    ``test_ivfpq_indexed_prunes_to_probed_cells``). Shares the inline
    twin's oracle verbatim: both quantizer trainings are
    sample-deterministic, so serving persisted must not change a row.

    At 100 TB this is THE sublinear ANN serve: per query it reads
    O(nprobe / cells) of a 128x-compressed corpus — partition-pruned
    disk reads, bounded broadcast state, one top-k exchange. r16: the
    cells are Lloyd-TRAINED (VERDICT r15 Next #2), so the prune now
    follows the data's own cluster structure, not the ingest labels."""
    cells_t, cb_t, cd_t = ensure_ivfpq_index(spark, sf_dir)
    return _ivfpq_serve(spark, sf_dir, cells_t, cb_t, cd_t, kernel)


def _set_ivfpq_indexed_oracle() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    QUERIES["ann_ivfpq_indexed"].oracle = QUERIES["ann_ivfpq_topk"].oracle


_set_ivfpq_indexed_oracle()


def build_pq_index(
    spark: SparkSession,
    e: DataFrame,
    *,
    codebook_table: str,
    codes_table: str,
) -> None:
    """Persist the PQ serving artifact: the tiny (label, v) codebook and
    the encoded corpus codes PARTITIONED BY coarse label — 'encode once,
    search many'. The codes table is what ADC reads at serving time (no
    float vectors); partitioning by label makes the IVF+PQ probe a
    partition prune. Same repartition-before-partitionBy discipline as
    build_ann_index (one file per cell, no small-file explosion)."""
    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table

    # a full rebuild reads the corpus of record — reset the family's
    # tombstone slate (engine/index_delete.py semantics)
    from dbt_on_snowflake_spark.engine.index_delete import (
        mark_engine_dir,
    )

    _drop_managed_table(spark, _pq_tombstones(codes_table))
    _drop_managed_table(spark, codebook_table)
    _pq_codebook_vectors(e).write.mode("overwrite").saveAsTable(codebook_table)
    mark_engine_dir(spark, codebook_table)  # ownership proof (pass 5 #3)
    _drop_managed_table(spark, codes_table)
    codes = _pq_encode(
        e.select("vec_id", "label", "v"),
        _codebook_row(spark.table(codebook_table)),
    )
    # the BUILD-TIME quantization-error baseline (underscore sidecar —
    # invisible to reads, preserved by the compaction/fold swap; the
    # drift gate compares every later state of the grown codes against
    # it, ``pq_index_drift``) rides the write pass via observe instead
    # of a separate post-write scan (r17)
    observed, obs = _observe_qerr(codes)
    (
        observed.repartition("label")
        .write.mode("overwrite")
        .partitionBy("label")
        .saveAsTable(codes_table)
    )
    m = _observed_row(obs, lambda: _qerr_row(spark, codes_table))
    _write_qstats_sidecar(spark, codes_table, m["mean_qerr"], m["n_rows"])


def build_ivfpq_index(
    spark: SparkSession,
    e: DataFrame,
    *,
    cells_table: str,
    codebook_table: str,
    codes_table: str,
) -> None:
    """Persist the IVFPQ serving artifact (r16): the trained coarse
    CELLS (``_coarse_train`` — K full-dim Lloyd centroids), the trained
    PQ codebook, and the corpus codes PARTITIONED BY TRAINED CELL —
    each vector re-assigned to its nearest cell (``_assign_cells``)
    before the encode, so the serve's nprobe prune is a literal
    partition filter over the data's own cluster structure. Build cost
    is two bounded driver-side trainings + ONE linear corpus pass
    (assignment and encode are chained narrow Arrow maps in the same
    stage); same repartition-before-partitionBy small-file discipline
    and tombstone/qstats slate reset as ``build_pq_index``."""
    from dbt_on_snowflake_spark.engine.index_delete import mark_engine_dir
    from dbt_on_snowflake_spark.operators.dedup import _drop_managed_table

    _drop_managed_table(spark, _pq_tombstones(codes_table))
    samp = _train_sample(e)  # ONE collect feeds both trainers
    coarse = _coarse_train_rows(samp)
    _drop_managed_table(spark, cells_table)
    _local_df(spark, coarse, _PQ_CB_SCHEMA).write.mode(
        "overwrite"
    ).saveAsTable(cells_table)
    mark_engine_dir(spark, cells_table)
    entries = _lloyd_train_rows(samp)
    _drop_managed_table(spark, codebook_table)
    _local_df(spark, entries, _PQ_CB_SCHEMA).write.mode(
        "overwrite"
    ).saveAsTable(codebook_table)
    mark_engine_dir(spark, codebook_table)
    _drop_managed_table(spark, codes_table)
    codes = _pq_encode(
        _assign_cells(e.select("vec_id", "label", "v"), coarse),
        _entries_cb_row(spark, entries),
    )
    # baseline rides the write pass (see build_pq_index / _observe_qerr)
    observed, obs = _observe_qerr(codes)
    (
        observed.repartition("label")
        .write.mode("overwrite")
        .partitionBy("label")
        .saveAsTable(codes_table)
    )
    m = _observed_row(obs, lambda: _qerr_row(spark, codes_table))
    _write_qstats_sidecar(spark, codes_table, m["mean_qerr"], m["n_rows"])


def ivfpq_index_append(
    spark: SparkSession,
    new_e: DataFrame,
    *,
    cells_table: str,
    codebook_table: str,
    codes_table: str,
) -> DataFrame:
    """Append NEW vectors to a persisted IVFPQ index built by
    ``build_ivfpq_index`` — the family's production ingest path (r16):
    at 100 TB a new batch must NOT force a full-corpus re-encode OR a
    quantizer retrain. Same probe-then-grow contract as
    ``pq_index_append`` with BOTH quantizers frozen:

    - idempotence first (at-least-once ingest): already-encoded
      vec_ids are dropped via the codes table's FILE-LIST SNAPSHOT +
      broadcast anti-join — a fully re-delivered batch appends nothing;
    - the batch is assigned to its nearest FROZEN trained cell
      (``_assign_cells`` over the persisted cells table — bounded,
      collected once) and encoded against the FROZEN persisted
      codebook; per-batch cost is O(|batch| x (cells + PQ_M x K)),
      independent of corpus size, corpus never re-read;
    - the (vec_id, cell, bests) rows land in the CELL-partitioned
      codes table via dynamic partition append, clustered on the cell
      first (the small-file discipline).

    Cell assignment and codes are per-row facts of (vector, frozen
    quantizers), so append converges BIT-EXACTLY to a rebuild against
    the same frozen pair; retraining is the separate offline job
    (``retrain_ivfpq_family``). Returns the encoded rows."""
    new_e = _drop_already_indexed(spark, new_e, codes_table)
    # bounded: K cells x D doubles — the frozen coarse quantizer
    frozen_cells = [
        (int(r["label"]), list(r["v"]))
        for r in spark.table(cells_table).collect()
    ]
    codes = _pq_encode(
        _assign_cells(new_e.select("vec_id", "label", "v"), frozen_cells),
        _codebook_row(spark.table(codebook_table)),
    )
    (
        codes.repartition("label")
        .write.mode("append")
        .partitionBy("label")
        .saveAsTable(codes_table)
    )
    return codes


def pq_index_append(
    spark: SparkSession,
    new_e: DataFrame,
    *,
    codebook_table: str,
    codes_table: str,
) -> DataFrame:
    """Append NEW vectors to a persisted PQ index built by
    ``build_pq_index`` — closing the one index family that was still
    encode-once/rebuild (r10 verdict Missing #2): at 100 TB a new batch
    must NOT force a full-corpus re-encode. Mirrors the
    ``ann_index_append`` / ``text_index_append`` probe-then-grow
    contract:

    - the batch is first made IDEMPOTENT (at-least-once ingest): vec_ids
      already encoded are dropped via a broadcast join streaming only
      the codes table's vec_id column through a FILE-LIST SNAPSHOT
      (driver-side metadata listing — the returned rows stay stable when
      re-evaluated after this call's own append lands), then a broadcast
      anti-join back onto the batch; a fully re-delivered batch appends
      nothing (``test_pq_index_append_replay_is_noop``);
    - encoding is the batch scan x the broadcast 1-row FROZEN codebook —
      the corpus embeddings are NEVER re-read and the codebook is NEVER
      retrained (plan-pinned by ``test_pq_append_no_corpus_reencode``).
      Per-batch cost is O(|batch| x PQ_M x |codebook|), independent of
      corpus size;
    - the encoded (vec_id, label, bests) rows land in the
      label-partitioned codes table via dynamic partition append,
      clustered on label first (build_pq_index's small-file discipline).

    Codes are per-row facts of (vector, codebook), so append converges
    BIT-EXACTLY to a rebuild against the same frozen codebook
    (``test_pq_index_append_converges_to_rebuild``); codebook RETRAINING
    is the separate offline job (rebuild via ``build_pq_index``), the
    same split as ``ann_index_append`` vs ``refresh_centroids``.
    ``compact --indexes`` folds the per-batch small files like every
    other index family. Returns the encoded rows."""
    new_e = _drop_already_indexed(spark, new_e, codes_table)
    codes = _pq_encode(
        new_e.select("vec_id", "label", "v"),
        _codebook_row(spark.table(codebook_table)),
    )
    (
        codes.repartition("label")
        .write.mode("append")
        .partitionBy("label")
        .saveAsTable(codes_table)
    )
    return codes


# ------------------------------------------------ codebook drift gate

_QSTATS = "_qstats.json"


def _mean_qerr_col() -> F.Column:
    """Per-row total quantization error: the sum of the PQ_M per-
    subspace nearest-centroid distances the encode recorded in
    ``bests`` — how well the FROZEN codebook represents the row."""
    return F.aggregate(
        F.col("bests"), F.lit(0.0), lambda acc, b: acc + b["d"]
    )


def _observe_qerr(codes: DataFrame):
    """Attach the build-time quantization-error baseline aggregate to
    the codes write plan via ``observe`` (CollectMetrics): the mean
    falls out of the write pass itself instead of a separate post-write
    scan of the just-written table (one fewer codes pass per build —
    r17; guide §1.2 "don't compute things you throw away"). Rounded to
    6 decimals: a double AVG is order-dependent in its last ulps, and a
    compaction/fold legitimately reorders the rows it rewrites — the
    drift RATIO must compare equal across such rewrites (gate grain is
    ~1.5x; ulp noise is ~1e-16 relative). Returns ``(observed_df,
    observation)``; read ``observation.get`` only after the write."""
    from pyspark.sql import Observation

    obs = Observation()
    return (
        codes.observe(
            obs,
            (F.round(F.avg(_mean_qerr_col()), 6) + 0.0).alias("mean_qerr"),
            F.count(F.lit(1)).alias("n_rows"),
        ),
        obs,
    )


def _qerr_row(spark: SparkSession, codes_table: str):
    """The quantization-error baseline re-derived from the written
    codes table — ``_observe_qerr``'s aggregate as a standalone job,
    the empty-build fallback (testdata.observed_row): a zero-task
    write posts no metrics row, and the table is empty exactly then,
    so this scan is free."""
    return (
        spark.table(codes_table)
        .agg(
            (F.round(F.avg(_mean_qerr_col()), 6) + 0.0).alias("mean_qerr"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()[0]
    )


def _write_qstats_sidecar(
    spark: SparkSession,
    codes_table: str,
    mean_qerr: float | None,
    n_rows: int,
) -> None:
    import json as _json

    from dbt_on_snowflake_spark.engine.fs import fs_create_atomic
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        table_location,
    )

    fs_create_atomic(
        spark,
        posixpath.join(table_location(spark, codes_table), _QSTATS),
        _json.dumps(
            {
                # avg over an empty build is NULL -> record 0.0
                "base_mean_qerr": mean_qerr or 0.0,
                "n_rows": n_rows,
            }
        ).encode(),
    )


def pq_index_drift(spark: SparkSession, *, codes_table: str) -> dict:
    """The codebook-drift metric for a PQ family (r11 verdict, Next #3):
    appends encode against the FROZEN build-time codebook forever, and
    nothing previously ever decided when that stopped being a good
    idea. The gate is the mean quantization error of the CURRENT live
    codes over the build-time baseline the sidecar recorded — a pure
    codes-table aggregate (the d's were computed at encode time), so
    checking drift costs one narrow scan of the codes, never a pass
    over the embeddings. In-distribution appends hold the ratio near
    1.0; a distribution shift the codebook cannot represent drags the
    new rows' distances (and so the mean) up. Raises when the family
    has no baseline sidecar — an old-format index rebuilds once to gain
    one; guessing a baseline could mask real drift (fail closed)."""
    import json as _json

    from dbt_on_snowflake_spark.engine.fs import fs_read_replaceable
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        table_location,
    )

    p = posixpath.join(table_location(spark, codes_table), _QSTATS)
    raw = fs_read_replaceable(spark, p)
    if raw is None:
        raise ValueError(
            f"{codes_table} has no {_QSTATS} baseline; rebuild via "
            "build_pq_index to record one"
        )
    base = _json.loads(raw.decode())
    row = (
        _live_codes(spark, codes_table)
        .agg(
            # same 6-decimal rounding as the sidecar write: the current
            # mean must compare equal across a compaction's row
            # reorder (order-dependent double AVG last-ulps)
            (F.round(F.avg(_mean_qerr_col()), 6) + 0.0).alias("mean_qerr"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()[0]  # bounded: one aggregate row
    )
    # avg over zero live rows is NULL (everything tombstoned / empty
    # table): nothing is being served, so there is nothing to retrain —
    # treat as zero error rather than crashing the scheduled check
    current = row.mean_qerr if row.mean_qerr is not None else 0.0
    b = base["base_mean_qerr"] or 0.0
    if b > 0:
        ratio = current / b
    else:
        # a zero baseline (codebook encodes the build corpus exactly —
        # or its true mean sat below the 6-decimal sidecar grain and
        # rounded to 0.0) must not make the gate fire forever:
        # current error within the SAME grain is equal-perfection (a
        # sub-grain baseline with sub-grain current must not return
        # inf — r15 review finding 3); error above the grain from a
        # zero baseline is genuine drift. Sub-grain drift is immaterial
        # by construction: the per-row d's are 1e-4-rounded, so 1e-6
        # absolute mean error carries no retrain signal. The bound is
        # INTENTIONALLY inclusive (r15 advice #2): 1e-6 is the sidecar
        # grain itself — a current mean landing exactly there is
        # indistinguishable from the rounding of a sub-grain truth, so
        # the gate swallows that one grain step and fires only strictly
        # above it (>= 2e-6 after the 6-decimal sidecar rounding).
        ratio = 1.0 if current <= 1e-6 else float("inf")
    return {
        "base_mean_qerr": b,
        "current_mean_qerr": current,
        "ratio": ratio,
        "n_rows": row.n_rows,
        "base_n_rows": base["n_rows"],
    }


DRIFT_REBUILD_RATIO = 1.5  # default gate: retrain at +50% mean qerr


def reindex_pq_when_drifted(
    spark: SparkSession,
    *,
    codes_table: str,
    rebuild,
    threshold: float = DRIFT_REBUILD_RATIO,
) -> dict:
    """The schedulable retrain decision (``reindex --when-drifted``,
    runnable from ``tasks.yml``): measure drift, and call ``rebuild``
    (the caller's ``build_pq_index`` thunk — retraining needs the
    original vectors, which only the caller can reach) ONLY when the
    ratio exceeds ``threshold``. An in-distribution append stream never
    triggers it; a shifted batch does, once, and the rebuild resets the
    baseline so the gate re-arms (pinned by
    ``tests/test_drift_gate.py``). Returns the drift record plus what
    was decided."""
    drift = pq_index_drift(spark, codes_table=codes_table)
    if drift["ratio"] > threshold:
        rebuild()
        return {**drift, "drifted": True, "rebuilt": True}
    return {**drift, "drifted": False, "rebuilt": False}


def retrain_pq_family(
    spark: SparkSession, sf_dir: str, *, codes_table: str, build=None
) -> None:
    """The generic retrain for ANY pq_codes_* family — the rebuild
    thunk ``reindex`` hands to ``reindex_pq_when_drifted`` when the
    family wasn't built by ``ensure_pq_index`` (the append-grown
    ``pq_codes_aps_*`` family, the streaming-ingest family, ad-hoc
    builds — exactly the indexes that accumulate drift, r12 advice #2).
    Trains a fresh codebook over the vectors the family CURRENTLY
    serves: the corpus embeddings semi-joined to the family's live
    vec_ids, so append-grown rows are in the training set and
    tombstoned rows are not (the rebuild also resets the tombstone
    slate, which is correct for the same reason). The codebook table
    follows the family convention (``pq_codes_X`` -> ``pq_codebook_X``,
    database qualifiers preserved).

    FAIL CLOSED: raises when any live vec_id is missing from the
    corpus embeddings — retraining on the intersection would silently
    shrink the index (a family encoded from a different vector source
    must retrain through its own build path).

    ``build`` (r16): a one-arg thunk (the live-vector DataFrame)
    overriding the default ``build_pq_index`` rebuild — families with
    their own on-disk layout (the cell-partitioned IVFPQ codes) reuse
    the coverage probe / staging discipline here while rebuilding
    through their own builder (``retrain_ivfpq_family``)."""
    from dbt_on_snowflake_spark.engine.index_delete import (
        derive_tombstones_name,
    )

    codebook_table = derive_tombstones_name(
        codes_table, strip="pq_codes_", prefix="pq_codebook_"
    )
    e = _vectors(spark, sf_dir)
    live = _live_codes(spark, codes_table).select("vec_id")
    # one narrow anti-join count, no broadcast hint: both sides grow
    # with the index at 100 TB, so the coverage probe must shuffle-join
    # (AQE picks the strategy) rather than materialize either side
    n_missing = live.join(
        e.select("vec_id"), "vec_id", "left_anti"
    ).count()
    if n_missing:
        raise ValueError(
            f"{codes_table}: {n_missing} live vec_ids are not in the "
            f"corpus embeddings at {sf_dir}; refusing to retrain on a "
            "subset — rebuild this family through its own build path"
        )
    # MATERIALIZE the live ids before the rebuild: build_pq_index drops
    # the codes table it is about to overwrite, and a lazy plan reading
    # that same table would fail at write time. A narrow ids-only
    # staging table (not a collect — the id set grows with the index)
    from dbt_on_snowflake_spark.operators.dedup import (
        _drop_managed_table,
    )

    staging = derive_tombstones_name(
        codes_table, strip="pq_codes_", prefix="pq_retrain_ids_"
    )
    from dbt_on_snowflake_spark.engine.index_delete import (
        mark_engine_dir,
    )

    _drop_managed_table(spark, staging)
    live.write.saveAsTable(staging)
    # marked so a crash before the finally-drop leaves a dir the NEXT
    # retrain can prove it owns and clear (r13 review pass 6, finding 4)
    mark_engine_dir(spark, staging)
    try:
        live_e = e.join(spark.table(staging), "vec_id")
        if build is not None:
            build(live_e)
        else:
            build_pq_index(
                spark,
                live_e,
                codebook_table=codebook_table,
                codes_table=codes_table,
            )
    finally:
        _drop_managed_table(spark, staging)


def retrain_ivfpq_family(
    spark: SparkSession, sf_dir: str, *, codes_table: str
) -> None:
    """The IVFPQ family's drift-triggered rebuild (r16): the generic
    retrain's coverage-probe/staging discipline, rebuilding through
    ``build_ivfpq_index`` so BOTH quantizers retrain and the codes
    come back cell-partitioned — the generic ``build_pq_index`` path
    would silently re-partition them by ingest label. Sibling names
    follow the family convention (``pq_codes_ivp_X`` ->
    ``pq_codebook_ivp_X`` / ``ivf_cells_X``)."""
    from dbt_on_snowflake_spark.engine.index_delete import (
        derive_tombstones_name,
    )

    cells_table = derive_tombstones_name(
        codes_table, strip="pq_codes_ivp_", prefix="ivf_cells_"
    )
    codebook_table = derive_tombstones_name(
        codes_table, strip="pq_codes_", prefix="pq_codebook_"
    )
    retrain_pq_family(
        spark,
        sf_dir,
        codes_table=codes_table,
        build=lambda live_e: build_ivfpq_index(
            spark,
            live_e,
            cells_table=cells_table,
            codebook_table=codebook_table,
            codes_table=codes_table,
        ),
    )


def retrain_any_pq_family(
    spark: SparkSession, sf_dir: str, *, codes_table: str
) -> None:
    """Route a drift-triggered rebuild to the family's OWN builder by
    its naming CONVENTION — the one dispatch the reindex sweep uses
    (r16 review finding 1): ``pq_codes_ivp_*`` (any database
    qualifier, any fingerprint generation — a superseded family a
    failed GC left behind, or an explicit ``--codes-table``) rebuilds
    cell-partitioned via ``retrain_ivfpq_family``; every other
    ``pq_codes_*`` family takes the generic label-partitioned
    retrain. An exact-name map would silently hand a qualified or
    stale-generation ivp family to the generic rebuild, corrupting
    its partition layout."""
    if codes_table.rsplit(".", 1)[-1].startswith("pq_codes_ivp_"):
        retrain_ivfpq_family(spark, sf_dir, codes_table=codes_table)
    else:
        retrain_pq_family(spark, sf_dir, codes_table=codes_table)


# ------------------------------------------- IVF centroid drift gate

_CSTATS = "_cstats.json"


def _ann_centroids_for(assignments_table: str) -> str:
    """The family's centroid-table name (qualifier-preserving)."""
    from dbt_on_snowflake_spark.engine.index_delete import (
        derive_tombstones_name,
    )

    return derive_tombstones_name(
        assignments_table,
        strip="ann_assignments_",
        prefix="ann_centroids_",
    )


def _mean_cdist_row(spark: SparkSession, assignments, centroids_table: str):
    """mean SQUARED L2 DISPLACEMENT ``|v - centroid[label]|^2`` over
    the given assignment rows against the FROZEN centroid table, plus
    the row count — the exact IVF analog of the PQ gate's mean
    quantization error (which is also a squared distance to the
    assigned sub-centroids). Squared distance, NOT cosine: the
    synthetic-embedding corpora sit near-orthogonal to their centroids
    (mean 1-cos ~ 0.85 of a 2.0 ceiling), so an angular metric has no
    headroom and a wildly shifted batch barely moves it, while the
    displacement explodes with any scale/offset shift. One narrow scan
    of the assignments x the broadcast (tiny) centroid table; the
    corpus embeddings are never read (the assignments carry their
    vectors)."""
    cvec = F.broadcast(spark.table(centroids_table)).alias("c")
    dist2 = F.aggregate(
        F.zip_with("a.v", "c.v", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    return (
        assignments.alias("a")
        .join(cvec, "label")
        .agg(
            # 6-decimal rounding, the qstats sidecar convention: a
            # double AVG is order-dependent in its last ulps and a
            # compaction legitimately reorders the rows it rewrites
            (F.round(F.avg(dist2), 6) + 0.0).alias("mean_cdist"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()[0]  # bounded: one aggregate row
    )


def _write_cstats_sidecar(
    spark: SparkSession,
    assignments_table: str,
    mean_cdist: float | None,
    n_rows: int,
) -> None:
    """Write the centroid-distance baseline sidecar next to the
    assignments (the qstats convention — underscore file, invisible to
    reads, preserved by the compaction/fold swap) from already-computed
    values. ``fs_replace_atomic``, because ``refresh_centroids``
    re-records over a LIVING table dir (unlike the PQ build, which
    always writes a fresh one): a re-record killed mid-rewrite must not
    strand the family baseline-less — the drift gate and the
    outside-warehouse ownership proof both read it (r13 verdict
    Next #4)."""
    import json as _json

    from dbt_on_snowflake_spark.engine.fs import fs_replace_atomic
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        table_location,
    )

    fs_replace_atomic(
        spark,
        posixpath.join(table_location(spark, assignments_table), _CSTATS),
        _json.dumps(
            {
                # avg over an empty build is NULL -> record 0.0
                "base_mean_cdist": mean_cdist or 0.0,
                "n_rows": n_rows,
            }
        ).encode(),
    )


def _write_ann_cstats(
    spark: SparkSession, *, centroids_table: str, assignments_table: str
) -> None:
    """Recompute and record the centroid-distance baseline over the
    CURRENT table state — the ``refresh_centroids`` path, which
    re-records over a living (possibly tombstone-carrying, possibly
    append-grown) family; a fresh ``build_ann_index`` instead folds the
    same aggregate into its assignments write via ``observe`` (one
    fewer corpus pass — r17).
    Runs under its own job group: the refresh can be invoked next to
    serve paths whose bench stage fingerprints must not drift (the
    ``ensure_index_tables`` isolation convention)."""
    sc = spark.sparkContext
    caller_group = sc.getLocalProperty("spark.jobGroup.id")
    sc.setJobGroup("index-build:ann_cstats", "drift baseline")
    try:
        # LIVE rows only: the drift check measures live rows and the
        # refresh trains on live rows, so a baseline recorded over a
        # tombstone-carrying family must use the same population or
        # every post-refresh ratio starts off-calibrated (masking real
        # drift, or retraining on every sweep — r13 review, finding 1).
        row = _mean_cdist_row(
            spark,
            _live_assignments(spark, assignments_table).select(
                "label", "v"
            ),
            centroids_table,
        )
        _write_cstats_sidecar(
            spark, assignments_table, row.mean_cdist, row.n_rows
        )
    finally:
        sc.setJobGroup(caller_group, "serve")


def ann_index_drift(
    spark: SparkSession, *, assignments_table: str
) -> dict:
    """The centroid-drift metric for an IVF family (r12 verdict, Next
    #6): ``ann_index_append`` assigns against the FROZEN build-time
    centroids forever, ``refresh_centroids`` exists, and nothing
    previously ever decided when to call it — the same frozen-reference
    risk the PQ codebook gate closed in r12. The gate is the mean
    SQUARED L2 DISPLACEMENT to the assigned centroid (the PQ gate's
    own metric family — see ``_mean_cdist_row`` for why not cosine) of
    the CURRENT live assignments over the build/refresh-time baseline
    the sidecar recorded. In-distribution appends hold the ratio near 1.0;
    a distribution shift the centroids no longer represent drags the
    new rows' distances (and so the mean) up. Raises when the family
    has no baseline sidecar — an old-format index rebuilds (or
    refreshes) once to gain one; guessing a baseline could mask real
    drift (fail closed, the ``pq_index_drift`` contract)."""
    import json as _json

    from dbt_on_snowflake_spark.engine.fs import fs_read_replaceable
    from dbt_on_snowflake_spark.engine.index_maintenance import (
        table_location,
    )

    p = posixpath.join(table_location(spark, assignments_table), _CSTATS)
    raw = fs_read_replaceable(spark, p)
    if raw is None:
        raise ValueError(
            f"{assignments_table} has no {_CSTATS} baseline; rebuild "
            "via build_ann_index (or refresh_centroids) to record one"
        )
    base = _json.loads(raw.decode())
    row = _mean_cdist_row(
        spark,
        _live_assignments(spark, assignments_table).select("label", "v"),
        _ann_centroids_for(assignments_table),
    )
    current = row.mean_cdist if row.mean_cdist is not None else 0.0
    b = base["base_mean_cdist"] or 0.0
    if b > 0:
        ratio = current / b
    else:
        # same grain guard as pq_index_drift: a sub-grain true baseline
        # rounds to 0.0 in the sidecar, and a later sub-grain current
        # must read as equal-perfection, not ratio=inf firing the
        # refresh forever (r15 review pass 2, finding 2). Inclusive on
        # purpose (r15 advice #2): exactly-at-grain 1e-6 is within the
        # sidecar's own rounding of a sub-grain truth — the gate fires
        # strictly above the grain only.
        ratio = 1.0 if current <= 1e-6 else float("inf")
    return {
        "base_mean_cdist": b,
        "current_mean_cdist": current,
        "ratio": ratio,
        "n_rows": row.n_rows,
        "base_n_rows": base["n_rows"],
    }


def reindex_ann_when_drifted(
    spark: SparkSession,
    *,
    assignments_table: str,
    threshold: float = DRIFT_REBUILD_RATIO,
) -> dict:
    """The schedulable IVF retrain decision (``reindex --when-drifted``
    sweeps these families alongside the PQ ones): when the drift ratio
    crosses ``threshold``, run ``refresh_centroids`` — the family's
    retrain, recomputing per-label means from the grown LIVE
    assignments — and re-record the baseline so the gate re-arms. An
    in-distribution append stream never triggers it; a shifted batch
    does, once (``tests/test_drift_gate.py``)."""
    drift = ann_index_drift(spark, assignments_table=assignments_table)
    if drift["ratio"] > threshold:
        centroids_table = _ann_centroids_for(assignments_table)
        refresh_centroids(
            spark,
            centroids_table=centroids_table,
            assignments_table=assignments_table,
        )
        return {**drift, "drifted": True, "rebuilt": True}
    return {**drift, "drifted": False, "rebuilt": False}


# ----------------------------------------- ANN/PQ index DELETE propagation


def _pq_tombstones(codes_table: str) -> str:
    """The PQ family's tombstone-table name, derived from the codes
    table so the delete path and every ADC serve resolve the SAME
    table for any suffix (fingerprinted, appended, ad-hoc) — database
    qualifiers preserved (``derive_tombstones_name``)."""
    from dbt_on_snowflake_spark.engine.index_delete import (
        derive_tombstones_name,
    )

    return derive_tombstones_name(
        codes_table, strip="pq_codes_", prefix="pq_tombstones_"
    )


def _ann_tombstones(assignments_table: str) -> str:
    """The IVF family's tombstone-table name (see ``_pq_tombstones``)."""
    from dbt_on_snowflake_spark.engine.index_delete import (
        derive_tombstones_name,
    )

    return derive_tombstones_name(
        assignments_table,
        strip="ann_assignments_",
        prefix="ann_tombstones_",
    )


def pq_index_delete(
    spark: SparkSession, ids: DataFrame, *, codes_table: str
) -> None:
    """Delete vectors from a persisted PQ index built by
    ``build_pq_index`` — the missing lifecycle verb next to
    ``pq_index_append`` (r11 verdict, Next #2). O(|ids|): the vec_ids
    land in the family's tombstone table (engine/index_delete.py) and
    every ADC serve gates the codes through them immediately; the
    physical partition rewrite is ``compact --indexes``'s tombstone
    fold, which converges bit-exactly to an encode of the surviving
    vectors against the same frozen codebook (codes are per-row facts).
    The codebook is untouched — it stays frozen exactly as under
    append; retraining after heavy churn is the drift gate's call."""
    from dbt_on_snowflake_spark.engine.index_delete import index_delete

    index_delete(
        spark,
        ids,
        tombstones_table=_pq_tombstones(codes_table),
        id_col="vec_id",
        members=[{"table": codes_table, "id_cols": ["vec_id"]}],
    )


def ann_index_delete(
    spark: SparkSession, ids: DataFrame, *, assignments_table: str
) -> None:
    """Delete vectors from a persisted IVF index built by
    ``build_ann_index``: tombstone the vec_ids; every probe serve gates
    the assignments through them until the fold rewrites the touched
    label partitions. The centroid table is untouched (frozen, like the
    PQ codebook) — ``refresh_centroids`` recomputes it from the grown
    assignments when drift warrants."""
    from dbt_on_snowflake_spark.engine.index_delete import index_delete

    index_delete(
        spark,
        ids,
        tombstones_table=_ann_tombstones(assignments_table),
        id_col="vec_id",
        members=[{"table": assignments_table, "id_cols": ["vec_id"]}],
    )


def _live_codes(spark: SparkSession, codes_table: str) -> DataFrame:
    """The codes table's live (vec_id, bests) rows — the tombstone-gated
    read every ADC serve shares. Exact no-op (same plan) until the
    family's first delete (``live_rows``), so the pristine serve plan
    pins hold."""
    from dbt_on_snowflake_spark.engine.index_delete import live_rows

    return live_rows(
        spark,
        spark.table(codes_table),
        _pq_tombstones(codes_table),
        "vec_id",
    ).select("vec_id", "bests")


def _live_assignments(spark: SparkSession, assignments_table: str) -> DataFrame:
    """The assignments table's live rows (see ``_live_codes``)."""
    from dbt_on_snowflake_spark.engine.index_delete import live_rows

    return live_rows(
        spark,
        spark.table(assignments_table),
        _ann_tombstones(assignments_table),
        "vec_id",
    )


@query(
    "ann_pq_adc_deleted",
    driver=False,  # r12-born: R13_ROTATE_IN
    oracle=_pq_adc_topk_oracle(
        _PQ_CODES_CTE,
        TOP_K,
        codes_src=(
            "SELECT vec_id, m, code FROM pq_codes"
            f" WHERE rn = 1 AND {_CORPUS_PRED}"
        ),
    ),
)
def ann_pq_adc_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_pq_adc_topk`` served AFTER a delete: the PQ index is built
    from the FULL corpus (codebook trained on everything), every 10th
    vector is then deleted via ``pq_index_delete`` (tombstones only),
    and the ADC serve must match the oracle whose codes cover only the
    surviving vectors — against the SAME full-corpus codebook, which is
    exactly what a fold (or a re-encode of the survivors against the
    frozen codebook) produces. One query proves delete propagation
    end-to-end at the serve layer; fold convergence is pinned by
    ``tests/test_index_delete.py``."""
    import hashlib

    suffix = hashlib.md5(f"pqdel:{sf_dir}".encode()).hexdigest()[:8]
    cb_t, cd_t = f"pq_codebook_del_{suffix}", f"pq_codes_del_{suffix}"
    e = _vectors(spark, sf_dir)
    # rebuilt from scratch each call (the build+delete verification
    # surface); the build itself resets the tombstone slate
    build_pq_index(spark, e, codebook_table=cb_t, codes_table=cd_t)
    pq_index_delete(
        spark,
        e.filter(F.expr(_NEW_BATCH_PRED)).select("vec_id"),
        codes_table=cd_t,
    )
    return _adc_serve(spark, e, cb_t, _live_codes(spark, cd_t), TOP_K)


# the multiprobe oracle with the CORPUS side restricted to the
# surviving vectors — cells stay trained on the full corpus (the
# frozen-at-build posture, like the PQ codebook) and the query side is
# untouched (queries are external lookups, and _QUERY_PRED's
# stride-multiples never intersect the deleted tenth); built post-hoc
# by ``_set_trained_ivf_oracles()`` via _oracle_multiprobe's
# corpus_pred parameter.


@query(
    "ann_ivf_multiprobe_deleted",
    driver=False,  # r12-born: R13_ROTATE_IN
    oracle=None,  # set post-hoc: _set_trained_ivf_oracles()
)
def ann_ivf_multiprobe_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_ivf_multiprobe`` served AFTER a delete: the IVF index is
    built from the FULL corpus (centroids frozen from everything),
    every 10th vector is then deleted via ``ann_index_delete``
    (tombstones only), and the probe serve over the gated assignments
    must match the oracle whose corpus side covers only the survivors.
    Completes the driver-checkable delete matrix: every index family
    (BM25, PQ, IVF, minhash) now has a registered delete-then-serve
    proof; fold convergence is pinned by
    ``tests/test_index_delete.py``."""
    import hashlib

    suffix = hashlib.md5(f"ivfdel:{sf_dir}".encode()).hexdigest()[:8]
    cb = f"ann_centroids_{suffix}"
    asg = f"ann_assignments_{suffix}"
    e = _vectors(spark, sf_dir)
    # rebuilt from scratch each call (the build+delete verification
    # surface); the build itself resets the tombstone slate
    build_ann_index(spark, e, centroids_table=cb, assignments_table=asg)
    ann_index_delete(
        spark,
        e.filter(F.expr(_NEW_BATCH_PRED)).select("vec_id"),
        assignments_table=asg,
    )
    q = F.broadcast(e.filter(F.expr(_QUERY_PRED))).alias("q")
    cvec = spark.table(cb)
    corpus = _live_assignments(spark, asg).select("vec_id", "label", "v")
    return _multiprobe_topk(q, cvec, corpus)


@query(
    "ann_pq_adc_appended",
    driver=False,  # r11-born: R12_ROTATE_IN
    oracle=_pq_adc_topk_oracle(_PQ_CODES_CTE_FROZEN, TOP_K),
)
def ann_pq_adc_appended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered incremental-PQ exercise: build the PQ index from the
    corpus slice (vec_id % 10 <> 9), append the held-out batch via
    ``pq_index_append`` against the FROZEN codebook, then serve ADC over
    the GROWN codes table. The oracle is ``ann_pq_adc_topk``'s with the
    centroid CTE restricted to the base corpus (the frozen codebook the
    index persisted) and codes over ALL vectors — exactly what a rebuild
    against the same codebook would encode, so one query proves
    build + append + serve end-to-end (``ann_incremental_assign``'s
    oracle convention)."""
    import hashlib

    suffix = hashlib.md5(f"pqapp:{sf_dir}".encode()).hexdigest()[:8]
    cb_t, cd_t = f"pq_codebook_app_{suffix}", f"pq_codes_app_{suffix}"
    e = _vectors(spark, sf_dir)
    # rebuilt from scratch each call: this query IS the build+append
    # verification surface (text_bm25_topk_incremental's posture)
    build_pq_index(
        spark,
        e.filter(F.expr(_CORPUS_PRED)),
        codebook_table=cb_t,
        codes_table=cd_t,
    )
    pq_index_append(
        spark,
        e.filter(F.expr(_NEW_BATCH_PRED)),
        codebook_table=cb_t,
        codes_table=cd_t,
    )
    spark.catalog.refreshTable(cd_t)
    codes = _live_codes(spark, cd_t)
    return _adc_serve(spark, e, cb_t, codes, TOP_K)


def ensure_appended_pq_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Build-once the GROWN PQ state — base build + one
    ``pq_index_append`` batch against the frozen codebook — behind the
    shared ensure scaffold (fingerprinted suffix, job-group isolated,
    superseded-suffix GC). ``ann_pq_adc_appended`` deliberately
    rebuilds per call (its verification posture, r11 verdict What's
    wrong #2); THIS is the artifact the steady-state serve twin reads,
    so the bench finally tracks serving over append-grown codes rather
    than the rebuild."""
    from dbt_on_snowflake_spark.testdata import ensure_index_tables

    suffix = _pq_family_suffix(spark, sf_dir, "pqapps")
    cb_t = f"pq_codebook_aps_{suffix}"
    cd_t = f"pq_codes_aps_{suffix}"
    # the grown-state COMMIT MARKER, created LAST in the build and
    # probed FIRST by ensure: the scaffold's crash model assumes every
    # build step creates a table, but the append step here GROWS an
    # existing one — a crash between build_pq_index and pq_index_append
    # would otherwise leave a complete-looking family that silently
    # serves base-only codes forever (r12 review, finding 2). With the
    # marker, that crash leaves the probe failing and the next call
    # re-runs the whole build (both builders write mode("overwrite")).
    grown_t = f"pq_grown_aps_{suffix}"

    def build() -> None:
        from dbt_on_snowflake_spark.operators.dedup import (
            _drop_managed_table,
        )

        # invalidate the marker FIRST: a rebuild triggered by a missing
        # SIBLING (crashed swap) that crashes mid-build must not leave
        # a stale marker satisfying the probe over base-only codes
        # (r12 review pass 2)
        _drop_managed_table(spark, grown_t)
        e = _vectors(spark, sf_dir)
        build_pq_index(
            spark,
            e.filter(F.expr(_CORPUS_PRED)),
            codebook_table=cb_t,
            codes_table=cd_t,
        )
        pq_index_append(
            spark,
            e.filter(F.expr(_NEW_BATCH_PRED)),
            codebook_table=cb_t,
            codes_table=cd_t,
        )
        spark.catalog.refreshTable(cd_t)
        spark.createDataFrame(
            [(1,)], "grown int"
        ).write.mode("overwrite").saveAsTable(grown_t)
        from dbt_on_snowflake_spark.engine.index_delete import (
            mark_engine_dir,
        )

        mark_engine_dir(spark, grown_t)

    ensure_index_tables(
        spark,
        tables=(grown_t, cd_t, cb_t),
        job_group="pq_appended_index",
        gc_prefixes=(
            "pq_codebook_aps_",
            "pq_codes_aps_",
            "pq_grown_aps_",
            "pq_tombstones_aps_",
        ),
        gc_suffix=suffix,
        build=build,
    )
    return cb_t, cd_t


@query(
    "ann_pq_adc_appended_served",
    driver=False,  # r12-born: R13_ROTATE_IN; shares the frozen oracle
    oracle=_pq_adc_topk_oracle(_PQ_CODES_CTE_FROZEN, TOP_K),
    headline=True,  # benched: the steady-state serve over grown codes
)
def ann_pq_adc_appended_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ann_pq_adc_appended``'s STEADY-STATE twin (r11 verdict, Next
    #4): the grown base+append PQ state is built once behind
    ``ensure_appended_pq_index`` (job-group isolated, the
    ``dedup_semantic_served`` convention, so bench stage counts show
    the serve only); every call after the first is a pure ADC read of
    the label-partitioned codes — the shape a production index serves
    all day, which the per-call-rebuild verification row can never
    bench. Shares ``ann_pq_adc_appended``'s frozen-codebook oracle
    verbatim: growing once and serving many must not change a row."""
    cb_t, cd_t = ensure_appended_pq_index(spark, sf_dir)
    e = _vectors(spark, sf_dir)
    return _adc_serve(spark, e, cb_t, _live_codes(spark, cd_t), TOP_K)


def ensure_appended_ivfpq_index(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str, str]:
    """Build-once the GROWN IVFPQ state — base ``build_ivfpq_index``
    over the corpus slice + one ``ivfpq_index_append`` batch against
    the FROZEN quantizer pair — behind the shared ensure scaffold.
    Same crash model as ``ensure_appended_pq_index``: the append step
    GROWS an existing table, so a commit MARKER created last and
    probed first keeps a crash between build and append from leaving a
    complete-looking family serving base-only codes forever. Family
    names stay inside the ``pq_codes_ivp_`` convention so the reindex
    sweep's drift retrain routes to the cell-partitioned builder
    (``retrain_any_pq_family``).

    KNOWN POSTURE (shared with the flat ``pq_codes_aps_`` family since
    r12, surfaced by the r16 review): the registered serve's oracle
    describes the FROZEN base+append split; a drift-GATED retrain of
    this family (both quantizers retrained over the full live set)
    produces a different — legitimate — state the frozen oracle cannot
    describe, and the fingerprint/marker probes won't rebuild away. In
    practice the gate never fires here: the appended tenth is drawn
    from the same distribution, the ratio holds ~1.0
    (test_in_distribution_append_stays_within_gate), and a genuinely
    drifted corpus warrants exactly that retrain — at which point the
    frozen-split row is re-verified by rebuilding the family (corpus
    rotation) or evidence-reset, the same operational contract as the
    flat family."""
    from dbt_on_snowflake_spark.testdata import (
        ensure_index_tables,
        index_suffix,
    )

    suffix = index_suffix(
        spark, sf_dir, "ivfpqaps", "embeddings", algo=IVFPQ_ALGO
    )
    cells_t = f"ivf_cells_aps_{suffix}"
    cb_t = f"pq_codebook_ivp_aps_{suffix}"
    cd_t = f"pq_codes_ivp_aps_{suffix}"
    grown_t = f"ivp_grown_aps_{suffix}"

    def build() -> None:
        from dbt_on_snowflake_spark.engine.index_delete import (
            mark_engine_dir,
        )
        from dbt_on_snowflake_spark.operators.dedup import (
            _drop_managed_table,
        )

        # invalidate the marker FIRST (the aps-family crash model)
        _drop_managed_table(spark, grown_t)
        e = _vectors(spark, sf_dir)
        build_ivfpq_index(
            spark,
            e.filter(F.expr(_CORPUS_PRED)),
            cells_table=cells_t,
            codebook_table=cb_t,
            codes_table=cd_t,
        )
        ivfpq_index_append(
            spark,
            e.filter(F.expr(_NEW_BATCH_PRED)),
            cells_table=cells_t,
            codebook_table=cb_t,
            codes_table=cd_t,
        )
        spark.catalog.refreshTable(cd_t)
        spark.createDataFrame(
            [(1,)], "grown int"
        ).write.mode("overwrite").saveAsTable(grown_t)
        mark_engine_dir(spark, grown_t)

    ensure_index_tables(
        spark,
        tables=(grown_t, cd_t, cb_t, cells_t),
        job_group="ivfpq_appended_index",
        gc_prefixes=(
            "ivf_cells_aps_",
            "pq_codebook_ivp_aps_",
            "pq_codes_ivp_aps_",
            "pq_tombstones_ivp_aps_",
            "ivp_grown_aps_",
        ),
        gc_suffix=suffix,
        build=build,
    )
    return cells_t, cb_t, cd_t


@query(
    "ann_ivfpq_appended_served",
    driver=False,  # r16-born: R17_ROTATE_IN (first driver row due r17)
    oracle=_ivfpq_oracle(
        _PQ_CODES_CTE_FROZEN, f" WHERE {_CORPUS_PRED}"
    ),
)
def ann_ivfpq_appended_served(
    spark: SparkSession, sf_dir: str, kernel: str | None = None
) -> DataFrame:
    """The IVFPQ serve over an APPEND-GROWN family (r16): base build
    from the corpus slice, the held-out batch appended against the
    FROZEN trained cells + FROZEN PQ codebook (``ivfpq_index_append``),
    then the steady-state partition-pruned serve over the grown,
    cell-partitioned codes — build + append + serve proven by one
    oracle whose BOTH quantizer chains train on the base slice only
    while codes/assignment cover every vector (the
    ``ann_pq_adc_appended`` frozen-CTE convention, now for the
    inverted-list family). At 100 TB this is the ingest-while-serving
    posture: new batches land as per-cell appends, no re-encode, no
    retrain, the serve's prune unchanged."""
    cells_t, cb_t, cd_t = ensure_appended_ivfpq_index(spark, sf_dir)
    return _ivfpq_serve(spark, sf_dir, cells_t, cb_t, cd_t, kernel)


@query(
    "ann_pq_adc_indexed",
    driver=False,  # r7-born; rotates into the r8 driver export
    oracle=None,  # set below: shares ann_pq_adc_topk's oracle verbatim
)
def ann_pq_adc_indexed(
    spark: SparkSession, sf_dir: str, k: int = TOP_K
) -> DataFrame:
    """``ann_pq_adc_topk`` served from the PERSISTED PQ index: the
    codebook and corpus codes come from build_pq_index's tables — the
    only pass over the embeddings parquet is the bounded query side; no
    re-encoding anywhere (plan-pinned by
    ``test_pq_indexed_no_encode_recompute``). Persisting must not change
    a single result row, so it shares the recompute path's oracle."""
    codebook_table, codes_table = ensure_pq_index(spark, sf_dir)
    e = _vectors(spark, sf_dir)
    codes = _live_codes(spark, codes_table)
    return _adc_serve(spark, e, codebook_table, codes, k)


def _adc_serve(
    spark: SparkSession,
    e: DataFrame,
    codebook_table: str,
    codes: DataFrame,
    k: int,
    queries: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k over an already-encoded (vec_id, bests) codes relation
    against the persisted codebook — the serve stage shared by the
    plain indexed query, the filtered variant (which hands in a
    partition-pruned codes subset), and the multimodal twin (which
    hands in payload-derived query vectors via ``queries``: any bounded
    (vec_id, v) relation; defaults to the corpus rows under
    ``_QUERY_PRED``)."""
    if queries is None:
        queries = e.filter(F.expr(_QUERY_PRED))
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot_scaled").desc(), F.col("neighbor_id").asc()
    )
    import os as _os

    if _os.environ.get("SPARK_GRAFT_PQ_KERNEL", "arrow") == "arrow":
        # the persisted codebook is bounded control-plane data — build
        # the query LUTs driver-side (no per-entry interpreted fold);
        # codebook + query rows ride one collect (_cb_and_query_rows)
        entries, qrows = _cb_and_query_rows(spark, codebook_table, queries)
        scored = _adc_score_arrow(codes, _qlut_rows(qrows, entries), k=k)
    else:
        qlut = _qlut_expr(queries, _codebook_row(spark.table(codebook_table)))
        score = None
        for m in range(PQ_M):
            term = F.element_at(F.col("luts")[m], F.col("bests")[m]["code"])
            score = term if score is None else score + term
        scored = (
            codes.crossJoin(F.broadcast(qlut))
            .filter(F.col("vec_id") != F.col("query_id"))
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                score.alias("approx_dot_scaled"),
            )
        )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


@query(
    "ann_filtered_rerank_indexed",
    driver=False,  # r10-born: R11_ROTATE_IN
    oracle=None,  # set below (built from the rerank CTEs + the filter)
    headline=True,  # benched: the filtered two-stage serve flagship
)
def ann_filtered_rerank_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered TWO-STAGE serve over the persisted PQ index — the
    production shape for "semantic search over docs matching a
    predicate" at PQ scale: the codes table is PARTITIONED BY coarse
    label, so the metadata predicate prunes whole code partitions
    before any ADC lookup; stage 1 ADC-shortlists over the MATCHING
    codes only (a brute scan of the filtered subset — unlike the IVF
    probe there is no cell under-fill to widen, every matching
    candidate is scored); stage 2 exact-reranks the shortlist. Filter
    semantics match ``ann_filtered_topk`` (pre-filter, top-k over the
    filtered set); index + rerank semantics match
    ``ann_pq_rerank_indexed``. Reads the SAME encode-once index the
    unfiltered PQ serves use (``ensure_pq_index``) — a second copy of
    the codes under a filtered-only suffix would double the encode and
    the storage for byte-identical content."""
    codebook_table, codes_table = ensure_pq_index(spark, sf_dir)
    e = _vectors(spark, sf_dir)
    from dbt_on_snowflake_spark.engine.index_delete import live_rows

    codes = live_rows(
        spark,
        # label partition pruning first, then the tombstone gate
        spark.table(codes_table).filter(F.expr(ANN_FILTER_PRED)),
        _pq_tombstones(codes_table),
        "vec_id",
    ).select("vec_id", "bests")
    shortlist = _adc_serve(
        spark, e, codebook_table, codes, RERANK_SHORTLIST
    ).select("query_id", "neighbor_id")
    return _exact_rerank(e, shortlist)


def _set_filtered_rerank_oracle() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    QUERIES["ann_filtered_rerank_indexed"].oracle = _pq_rerank_oracle(
        codes_cte=_PQ_CODES_CTE,
        lut_from=f"(SELECT * FROM e WHERE {_QUERY_PRED}) qv",
        codes_src=f"""
            -- the filter prunes the CODES, mirroring the engine's
            -- label-partition-pruned read of the persisted codes table
            SELECT vec_id, m, code FROM pq_codes
            WHERE rn = 1 AND {ANN_FILTER_PRED.replace("label", "vlabel")}
        """,
        depth=RERANK_SHORTLIST,
        k=TOP_K,
    )


_set_filtered_rerank_oracle()


def _set_pq_indexed_oracle() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    QUERIES["ann_pq_adc_indexed"].oracle = QUERIES["ann_pq_adc_topk"].oracle


_set_pq_indexed_oracle()


def attach_pq_index(
    spark: SparkSession, *, codebook_table: str, codes_table: str
) -> None:
    """Re-attach a persisted PQ index in a NEW session (in-memory
    catalog: metadata dies with the writing session, the parquet files
    persist). External-table DDL over the existing locations + partition
    recovery restores the label-partitioned codes layout, so IVF+PQ
    probes still prune partitions. With a persistent metastore this is
    a no-op, same contract as attach_minhash_index. The family's
    persisted tombstone table (if a prior session deleted from this
    index) re-attaches alongside — without it the fresh session's ADC
    serves would bypass the ``live_rows`` gate and resurrect deleted
    vectors (r12 advice #1)."""
    from dbt_on_snowflake_spark.engine.index_delete import (
        _managed_location,
        reattach_tombstones,
    )

    reattach_tombstones(spark, _pq_tombstones(codes_table), id_col="vec_id")
    # locations resolve through the table's (possibly implicit)
    # database — the naive wh/<name> join mis-targets qualified or
    # custom-LOCATION families (r13 review pass 2, finding 4)
    if not spark.catalog.tableExists(codebook_table):
        spark.catalog.createTable(
            codebook_table,
            path=_managed_location(spark, codebook_table),
            source="parquet",
        )
    if not spark.catalog.tableExists(codes_table):
        spark.catalog.createTable(
            codes_table,
            path=_managed_location(spark, codes_table),
            source="parquet",
        )
        spark.catalog.recoverPartitions(codes_table)


# -------------------------------------- trained-cell plain-IVF oracles
#
# The r17 re-key (VERDICT r16 Next #2): every plain-IVF serve probes
# the Lloyd-TRAINED coarse cells, so their oracles compose the cc
# Lloyd chain + the shared casg assignment CTE. Attached post-hoc (the
# ``_set_filtered_rerank_oracle`` convention) because the registered
# queries are defined above the oracle machinery.


def _oracle_multiprobe(nprobe: int, corpus_pred: str | None = None) -> str:
    """The trained-cell IVF probe oracle: nprobe nearest trained cells
    per query (rounded cosine DESC, cell ASC), exact cosine over the
    probed cells' assigned vectors. ``corpus_pred`` restricts the
    SCORED corpus side (the delete-serve twin: survivors only) while
    the cells stay trained on the full corpus — the frozen-at-build
    posture. Shared verbatim by the inline and persisted twins
    (persisting the index must not change a single result row) and, at
    nprobe=1, by the retired single-probe special case."""
    corpus_src = (
        "e"
        if corpus_pred is None
        else f"(SELECT * FROM e WHERE {corpus_pred})"
    )
    cos = COSINE_SQL.format(a="q.v", b="c.v")
    return f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    {_coarse_lloyd_sql()},
    {_CASG_SQL},
    q AS (SELECT * FROM e WHERE {_QUERY_PRED}),
    qc AS (
        -- NaN -> NULL + NULLS LAST: a zero-norm trained cell (a Lloyd
        -- mean cancelling to zero) or zero-norm query makes the
        -- ranking cosine undefined; DuckDB ranks NaN FIRST under plain
        -- DESC while the engine's _cosine yields NULL which Spark's
        -- DESC ranks last — seat undefined cells at the end of the
        -- probe order in both engines (the r10 filtered-serve guard,
        -- applied consistently; r17 review pass 2, finding 1)
        SELECT q.vec_id AS query_id, c.label,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY (CASE WHEN isnan({cos})
                             THEN NULL
                             ELSE ROUND({cos}, 4)
                             END) DESC NULLS LAST, c.label ASC
               ) AS crank
        FROM q CROSS JOIN cccb c
    ),
    probes AS (SELECT query_id, label FROM qc WHERE crank <= {nprobe}),
    scored AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               ROUND({cos}, 4) + 0.0 AS cosine
        FROM probes p
        JOIN casg a ON a.cell = p.label
        JOIN {corpus_src} c ON c.vec_id = a.vec_id
        JOIN q ON q.vec_id = p.query_id AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= {TOP_K}
    """


def _oracle_incremental_assign() -> str:
    """``ann_incremental_assign``'s oracle: cells Lloyd-trained on the
    CORPUS slice's bounded sample (the frozen quantizer the build
    persisted), the held-out batch assigned to its nearest frozen cell
    by rounded squared L2 with lowest-cell tie-break — the
    ``_assign_cells`` arithmetic CTE-for-CTE."""
    l2 = _PQ_L2SQ_SQL.format(a="n.v", b="c.v")
    return f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    newb AS (SELECT * FROM e WHERE {_NEW_BATCH_PRED}),
    {_coarse_lloyd_sql(f" WHERE {_CORPUS_PRED}")}
    SELECT vec_id, assigned_label, l2sq FROM (
        SELECT n.vec_id, c.label AS assigned_label,
               ROUND({l2}, 4) + 0.0 AS l2sq,
               ROW_NUMBER() OVER (
                   PARTITION BY n.vec_id
                   ORDER BY ROUND({l2}, 4) ASC, c.label ASC
               ) AS rnk
        FROM newb n CROSS JOIN cccb c
    ) WHERE rnk = 1
    """


def _oracle_centroids() -> str:
    """``ann_centroids``'s oracle: the trained cell coordinates
    (bit-identical across engines through the mirrored Lloyd chains)
    plus the per-cell assigned-vector counts from casg; cells with no
    assigned vectors report 0."""
    return f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    {_coarse_lloyd_sql()},
    {_CASG_SQL},
    cellcnt AS (SELECT cell, COUNT(*) AS n FROM casg GROUP BY cell)
    SELECT c.label,
           CAST(c.dim - 1 AS BIGINT) AS dim,
           c.val + 0.0 AS centroid_val,
           CAST(COALESCE(cc.n, 0) AS BIGINT) AS n_vectors
    FROM (
        SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS dim
        FROM cccb
    ) c
    LEFT JOIN cellcnt cc ON cc.cell = c.label
    """


def _oracle_recall_eval() -> str:
    """``ann_recall_eval``'s oracle: exact brute-force top-k vs the
    trained-cell multiprobe top-k, overlap counted per query."""
    cos = COSINE_SQL.format(a="q.v", b="c.v")
    return f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    {_coarse_lloyd_sql()},
    {_CASG_SQL},
    q AS (SELECT * FROM e WHERE {_QUERY_PRED}),
    bscored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROUND({cos}, 4) + 0.0 AS cosine
        FROM q JOIN e c ON q.vec_id <> c.vec_id
    ),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
            ) AS rank FROM bscored
        ) WHERE rank <= {TOP_K}
    ),
    qc AS (
        -- NaN -> NULL + NULLS LAST: a zero-norm trained cell (a Lloyd
        -- mean cancelling to zero) or zero-norm query makes the
        -- ranking cosine undefined; DuckDB ranks NaN FIRST under plain
        -- DESC while the engine's _cosine yields NULL which Spark's
        -- DESC ranks last — seat undefined cells at the end of the
        -- probe order in both engines (the r10 filtered-serve guard,
        -- applied consistently; r17 review pass 2, finding 1)
        SELECT q.vec_id AS query_id, c.label,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY (CASE WHEN isnan({cos})
                             THEN NULL
                             ELSE ROUND({cos}, 4)
                             END) DESC NULLS LAST, c.label ASC
               ) AS crank
        FROM q CROSS JOIN cccb c
    ),
    probes AS (SELECT query_id, label FROM qc WHERE crank <= {N_PROBE}),
    iscored AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               ROUND({cos}, 4) + 0.0 AS cosine
        FROM probes p
        JOIN casg a ON a.cell = p.label
        JOIN e c ON c.vec_id = a.vec_id
        JOIN q ON q.vec_id = p.query_id AND q.vec_id <> c.vec_id
    ),
    ivf AS (
        SELECT query_id, neighbor_id FROM (
            SELECT *, ROW_NUMBER() OVER (
                PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
            ) AS rank FROM iscored
        ) WHERE rank <= {TOP_K}
    ),
    hits AS (
        SELECT b.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
        FROM brute b JOIN ivf i
          ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
        GROUP BY b.query_id
    )
    SELECT q.vec_id AS query_id,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
           ROUND(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / {TOP_K}, 4) + 0.0
               AS recall_at_k
    FROM q LEFT JOIN hits h ON h.query_id = q.vec_id
    """


def _oracle_filtered_indexed() -> str:
    """``ann_filtered_indexed``'s oracle: the deterministic probe
    widening over TRAINED cells — per-cell counts of filter-matching
    vectors (the filter applies to the INGEST label; cells come from
    casg), the smallest probe prefix whose cells cumulatively hold
    >= k matches, floored at N_PROBE; exact cosine over the probed
    matching vectors."""
    cos = COSINE_SQL.format(a="q.v", b="c.v")
    return f"""
    WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
    {_coarse_lloyd_sql()},
    {_CASG_SQL},
    q AS (SELECT * FROM e WHERE {_QUERY_PRED}),
    qc AS (
        -- NaN -> NULL + explicit NULLS LAST: a zero-norm cell or
        -- zero-norm query makes the ranking cosine undefined; DuckDB
        -- would rank the NaN FIRST under plain DESC while the
        -- engine's _cosine yields NULL which Spark's DESC ranks last
        -- — both engines must seat undefined cells at the end of the
        -- probe order (r10 review)
        SELECT q.vec_id AS query_id, c.label,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY (CASE WHEN isnan({cos})
                             THEN NULL
                             ELSE ROUND({cos}, 4)
                             END) DESC NULLS LAST, c.label ASC
               ) AS crank
        FROM q CROSS JOIN cccb c
    ),
    cellcnt AS (
        SELECT a.cell AS label, COUNT(*) AS m
        FROM e JOIN casg a ON a.vec_id = e.vec_id
        WHERE e.{ANN_FILTER_PRED} GROUP BY a.cell
    ),
    cum AS (
        SELECT qc.query_id, qc.label, qc.crank,
               SUM(COALESCE(cc.m, 0)) OVER (
                   PARTITION BY qc.query_id ORDER BY qc.crank
               ) AS cm
        FROM qc LEFT JOIN cellcnt cc ON cc.label = qc.label
    ),
    need AS (
        SELECT query_id,
               GREATEST(
                   COALESCE(
                       MIN(CASE WHEN cm >= {TOP_K} THEN crank END),
                       MAX(crank)
                   ),
                   {N_PROBE}
               ) AS width
        FROM cum GROUP BY query_id
    ),
    probes AS (
        SELECT cum.query_id, cum.label
        FROM cum JOIN need ON need.query_id = cum.query_id
        WHERE cum.crank <= need.width
    ),
    scored AS (
        SELECT p.query_id, c.vec_id AS neighbor_id,
               ROUND({cos}, 4) + 0.0 AS cosine
        FROM probes p
        JOIN casg a ON a.cell = p.label
        JOIN e c ON c.vec_id = a.vec_id AND c.{ANN_FILTER_PRED}
        JOIN q ON q.vec_id = p.query_id AND q.vec_id <> c.vec_id
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
        ) AS rank
        FROM scored WHERE NOT isnan(cosine)
    )
    SELECT query_id, neighbor_id, cosine, rank FROM ranked
    WHERE rank <= {TOP_K}
    """


def _set_trained_ivf_oracles() -> None:
    from dbt_on_snowflake_spark.registry import QUERIES

    mp = _oracle_multiprobe(N_PROBE)
    QUERIES["ann_ivf_multiprobe"].oracle = mp
    # persisting the index must not change a single result row —
    # shared verbatim
    QUERIES["ann_ivf_multiprobe_indexed"].oracle = mp
    QUERIES["ann_ivf_topk"].oracle = _oracle_multiprobe(1)
    deleted = _oracle_multiprobe(N_PROBE, corpus_pred=_CORPUS_PRED)
    assert deleted != mp
    QUERIES["ann_ivf_multiprobe_deleted"].oracle = deleted
    QUERIES["ann_incremental_assign"].oracle = _oracle_incremental_assign()
    QUERIES["ann_centroids"].oracle = _oracle_centroids()
    QUERIES["ann_recall_eval"].oracle = _oracle_recall_eval()
    QUERIES["ann_filtered_indexed"].oracle = _oracle_filtered_indexed()


_set_trained_ivf_oracles()
