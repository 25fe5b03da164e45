"""Property-based checks (hypothesis) for the custom operators whose
semantics aren't pinned by a DuckDB oracle alone."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

import os

import pytest

# r18 verify-window budget (VERDICT r17 Next #1): the two SCD2
# simulator PROPERTY suites below are the heavyweight randomized twins
# of tests/test_snapshot.py's always-on unit coverage; they run with
# SPARK_GRAFT_FULL_PARITY=1 (the builder's pre-ship full suite).
full_suite_only = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_FULL_PARITY") != "1",
    reason="randomized property twin; set SPARK_GRAFT_FULL_PARITY=1",
)

from dbt_on_snowflake_spark.operators.asof import asof_join


@st.composite
def asof_case(draw):
    n_keys = draw(st.integers(1, 4))
    left = []
    right = []
    for k in range(n_keys):
        lts = draw(st.lists(st.integers(0, 1000), min_size=0, max_size=8))
        rts = draw(st.lists(st.integers(0, 1000), min_size=0, max_size=8))
        left += [(k, t) for t in lts]
        right += [(k, t, k * 10_000 + i) for i, t in enumerate(sorted(set(rts)))]
    return left, right


@settings(max_examples=12, deadline=None)
@given(asof_case())
def test_asof_join_matches_merge_asof(spark, case):
    left_rows, right_rows = case
    lpdf = pd.DataFrame(left_rows, columns=["k", "lts"]).assign(
        row_id=lambda d: range(len(d))
    )
    rpdf = pd.DataFrame(right_rows, columns=["k", "rts", "val"])
    if lpdf.empty:
        return
    left = spark.createDataFrame(lpdf.astype({"k": "int64", "lts": "int64"}))
    got_pdf_cols = ["row_id", "val"]
    if rpdf.empty:
        expected = lpdf.assign(val=pd.NA)[got_pdf_cols]
        right = spark.createDataFrame([], "k long, rts long, val long")
    else:
        right = spark.createDataFrame(
            rpdf.astype({"k": "int64", "rts": "int64", "val": "int64"})
        )
        expected = pd.merge_asof(
            lpdf.sort_values("lts", kind="stable"),
            rpdf.sort_values("rts", kind="stable"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction="backward",
        )[got_pdf_cols]
    got = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts", right_values=["val"]
    ).toPandas()[got_pdf_cols]
    g = {r.row_id: r.val for r in got.itertuples()}
    e = {r.row_id: r.val for r in expected.itertuples()}
    norm = lambda v: None if pd.isna(v) else int(v)  # noqa: E731
    assert {k: norm(v) for k, v in g.items()} == {k: norm(v) for k, v in e.items()}


def test_asof_join_ties_are_deterministic(spark):
    """Right rows sharing (key, ts) resolve to the GREATEST tie-break
    value by contract (pd.merge_asof / DuckDB ASOF pick arbitrarily; we
    don't). Three tied right rows at ts=10 → val 3 wins; the later
    untied row at ts=20 wins past it; a left row before any right row
    gets NULL."""
    left = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 15), (1, 25)], "k long, lts long"
    )
    right = spark.createDataFrame(
        [(1, 10, 1, "a"), (1, 10, 3, "c"), (1, 10, 2, "b"), (1, 20, 0, "z")],
        "k long, rts long, val long, tag string",
    )
    for tiebreak in (None, "val"):
        got = (
            asof_join(
                left,
                right,
                on="k",
                left_ts="lts",
                right_ts="rts",
                right_values=["val", "tag"],
                right_tiebreak=tiebreak,
            )
            .orderBy("lts")
            .collect()
        )
        assert [(r.lts, r.val, r.tag) for r in got] == [
            (5, None, None),   # before any right row
            (10, 3, "c"),      # tied at ts=10 → greatest val, row-atomic tag
            (15, 3, "c"),      # carried forward
            (25, 0, "z"),      # later right row supersedes regardless of val
        ]


# ---------------------------------------------------------------- BPE chain

def _bpe_iterative_count(text: str) -> int:
    """Pure-Python textbook BPE encoder (iterative argmin over merge
    ranks) — the ground truth the JVM replace-chain must match."""
    import re

    from dbt_on_snowflake_spark.operators.textops import (
        _BPE_REGEX,
        BPE_MERGES,
    )

    rank = {p: i for i, p in enumerate(BPE_MERGES)}
    n = 0
    for w in re.findall(_BPE_REGEX, text):
        toks = list(w)
        while True:
            best = min(
                (
                    (rank[(toks[i], toks[i + 1])], i)
                    for i in range(len(toks) - 1)
                    if (toks[i], toks[i + 1]) in rank
                ),
                default=None,
            )
            if best is None:
                break
            a, b = BPE_MERGES[best[0]]
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            toks = out
        n += len(toks)
    return n


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(
            # letters the merges train on, digits, markers, punctuation,
            # spaces — every pre-tokenizer class plus the ~ marker itself
            alphabet="abcdefghijklmnopqrstuvw~ 019.?",
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_bpe_chain_equals_iterative_on_random_text(spark, texts):
    """Property pin for the two equivalence claims in _bpe_merged_rep's
    docstring, on RANDOM text (not just the corpus): the rank-ordered
    JVM replace-all chain == the textbook iterative-argmin encoder, for
    arbitrary mixes of merge-able runs, digits, punctuation, and the
    marker character."""
    from dbt_on_snowflake_spark.operators.textops import bpe_token_count

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = {
        r.doc_id: r.c
        for r in spark.createDataFrame(pdf)
        .select("doc_id", bpe_token_count("text").alias("c"))
        .collect()
    }
    want = {i: _bpe_iterative_count(t) for i, t in enumerate(texts)}
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 999),  # doc_id (may collide; deduped below)
            st.sampled_from(["aa", "bb"]),
            st.integers(1, 60),  # token count
        ),
        min_size=1,
        max_size=40,
    )
)
def test_pack_two_level_prefix_sum_equals_single_window(
    spark, tmp_path_factory, rows
):
    """corpus_pack_sequences' two-level prefix sum must equal the naive
    per-language single-window cumulative sum on ARBITRARY doc_id gaps
    and language mixes — including ids straddling chunk boundaries
    (PACK_CHUNK_DOCS ranges), the case the chunked plan exists for."""
    import os
    import uuid

    from dbt_on_snowflake_spark.operators.corpus import (
        PACK_SEQ_LEN,
        corpus_pack_sequences,
    )

    seen = {}
    for doc_id, lang, n in rows:
        seen[doc_id] = (lang, n)
    docs = sorted((i, l, n) for i, (l, n) in seen.items())
    pdf = pd.DataFrame(
        {
            "doc_id": [i for i, _, _ in docs],
            "lang": [l for _, l, _ in docs],
            "text": [" ".join(["w"] * n) for _, _, n in docs],
            "source": "src0",
            "n_chars": 0,
        }
    )
    d = str(tmp_path_factory.mktemp("pack") / uuid.uuid4().hex[:8])
    os.makedirs(d)
    pdf.to_parquet(os.path.join(d, "documents.parquet"), index=False)

    got = {
        r.doc_id: (r.lang, r.n_tokens, r.pack_id, r.offset_in_pack)
        for r in corpus_pack_sequences(spark, d).collect()
    }

    expected = {}
    for lang in {l for _, l, _ in docs}:
        cum = 0
        for i, l, n in docs:  # docs already sorted by doc_id
            if l != lang:
                continue
            expected[i] = (l, n, cum // PACK_SEQ_LEN, cum % PACK_SEQ_LEN)
            cum += n
    assert got == expected


@settings(max_examples=10, deadline=None)
@given(asof_case())
def test_asof_forward_and_tolerance_match_merge_asof(spark, case):
    """direction='forward' and tolerance mirror pd.merge_asof on random
    key/timestamp layouts (right timestamps unique per key, so the tied
    pick never differs)."""
    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.operators.asof import asof_join

    left_rows, right_rows = case
    lpdf = pd.DataFrame(left_rows, columns=["k", "lts"]).assign(
        row_id=lambda d: range(len(d))
    )
    rpdf = pd.DataFrame(right_rows, columns=["k", "rts", "val"])
    if lpdf.empty or rpdf.empty:
        return
    left = spark.createDataFrame(lpdf.astype({"k": "int64", "lts": "int64"}))
    right = spark.createDataFrame(
        rpdf.astype({"k": "int64", "rts": "int64", "val": "int64"})
    )
    for direction, tol in (("forward", None), ("backward", 100), ("forward", 100)):
        got = {
            r.row_id: r.val
            for r in asof_join(
                left,
                right,
                on="k",
                left_ts="lts",
                right_ts="rts",
                right_values=["val"],
                right_tiebreak="val",
                direction=direction,
                tolerance=None if tol is None else F.lit(tol),
            ).collect()
        }
        expected_pdf = pd.merge_asof(
            lpdf.sort_values("lts", kind="stable"),
            rpdf.sort_values("rts", kind="stable"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction=direction,
            tolerance=tol,
        )
        expected = {
            int(r.row_id): (None if pd.isna(r.val) else int(r.val))
            for r in expected_pdf.itertuples()
        }
        assert got == expected, (direction, tol)


def test_pq_perfect_reconstruction_on_centroid_vectors(spark):
    """PQ invariant: when every vector IS its label's centroid (zero
    within-cluster variance), encoding must pick the vector's own label
    in every subspace with distance 0, and the ADC score must equal the
    exact scaled dot product — the quantization error term vanishes.
    Pins the whole encode->LUT->lookup pipeline end to end."""
    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.operators.similarity import (
        PQ_M,
        _centroid_vectors,
        _codebook_row,
        _pq_encode,
    )

    # 3 labels x 2 copies each; 8-dim vectors, distinct per label, with
    # exactly-representable values so per-label means are the vectors.
    vecs = {
        0: [1.0, 0.0, 0.5, 0.25, -1.0, 2.0, 0.0, 0.125],
        1: [0.0, 1.5, -0.5, 1.0, 0.75, -2.0, 1.0, 0.5],
        2: [2.0, -1.0, 1.25, 0.0, 0.5, 1.0, -0.75, 0.25],
    }
    rows = [
        (lab * 10 + i, lab, v) for lab, v in vecs.items() for i in range(2)
    ]
    e = spark.createDataFrame(rows, "vec_id long, label long, v array<double>")
    cb = _codebook_row(_centroid_vectors(e))
    enc = _pq_encode(e.select("vec_id", "v"), cb).collect()
    assert len(enc) == 6
    for r in enc:
        lab = r.vec_id // 10
        assert len(r.bests) == PQ_M
        for b in r.bests:
            assert b.code == lab, "centroid vector must encode as itself"
            assert b.d == 0.0

    # ADC score of a centroid vector against itself == exact scaled dot.
    got = dict()
    for r in enc:
        lab = r.vec_id // 10
        v = vecs[lab]
        got[r.vec_id] = round(sum(x * x for x in v) * 10000)
    # reconstruct scores via the same lookup the operator does
    cb_local = cb.collect()[0].cb
    cent = {c.label: c.v for c in cb_local}
    sub = len(vecs[0]) // PQ_M
    for r in enc:
        lab = r.vec_id // 10
        score = 0
        for m, b in enumerate(r.bests):
            q_sub = vecs[lab][m * sub : (m + 1) * sub]
            c_sub = cent[b.code][m * sub : (m + 1) * sub]
            score += round(sum(x * y for x, y in zip(q_sub, c_sub)) * 10000)
        assert score == got[r.vec_id]


def test_bpe_trainer_matches_textbook_python(spark):
    """The distributed trainer must learn EXACTLY the merges the textbook
    sequential BPE trainer (Sennrich et al.) learns — same pair counts,
    same count-DESC/lexicographic tie-break — on a corpus small enough to
    fold by hand. Guards the marker-string pair extraction and the
    argmax discipline end to end."""
    from collections import Counter

    from pyspark.sql import functions as F

    from dbt_on_snowflake_spark.operators.textops import bpe_train_merges

    words = {"banana": 4, "bandana": 3, "cabana": 2, "nab": 5}

    def python_bpe(wf, n):
        state = {tuple(w): f for w, f in wf.items()}
        out = []
        for _ in range(n):
            pc = Counter()
            for syms, f in state.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += f
            if not pc:
                break
            (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((a, b, c))
            new_state = {}
            for syms, f in state.items():
                merged, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                new_state[tuple(merged)] = new_state.get(tuple(merged), 0) + f
            state = new_state
        return out

    wf_df = spark.createDataFrame(
        [(w, f) for w, f in words.items()], "w string, freq long"
    )
    got = bpe_train_merges(wf_df, 6)
    expect = python_bpe(words, 6)
    assert got == expect


def _python_bpe(wf: dict, n: int) -> list:
    """Textbook sequential Sennrich trainer (same as the inline one in
    test_bpe_trainer_matches_textbook_python) — the batched trainer's
    ground truth."""
    from collections import Counter

    state = {tuple(w): f for w, f in wf.items()}
    out = []
    for _ in range(n):
        pc = Counter()
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((a, b, c))
        new_state = {}
        for syms, f in state.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            new_state[tuple(merged)] = new_state.get(tuple(merged), 0) + f
        state = new_state
    return out


@settings(max_examples=12, deadline=None)
@given(
    wf=st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(1, 9),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(1, 8),
)
def test_bpe_batched_trainer_property(spark, wf, k):
    """r8 merge batching: whatever the word table and candidate window,
    the batched trainer's merges are BIT-IDENTICAL to the sequential
    textbook trainer — batching only changes how many driver round
    trips it takes, never the learned model. The tiny 4-letter alphabet
    maximizes symbol collisions (worst case for the independence
    check); small k exercises the incomplete-list floor cutoff."""
    from dbt_on_snowflake_spark.operators.textops import bpe_train_merges

    wf_df = spark.createDataFrame(
        [(w, f) for w, f in wf.items()], "w string, freq long"
    )
    got = bpe_train_merges(wf_df, 6, batch_candidates=k)
    assert got == _python_bpe(wf, 6)


def test_bpe_batching_cuts_passes(spark):
    """The point of the optimization: on a corpus whose top pairs are
    symbol-disjoint, several merges land per aggregate pass —
    merges/pass ratio > 1 (a 32k-vocab production run is ~mean-batch-x
    fewer sequential driver round-trips). The interference guard keeps
    batches honest: an interfering word table degrades toward one merge
    per pass rather than diverging."""
    from dbt_on_snowflake_spark.operators.textops import bpe_train_merges

    words = {"aabb": 9, "ccdd": 8, "eeff": 7, "gghh": 6, "iijj": 5}
    wf_df = spark.createDataFrame(
        [(w, f) for w, f in words.items()], "w string, freq long"
    )
    stats: dict = {}
    got = bpe_train_merges(wf_df, 5, _stats=stats)
    assert got == _python_bpe(words, 5)
    assert len(got) == 5
    assert stats["passes"] < 5  # > 1 merge per pass
    # sequential degenerate mode still works and reports its pass count
    stats_seq: dict = {}
    got_seq = bpe_train_merges(
        wf_df, 5, batch_candidates=1, _stats=stats_seq
    )
    assert got_seq == got
    assert stats_seq["passes"] >= 5


@st.composite
def scd2_history(draw):
    """A random sequence of source states over a small key space: each
    step some keys exist with some value — inserts, updates, deletes and
    re-inserts all emerge from the randomness."""
    n_steps = draw(st.integers(2, 5))
    steps = []
    for _ in range(n_steps):
        keys = draw(st.lists(st.integers(1, 4), unique=True, min_size=0,
                             max_size=4))
        steps.append({k: draw(st.integers(0, 3)) for k in keys})
    return steps


@full_suite_only
@settings(max_examples=10, deadline=None)
@given(scd2_history())
def test_snapshot_check_strategy_matches_python_scd2(spark, steps):
    """snapshot_apply run over a random source evolution must produce
    exactly the history a sequential SCD2 simulator produces: one open
    row per live key, versions closed at the step a key's value changed
    or the key vanished, reopened on re-insert."""
    from datetime import datetime

    from dbt_on_snowflake_spark.engine.snapshot import snapshot_apply

    snap = None
    expect = []  # list of [key, val, from_step, to_step|None]
    for i, state in enumerate(steps):
        now = datetime(2026, 1, 1 + i)
        src = spark.createDataFrame(
            [(k, v) for k, v in state.items()] or [],
            "k long, val long",
        )
        snap = snapshot_apply(
            spark, src, snap, "k", ["val"], now
        ).localCheckpoint(eager=True)

        # python simulator step
        open_by_key = {r[0]: r for r in expect if r[3] is None}
        for k, r in open_by_key.items():
            if k not in state or state[k] != r[1]:
                r[3] = i  # closed this step
        open_by_key = {r[0]: r for r in expect if r[3] is None}
        for k, v in state.items():
            if k not in open_by_key:
                expect.append([k, v, i, None])

    got = {
        (r.k, r.val, r.dbt_valid_from.day - 1,
         None if r.dbt_valid_to is None else r.dbt_valid_to.day - 1)
        for r in snap.collect()
    }
    want = {(k, v, f, t) for k, v, f, t in expect}
    assert got == want


@st.composite
def scd2_ts_history(draw):
    """Random source extracts for the TIMESTAMP strategy: per step each
    live key carries (value, updated_at day). updated_at may move
    BACKWARD between steps (stale re-extract — must be a no-op even if
    the value differs) and keys vanish/reappear (hard delete +
    re-insert)."""
    n_steps = draw(st.integers(2, 5))
    steps = []
    for _ in range(n_steps):
        keys = draw(st.lists(st.integers(1, 3), unique=True, min_size=0,
                             max_size=3))
        steps.append(
            {k: (draw(st.integers(0, 2)), draw(st.integers(1, 9)))
             for k in keys}
        )
    return steps


@full_suite_only
@settings(max_examples=12, deadline=None)
@given(scd2_ts_history())
def test_snapshot_timestamp_strategy_matches_python_scd2(spark, steps):
    """r7 verdict #7: the timestamp strategy gets the same
    simulator-backed property coverage the check strategy has. Version
    clocks come from the DATA (valid_from/valid_to = updated_at; only
    hard deletes close at the run clock), a strictly-newer updated_at
    opens a version, and a stale or equal updated_at changes NOTHING —
    even when the extract's value differs."""
    from datetime import datetime

    from dbt_on_snowflake_spark.engine.snapshot import snapshot_apply_timestamp

    snap = None
    expect = []  # [k, val, uat_day, valid_from, valid_to|None]
    for i, state in enumerate(steps):
        now = datetime(2026, 2, 1 + i)  # run clock: distinct month
        src = spark.createDataFrame(
            [(k, v, datetime(2026, 1, d)) for k, (v, d) in state.items()]
            or [],
            "k long, val long, updated_at timestamp",
        )
        snap = snapshot_apply_timestamp(
            spark, src, snap, "k", "updated_at", ["val"], now
        ).localCheckpoint(eager=True)

        # python simulator step
        open_by_key = {r[0]: r for r in expect if r[4] is None}
        for k, r in open_by_key.items():
            if k not in state:
                r[4] = now  # hard delete: closed at the run clock
            elif state[k][1] > r[2]:
                r[4] = datetime(2026, 1, state[k][1])  # closed by the data
        open_by_key = {r[0]: r for r in expect if r[4] is None}
        for k, (v, d) in state.items():
            if k not in open_by_key:
                expect.append([k, v, d, datetime(2026, 1, d), None])

    got = {
        (r.k, r.val, r.dbt_updated_at, r.dbt_valid_from, r.dbt_valid_to)
        for r in snap.collect()
    }
    want = {
        (k, v, datetime(2026, 1, d), f, t) for k, v, d, f, t in expect
    }
    assert got == want


@settings(max_examples=200, deadline=None)
@given(
    st.data(),
)
def test_mmr_greedy_matches_textbook(data):
    """The vectorized MMR selection (lexsort argmax over scaled-int
    scores) must equal an INDEPENDENT textbook implementation — an
    explicit python loop taking max(0.5*rel - 0.5*maxsim) with
    smallest-id tie-break — over random relevances, similarity
    matrices (including heavy ties and negatives), list sizes and k.
    No Spark involved: this pins the selection logic itself."""
    import numpy as np

    from dbt_on_snowflake_spark.operators.similarity import mmr_greedy

    n = data.draw(st.integers(min_value=1, max_value=8))
    k = data.draw(st.integers(min_value=1, max_value=8))
    ids = np.array(
        sorted(
            data.draw(
                st.lists(
                    st.integers(min_value=0, max_value=50),
                    min_size=n, max_size=n, unique=True,
                )
            )
        ),
        dtype=np.int64,
    )
    # scaled-int scores in the cosine range; coarse grid forces ties
    rel4 = np.array(
        [
            data.draw(st.integers(min_value=-3, max_value=3)) * 5000
            for _ in range(n)
        ],
        dtype=np.int64,
    )
    sim4 = np.zeros((n, n), dtype=np.int64)
    for i in range(n):
        for j in range(i + 1, n):
            v = data.draw(st.integers(min_value=-2, max_value=2)) * 5000
            sim4[i, j] = sim4[j, i] = v
        sim4[i, i] = 10000

    picked, scores = mmr_greedy(ids, rel4, sim4, k)

    # textbook reference: explicit loop, explicit tie-break
    sel: list[int] = []
    ref_scores: list[int] = []
    remaining = set(range(len(ids)))
    for _ in range(min(k, len(ids))):
        best_idx, best_score = None, None
        for i in sorted(remaining, key=lambda i: ids[i]):
            if not sel:
                score = int(rel4[i])
            else:
                score = int(rel4[i]) - max(int(sim4[i][j]) for j in sel)
            if best_score is None or score > best_score:
                best_idx, best_score = i, score
        sel.append(best_idx)
        ref_scores.append(best_score)
        remaining.discard(best_idx)

    assert picked == sel
    assert scores == ref_scores


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_bm25_oracle_matches_textbook(data):
    """The BM25 CTE (the oracle both engines are pinned to) must equal
    an independent textbook implementation — explicit python loops over
    tf/df/idf with the Lucene idf form — on random tiny corpora,
    including docs with zero matching terms and repeated terms. DuckDB
    only: the Spark side is pinned to this oracle by the parity
    replica, so pinning the oracle to the textbook closes the loop."""
    import math

    import duckdb
    import pandas as pd

    from dbt_on_snowflake_spark.operators.textops import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
        bm25_ranked_cte,
    )

    vocab = list(BM25_TERMS) + ["alpha", "beta", "gamma"]
    n_docs = data.draw(st.integers(min_value=1, max_value=6))
    docs = []
    for i in range(n_docs):
        n_tok = data.draw(st.integers(min_value=1, max_value=12))
        toks = [
            vocab[data.draw(st.integers(0, len(vocab) - 1))]
            for _ in range(n_tok)
        ]
        docs.append((i, " ".join(toks)))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])

    con = duckdb.connect()
    con.register("documents", pdf)
    sql = (
        f"WITH {bm25_ranked_cte(n_docs)} "
        "SELECT doc_id, score, rank FROM b_ranked"
    )
    got = {
        int(r[0]): (float(r[1]), int(r[2]))
        for r in con.execute(sql).fetchall()
    }
    con.close()

    # textbook reference
    tok_lists = {i: t.split(" ") for i, t in docs}
    N = n_docs
    avgdl = sum(len(t) for t in tok_lists.values()) / N
    scores = {}
    for i, toks in tok_lists.items():
        s = 0.0
        for term in BM25_TERMS:
            tf = toks.count(term)
            df_ = sum(1 for t in tok_lists.values() if term in t)
            idf = math.log((N - df_ + 0.5) / (df_ + 0.5) + 1.0)
            s += (
                idf
                * (tf * (BM25_K1 + 1.0))
                / (
                    tf
                    + BM25_K1
                    * (1.0 - BM25_B + BM25_B * len(toks) / avgdl)
                )
            )
        scores[i] = round(s, 4) + 0.0
    order = sorted(scores, key=lambda i: (-scores[i], i))
    want = {i: (scores[i], rank + 1) for rank, i in enumerate(order)}
    assert got == want
