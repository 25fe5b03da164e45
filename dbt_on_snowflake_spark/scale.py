"""Synthetic corpus scale-up: derive an N-x copy of a testdata sf dir
by unioning key-shifted copies of the SF-growing tables (r13 verdict
Next #6 — the empirical probe behind SCALING.md's 100x posture
arguments).

Design choices mirror how a real corpus grows, so a probe over the
derived dir measures the engine, not an artifact of the derivation:

- Fact tables grow, the catalog doesn't: lineitem/orders/customer/
  documents/embeddings get ``factor`` key-shifted copies; region/
  nation/part/supplier are copied verbatim (10x more orders over the
  same parts and suppliers — the broadcast-stability case the probe
  exists to check).
- Foreign keys stay consistent: each copy i shifts o_orderkey and
  l_orderkey by the same ``i * (max_orderkey + 1)``, and o_custkey with
  c_custkey likewise, so join hit-rates and fan-outs are exactly the
  base dir's at every copy.
- Document copies must NOT be near-dups of each other: a naive 10x
  text copy makes every doc a 10-way near-dup cluster, which inflates
  LSH candidate pairs quadratically — a property of the synthetic
  data, not of any real 10x corpus. Each copy instead rotates two
  disjoint character classes (5 vowels by i%5, 19 consonants by i%19
  — injective, so WITHIN-copy near-dup structure is preserved exactly,
  and for factor <= 19 every copy PAIR differs in the 19-letter
  rotation, collapsing cross-copy shingle overlap to ~0 for any
  alphabetic text). Verified-pair output therefore scales linearly:
  factor x the base pairs.
- Embedding copies get a per-copy cyclic dimension rotation: an
  orthogonal transform, so within-copy geometry (distances, clusters,
  quantization error) is exactly the base dir's while cross-copy
  cosines collapse to ~0 — a 10x corpus of genuinely new vectors, not
  10-way near-exact ties. Recall@k measured over the scaled dir is
  therefore a real 10x-distractor measurement.

Everything is declarative DataFrame work — the only driver-side values
are the per-table 1-row max-key aggregates. The write is a plain
parquet mirror of the testdata layout (``<table>.parquet`` dirs), so
every ``queries()`` entry runs against the derived dir unchanged.
"""

from __future__ import annotations

import json
import os
import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# tables copied verbatim: fixed-cardinality dims plus the catalog
# tables that a growing order stream keeps referencing
VERBATIM_TABLES = ("region", "nation", "part", "supplier")

_VOWELS = "aeiou"
# 19 consonants (all but x and y — a PRIME class size): copies rotate
# a class covering most English characters, and every cross-copy pair
# within factor <= 19 differs in THIS rotation (i%19 collides only at
# stride 19), not merely in the 5-vowel one (r14 review pass 9, finding 5: with two 5-letter
# classes, copies i and i+5 shared the vowel map and rstln-poor text
# survived near-identically across them)
_CONSONANTS = "bcdfghjklmnpqrstvwz"

MARKER = "_scale_probe.json"


def _rot(s: str, k: int) -> str:
    k %= len(s)
    return s[k:] + s[:k]


def _copy_translation(i: int) -> tuple[str, str]:
    """Bijective per-copy character remap: vowels rotated by i%5 and
    the 19-consonant class by i%19 — copy 0 is the identity, and for
    any factor <= 19 every PAIR of copies differs in the 19-letter
    rotation, so any shingle containing one of those consonants
    changes between every pair of copies. Boundary (documented, not
    hidden): text with NO alphabetic characters at all (digit-only
    shingles) is invariant under any character-class rotation — such
    content is decorrelated only by its alphabetic context."""
    src = _VOWELS + _VOWELS.upper() + _CONSONANTS + _CONSONANTS.upper()
    v = _rot(_VOWELS, i % 5)
    c = _rot(_CONSONANTS, i % 19)
    dst = v + v.upper() + c + c.upper()
    return src, dst


def _max_plus_one(df: DataFrame, col: str) -> int:
    # 1-row aggregate: the key-domain stride for the shifted copies
    row = df.agg(F.max(F.col(col)).alias("m")).collect()[0]
    if row["m"] is None:
        raise ValueError(
            f"cannot derive a key stride: column {col!r} has no rows "
            "— the base table is empty"
        )
    return int(row["m"]) + 1


def _copies(df: DataFrame, factor: int, transform) -> DataFrame:
    out = None
    for i in range(factor):
        c = transform(df, i)
        out = c if out is None else out.unionByName(c)
    return out


def derive_scaled_dir(
    spark: SparkSession,
    base_dir: str,
    out_dir: str,
    factor: int = 10,
) -> str:
    """Write a ``factor``-x derivation of ``base_dir`` to ``out_dir``
    (idempotent: a marker records (base, factor); a matching existing
    derivation is reused, a mismatched one is rebuilt)."""
    if factor < 1 or factor > 19:
        raise ValueError(
            "factor must be in [1, 19]: beyond 19 copies the "
            "consonant rotation repeats and copy pairs i, i+19 would "
            "differ only in the 5-vowel map"
        )
    marker = os.path.join(out_dir, MARKER)
    # version bumps when the derivation recipe changes (tables covered,
    # remap scheme) — a cached dir from an older recipe is rebuilt
    want = {
        "base_dir": os.path.abspath(base_dir),
        "factor": factor,
        "version": 4,
    }
    if os.path.exists(marker):
        try:
            have = json.load(open(marker))
        except (OSError, json.JSONDecodeError):
            have = None
        if have == want:
            return out_dir
        # recipe/base mismatch: remove the stale marker BEFORE touching
        # any table so a crash mid-rebuild leaves a dir nobody adopts
        # (a surviving old marker would hand a half-rewritten mix to a
        # process still requesting the old recipe — r14 review pass 3,
        # finding 3); the fresh marker lands only after every table is
        # rewritten
        os.remove(marker)
    os.makedirs(out_dir, exist_ok=True)

    def rd(name: str) -> DataFrame:
        return spark.read.parquet(
            posixpath.join(base_dir, f"{name}.parquet")
        )

    def wr(df: DataFrame, name: str) -> None:
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )

    for t in VERBATIM_TABLES:
        wr(rd(t), t)

    cust, orders, li = rd("customer"), rd("orders"), rd("lineitem")
    off_c = _max_plus_one(cust, "c_custkey")
    off_o = _max_plus_one(orders, "o_orderkey")

    wr(
        _copies(
            cust, factor,
            lambda df, i: df.withColumn(
                "c_custkey", F.col("c_custkey") + F.lit(i * off_c)
            ),
        ),
        "customer",
    )
    wr(
        _copies(
            orders, factor,
            lambda df, i: df.withColumn(
                "o_orderkey", F.col("o_orderkey") + F.lit(i * off_o)
            ).withColumn(
                "o_custkey", F.col("o_custkey") + F.lit(i * off_c)
            ),
        ),
        "orders",
    )
    wr(
        _copies(
            li, factor,
            lambda df, i: df.withColumn(
                "l_orderkey", F.col("l_orderkey") + F.lit(i * off_o)
            ),
        ),
        "lineitem",
    )

    docs = rd("documents")
    off_d = _max_plus_one(docs, "doc_id")

    def doc_copy(df: DataFrame, i: int) -> DataFrame:
        src, dst = _copy_translation(i)
        return df.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * off_d)
        ).withColumn("text", F.translate(F.col("text"), src, dst))

    wr(_copies(docs, factor, doc_copy), "documents")

    # events: read through testdata.table (the TIMESTAMP(NANOS) ->
    # micros conversion), shift event_id by its own stride and user_id
    # by the CUSTOMER stride — user_id references c_custkey, so copy i
    # events enrich against copy i customers with exactly the base
    # dir's hit-rate. The time range is untouched: a 10x corpus is 10x
    # event density over the same window, so time-bucketed aggregates
    # keep their group count and grow their per-group values.
    from dbt_on_snowflake_spark.testdata import table as _table

    ev = _table(spark, base_dir, "events")
    off_e = _max_plus_one(ev, "event_id")
    wr(
        _copies(
            ev, factor,
            lambda df, i: df.withColumn(
                "event_id", F.col("event_id") + F.lit(i * off_e)
            ).withColumn(
                "user_id", F.col("user_id") + F.lit(i * off_c)
            ),
        ),
        "events",
    )

    emb = rd("embeddings")
    off_v = _max_plus_one(emb, "vec_id")
    off_l = _max_plus_one(emb, "label")
    # dimension count: one bounded driver-side row (the copies need a
    # literal rotation length; testdata vectors are fixed-width)
    first = emb.select("embedding").first()
    if first is None:
        raise ValueError(
            f"embeddings table at {base_dir} is empty — nothing to "
            "derive a scaled copy from"
        )
    dim = len(first["embedding"])

    def emb_copy(df: DataFrame, i: int) -> DataFrame:
        # per-copy cyclic DIMENSION rotation — the vector-space analog
        # of the document character remap: an orthogonal transform, so
        # every within-copy distance/cosine (and thus the copy's
        # cluster geometry, kNN structure, and quantization-error
        # profile) is EXACTLY the base dir's, while cross-copy cosines
        # collapse to ~0 for high-dim vectors (a vector and its
        # rotation are near-orthogonal). A naive verbatim/offset copy
        # instead makes every vector a 10-way near-exact tie, which
        # floods any top-k with synthetic duplicates.
        # labels shift with the copy too: a rotated copy's clusters
        # live elsewhere in the space, so reusing the base label ids
        # would make each label a 10-way dispersed pseudo-cluster (a
        # derivation artifact); distinct per-copy labels are how a real
        # 10x corpus grows — same cluster geometry, 10x more clusters
        k = i % dim
        df = df.withColumn(
            "vec_id", F.col("vec_id") + F.lit(i * off_v)
        ).withColumn(
            "label", (F.col("label") + F.lit(i * off_l)).cast("int")
        )
        if k == 0:
            return df
        return df.withColumn(
            "embedding",
            F.concat(
                F.slice(F.col("embedding"), k + 1, dim - k),
                F.slice(F.col("embedding"), 1, k),
            ),
        )

    wr(_copies(emb, factor, emb_copy), "embeddings")

    with open(marker, "w") as f:
        json.dump(want, f)
    return out_dir
