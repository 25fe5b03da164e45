"""dedup_exact crossover probe (r18, VERDICT r17 Next #7).

The shipped dedup_exact keeps MIN(lang) — a string-buffered declarative
aggregate that demotes both aggregate levels to SortAggregate (the one
SortAggregate in the registry, measured-and-accepted at r17: the
broadcast-dict rewrite that restores HashAggregate lost 2.5-2.8x at
sf0.1 because its fixed driver-side cost — a distinct-langs collect and
two broadcast joins — dwarfs sorting bench-scale data). The r17 verdict
asked for the crossover: at what row count does the dict rewrite's
amortizing fixed cost beat the sort's n-log-n growth?

This probe derives duplicated-UNIQUE-text copies of the sf0.1 documents
corpus at 10x/100x/1000x row counts (text suffixed per copy so the
group count scales with rows — identical texts would collapse in the
map-side partial aggregate and understate the shuffle), times both
variants interleaved (noop sink, min-of-N), verifies row-identity of
the variants at the two smaller factors, and prints one JSON line.

Usage: python plans/r18/dedup_exact_crossover.py [factors...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dbt_on_snowflake_spark.session import get_spark
from dbt_on_snowflake_spark.testdata import local_df

BASE = "/root/testdata/sf0.1/documents.parquet"
SCRATCH = "/root/repo/.scratch"


def string_min(spark, path):
    d = spark.read.parquet(path)
    return (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("lang").alias("lang"),
        )
        .select("keep_doc_id", "n_copies", "lang", "content_hash")
    )


def broadcast_dict(spark, path):
    """The rank-dict rewrite: the bounded lang domain is collected once,
    MIN runs over its integer rank (UnsafeRow-mutable -> HashAggregate
    on both levels), the rank maps back via a broadcast join. Exactly
    the r17 'driver dict' variant."""
    d = spark.read.parquet(path)
    langs = sorted(
        r["lang"] for r in d.select("lang").distinct().collect()
    )
    rows = [(lang, i) for i, lang in enumerate(langs)]
    fwd = local_df(spark, rows, "lang string, lr int")
    back = local_df(spark, rows, "lang string, lr int")
    agg = (
        d.join(F.broadcast(fwd), "lang")
        .groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("lr").alias("lr"),
        )
    )
    return agg.join(F.broadcast(back), "lr").select(
        "keep_doc_id", "n_copies", "lang", "content_hash"
    )


def derive(spark, factor: int) -> str:
    out = os.path.join(SCRATCH, f"dedup_exact_x{factor}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    base = spark.read.parquet(BASE)
    n = base.count()
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(k * 10_000_000)).alias("doc_id"),
            # unique text per copy so groups scale with rows; keep the
            # original base copy byte-identical
            (
                F.col("text")
                if k == 0
                else F.concat(F.col("text"), F.lit(f" copy{k}"))
            ).alias("text"),
            "lang",
            *[c for c in base.columns if c not in ("doc_id", "text", "lang")],
        )
        for k in range(factor)
    ]
    u = copies[0]
    for c in copies[1:]:
        u = u.unionByName(c)
    u.repartition(32).write.mode("overwrite").parquet(out)
    print(f"derived x{factor}: {n * factor} rows -> {out}", file=sys.stderr)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100, 1000]
    spark = get_spark("dedup_exact_crossover")
    sc = spark.sparkContext
    dirs = {f: (BASE if f == 1 else derive(spark, f)) for f in factors}
    variants = {"string_min": string_min, "broadcast_dict": broadcast_dict}

    # row-identity of the two variants at the smaller factors
    for f in factors[:2]:
        a = string_min(spark, dirs[f])
        b = broadcast_dict(spark, dirs[f])
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty(), f
    print("variants row-identical at factors "
          f"{factors[:2]}", file=sys.stderr)

    rounds = 3
    runs: dict[tuple[int, str], list[float]] = {
        (f, v): [] for f in factors for v in variants
    }
    # warm pass
    for f in factors:
        for v, fn in variants.items():
            fn(spark, dirs[f]).write.format("noop").mode(
                "overwrite"
            ).save()
    for _ in range(rounds):
        for f in factors:
            for v, fn in variants.items():
                sc.setJobDescription(f"crossover x{f} {v}")
                t0 = time.perf_counter()
                fn(spark, dirs[f]).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs[(f, v)].append(round(time.perf_counter() - t0, 3))
                sc.setJobDescription(None)
    out = {
        f: {
            v: {"sec": min(runs[(f, v)]), "runs": runs[(f, v)]}
            for v in variants
        }
        for f in factors
    }
    for f in factors:
        s, d = out[f]["string_min"]["sec"], out[f]["broadcast_dict"]["sec"]
        out[f]["dict_over_string"] = round(d / s, 3) if s > 0 else None
    print(json.dumps({"metric": "dedup_exact_crossover",
                      "base_rows": 5000, "factors": out}))


if __name__ == "__main__":
    main()
