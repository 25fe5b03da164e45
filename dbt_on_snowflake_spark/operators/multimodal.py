"""Multimodal-column operators (SURVEY §7.5).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The container has no codec libraries, so the *decode* step is a
clearly-marked deterministic fake (`fake_decode_rgb`), but everything
Spark-side — binary schema, Arrow batch shape, ``mapInPandas`` plumbing,
partition sizing — is real and tested.

``multimodal_meta`` is fully SQL-expressible (byte length / content hash
over the binary payload) and oracle-checked; the decode/feature pipeline
is rows-only (no SQL equivalent) and covered by pytest.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dbt_on_snowflake_spark.registry import query
from dbt_on_snowflake_spark.testdata import table


def _with_payload(d: DataFrame) -> DataFrame:
    """Derive a deterministic binary 'media payload' column from text.

    Stands in for real image/audio bytes: at 100 TB these are the same
    opaque BinaryType cells (or object-store URIs resolved in the scan)."""
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.col("source").alias("media_source"),
    )


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id,
           source AS media_source,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS content_md5,
           CASE WHEN octet_length(encode(text)) > 256 THEN 'large'
                ELSE 'small' END AS size_class
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length, content
    hash, size class — the catalog/manifest pass of a media pipeline,
    entirely JVM-side."""
    d = table(spark, sf_dir, "documents")
    p = _with_payload(d)
    return p.select(
        "doc_id",
        "media_source",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.when(F.octet_length("payload") > 256, "large")
        .otherwise("small")
        .alias("size_class"),
    )


# ----------------------------------------------------- decode (stubbed)

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, "
    "n_channels int, mean_intensity double"
)


def fake_decode_rgb(payload: bytes) -> tuple[int, int, int, float]:
    """DETERMINISTIC FAKE decoder (no codec libs in this container).

    A real implementation would be e.g. PIL.Image.open(BytesIO(payload));
    this derives stable pseudo-dimensions and a mean intensity from the
    bytes so the Spark plumbing is fully exercised and repeatable. Raise
    path for genuinely unsupported media is NotImplementedError."""
    if not payload:
        raise NotImplementedError("empty payload: no decodable media")
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean_intensity = (sum(payload[:64]) % 2551) / 10.0
    return width, height, 3, mean_intensity


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched, per-partition, no driver data.

    Batch shape: input partitions stream as pandas DataFrames; output rows
    carry typed decode results. At scale, repartition upstream so a batch
    of payloads fits executor memory (payload bytes dominate)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [fake_decode_rgb(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "n_channels": [d[2] for d in decoded],
                    "mean_intensity": [d[3] for d in decoded],
                }
            )

    return df.mapInPandas(run, schema=DECODE_SCHEMA)


@query("multimodal_decode")  # no SQL oracle: mapInPandas pipeline
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> fake-decode -> typed features via mapInPandas.
    Rows-only driver check; exact values are pytest-verified against the
    pure-Python decoder."""
    d = table(spark, sf_dir, "documents")
    return decode_media(_with_payload(d))
