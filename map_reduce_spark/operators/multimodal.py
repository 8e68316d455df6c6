"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with typed metadata alongside, and runs decode /
feature-extraction as Arrow-batched Pandas functions (``mapInPandas``).
The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic stub (``_fake_decode``) — but everything
Spark-side is real and tested: the binary column, the schema contract,
the batch iterator shape, and the partition-parallel execution.

The binary payloads are synthesized from ``documents.text`` (utf-8
bytes) since the driver tables have no media column; swapping in real
bytes changes nothing structurally.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, media_type, n_bytes):
    the canonical multimodal-column layout."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )


@register(
    "binary_metadata",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_fp
FROM documents
""",
)
def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary column (size + fingerprint) —
    pure JVM expressions, no decode."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        F.md5("text").alias("payload_fp"),
    )


_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, "
    "mean_byte double"
)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each worker receives pandas batches, runs the
    decode stub per payload, emits a typed feature row — the real
    multimodal operator shape (vectorized transfer, per-partition
    parallelism, no driver involvement).

    The worker function is deliberately self-contained (no references
    to this module) so cloudpickle ships it by value — Python workers
    do not need map_reduce_spark on their import path.
    """

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        def fake_decode(payload: bytes) -> tuple[int, int, int]:
            # STUB decoder (no media codecs in this container): derives
            # deterministic fake geometry from the raw bytes. A real
            # deployment swaps this body for PIL/ffmpeg, same schema.
            n = len(payload)
            width = 16 + (n % 64)
            height = 16 + (sum(payload[:32]) % 64 if n else 0)
            return int(width), int(height), 3

        for pdf in batches:
            feats = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "mean_byte": [
                        (sum(p) / len(p)) if len(p) else 0.0 for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(op, schema=_FEATURE_SCHEMA)


@register("multimodal_features", oracle=None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode + feature extraction via mapInPandas.

    Rows-only for the driver (the decode stub is engine-side Python);
    tests assert determinism, schema, and batch behavior.
    """
    return extract_features(binary_table(spark, sf_dir))
