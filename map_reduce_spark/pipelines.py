"""End-to-end training-data preparation pipeline — the composed use
case the LLM-pipeline operators exist for.

    raw documents
      → quality gate (text_analysis.text_quality verdict)
      → exact dedup (lowest doc_id per content fingerprint survives)
      → near-dup removal (MinHash-LSH pairs → connected components;
        only each duplicate CLUSTER's canonical member survives —
        transitive chains A~B~C collapse to one doc even when A~C
        itself sits below threshold)
      → annotation (predicted language, token counts)
      → deterministic train/val/test assignment (stable hash split)
      → parquet, partitioned by predicted language

Scale shape: two narrow projections, one fingerprint groupBy, the LSH
candidate join (no pairwise blowup), label propagation over the tiny
dup-pair graph, one broadcast anti-join against the drop list, and a
partitioned write — nothing quadratic, nothing driver-side except the
component loop's per-round convergence scalar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.operators.dedup import (
    connected_components,
    dedup_exact,
    dedup_minhash_lsh,
)
from map_reduce_spark.operators.pipeline_ops import _hash_bucket
from map_reduce_spark.operators.text_analysis import lang_id, text_quality, token_count


def prepare_training_data(
    spark: SparkSession, sf_dir: str, out_dir: str | None = None
) -> DataFrame:
    """Run the full preparation chain; optionally write the result
    partitioned by predicted language. Returns the prepared frame
    (doc_id, text, source, pred_lang, n_tokens, n_chars_actual)."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. quality gate
    keep_ids = (
        text_quality(spark, sf_dir)
        .filter(F.col("quality_verdict") == "keep")
        .select("doc_id")
    )

    # 2. exact dedup: survivors are each fingerprint's lowest doc_id
    exact_keep = dedup_exact(spark, sf_dir).select(
        F.col("keep_id").alias("doc_id")
    )

    # 3. near-dup removal: resolve verified LSH pairs into transitive
    # clusters; everything but each cluster's canonical (min-id) member
    # is dropped
    near_drop = (
        connected_components(dedup_minhash_lsh(spark, sf_dir))
        .filter(~F.col("is_canonical"))
        .select("doc_id")
    )

    survivors = (
        docs.join(keep_ids, "doc_id", "left_semi")
        .join(exact_keep, "doc_id", "left_semi")
        .join(F.broadcast(near_drop), "doc_id", "left_anti")
    )

    # 4. annotate + stable split assignment
    b = _hash_bucket(F.col("doc_id"), "split")
    split = F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    annotated = (
        survivors.join(lang_id(spark, sf_dir).select("doc_id", "pred_lang"), "doc_id")
        .join(
            token_count(spark, sf_dir).select("doc_id", "n_tokens", "n_chars_actual"),
            "doc_id",
        )
        .select(
            "doc_id",
            "text",
            "source",
            "pred_lang",
            "n_tokens",
            "n_chars_actual",
            split.alias("split"),
        )
    )

    if out_dir is not None:
        annotated.write.mode("overwrite").partitionBy("pred_lang").parquet(out_dir)
    return annotated
