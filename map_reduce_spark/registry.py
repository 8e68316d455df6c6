"""Query registry — the engine's public operator catalog.

Every operator in SURVEY.md §2 (and each added category) registers:

- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the implementation),
- optionally a DuckDB-runnable ANSI-SQL oracle string with identical
  output column names (the driver hash-compares the two at sf0.01).

``__spark_entry__.py`` is a thin shim over this module.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_REGISTRY: dict[str, "Query"] = {}

# operator modules that register queries on import
_OPERATOR_MODULES = (
    "map_reduce_spark.operators.wordcount",
    "map_reduce_spark.operators.relational",
    "map_reduce_spark.operators.scalar_funcs",
    "map_reduce_spark.operators.windows",
    "map_reduce_spark.operators.dedup",
    "map_reduce_spark.operators.similarity",
    "map_reduce_spark.operators.text_analysis",
    "map_reduce_spark.operators.events",
    "map_reduce_spark.operators.multimodal",
    "map_reduce_spark.operators.advanced_joins",
    "map_reduce_spark.operators.coverage_extras",
    "map_reduce_spark.operators.pandas_udfs",
    "map_reduce_spark.operators.subqueries",
    "map_reduce_spark.operators.tpch",
    "map_reduce_spark.operators.corpus_quality",
    "map_reduce_spark.operators.functions_extra",
    "map_reduce_spark.operators.pipeline_ops",
    "map_reduce_spark.operators.analytics",
    "map_reduce_spark.operators.graph",
    "map_reduce_spark.operators.modern_sql",
    "map_reduce_spark.operators.python_source",
    "map_reduce_spark.streaming.jobs",
    "map_reduce_spark.pipelines",
)


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver runs rows-only check
    doc: str = ""


def register(name: str, oracle: str | None = None):
    """Decorator: register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip())
        return fn

    return deco


# Catalog order is a verification budget: the round driver hash-checks
# the FIRST 50 entries of queries() against their DuckDB oracles.
# After rounds 1-3, 137 distinct queries hold driver rows (132 green,
# 5 rows-only-by-design, 0 failures) and 62 have never been checked.
# The round-4 window therefore holds (per the round-3 verdict, item 1):
#   - two anchors (the reference flagship + exact dedup) that stay
#     continuously verified,
#   - 48 never-driver-checked queries, whole families front-loaded so
#     components flip to done: the training-pipeline 13 + the composed
#     prepare_training_data, graph (textrank/triangle) +
#     dedup_components_lss (now the documented scale default for
#     dup-cluster resolution), the modern-SQL five, the Python
#     DataSource trio, the streaming four, the late-r3 scale operators
#     (entity_resolution, bpe_train_merges, bpe_encode, count_min_freq,
#     dedup_semantic + knn_graph — both re-keyed this round onto the
#     two-level sqrt(N) cell quantizer), and 13 more standalone
#     operators (dedup_spans, pq_adc_topk, boilerplate_dedup,
#     multimodal_gif_pipeline, sorted_neighborhood_pairs,
#     interval_overlap_join, doc_chunking, tokenize_to_ids,
#     winsorize_values, window_analytics, distinct_linear_counting,
#     topic_tfidf, bigram_lm_score).
# The remaining never-driver-checked queries are queued for round 5:
# gap_fill_hourly / interpolate_hourly / udtf_table_polymorphic /
# arrow_map_stats / bpe_pair_counts / higher_order_funcs /
# set_intersect_all / set_except_all / bitwise_agg / listagg_funcs /
# agg_bitmap_distinct / embedding_quantize / window_analytics (yielded
# its r4 slot to the re-keyed dedup_embedding_cosine), the round-4
# additions dsir_weights / contamination_minhash /
# select_pretraining_data (composed pipeline #2) /
# weighted_reservoir_sample / the re-oracled
# multimodal_features (all locally hash-verified under the identical
# DuckDB check), plus the two rows-only sketch estimators
# agg_hll_sketch_union / agg_theta_sketch_setops (accuracy-bounded in
# tests/test_sketches.py; a driver row adds only a rows-only check, so
# they yield their slots to oracled entries).
# Everything else holds a green row from r1-r3 and follows in
# registration order.
_PRIORITY: tuple[str, ...] = (
    # anchors
    "mr_pipeline",
    "dedup_exact",
    # training pipeline (pipeline_ops.py) — the biggest unchecked block
    "split_train_val_test",
    "stratified_sample",
    "mix_temperature",
    "pii_scrub",
    "text_normalize",
    "skew_agg_twophase",
    "zorder_layout",
    "dq_checks",
    "weighted_sample",
    "quality_classifier",
    "corpus_shuffle",
    "domain_cap",
    "snapshot_diff",
    # the composed end-to-end engine certification
    "prepare_training_data",
    # graph + the scale default for dup-cluster resolution
    "textrank_keywords",
    "triangle_count",
    "dedup_components_lss",
    # modern SQL five
    "variant_funcs",
    "lateral_topn",
    "sql_udf_funcs",
    "sql_pipe_syntax",
    "sql_parameterized",
    # Spark-4 Python DataSource trio (batch scan, stream, staged write)
    "python_datasource_scan",
    "python_datasource_stream",
    "python_datasource_write",
    # streaming remainder
    "streaming_dedup_watermark",
    "streaming_stateful_counts",
    "streaming_static_join",
    "streaming_stream_join",
    # late-r3 scale operators
    "entity_resolution",
    "bpe_train_merges",
    "bpe_encode",
    "count_min_freq",
    "dedup_semantic",
    "knn_graph",
    # standalone never-checked operators
    "dedup_spans",
    "pq_adc_topk",
    "boilerplate_dedup",
    "multimodal_gif_pipeline",
    "sorted_neighborhood_pairs",
    "interval_overlap_join",
    "doc_chunking",
    "tokenize_to_ids",
    "winsorize_values",
    # re-keyed from label blocking onto the two-level quantizer in r4
    # (the 10x sweep measured the label block quadratic): output
    # changed, so it re-enters the window; window_analytics yields its
    # slot to the r5 queue (the window_* family already holds 7 green
    # rows).
    "dedup_embedding_cosine",
    "distinct_linear_counting",
    "topic_tfidf",
    "bigram_lm_score",
)


def _load() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, Query]:
    _load()
    prioritized = {n: _REGISTRY[n] for n in _PRIORITY if n in _REGISTRY}
    rest = {n: q for n, q in _REGISTRY.items() if n not in prioritized}
    return {**prioritized, **rest}


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
