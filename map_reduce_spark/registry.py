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
    "map_reduce_spark.operators.monitoring",
    "map_reduce_spark.operators.modern_sql",
    "map_reduce_spark.operators.python_source",
    "map_reduce_spark.sources.avro_py",
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
# The round-7 window applies the file-granularity staleness rule (a
# query is stale when its implementing file changed after its latest
# driver row) to everything the r6/r7 commits touched:
#   - two anchors (the reference flagship + exact dedup) that stay
#     continuously verified,
#   - the four round-7 additions (ann_index_compact completing the
#     incremental ANN story, health_report_fold completing the
#     incremental monitoring story, streaming_health_report and
#     streaming_ann_upsert running both folds on the ingest stream),
#   - the whole similarity.py surface (r7: upsert drift-overflow
#     guard + PQ_M-derived code columns + the compaction landed
#     there) and the whole monitoring.py surface (r7: gram-stream /
#     perm-hash refactor shared with the health fold),
#   - the oracled dedup.py surface (r6: dedup_incremental library-form
#     refactor postdates most of the file's rows, five r2-era),
#   - the whole streaming/jobs.py family including streaming_drift_psi
#     (the file changed again in r7 — the health-fold foreachBatch
#     runner landed there — so its green r6 row is stale by the same
#     rule as everything else),
#   - fillers re-certifying the two r6-verdict-named r1-era holdouts
#     (window_moving_sum, window_row_number_topk).
# Deliberately NOT in the window: ann_lsh_topk / dedup_minhash_lsh /
# dedup_simhash (rows-only by design; their fully-oracled portable
# twins ARE in the window), and set_intersect / set_except /
# union_by_name / string_funcs / set_union / sql_api_q6 /
# window_lag_lead / window_cumulative / contamination_minhash (r1-r3
# rows, unchanged files, 10x-parity-covered — the lowest-risk rows in
# the catalog; the last three ceded their slots to the three late-r7
# additions dedup_index_compact / streaming_dedup_incremental /
# ann_recall_eval, which have no driver row at all; the session.py
# cache-tracker inheritance contamination_minhash was covering is
# already exercised in-window by dedup_minhash_lsh_portable and
# dedup_simhash_portable, the other two heaviest stage_cache users).
# Everything else holds a green row from r2-r6 and follows in
# registration order.
_PRIORITY: tuple[str, ...] = (
    # anchors
    "mr_pipeline",
    "dedup_exact",
    # round-7 additions
    "ann_index_compact",
    "health_report_fold",
    "streaming_health_report",
    "streaming_ann_upsert",
    "dedup_index_compact",
    "streaming_dedup_incremental",
    "ann_recall_eval",
    # similarity.py surface (file changed r7)
    "ann_index_upsert",
    "centroid_retrain",
    "dedup_semantic",
    "knn_graph",
    "dedup_embedding_cosine",
    "embedding_topk",
    "ann_lsh_topk_portable",
    "ivf_assign",
    "embedding_centroids",
    "ivf_topk",
    "pq_encode",
    "pq_adc_topk",
    "kmeans_lloyd",
    "hard_negatives",
    # monitoring.py surface (file changed r7)
    "drift_psi",
    "source_overlap",
    "source_overlap_minhash",
    "curation_funnel",
    "k_anonymity",
    "corpus_health_report",
    # oracled dedup.py surface (file changed r6; rows r2-r5)
    "dedup_exact_survivors",
    "ngram_jaccard_dupes",
    "dedup_components",
    "dedup_components_lss",
    "dedup_minhash_lsh_portable",
    "dedup_incremental",
    "dedup_simhash_portable",
    "dedup_spans",
    # streaming/jobs.py family (file changed r6 and again r7)
    "streaming_drift_psi",
    "streaming_word_count",
    "streaming_tumbling_watermark",
    "streaming_session_window",
    "streaming_sliding_window",
    "streaming_dedup_exact",
    "streaming_static_join",
    "streaming_stream_join",
    "streaming_stateful_counts",
    "streaming_dedup_watermark",
    "streaming_foreach_batch",
    # fillers: the two r6-verdict-named r1-era holdouts
    "window_moving_sum",
    "window_row_number_topk",
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
