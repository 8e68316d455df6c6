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
# The catalog closed in round 5 (every registered query holds at least
# one driver row; 48/50 of the r5 window fully green, the 2 non-green
# being the by-design rows-only sketch estimators). The round-6 window
# (per the round-5 verdict, item 2) rotates onto STALENESS: every query
# whose implementing file changed after its latest driver row gets a
# fresh row this round.
#   - two anchors (the reference flagship + exact dedup) that stay
#     continuously verified,
#   - the round-6 addition ann_index_upsert (verdict item 4),
#   - every r5-verdict-named query whose r5 code change postdates its
#     row: the similarity salting family, triangle_count, the BPE pair,
#     the multimodal codecs, the Python DataSource trio, the composed
#     training pipeline, corpus_shuffle, recursive_cte,
#   - the whole multimodal.py surface (decode_jpeg's bit-reader pad
#     was widened in r6) and the whole similarity.py surface
#     (ann_index_upsert landed there in r6) — file-granularity
#     staleness, so no registered query's latest row predates its
#     file's last change,
#   - the tpch.py hint-removal inheritors q3/q10/q18 (q3 also the only
#     r2-era TPC-H row),
#   - fillers re-certifying the oldest remaining rows: 17 of the 19
#     r1-era queries (window_moving_sum and window_row_number_topk
#     keep their r1 rows this round — both are 10x-parity-covered and
#     the latter is bench-headline).
# Deliberately NOT in the window: ann_lsh_topk (rows-only by design;
# its fully-oracled portable twin IS in the window). Everything else
# holds a green row from r2-r5 and follows in registration order.
_PRIORITY: tuple[str, ...] = (
    # anchors
    "mr_pipeline",
    "dedup_exact",
    # round-6 additions: incremental ANN index maintenance + the
    # selective retrain downstream of its flags (centroid_retrain takes
    # the window_lag_lead filler slot; that query keeps its r1 green
    # row and is 10x-parity-covered)
    "ann_index_upsert",
    "centroid_retrain",
    # r5-changed code whose rows predate the change (r5 verdict item 2)
    "dedup_semantic",
    "knn_graph",
    "dedup_embedding_cosine",
    "triangle_count",
    "bpe_train_merges",
    "bpe_encode",
    "prepare_training_data",
    "corpus_shuffle",
    "recursive_cte",
    "python_datasource_scan",
    "python_datasource_stream",
    "python_datasource_write",
    # multimodal.py surface (r5 JPEG codec + r6 bit-reader pad widening)
    "multimodal_pipeline",
    "multimodal_gif_pipeline",
    "multimodal_features",
    "multimodal_parse",
    "audio_metadata",
    "binary_metadata",
    # tpch.py hint-removal inheritors (q3 is also the oldest TPC-H row)
    "q3_top_revenue_orders",
    "q10_returned_items",
    "q18_large_orders",
    # rest of the similarity.py surface (file changed in r6)
    "embedding_topk",
    "ann_lsh_topk_portable",
    "ivf_assign",
    "embedding_centroids",
    "ivf_topk",
    "pq_encode",
    "pq_adc_topk",
    "kmeans_lloyd",
    "hard_negatives",
    # fillers: oldest (r1-era) rows
    "agg_basic",
    "agg_filtered",
    "array_funcs",
    "conditional_funcs",
    "date_funcs",
    "distinct_op",
    "json_funcs",
    "math_funcs",
    "monthly_revenue",
    # round-6 additions: the corpus-monitoring family (monitoring.py +
    # its streaming twin + the composed per-drop report) needs FIRST
    # rows, so it takes the last seven filler slots (set_except /
    # set_intersect / set_union / sql_api_q6 / string_funcs /
    # union_by_name / window_cumulative keep their r1 green rows — all
    # seven are 10x-parity-covered).
    "drift_psi",
    "source_overlap",
    "source_overlap_minhash",
    "curation_funnel",
    "streaming_drift_psi",
    "k_anonymity",
    "corpus_health_report",
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
