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
# After rounds 1-4, 184 of 203 registered queries hold driver rows and
# 184/184 pass their latest check; 19 have never been checked.
# The round-5 window (per the round-4 verdict, item 1) closes the
# catalog — after this round every registered query holds at least one
# driver row:
#   - two anchors (the reference flagship + exact dedup) that stay
#     continuously verified,
#   - all 19 never-driver-checked queries (17 oracled + the 2
#     rows-only sketch estimators, accuracy-bounded in
#     tests/test_sketches.py), led by interpolate_hourly /
#     gap_fill_hourly (interpolate was rewritten in r4, so its row is
#     the most urgent) and the r4 corpus-curation family,
#   - 4 stale-row re-entries whose code or oracle changed after their
#     last driver row: multimodal_features (oracle re-derived in r4;
#     last row is r2 rows-only) and the r4 persist-barrier inheritors
#     sort_by_key / sort_multi_col / window_ntile,
#   - 25 fillers re-certifying the OLDEST green rows (all r1-era):
#     the reference's own §2.1 surface (scan_dir .. sink_text) plus
#     the heaviest r1 relational/window queries (TPC-H Q1/Q5, rollup/
#     cube/grouping-sets, the join family, rank/range-frame windows).
#     (The r4 verdict dated tpch Q2/Q7-Q22 as r2-era; CORRECTNESS_r03
#     shows they are r3-era, so the r1 block is the oldest and goes
#     first.)
# Everything else holds a green row from r2-r4 and follows in
# registration order.
_PRIORITY: tuple[str, ...] = (
    # anchors
    "mr_pipeline",
    "dedup_exact",
    # never-checked: batch resampling (interpolate rewritten in r4)
    "interpolate_hourly",
    "gap_fill_hourly",
    # never-checked: r4 corpus-curation family
    "dsir_weights",
    "contamination_minhash",
    "select_pretraining_data",
    "weighted_reservoir_sample",
    "embedding_quantize",
    # never-checked: UDF/arrow surface
    "udtf_table_polymorphic",
    "arrow_map_stats",
    # never-checked: corpus/functions extras
    "bpe_pair_counts",
    "higher_order_funcs",
    "set_intersect_all",
    "set_except_all",
    "bitwise_agg",
    "listagg_funcs",
    "agg_bitmap_distinct",
    "window_analytics",
    # never-checked: rows-only sketch estimators (no SQL-expressible
    # oracle; accuracy bounds live in tests/test_sketches.py)
    "agg_hll_sketch_union",
    "agg_theta_sketch_setops",
    # stale-row re-entries (code/oracle changed after last driver row)
    "multimodal_features",
    "sort_by_key",
    "sort_multi_col",
    "window_ntile",
    # fillers: re-certify the oldest (r1-era) rows — §2.1 first
    "scan_dir",
    "scan_file",
    "tokenize",
    "filter_empty",
    "upper_map",
    "hash_partition",
    "group_by_key",
    "count_reduce",
    "sink_text",
    # fillers: heaviest r1-era relational/window queries
    "q1_pricing_summary",
    "q5_region_revenue",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_corr",
    "join_broadcast_star",
    "join_fact_fact",
    "join_left",
    "join_semi",
    "join_anti",
    "join_range",
    "window_rank",
    "window_range_frame",
    # registered in r5 (incremental batch-vs-index dedup): takes the
    # monthly_revenue filler slot so the catalog closes INCLUDING the
    # round's own addition (monthly_revenue keeps its r1 green row)
    "dedup_incremental",
    "topk_orders",
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
