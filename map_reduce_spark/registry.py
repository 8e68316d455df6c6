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
    "map_reduce_spark.sources.plain_formats",
    "map_reduce_spark.sources.delta_py",
    "map_reduce_spark.sources.sqlite_py",
    "map_reduce_spark.sources.iceberg_py",
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
# The round-9 window (final, after the second build wave):
#   - two anchors (the reference flagship + exact dedup), continuously
#     verified;
#   - the 28 r9 additions with NO driver row yet: the merge-on-read
#     trio + expire + DV/column-mapping scans + the two
#     schema-evolution-travel queries (first wave), then the
#     partitioned-Iceberg pruning pair, COW merge/update/delete +
#     rollback, MOR compaction, sorted rewrite, partition-spec
#     evolution, both zero-copy migrations, the composed production
#     loop, the Delta partition-prune/update/restore trio, the
#     exactly-once Iceberg stream sink + snapshot-offset stream
#     source, and the three plain-format scans (second wave);
#   - every query on an r9-changed file: the delta_py family, the
#     iceberg_py trio, and sqlite_scan;
#   - the r8-verdict-named displaced six (scd2_merge, session_window,
#     window_sliding/tumbling, unpivot_stack, asof_join) and as many
#     r2-era rows as the remaining budget holds.
# Displaced past rank 50 by the second wave (never-driven beats
# stale-row refresh): join_full_outer, the pandas-UDF trio,
# python_udtf, and the r3-era LLM/TPC-H tail — all keep green r2/r3
# rows on unchanged files, and the builder's full-catalog sf0.01
# drive re-covers the whole registry on the final tree each round.
# Prior windows' rationales are in git history.
_PRIORITY: tuple[str, ...] = (
    # anchors
    "mr_pipeline",
    "dedup_exact",
    # round-9 additions (no driver row yet): merge-on-read + DV +
    # schema evolution + snapshot expiry
    "iceberg_mor_scan",
    "iceberg_mor_changes",
    "iceberg_eq_delete_scan",
    "iceberg_expire_snapshots",
    "delta_dv_scan",
    "delta_column_mapping_scan",
    "delta_schema_evolution_travel",
    "iceberg_schema_evolution_travel",
    # later-r9 additions (no driver row yet): partitioned-Iceberg
    # pruning pair, the COW merge, and the plain-format scans
    "iceberg_partition_prune",
    "iceberg_minmax_prune",
    "iceberg_merge_upsert",
    "iceberg_delete_where",
    "iceberg_compact_mor",
    "iceberg_partition_evolution",
    "migrate_delta_to_iceberg",
    "migrate_iceberg_to_delta",
    "iceberg_production_loop",
    "iceberg_rewrite_sorted",
    "iceberg_update_where",
    "iceberg_rollback",
    "delta_partition_prune",
    "delta_update_where",
    "delta_restore",
    "streaming_iceberg_sink",
    "streaming_iceberg_source",
    "orc_scan",
    "csv_scan",
    "json_scan",
    # r9-changed: delta_py family (DV gate/checkpoint/read path)
    "delta_scan",
    "delta_time_travel",
    "delta_merge_upsert",
    "delta_optimize_compact",
    "streaming_delta_sink",
    "delta_changes_scan",
    "delta_ingest_dedup",
    "delta_optimize_zorder",
    # r9-changed: iceberg_py trio (scan plan + writer rewrite)
    "iceberg_scan",
    "iceberg_snapshot_travel",
    "iceberg_changes_scan",
    # r9-changed: sqlite_py (partition affinity gate)
    "sqlite_scan",
    # the r8-displaced six (verdict ask) + ALL remaining r2-era rows
    "scd2_merge",
    "session_window",
    "window_sliding",
    "window_tumbling",
    "unpivot_stack",
    "asof_join",
    "pack_sequences",
    "text_stats_by_source",
    "map_funcs",
    "percentiles_exact",
    "pivot_event_counts",
    "scalar_subquery",
    "asof_join_cogroup",
    "join_right",
    "join_full_outer",
    "python_udtf",
    "pandas_scalar_norm",
    "pandas_zscore_by_label",
    "pandas_grouped_agg",
    # r3-era rows: LLM/corpus family first (NOTES rule 14). The later
    # six r9 additions above displaced heavy_hitters, unigram_logprob,
    # bm25_rank, vocab_coverage, q4_order_priority and
    # q13_customer_distribution past rank 50 (never-driven beats
    # stale-row refresh); they keep their green r3 rows and the
    # builder's full-catalog sf0.01 drive re-covers them this round.
    "contamination_check",
    "repetition_stats",
    "inverted_index",
    "heavy_hitters",
    "unigram_logprob",
    "bm25_rank",
    "vocab_coverage",
    "q4_order_priority",
    "q13_customer_distribution",
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
