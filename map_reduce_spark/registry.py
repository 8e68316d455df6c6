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
# The round-10 window:
#   - two anchors (the reference flagship + exact dedup), continuously
#     verified;
#   - the two r10 additions with NO driver row yet
#     (delta_v2_checkpoint_scan, iceberg_name_mapping_scan);
#   - one representative per r10-CHANGED code path, chosen so every
#     edit gets a driver row: the delta log/checkpoint core
#     (delta_scan classic-checkpoint fixture, delta_time_travel
#     pre-checkpoint replay, delta_restore), the partitioned-Iceberg
#     writer fixes (bucket-over-temporal hashing, 'v'-prefixed string
#     partition staging, rewrite spec-id — partition_prune,
#     minmax_prune, partition_evolution, production_loop,
#     merge_upsert, update_where, delete_where, rewrite_sorted,
#     compact_mor), the rollback guard + snapshot-log/properties carry
#     (iceberg_rollback, streaming_iceberg_source/sink), the
#     current-vs-pinned schema selection + name-mapping read path
#     (iceberg_scan, snapshot_travel, schema_evolution_travel,
#     mor_scan), migrate_delta_to_iceberg (touches both formats'
#     cores), and vocab_coverage (ranking.global_prefix_sum rewrite);
#   - the other r10 additions (delta_cdf_scan, iceberg_changelog_scan,
#     iceberg_orphan_sweep, streaming_delta_cdf — all never driven)
#     displaced text_normalize, skew_agg_twophase, dq_checks (green r4
#     rows, unchanged files) and streaming_iceberg_sink (green r9 row;
#     its append-commit machinery is driven by every partitioned
#     append in this window) — never-driven beats stale-row refresh;
#     delta_history_metadata displaced iceberg_rewrite_sorted (green
#     r9 row; compact_mor in this window drives the same rewrite-commit
#     machinery — sorted layout is its order_by variant) and
#     iceberg_files_metadata likewise displaced iceberg_mor_scan
#     (green r9 row; the MOR anti-join is unchanged this round and the
#     r10 read-path edits are driven via iceberg_scan and the
#     schema-evolution travel row);
#   - the r9-verdict-named stalest rows, in its order: the multimodal
#     six (r6 rows on a file last edited r8), the r4-era
#     pipeline_ops/text tail, and the SURVEY §2.1 ten (r5 rows;
#     mr_pipeline is the 11th and anchors the window).
# Displaced (all keep green r7-r9 rows on files unchanged since):
# migrate_iceberg_to_delta (its shared machinery is driven via the
# delta->iceberg leg), the remaining delta/iceberg r9 rows, and the
# r2/r3-era tail — the builder's full-catalog sf0.01 drive re-covers
# the whole registry on the final tree each round.
# The round-9 window rationale is in git history (as are all prior
# windows').
_PRIORITY: tuple[str, ...] = (
    # anchors
    "mr_pipeline",
    "dedup_exact",
    # r10 additions (no driver row yet)
    "delta_v2_checkpoint_scan",
    "iceberg_name_mapping_scan",
    "delta_cdf_scan",
    "iceberg_changelog_scan",
    "iceberg_orphan_sweep",
    "streaming_delta_cdf",
    "iceberg_files_metadata",
    "delta_history_metadata",
    # r10-changed: delta log/checkpoint core + restore
    "delta_scan",
    "delta_time_travel",
    "delta_restore",
    # r10-changed: partitioned-Iceberg writer fixes
    "iceberg_partition_prune",
    "iceberg_minmax_prune",
    "iceberg_partition_evolution",
    "iceberg_production_loop",
    "iceberg_merge_upsert",
    "iceberg_update_where",
    "iceberg_delete_where",
    "iceberg_compact_mor",
    # r10-changed: rollback guard + snapshot-log/properties carry
    "iceberg_rollback",
    "streaming_iceberg_source",
    # r10 addition: the bucket-over-temporal regression sentinel
    "iceberg_bucket_time_prune",
    # r10-changed: schema selection + name-mapping read path
    # (schema_evolution_travel covers the pinned-snapshot path that
    # snapshot_travel would, freeing its slot for the sentinel above)
    "iceberg_scan",
    "iceberg_schema_evolution_travel",
    "migrate_delta_to_iceberg",
    # r10-changed: ranking.global_prefix_sum consumer
    "vocab_coverage",
    # SURVEY 2.1 ten (stalest driver rows: r5)
    "scan_dir",
    "scan_file",
    "tokenize",
    "filter_empty",
    "upper_map",
    "sort_by_key",
    "hash_partition",
    "group_by_key",
    "count_reduce",
    "sink_text",
    # multimodal six (r6 rows; file last edited r8)
    "binary_metadata",
    "multimodal_features",
    "multimodal_parse",
    "multimodal_pipeline",
    "multimodal_gif_pipeline",
    "audio_metadata",
    # r4-era pipeline_ops/text tail
    "split_train_val_test",
    "stratified_sample",
    "pii_scrub",
    "tokenize_to_ids",
    "doc_chunking",
    "boilerplate_dedup",
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
