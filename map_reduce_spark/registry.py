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
# The round-8 window:
#   - two anchors (the reference flagship + exact dedup), continuously
#     verified;
#   - the queries with NO driver row yet (r8 additions avro_scan,
#     ann_maintenance_decision, the delta family — scan / time travel /
#     merge / OPTIMIZE / ZORDER / change feed / streaming sink / the
#     composed ingest-dedup loop — sqlite_scan, and the iceberg pair);
#     these eleven push
#     the window's former tail (scd2_merge, session_window,
#     window_sliding/tumbling, unpivot_stack, asof_join) past rank 50 —
#     all hold green r2-era rows on files unchanged since, the right
#     trade against never-verified queries;
#   - every r8 behaviorally-changed surface under the file-granularity
#     staleness rule: the health family (monitoring.py: psic-from-feats
#     + feats localCheckpoint), the dedup compaction family (dedup.py:
#     batch-state cache hook, broadcast hints dropped in the verify;
#     streaming/jobs.py: append-leg consolidation + vacuum), the
#     recall family (similarity.py: _recall_parts refactor), and the
#     watermark family (jobs.py: tumbling_render extraction);
#   - the r7-verdict-named rotation targets: the composed pipelines
#     (prepare_training_data r6, select_pretraining_data r5 — member
#     CTEs changed under them in r5-r7) and the heavy stage_cache
#     users outside the r7 window (contamination_minhash r5,
#     bpe_train_merges/bpe_encode r6), plus the r4-era heavy pairwise
#     generators (entity_resolution, sorted_neighborhood_pairs);
#   - ALL eight remaining r1-era rows (set ops, string_funcs,
#     sql_api_q6, window_lag_lead/cumulative, union_by_name);
#   - the rest of the budget on the oldest (r2-era) oracled rows,
#     LLM/corpus family first per NOTES rule 14.
# Everything else holds a green r3-r7 row on an unchanged-or-
# comment-only file and follows in registration order; the builder's
# full-catalog 10x parity sweep (SCALE_r08) covers the whole registry.
# The round-7 window comment (for the r7 rationale) is in git history.
_PRIORITY: tuple[str, ...] = (
    # anchors
    "mr_pipeline",
    "dedup_exact",
    # round-8 additions (no driver row yet): avro + table-format +
    # DB-source families
    "avro_scan",
    "ann_maintenance_decision",
    "delta_scan",
    "delta_time_travel",
    "delta_merge_upsert",
    "delta_optimize_compact",
    "streaming_delta_sink",
    "delta_changes_scan",
    "delta_ingest_dedup",
    "delta_optimize_zorder",
    "iceberg_scan",
    "iceberg_snapshot_travel",
    "iceberg_changes_scan",
    "sqlite_scan",
    # r8-changed: health family (monitoring.py)
    "health_report_fold",
    "streaming_health_report",
    "corpus_health_report",
    "drift_psi",
    "streaming_drift_psi",
    # r8-changed: dedup compaction family (dedup.py + streaming/jobs.py)
    "dedup_index_compact",
    "streaming_dedup_incremental",
    "dedup_incremental",
    "dedup_minhash_lsh_portable",
    # r8-changed: recall family (similarity.py)
    "ann_recall_eval",
    "streaming_ann_upsert",
    # r8-changed: watermark family (jobs.py tumbling_render)
    "streaming_tumbling_watermark",
    "streaming_session_window",
    "streaming_dedup_watermark",
    # r7-verdict rotation targets: composed pipelines + heavy cache users
    "prepare_training_data",
    "select_pretraining_data",
    "contamination_minhash",
    "bpe_train_merges",
    "bpe_encode",
    "entity_resolution",
    "sorted_neighborhood_pairs",
    # r1-era rows (the oldest in the catalog)
    "set_intersect",
    "set_except",
    "set_union",
    "union_by_name",
    "string_funcs",
    "sql_api_q6",
    "window_lag_lead",
    "window_cumulative",
    # r2-era rows, LLM/corpus family first
    "lang_id",
    "text_quality",
    "token_count",
    "doc_fingerprint",
    "bpe_token_count",
    "pack_sequences",
    "text_stats_by_source",
    "map_funcs",
    "percentiles_exact",
    "pivot_event_counts",
    "scalar_subquery",
    "scd2_merge",
    "session_window",
    "window_sliding",
    "window_tumbling",
    "unpivot_stack",
    "asof_join",
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
