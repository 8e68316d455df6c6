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
    "map_reduce_spark.streaming.jobs",
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


def _load() -> None:
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)


def all_queries() -> dict[str, Query]:
    _load()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
