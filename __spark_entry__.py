"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``map_reduce_spark.registry`` — every operator registers
its Spark callable and DuckDB oracle there; this module just re-exports
the catalog in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from map_reduce_spark import registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's composed word-count pipeline
    (SURVEY.md §2.1 #11) over documents at sf0.001."""
    from map_reduce_spark.operators.wordcount import mr_pipeline

    return mr_pipeline(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return registry.oracle_sql()
