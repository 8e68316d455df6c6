"""map_reduce_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference MapReduce engine (ghostdsb/map_reduce), plus
the relational / LLM-data-pipeline / streaming operator families a
large-scale (100 TB design point) training-data pipeline needs.

Architecture (idiomatic Spark, NOT a port of the reference's Elixir runtime):

- ``session``     — SparkSession factory (AQE, UTC, Arrow, tuned shuffle).
- ``io``          — sources/sinks: parquet/csv/json/text + whole-file reads.
- ``mapreduce``   — the generic ``run_job(mapper, reducer)`` API preserving
                    the reference's UDF contract (mapper(filename, content)
                    -> [(k, v)]; reducer(key, values) -> value), built on
                    wholeTextFiles → flatMap → groupByKey.
- ``registry``    — the query registry: every operator registers a Spark
                    callable and (when SQL-expressible) a DuckDB oracle SQL
                    string; ``__spark_entry__.py`` is a thin shim over it.
- ``operators``   — the operator inventory (word-count family, relational,
                    dedup, similarity, text analysis, event windows).
- ``streaming``   — Structured Streaming jobs (watermarks, windowed aggs,
                    sessionization) mirroring the batch semantics.
"""

from map_reduce_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
