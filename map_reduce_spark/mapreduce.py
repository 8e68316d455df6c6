"""The generic MapReduce API — the reference's UDF contract on Spark.

The reference's extension surface is a module with two callbacks
(/root/reference/lib/mr_sequential.ex:10,25):

    mapper(filename, content) -> [(key, value)]
    reducer(key, values)      -> value

This module preserves that exact contract on top of Spark primitives:
``wholeTextFiles`` (one element per input file = one map split, the
analog of master.ex:112-120's file-per-task) → ``flatMap(mapper)`` →
``groupByKey`` (Spark's shuffle replaces the reference's
phash2-mod-R intermediate files, worker.ex:142-150) → ``mapValues(reducer)``.

Unlike the reference's distributed path — which hardcodes the WordCount
app (worker.ex:111,135) and aggregates per (input file, hash partition) —
``run_job`` is generic over the app and aggregates globally, matching the
sequential oracle (mr_sequential.ex:3-28), whose output ``mr-out-0`` is
the reference's de-facto golden result.

For anything beyond this compatibility surface, use the DataFrame
operators in ``map_reduce_spark.operators`` — Catalyst-optimized and
~10-100x faster than the Python-lambda path here.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

Mapper = Callable[[str, str], Iterable[tuple]]
Reducer = Callable[[str, list], object]


def run_job(
    spark: SparkSession,
    mapper: Mapper,
    reducer: Reducer,
    input_dir: str,
    num_partitions: int | None = None,
):
    """Run a MapReduce job; returns an RDD of (key, reduced_value).

    ``num_partitions`` plays the role of the reference's R
    (n_workers: 8, config/config.exs:10); defaults to Spark's
    parallelism. Keys are hash-partitioned exactly as the reference's
    ``rem(phash2(key), R)`` (worker.ex:144) — same semantics, Spark's
    shuffle machinery.
    """
    files = spark.sparkContext.wholeTextFiles(input_dir)
    pairs = files.flatMap(lambda fc: mapper(fc[0], fc[1]))
    grouped = pairs.groupByKey(numPartitions=num_partitions)
    return grouped.map(lambda kv: (kv[0], reducer(kv[0], list(kv[1]))))


def run_job_df(
    spark: SparkSession,
    mapper: Mapper,
    reducer: Reducer,
    input_dir: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """``run_job`` with a DataFrame result (key string, value string)."""
    rdd = run_job(spark, mapper, reducer, input_dir, num_partitions)
    return spark.createDataFrame(
        rdd.map(lambda kv: (str(kv[0]), str(kv[1]))), schema="key string, value string"
    )


# --- The reference's one application: word count -------------------------
# Tokenize on [^a-zA-Z] (digits/punct/apostrophes are separators), drop
# empty tokens, uppercase, count occurrences per word.
# (/root/reference/lib/mr_apps/word_count.ex:3-13.)

_TOKEN_SEP = re.compile(r"[^a-zA-Z]")


def word_count_mapper(filename: str, content: str) -> list[tuple[str, int]]:
    return [(w.upper(), 1) for w in _TOKEN_SEP.split(content) if w != ""]


def word_count_reducer(key: str, values: list) -> int:
    # The reference's reducer COUNTS the group, it does not sum values
    # (word_count.ex:10-13) — preserved verbatim.
    return len(values)


def word_count(spark: SparkSession, input_dir: str, num_partitions: int | None = None):
    """The reference's flagship job via the generic API."""
    return run_job(spark, word_count_mapper, word_count_reducer, input_dir, num_partitions)
