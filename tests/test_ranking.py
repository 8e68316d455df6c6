"""Edge-case tests for the scale-safe global ordering primitives
(map_reduce_spark.ranking): equivalence with the single-partition
Window forms they replace, on shapes that stress boundary placement."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from map_reduce_spark.ranking import global_ntile, global_row_number


def _check_row_number(spark, rows, n_parts):
    df = spark.createDataFrame(rows, schema="k long, tie long")
    got = {
        (r.k, r.tie): r.pos
        for r in global_row_number(
            df, [F.col("k"), F.col("tie")], num_partitions=n_parts
        ).collect()
    }
    want = {
        (r.k, r.tie): r.pos
        for r in df.withColumn(
            "pos", F.row_number().over(Window.orderBy("k", "tie"))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_parts", [1, 3, 8, 64])
def test_global_row_number_matches_window(spark, n_parts):
    rows = [(i % 7, i) for i in range(100)]
    _check_row_number(spark, rows, n_parts)


def test_global_row_number_more_partitions_than_rows(spark):
    _check_row_number(spark, [(5, 1), (3, 2), (3, 3)], 32)


def test_global_row_number_empty(spark):
    df = spark.createDataFrame([], schema="k long")
    assert global_row_number(df, [F.col("k")]).count() == 0


@pytest.mark.parametrize("n,k", [(10, 4), (3, 4), (4, 4), (100, 7), (1, 2)])
def test_global_ntile_matches_builtin(spark, n, k):
    df = spark.createDataFrame([(i * 13 % n, i) for i in range(n)], "v long, id long")
    got = {
        r.id: r.bucket
        for r in global_ntile(
            df, [F.col("v"), F.col("id")], k=k, out="bucket"
        ).collect()
    }
    want = {
        r.id: r.bucket
        for r in df.withColumn(
            "bucket", F.ntile(k).over(Window.orderBy("v", "id"))
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_parts", [1, 3, 8, 64])
def test_global_prefix_sum_matches_window(spark, n_parts):
    from map_reduce_spark.ranking import global_prefix_sum

    rows = [(i % 7, i, (i * 13) % 5 + 1) for i in range(100)]
    df = spark.createDataFrame(rows, schema="k long, tie long, v long")
    got = {
        (r.k, r.tie): (r.cum, r.rank)
        for r in global_prefix_sum(
            df, [F.col("k"), F.col("tie")], "v",
            rank_out="rank", num_partitions=n_parts,
        ).collect()
    }
    w = Window.orderBy("k", "tie").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        (r.k, r.tie): (r.cum, r.rank)
        for r in df.withColumn("cum", F.sum("v").over(w))
        .withColumn("rank", F.row_number().over(Window.orderBy("k", "tie")))
        .collect()
    }
    assert got == want


def test_global_prefix_sum_no_single_partition_exchange(spark):
    from map_reduce_spark.ranking import global_prefix_sum

    df = spark.range(1000).selectExpr("id AS k", "id % 9 AS v")
    plan = global_prefix_sum(
        df, [F.col("k")], "v", rank_out="rank"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
