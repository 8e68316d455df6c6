"""Scale-safe global ordering primitives.

``Window.orderBy(...)`` with no ``partitionBy`` plans an ``Exchange
SinglePartition``: one task materializes the whole table — fine at
sf0.1, fatal at 100 TB. These helpers produce the identical total-order
rank with a scalable shape:

1. ``repartitionByRange`` on the sort key (sampled boundaries — the same
   mechanism Spark's own global ``orderBy`` uses), so partition *p*
   holds a contiguous key range and all earlier ranges live in
   partitions ``< p``;
2. per-partition ``row_number`` (Window partitioned by
   ``spark_partition_id()`` — a parallel hash exchange, never a single
   partition);
3. cumulative partition-size offsets via a broadcast triangular join
   over the tiny (one row per partition) count table — deliberately NOT
   a global window, so no ``Exchange SinglePartition`` appears anywhere
   in the plan (locked by tests/test_plans.py).

Global position = offset(partition) + local row_number. Exact for any
boundary placement, at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from map_reduce_spark.session import stage_cache


def global_row_number(
    df: DataFrame,
    sort_cols: list[Column],
    out: str = "pos",
    num_partitions: int | None = None,
    keep_total: bool = False,
) -> DataFrame:
    """Append a 1-based dense global position ``out`` following the
    total order of ``sort_cols`` (include a unique tiebreaker for a
    deterministic order).

    With ``keep_total=True`` the helper also keeps ``_n`` (the global
    row count, same on every row) for rank-derived statistics such as
    ntile — computed from the same per-partition counts, so no extra
    pass over the data.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # PERSIST the range-partitioned frame before fanning out: range
    # boundaries come from runtime SAMPLING, and the two consumers
    # below (local row_number, per-partition counts) would otherwise
    # each re-execute the exchange with independently-sampled
    # boundaries — offsets from one partitioning applied to row
    # numbers from another (duplicated/shifted global positions).
    # Invisible at tiny SF (the boundary sample covers the whole
    # input, so re-samples agree); caught by the round-4 10x PARITY
    # pass on corpus_shuffle. NOTES rule 11 stage barrier.
    part = stage_cache(
        df.repartitionByRange(n, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = Window.partitionBy("_pid").orderBy(*sort_cols)
    local = part.withColumn("_rn", F.row_number().over(w_local))

    # one row per partition: metadata-sized however big df is
    counts = part.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    x, y = counts.alias("x"), counts.alias("y")
    offs = (
        x.crossJoin(F.broadcast(y))
        .groupBy(F.col("x._pid").alias("_pid"))
        .agg(
            F.sum(
                F.when(F.col("y._pid") < F.col("x._pid"), F.col("y._cnt")).otherwise(
                    F.lit(0)
                )
            ).alias("_off"),
            F.sum(F.col("y._cnt")).alias("_n"),
        )
    )
    ranked = local.join(F.broadcast(offs), "_pid").withColumn(
        out, (F.col("_off") + F.col("_rn")).cast("int")
    )
    drop = ["_pid", "_rn", "_off"] + ([] if keep_total else ["_n"])
    return ranked.drop(*drop)


def global_ntile(
    df: DataFrame,
    sort_cols: list[Column],
    k: int,
    out: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """ANSI ``ntile(k)`` over a total order, scale-safe.

    ntile semantics: with n rows, the first ``n % k`` buckets hold
    ``n div k + 1`` rows, the rest ``n div k`` — derived here in closed
    form from the global position and total count.
    """
    ranked = global_row_number(
        df, sort_cols, out="_pos", num_partitions=num_partitions, keep_total=True
    )
    q = F.expr("_n div {k}".format(k=k))
    rem = F.col("_n") % k
    big = rem * (q + 1)  # rows covered by the (q+1)-sized buckets
    # greatest(q, 1): when k >= n the otherwise-branch is unreachable,
    # but keep its divisor nonzero for ANSI-mode safety
    bucket = (
        F.when(F.col("_pos") <= big, F.floor((F.col("_pos") - 1) / (q + 1)) + 1)
        .otherwise(rem + F.floor((F.col("_pos") - big - 1) / F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
    return ranked.withColumn(out, bucket).drop("_pos", "_n")


def global_prefix_sum(
    df: DataFrame,
    sort_cols: list[Column],
    value_col: str,
    out: str = "cum",
    rank_out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the running total of ``value_col`` following the total
    order of ``sort_cols`` (inclusive prefix sum), scale-safe: the
    same range-partition + local-window + broadcast-offset shape as
    ``global_row_number``, with per-partition SUM offsets instead of
    counts — no ``Exchange SinglePartition`` anywhere in the plan.
    With ``rank_out`` set, the 1-based global position comes along for
    free (same local window, same offsets pass)."""
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    # NOTES rule 11 stage barrier — see global_row_number.
    part = stage_cache(
        df.repartitionByRange(n, *sort_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*sort_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = part.withColumn("_lcum", F.sum(value_col).over(w_local))
    if rank_out is not None:
        local = local.withColumn(
            "_lrn", F.row_number().over(Window.partitionBy("_pid").orderBy(*sort_cols))
        )
    # one row per partition: metadata-sized however big df is
    agg = part.groupBy("_pid").agg(
        F.sum(value_col).alias("_psum"), F.count("*").alias("_pcnt")
    )
    x, y = agg.alias("x"), agg.alias("y")
    offs = (
        x.crossJoin(F.broadcast(y))
        .groupBy(F.col("x._pid").alias("_pid"))
        .agg(
            F.sum(
                F.when(F.col("y._pid") < F.col("x._pid"), F.col("y._psum")).otherwise(
                    F.lit(0)
                )
            ).alias("_soff"),
            F.sum(
                F.when(F.col("y._pid") < F.col("x._pid"), F.col("y._pcnt")).otherwise(
                    F.lit(0)
                )
            ).alias("_coff"),
        )
    )
    ranked = local.join(F.broadcast(offs), "_pid").withColumn(
        out, F.col("_soff") + F.col("_lcum")
    )
    if rank_out is not None:
        ranked = ranked.withColumn(
            rank_out, (F.col("_coff") + F.col("_lrn")).cast("int")
        )
    return ranked.drop("_pid", "_lcum", "_lrn", "_soff", "_coff")
