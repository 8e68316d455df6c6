"""Window-function inventory (SURVEY.md §2.2 "window functions" — absent
in the reference, required category).

Determinism: every ORDER BY inside a window carries a unique tiebreak so
row_number/lag/frames are total-ordered; frame sums accumulate exact
scaled LONGs finished by a per-row decimal division (``_sumd_over``) so
partial-order evaluation can't flip float bits — same value as the
decimal frame sums they replaced, cheaper frame arithmetic.

Scale notes: all windows below partition by a key (custkey/suppkey) —
one shuffle on the partition key, then per-partition sorting; nothing
needs a global single-partition window (the one global ordering demo
lives in relational.sort_multi_col).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.operators.relational import _sumd, _sumd_over
from map_reduce_spark.registry import register


@register(
    "window_rank",
    oracle="""
SELECT o_orderkey, o_orderpriority AS priority,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       rank()       OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS rnk,
       dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC) AS drnk
FROM orders
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank + dense_rank within partition (ties share ranks, so no
    tiebreak needed for determinism)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "window_row_number_topk",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def window_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: the canonical row_number() <= k pattern.

    At scale this is the shape that replaces a self-join: one shuffle on
    the group key, per-partition heap sort, early filter.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            "rn",
        )
    )


@register(
    "window_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(o_totalprice AS DOUBLE) AS totalprice,
       CAST(lag(o_totalprice)  OVER w AS DOUBLE) AS prev_price,
       CAST(lead(o_totalprice) OVER w AS DOUBLE) AS next_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each customer's order history (unique tiebreak on
    orderkey makes the sequence total-ordered)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("totalprice"),
        F.lag("o_totalprice").over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice").over(w).cast("double").alias("next_price"),
    )


@register(
    "window_moving_sum",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_3
FROM orders
""",
)
def window_moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving aggregate with an explicit ROWS frame (3-order window).
    The frame sum runs over exact scaled longs (``_sumd_over``) — same
    correctly-rounded double as the decimal frame sum, cheaper frame
    arithmetic and 8-byte frame state."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        _sumd_over(F.col("o_totalprice"), w, alias="moving_3"),
    )


@register(
    "window_cumulative",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       row_number() OVER (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders
""",
)
def window_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer (unbounded-preceding frame); the
    running sum accumulates exact scaled longs (``_sumd_over``)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        _sumd_over(
            F.col("o_totalprice"),
            w.rowsBetween(Window.unboundedPreceding, 0),
            alias="running_total",
        ),
        F.row_number().over(w).alias("order_seq"),
    )


@register(
    "window_range_frame",
    oracle="""
SELECT o_orderkey, o_orderpriority AS priority,
       COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice
                      RANGE BETWEEN 10000 PRECEDING AND 10000 FOLLOWING) AS n_similar_price
FROM orders
""",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-RANGE window frame: how many same-priority orders fall
    within ±10k of each order's price (the value-bounded frame the
    ROWS frames can't express)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, 10000)
    )
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.count("*").over(w).alias("n_similar_price"),
    )


@register(
    "window_ntile",
    oracle="""
SELECT c_custkey,
       ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS balance_quartile
FROM customer
""",
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing over a total order.

    Built from the scale-safe global rank (map_reduce_spark.ranking)
    plus the closed-form ntile bucket formula — identical output to
    ``ntile(4) OVER (ORDER BY ...)`` with no single-partition window.
    """
    from map_reduce_spark.ranking import global_ntile

    c = load_table(spark, sf_dir, "customer")
    bucketed = global_ntile(
        c,
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        k=4,
        out="balance_quartile",
    )
    return bucketed.select("c_custkey", "balance_quartile")
