"""Subquery + reshaping shapes: scalar subquery, unpivot (stack), and
the classic join+agg+top-k (TPC-H Q3 shape).

Rounds out the relational inventory with patterns Catalyst handles via
dedicated strategies: scalar subqueries become broadcast one-row joins,
stack() is a generator projection (no shuffle), and the Q3 shape chains
broadcast dim filter -> fact join -> partial agg -> TakeOrdered.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.operators.relational import _sumd
from map_reduce_spark.registry import register


@register(
    "scalar_subquery",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
FROM orders
WHERE o_totalprice > 1.5 * (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
  FROM orders)
""",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above 1.5x the average price. The scalar
    aggregate broadcasts as a one-row join (exact-decimal average, per
    engine convention)."""
    o = load_table(spark, sf_dir, "orders")
    avg_df = o.agg(
        (_sumd(F.col("o_totalprice")) / F.count("*")).alias("avg_price")
    )
    return (
        o.crossJoin(F.broadcast(avg_df))
        .filter(F.col("o_totalprice") > 1.5 * F.col("avg_price"))
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice"))
    )


@register(
    "unpivot_stack",
    oracle="""
SELECT o_orderkey, 'totalprice' AS metric, CAST(o_totalprice AS DOUBLE) AS val FROM orders
UNION ALL
SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS val FROM orders
""",
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot via stack(): wide columns to (key, metric, value) rows —
    a generator projection, no shuffle."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(2, 'totalprice', CAST(o_totalprice AS DOUBLE), "
            "'custkey', CAST(o_custkey AS DOUBLE)) AS (metric, val)"
        ),
    )


@register(
    "q3_top_revenue_orders",
    oracle="""
SELECT o_orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter (broadcast dim) -> fact joins ->
    revenue agg -> top-10 (TakeOrderedAndProject, unique tiebreak)."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    )
    rev = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 6
    ).cast("decimal(18,6)")
    return (
        F.broadcast(c)
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )
