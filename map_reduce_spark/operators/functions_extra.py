"""Coverage extras #2: analytic windows, higher-order array functions,
multiset set-ops, bitwise aggregates.

Widens SURVEY.md §2.2's "window functions", "scalar functions" and
"set ops" rows to the remaining surface a warehouse user expects:
percent_rank/cume_dist/nth_value analytics, array lambdas
(transform/filter/aggregate), INTERSECT ALL / EXCEPT ALL multiset
semantics, and bit-aggregate functions.

Scale posture: the analytic windows partition by a real key (never a
bare global ORDER BY — NOTES.md #13); array lambdas are doc-local
(no shuffle); the multiset ops plan as aggregate+join on the value
columns (one shuffle); bit aggregates partial-aggregate map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register


@register(
    "window_analytics",
    oracle="""
SELECT c_custkey, c_mktsegment,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       first_value(c_custkey) OVER w AS poorest,
       last_value(c_custkey) OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal, c_custkey
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING) AS richest,
       nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal, c_custkey
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS second_poorest
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
""",
)
def window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: percent_rank, cume_dist, first/last/
    nth_value per market segment.

    percent_rank/cume_dist are exact rationals of row counts (identical
    doubles in both engines; rounded 6dp for display). first/nth/last
    use an explicit unbounded ROWS frame — the default ordered-window
    frame stops at CURRENT ROW, which would make last_value degenerate,
    and Spark and DuckDB agree on that default only by convention.
    Partitioned by segment: no single-task global window.
    """
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.first("c_custkey").over(w).alias("poorest"),
        F.last("c_custkey").over(wfull).alias("richest"),
        F.nth_value("c_custkey", 2).over(wfull).alias("second_poorest"),
    )


@register(
    "higher_order_funcs",
    oracle="""
SELECT doc_id,
       CAST(len(list_filter(w, x -> length(x) > 4)) AS INT) AS n_long_tokens,
       CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS total_len,
       CAST(list_sum(list_transform(w, x -> CASE WHEN contains(x, 'a')
                                                 THEN 1 ELSE 0 END)) AS BIGINT)
         AS n_with_a,
       upper(w[1]) AS first_upper
FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
""",
)
def higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array lambdas: filter, transform+aggregate, and
    element access over the token array.

    Doc-local array work — no shuffle, trivially parallel. (NOTES.md #8
    reserves HOFs for non-hot paths: these run interpreted, which is
    fine per-document; corpus-scale token statistics go through the
    explode+codegen aggregates in text_analysis/corpus_quality.)
    """
    docs = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    zero = F.lit(0).cast("bigint")
    return docs.select(
        "doc_id",
        F.size(F.filter(w, lambda x: F.length(x) > 4)).alias("n_long_tokens"),
        F.aggregate(w, zero, lambda acc, x: acc + F.length(x)).alias("total_len"),
        F.aggregate(
            w, zero, lambda acc, x: acc + F.when(x.contains("a"), 1).otherwise(0)
        ).alias("n_with_a"),
        F.upper(F.element_at(w, 1)).alias("first_upper"),
    )


@register(
    "set_intersect_all",
    oracle="""
SELECT c_mktsegment FROM customer WHERE c_nationkey < 12
INTERSECT ALL
SELECT c_mktsegment FROM customer WHERE c_nationkey >= 12
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection keeps min(multiplicity) of
    each value, unlike the dedup-ing INTERSECT already registered.
    Plans as a counted aggregate on each side + join (one shuffle per
    side on the value column)."""
    c = load_table(spark, sf_dir, "customer")
    lo = c.filter(F.col("c_nationkey") < 12).select("c_mktsegment")
    hi = c.filter(F.col("c_nationkey") >= 12).select("c_mktsegment")
    return lo.intersectAll(hi)


@register(
    "set_except_all",
    oracle="""
SELECT c_mktsegment FROM customer WHERE c_nationkey < 12
EXCEPT ALL
SELECT c_mktsegment FROM customer WHERE c_nationkey >= 12
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (multiplicities subtract)."""
    c = load_table(spark, sf_dir, "customer")
    lo = c.filter(F.col("c_nationkey") < 12).select("c_mktsegment")
    hi = c.filter(F.col("c_nationkey") >= 12).select("c_mktsegment")
    return lo.exceptAll(hi)


@register(
    "bitwise_agg",
    oracle="""
SELECT CAST(o_custkey % 8 AS INT) AS bucket,
       CAST(bit_and(o_orderkey) AS BIGINT) AS and_all,
       CAST(bit_or(o_orderkey) AS BIGINT) AS or_all,
       CAST(bit_xor(o_orderkey) AS BIGINT) AS xor_all,
       CAST(SUM(o_orderkey & 255) AS BIGINT) AS low_byte_sum
FROM orders
GROUP BY 1
""",
)
def bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate functions (bit_and/bit_or/bit_xor) and bit
    operators — exact integer semantics, order-independent by algebra,
    partial-aggregated map-side like any other agg."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy((F.col("o_custkey") % 8).cast("int").alias("bucket"))
        .agg(
            F.bit_and("o_orderkey").cast("bigint").alias("and_all"),
            F.bit_or("o_orderkey").cast("bigint").alias("or_all"),
            F.bit_xor("o_orderkey").cast("bigint").alias("xor_all"),
            F.sum(F.expr("o_orderkey & 255")).cast("bigint").alias("low_byte_sum"),
        )
    )
