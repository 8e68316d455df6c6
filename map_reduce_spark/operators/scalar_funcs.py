"""Scalar-function inventory (SURVEY.md §2.2 "scalar functions").

The reference's scalar surface is upper() + one regex split
(word_count.ex:5-7); a complete engine needs the string / date / math /
array / json / conditional families. One query per family, each over a
driver table, each DuckDB-checkable.

All expressions are built-in ``pyspark.sql.functions`` — JVM-side,
inside whole-stage codegen; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register


@register(
    "string_funcs",
    oracle="""
SELECT c_custkey,
       upper(c_name)                        AS name_upper,
       lower(c_mktsegment)                  AS seg_lower,
       substr(c_name, 1, 8)                 AS name_prefix,
       length(c_name)                       AS name_len,
       concat(c_mktsegment, '#', c_name)    AS tagged,
       lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
       replace(c_name, 'Customer', 'Cust')  AS name_short,
       reverse(c_mktsegment)                AS seg_rev,
       trim('  ' || c_mktsegment || ' ')    AS seg_trim,
       regexp_replace(c_name, '[0-9]+', '#') AS name_nodigits,
       c_name LIKE 'Customer%'              AS is_customer_prefix
FROM customer
""",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: case, substring, length, concat, pad, replace,
    reverse, trim, regexp_replace, LIKE."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat("c_mktsegment", F.lit("#"), "c_name").alias("tagged"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("name_short"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.trim(F.concat(F.lit("  "), "c_mktsegment", F.lit(" "))).alias("seg_trim"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_nodigits"),
        F.col("c_name").like("Customer%").alias("is_customer_prefix"),
    )


@register(
    "date_funcs",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate)      AS order_year,
       month(o_orderdate)     AS order_month,
       day(o_orderdate)       AS order_day,
       quarter(o_orderdate)   AS order_quarter,
       strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m-%d') AS month_start,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end
FROM orders
""",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract parts, truncate, diff, last_day."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.quarter("o_orderdate").alias("order_quarter"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_y2k"
        ),
        F.date_format(F.last_day(F.col("o_orderdate").cast("date")), "yyyy-MM-dd").alias(
            "month_end"
        ),
    )


@register(
    "math_funcs",
    oracle="""
SELECT p_partkey,
       abs(p_retailprice - 1000)            AS dist_from_1k,
       round(p_retailprice, 1)              AS price_round1,
       CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
       CAST(ceil(p_retailprice) AS BIGINT)  AS price_ceil,
       round(sqrt(p_retailprice), 6)        AS price_sqrt,
       round(ln(p_retailprice), 6)          AS price_ln,
       p_retailprice * p_retailprice        AS price_sq,
       p_size % 7                           AS size_mod7,
       CAST(sign(p_retailprice - 1500) AS BIGINT) AS above_1500,
       greatest(p_size, 25)                 AS size_floor25,
       least(p_size, 25)                    AS size_cap25
FROM part
""",
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/round/floor/ceil/sqrt/ln/pow/mod/sign/greatest."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("dist_from_1k"),
        F.round("p_retailprice", 1).alias("price_round1"),
        F.floor("p_retailprice").alias("price_floor"),
        F.ceil("p_retailprice").alias("price_ceil"),
        F.round(F.sqrt("p_retailprice"), 6).alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        (F.col("p_retailprice") * F.col("p_retailprice")).alias("price_sq"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.signum(F.col("p_retailprice") - 1500).cast("long").alias("above_1500"),
        F.greatest("p_size", F.lit(25)).alias("size_floor25"),
        F.least("p_size", F.lit(25)).alias("size_cap25"),
    )


@register(
    "array_funcs",
    oracle="""
SELECT vec_id,
       len(embedding)                                   AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6)           AS first_val,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS vec_sum,
       round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6) AS vec_max,
       label
FROM embeddings
""",
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family over the embeddings table: size, index, higher-order
    aggregate/transform (Spark ``aggregate``/``transform`` — JVM-side,
    no UDF)."""
    e = load_table(spark, sf_dir, "embeddings")
    vec_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(
            F.aggregate(vec_d, F.lit(0.0), lambda acc, x: acc + x), 4
        ).alias("vec_sum"),
        F.round(F.array_max(vec_d), 6).alias("vec_max"),
        "label",
    )


@register(
    "json_funcs",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k')                 AS k_str,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
       json_extract_string(props, '$.missing') IS NULL   AS missing_is_null
FROM events
""",
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family on events.props: path extraction + typed cast."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("long").alias("k_int"),
        F.get_json_object("props", "$.missing").isNull().alias("missing_is_null"),
    )


@register(
    "conditional_funcs",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'high'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'low' END                        AS price_band,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
       IF(o_orderpriority = '1-URGENT', 1, 0)     AS is_urgent
FROM orders
""",
)
def conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: CASE WHEN, COALESCE, NULLIF, IF."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
    )
