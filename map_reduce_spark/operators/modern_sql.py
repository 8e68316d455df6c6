"""Modern Spark-4 SQL surface: recursive CTEs, the VARIANT
semi-structured type, LATERAL correlated subqueries, and SQL-defined
functions.

The reference has no SQL entry point at all (SURVEY §0 — its API is a
mapper/reducer pair); ``sql_api_q6`` established the spark.sql path,
and this module covers the Spark-4-era SQL features a user migrating a
modern warehouse workload expects to keep:

- ``recursive_cte`` — WITH RECURSIVE month-spine generation +
  left-join densification (the classic calendar fill without a
  sequence() builtin in pure SQL);
- ``variant_funcs`` — parse_json -> VARIANT -> typed variant_get
  extraction, aggregated. VARIANT is Spark 4's shredding-friendly
  semi-structured type: unlike get_json_object (string re-parse per
  access), the parse happens once and typed access is O(field);
- ``lateral_topn`` — per-nation top-3 customers via LATERAL
  (correlated subquery with ORDER BY ... LIMIT), the SQL-standard
  form of the per-group top-k;
- ``sql_udf_funcs`` — CREATE TEMPORARY FUNCTION (SQL-defined scalar
  functions). These inline into Catalyst and stay inside whole-stage
  codegen — the fast path for user abstraction, vs. Python UDFs which
  cross the interpreter boundary.

Scale notes: recursion materializes only the spine (rows = distinct
months — metadata-sized); each iteration is one tiny union step, and
the join back to the fact aggregate is broadcastable. The LATERAL
top-k decorrelates over a 25-row outer (broadcast NL join locally);
at fact-table scale the same semantics should be written as the
window row_number top-k (``window_row_number_topk``) — documented
trade, same results. VARIANT extraction and SQL UDFs are pure per-row
projections: embarrassingly parallel, zero shuffle beyond the final
aggregate.

Cross-engine determinism: month keys are yyyyMM integers derived by
calendar formatting (NTZ timestamps — no session-TZ hop, NOTES rule
6), money sums go through DECIMAL (NOTES rule 1), extracted VARIANT
fields are integer-typed end to end, and the UDF arithmetic is
rounded onto the decimal grid before summation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register
from map_reduce_spark.session import stage_cache


@register(
    "recursive_cte",
    oracle="""
WITH RECURSIVE bounds AS (
  SELECT CAST(strftime(MIN(o_orderdate), '%Y%m') AS INT) AS mn,
         CAST(strftime(MAX(o_orderdate), '%Y%m') AS INT) AS mx
  FROM orders
),
months(m) AS (
  SELECT mn FROM bounds
  UNION ALL
  SELECT CASE WHEN m % 100 = 12 THEN m + 89 ELSE m + 1 END
  FROM months, bounds WHERE m < mx
),
rev AS (
  SELECT CAST(strftime(o_orderdate, '%Y%m') AS INT) AS m,
         COUNT(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT months.m AS month, COALESCE(rev.n_orders, 0) AS n_orders, rev.revenue
FROM months LEFT JOIN rev ON months.m = rev.m
""",
)
def recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE month spine over the orders date range,
    left-joined to monthly revenue (gap months appear with 0 orders).

    The recursion generates one row per calendar month between the
    min and max order date — a spine whose size is data-INDEPENDENT
    (months, not rows), so the iterative union is metadata-cheap at
    any corpus size; the revenue aggregate partial-aggs before its
    single low-cardinality shuffle, and the spine join broadcasts.
    """
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("rc_orders")
    # The recursive branch below re-evaluates every relation it
    # references ONCE PER ITERATION. If `bounds` were a plain CTE over
    # the fact table, each of the ~80 month steps would rescan and
    # re-aggregate the whole orders table (measured: 19 s at sf0.01 —
    # and O(months × corpus) at 100 TB). Persisting the 1-row bounds
    # relation first makes every iteration an InMemoryTableScan of one
    # cached row, so the spine costs O(months), independent of data.
    from pyspark.sql import functions as F

    # Second scale lever: the engine schedules one job per recursive
    # step, so a linear month-at-a-time spine pays that fixed cost
    # ~n_months times (measured ~240 ms/step → 19 s for 80 months).
    # Doubling recursion emits each delta row twice — (i, 2s) and
    # (i+s, 2s) — so the index set doubles per step and the spine
    # needs only ceil(log2(n_months)) iterations; the final SELECT
    # keeps the last (complete) round via s >= n_months AND i <
    # n_months. idx0 = year*12 + (month-1) linearizes calendar months
    # so index arithmetic never needs the %100 carry trick.
    bounds = (
        orders.agg(
            (F.year(F.min("o_orderdate")) * 12 + F.month(F.min("o_orderdate")) - 1).alias(
                "mn_idx"
            ),
            (F.year(F.max("o_orderdate")) * 12 + F.month(F.max("o_orderdate")) - 1).alias(
                "mx_idx"
            ),
        )
        .withColumn("n_months", F.col("mx_idx") - F.col("mn_idx") + F.lit(1))
    )
    bounds = stage_cache(bounds)
    bounds.count()  # materialize the single-row cache before recursion
    bounds.createOrReplaceTempView("rc_bounds")
    return spark.sql(
        """
        WITH RECURSIVE idx(i, s) AS (
          SELECT 0, 1 FROM rc_bounds
          UNION ALL
          SELECT i + b * s, s * 2
          FROM idx CROSS JOIN VALUES (0), (1) AS bits(b) CROSS JOIN rc_bounds
          WHERE s < n_months
        ),
        months(m) AS (
          SELECT CAST(((mn_idx + i) DIV 12) * 100 + ((mn_idx + i) % 12) + 1 AS INT)
          FROM idx CROSS JOIN rc_bounds
          WHERE s >= n_months AND i < n_months
        ),
        rev AS (
          SELECT CAST(date_format(o_orderdate, 'yyyyMM') AS INT) AS m,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
          FROM rc_orders GROUP BY 1
        )
        SELECT months.m AS month, COALESCE(rev.n_orders, 0) AS n_orders, rev.revenue
        FROM months LEFT JOIN rev ON months.m = rev.m
        """
    )


@register(
    "variant_funcs",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_present,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events GROUP BY event_type
""",
)
def variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingestion: parse the events ``props`` JSON once into a
    VARIANT and aggregate a typed ``variant_get`` field extraction.

    One parse per row (vs. get_json_object's parse-per-access), typed
    access pushed into codegen; pure projection + one partial-agg'd
    groupBy — the semi-structured scan profile at any scale. VARIANT
    is also the column type the engine would persist for open-schema
    payloads (parquet shredding-ready in Spark 4).
    """
    load_table(spark, sf_dir, "events").createOrReplaceTempView("var_events")
    return spark.sql(
        """
        WITH v AS (
          SELECT event_type,
                 variant_get(parse_json(props), '$.k', 'bigint') AS k
          FROM var_events
        )
        SELECT event_type,
               COUNT(*) AS n,
               COUNT(k) AS k_present,
               SUM(k) AS k_sum,
               MIN(k) AS k_min,
               MAX(k) AS k_max
        FROM v GROUP BY event_type
        """
    )


@register(
    "lateral_topn",
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_name, c_acctbal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 3
) t
""",
)
def lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation top-3 customers by account balance via a LATERAL
    correlated subquery (ORDER BY ... LIMIT inside the lateral) — the
    SQL-standard per-group top-k form.

    The outer side here is dimension-sized (25 nations), so the
    correlated plan is broadcast-cheap. When the outer is a fact
    table, write the same semantics as the window top-k
    (``window_row_number_topk``) — the decorrelated one-shuffle plan;
    both forms are part of the engine's surface.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM lat_nation n, LATERAL (
          SELECT c_name, c_acctbal
          FROM lat_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name
          LIMIT 3
        ) t
        """
    )


@register(
    "sql_udf_funcs",
    oracle="""
SELECT CASE WHEN l_extendedprice < 10000 THEN 'low'
            WHEN l_extendedprice < 40000 THEN 'mid'
            ELSE 'high' END AS band,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount), 4)
                     AS DECIMAL(18,4))) AS DOUBLE) AS net_revenue
FROM lineitem GROUP BY 1
""",
)
def sql_udf_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar functions (CREATE TEMPORARY FUNCTION ...
    RETURN expr) composed in a query: a net-price computation and a
    price-band classifier.

    SQL UDFs inline into the Catalyst plan — they stay inside
    whole-stage codegen (verify: the plan shows plain arithmetic, no
    BatchEvalPython), so user-named abstractions cost nothing at
    100 TB, unlike interpreter-crossing Python UDFs. The oracle
    inlines the same expressions by hand.
    """
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE, d DOUBLE) "
        "RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN p < 10000 THEN 'low' "
        "WHEN p < 40000 THEN 'mid' ELSE 'high' END"
    )
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("udf_lineitem")
    return spark.sql(
        """
        SELECT price_band(l_extendedprice) AS band,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(net_price(l_extendedprice, l_discount), 4)
                             AS DECIMAL(18,4))) AS DOUBLE) AS net_revenue
        FROM udf_lineitem GROUP BY 1
        """
    )


@register(
    "sql_pipe_syntax",
    oracle="""
SELECT o_orderpriority AS priority,
       strftime(CAST(o_orderdate AS DATE), '%Y') AS order_year,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY 1, 2
HAVING COUNT(*) > 10
""",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4 ``|>`` operators, the Google
    "SQL Has Problems" pipe-flow dialect): filter -> aggregate ->
    post-filter written as a linear pipeline instead of inside-out
    nesting. Same Catalyst plan as the classic form — the pipe
    stages desugar to the identical filter/aggregate operators, so
    this costs nothing at any scale; the oracle is the classic-syntax
    twin, proving the desugaring preserves semantics.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("pipe_orders")
    return spark.sql(
        """
        FROM pipe_orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         AS revenue
           GROUP BY o_orderpriority AS priority,
                    date_format(o_orderdate, 'yyyy') AS order_year
        |> WHERE n_orders > 10
        |> SELECT priority, order_year, n_orders, revenue
        """
    )


@register(
    "sql_parameterized",
    oracle="""
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice >= 1000.0
GROUP BY 1
""",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL (Spark 4 named-parameter API): the query text
    carries ``:status`` / ``:floor`` markers and values arrive via
    ``args`` — the injection-safe template path an application layer
    should use instead of string interpolation. Parameters bind at
    parse time to literals, so Catalyst constant-folds and pushes them
    down exactly like hand-written literals (zero plan cost); the
    oracle is the literal-inlined twin, proving the binding is
    semantics-preserving.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("param_orders")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
        FROM param_orders
        WHERE o_orderstatus = :status AND o_totalprice >= :floor
        GROUP BY 1
        """,
        args={"status": "F", "floor": 1000.0},
    )
