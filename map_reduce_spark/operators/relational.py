"""Relational operator inventory (SURVEY.md §2.2): joins, aggregations,
rollup/cube/grouping-sets, sorts/limits/top-k, set operations.

The reference has none of these (its only dataflow is word count); they
are required categories for capability parity at the engine level. All
built-in DataFrame ops — Catalyst plans partial aggregation, broadcast
joins for the dimension tables, sort-merge for fact-fact joins, and
TakeOrderedAndProject for top-k.

Determinism conventions (the driver hash-compares against DuckDB):
- money/qty aggregates go through DECIMAL (exact, order-independent),
  then CAST to DOUBLE — FP summation order can never flip a bit;
- averages are exact-decimal sums divided by bigint counts, in double;
- every top-k ordering carries a unique tiebreak column.

Scale notes (100 TB posture): dimension joins (region/nation/customer/
supplier/part) are broadcast — no shuffle of the fact table; fact-fact
joins (lineitem⋈orders) shuffle on the join key once and AQE handles
skew; every aggregate below is partial-aggregated map-side before its
single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register


def _dec(col: str | "F.Column", scale: int = 2):
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


def _scaled_long(col, scale: int = 2):
    """Exact scaled-long recovery of a fixed-point double column: the
    input is a scale-dp grid value stored as its nearest double, so
    ``x * 10^scale`` lands within ~1e-4 of the true integer and
    ``round`` recovers it exactly (no value can sit near a .5 tie).
    NULLs propagate through round/cast exactly like the decimal cast."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * F.lit(10**scale), 0).cast("long")


def _sumd(col, scale: int = 2, alias: str | None = None):
    """Exact sum, decimal semantics at long-sum cost: per-row the 2dp
    grid value becomes its exact scaled integer (``_scaled_long``), the
    partial aggregation runs over LONGs (~2x cheaper than Spark's
    decimal partial agg — r11 measurement: 0.42 s vs 0.22 s for one
    sum over sf0.1 lineitem), and the ONE per-group finish divides as
    a decimal so the double result is the correctly-rounded value of
    the exact sum at ANY magnitude — bit-identical to the previous
    SUM(DECIMAL(18,2))::DOUBLE at every scale (no fl(N) double-rounding
    detour; sums bounded < 2^63 scaled units, same as the oracle's
    BIGINT cast)."""
    n = F.sum(_scaled_long(col, scale))
    e = (n.cast("decimal(38,0)") / F.lit(10**scale)).cast("double")
    return e.alias(alias) if alias else e


def _sumd_over(col, w, scale: int = 2, alias: str | None = None):
    """``_sumd`` at WINDOW grain: the frame sum runs over exact scaled
    LONGs (the window's incremental add/remove work drops from decimal
    to long arithmetic, and the frame state narrows to 8 bytes) and the
    per-ROW finish divides as a decimal — the same correctly-rounded-
    double-of-the-exact-sum contract as ``_sumd``, bit-identical to
    SUM(DECIMAL(18,scale)) OVER w ::DOUBLE while the frame sum stays
    under 2^63 scaled units (same bound as ``_sumd``; r11 ADVICE: past
    that bound a non-ANSI long sum would WRAP silently where the
    DECIMAL(18,_) it replaced — and the oracle's HUGEINT — stayed
    exact, so the bound is a stated precondition, not 'any
    magnitude')."""
    n = F.sum(_scaled_long(col, scale)).over(w)
    e = (n.cast("decimal(38,0)") / F.lit(10**scale)).cast("double")
    return e.alias(alias) if alias else e


def _dec_prod(expr, scale: int = 6):
    """Exact fixed-point recovery of a product of fixed-point columns.

    Products of 2dp columns have <=6 true decimals; ``round(double, 6)``
    recovers the exact grid value identically in Spark and DuckDB, and
    the decimal cast makes the subsequent SUM order-independent. Keeping
    each factor chain inside one double expression avoids decimal
    precision-overflow (Spark and DuckDB cap at 38 with different
    truncation rules).
    """
    return F.round(expr, scale).cast(f"decimal(18,{scale})")


def _micros6(expr):
    """``_dec_prod``'s exact 6dp value as its scaled-LONG micros: the
    inner round recovers the 6dp grid value (identically in Spark and
    DuckDB — same contract as _dec_prod), and since that value's true
    micros is an integer, the outer round after the *1e6 double multiply
    (error ~1e-4 of a unit at the 18,6 domain bound) is exact. Summing
    LONG micros replaces the decimal partial agg (~2x cheaper) and the
    sum M equals the decimal path's S*1e6 bit-for-bit; finish with
    M::double/1e6, the exact formula the oracle's BIGINT cast encodes."""
    return F.round(F.round(expr, 6) * F.lit(1_000_000), 0).cast("long")


def _sum6d(micros_col, alias: str | None = None):
    """Finish a ``_micros6`` long sum as the correctly-rounded double of
    the exact 6dp sum — bit-identical to SUM(DECIMAL(18,6))::DOUBLE at
    any magnitude (decimal division at GROUP grain, so no fl(N)
    double-rounding; per-row work stays all-long)."""
    e = (
        F.sum(micros_col).cast("decimal(38,0)") / F.lit(1_000_000)
    ).cast("double")
    return e.alias(alias) if alias else e


# ---------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS sum_disc_price,
       CAST(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS DECIMAL(18,6))) * 1000000 AS BIGINT) AS DOUBLE) / 1000000 AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: the canonical scan→filter→agg.

    One parquet scan (pruned to 7 columns, shipdate predicate pushed
    down), partial agg, one shuffle on a 2-column low-cardinality key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
    # exact 6dp micros as LONGs (see _sumd: long partial agg at half the
    # decimal-agg cost): round(e, 6) recovers the exact 6dp grid value
    # as its nearest double, and *1e6 then sits within ~1e-4 of the true
    # integer micros, so the outer round is exact — the summed M is
    # bit-identical to the decimal path's S*1e6
    disc_price = _micros6(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    charge = _micros6(
        F.col("l_extendedprice")
        * (F.lit(1) - F.col("l_discount"))
        * (F.lit(1) + F.col("l_tax"))
    )
    # sum_disc_price / sum_charge: the exact decimal sum is converted
    # to double via SCALED-LONG division (micros -> long -> double ->
    # /1e6) in BOTH engines. At 10x data the 18,6 sums pass 16
    # significant digits, where engines' native DECIMAL->DOUBLE casts
    # disagree by one ulp (measured on the 10x slice); long->double is
    # correctly rounded in hardware on both sides, so this path is
    # bit-identical at any SF (sums bounded < 2^63 micros).
    def _d6(nsum, alias):
        # nsum is the exact long micros sum M; fl(fl(M)/1e6) is the
        # identical formula the decimal path computed via
        # (S*1e6)::long::double/1e6
        return (nsum.cast("double") / F.lit(1_000_000.0)).alias(alias)

    return f.groupBy("l_returnflag", "l_linestatus").agg(
        _sumd("l_quantity", alias="sum_qty"),
        _sumd("l_extendedprice", alias="sum_base_price"),
        _d6(F.sum(disc_price), "sum_disc_price"),
        _d6(F.sum(charge), "sum_charge"),
        (_sumd("l_quantity") / F.count("*")).alias("avg_qty"),
        (_sumd("l_extendedprice") / F.count("*")).alias("avg_price"),
        (_sumd("l_discount") / F.count("*")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_basic",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l_suppkey) AS n_supp,
       COUNT(DISTINCT l_partkey) AS n_parts,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
       CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc
FROM lineitem
""",
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate: count / count-distinct / sum / min / max / avg."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_parts"),
        _sumd("l_quantity", alias="total_qty"),
        F.min("l_extendedprice").cast("double").alias("min_price"),
        F.max("l_extendedprice").cast("double").alias("max_price"),
        (_sumd("l_discount") / F.count("*")).alias("avg_disc"),
    )


@register("agg_approx_distinct", oracle=None)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the sketch path for 100 TB
    cardinalities (no exact-distinct shuffle). Algorithm-specific, so
    rows-only; the companion exact counts live in ``agg_basic``.

    The percentile sketch is emitted as three scalar columns (not an
    array) so downstream row canonicalizers can sort/hash the frame.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("price_p50"),
        F.expr("approx_percentile(l_extendedprice, 0.95)").alias("price_p95"),
        F.expr("approx_percentile(l_extendedprice, 0.99)").alias("price_p99"),
    )


@register(
    "agg_corr",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(l_quantity * l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(l_quantity * l_quantity, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(l_extendedprice * l_extendedprice, 4) AS DECIMAL(28,4))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS qty_price_corr
FROM s
""",
)
def agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group from exact-decimal moment sums.

    Built-in ``corr`` accumulates floats in partition order
    (nondeterministic across engines/parallelism); assembling the
    moments exactly and applying the closed form once makes the result
    bit-stable — the engine's convention for all derived statistics.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d4 = lambda c: F.round(c, 4).cast("decimal(28,4)")  # noqa: E731
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        _sumd("l_quantity", alias="sx"),
        _sumd("l_extendedprice", alias="sy"),
        F.sum(d4(F.col("l_quantity") * F.col("l_extendedprice"))).cast("double").alias("sxy"),
        F.sum(d4(F.col("l_quantity") * F.col("l_quantity"))).cast("double").alias("sxx"),
        F.sum(d4(F.col("l_extendedprice") * F.col("l_extendedprice"))).cast("double").alias("syy"),
    )
    corr = (s.n * s.sxy - s.sx * s.sy) / (
        F.sqrt(s.n * s.sxx - s.sx * s.sx) * F.sqrt(s.n * s.syy - s.sy * s.sy)
    )
    return s.select("l_returnflag", F.round(corr, 6).alias("qty_price_corr"))


@register(
    "agg_rollup",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; NULL group keys folded to 'ALL'."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _sumd("l_quantity", alias="sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "agg_cube",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 2^2 grouping sets)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), _sumd("l_extendedprice", alias="sum_price"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_price",
        )
    )


@register(
    "agg_grouping_sets",
    oracle="""
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (status), (priority), (grand total)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "sql_api_q6",
    oracle="""
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount, 6) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 25
""",
)
def sql_api_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: a TPC-H Q6-style query written entirely as
    SQL over a registered view — Catalyst produces the same plan as
    the DataFrame API (one pruned, predicate-pushed scan + agg)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("sql_lineitem")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount, 6) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_lines
        FROM sql_lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.03 AND 0.07
          AND l_quantity < 25
        """
    )


@register(
    "agg_filtered",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_all,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                     FILTER (WHERE l_discount > 0.05), 0) AS DOUBLE) AS qty_discounted,
       COUNT(*) FILTER (WHERE l_tax = 0) AS n_taxfree
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional (FILTER-clause) aggregation — one pass, no self-join
    (Spark spelling: aggregate over when())."""
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_discount") > 0.05
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.count(F.when(disc, 1)).alias("n_discounted"),
        F.coalesce(F.sum(F.when(disc, _dec("l_quantity"))), F.lit(0))
        .cast("double")
        .alias("qty_discounted"),
        F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_taxfree"),
    )


@register(
    "monthly_revenue",
    oracle="""
SELECT strftime(CAST(date_trunc('month', o_orderdate) AS DATE), '%Y-%m') AS month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY 1
""",
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series rollup: calendar-month revenue (the hypertable-
    rollup shape — group key derived by date_trunc, partial-agg before
    one low-cardinality shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count("*").alias("n_orders"),
            _sumd("o_totalprice", alias="revenue"),
        )
    )


@register(
    "distinct_op",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (dedup shuffle on all projected columns)."""
    return load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    ).distinct()


# ---------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------


@register(
    "join_broadcast_star",
    oracle="""
SELECT r_name AS region, n_name AS nation,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def join_broadcast_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema dim join: explicit broadcast of nation+region.

    At 100 TB the fact side never shuffles for dimension joins — both
    dims ship to every executor (BroadcastHashJoin).
    """
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("n_customers"),
            _sumd("c_acctbal", alias="total_acctbal"),
        )
    )


@register(
    "join_fact_fact",
    oracle="""
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
""",
)
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi-join (lineitem⋈orders): one shuffle on the key;
    sort-merge or shuffled-hash chosen by Catalyst, AQE splits skew."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    rev = _micros6(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n_lines"), _sum6d(rev, "revenue"))
    )


@register(
    "join_left",
    oracle="""
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers without orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(_sumd("o_totalprice"), F.lit(0.0)).alias("spent"),
        )
    )


@register(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers with a >200k order."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no orders at all."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_range",
    oracle="""
SELECT o_orderpriority AS priority, COUNT(*) AS n_shipped_30d
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate AND l_shipdate < o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority
""",
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join + range predicate (ships within 30 days of order).

    The equi-key carries the shuffle; the range condition is evaluated
    post-match, so this stays a single-shuffle join (no cross product).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAY"))
    )
    return (
        li.join(o, cond)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count("*").alias("n_shipped_30d"))
    )


@register(
    "q5_region_revenue",
    oracle="""
SELECT n_name AS nation,
       CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way star join: local-supplier revenue by nation.

    Join order: facts join on their keys (shuffled once each), all four
    dimensions broadcast; the region filter prunes before the join.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _micros6(F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(_sum6d(rev, "revenue"))
    )


# ---------------------------------------------------------------------
# Sorts / limits / top-k
# ---------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15
""",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k by value with a unique tiebreak (orderkey).

    orderBy+limit plans TakeOrderedAndProject — per-partition heaps, no
    global sort, no shuffle of the full table; the right top-k shape at
    any scale.
    """
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("totalprice"))
        .limit(15)
    )


@register(
    "sort_multi_col",
    oracle="""
SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS acctbal,
       row_number() OVER (ORDER BY c_mktsegment, c_acctbal DESC, c_custkey) AS pos
FROM customer
""",
)
def sort_multi_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global multi-column sort with the order materialized as a rank.

    Scale shape: range-partitioned sort + per-partition row_number +
    broadcast partition offsets (map_reduce_spark.ranking) — the whole
    table never passes through one task.
    """
    from map_reduce_spark.ranking import global_row_number

    c = load_table(spark, sf_dir, "customer")
    ranked = global_row_number(
        c,
        [F.col("c_mktsegment"), F.col("c_acctbal").desc(), F.col("c_custkey")],
        out="pos",
    )
    return ranked.select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("acctbal"),
        "pos",
    )


# ---------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------

_BUILDING = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_BIG_SPENDERS = (
    "SELECT DISTINCT c_custkey FROM customer JOIN orders ON c_custkey = o_custkey "
    "WHERE o_totalprice > 150000"
)


def _building(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )


def _big_spenders(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return c.join(o, c.c_custkey == o.o_custkey).select("c_custkey").distinct()


@register(
    "set_union",
    oracle=f"SELECT c_custkey FROM ({_BUILDING} UNION {_BIG_SPENDERS})",
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    return _building(spark, sf_dir).union(_big_spenders(spark, sf_dir)).distinct()


@register(
    "set_intersect",
    oracle=f"SELECT c_custkey FROM ({_BUILDING} INTERSECT {_BIG_SPENDERS})",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    return _building(spark, sf_dir).intersect(_big_spenders(spark, sf_dir))


@register(
    "set_except",
    oracle=f"SELECT c_custkey FROM ({_BUILDING} EXCEPT {_BIG_SPENDERS})",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): building-segment customers who never spent >150k."""
    return _building(spark, sf_dir).subtract(_big_spenders(spark, sf_dir))


@register(
    "union_by_name",
    oracle="""
SELECT kind, key, CAST(bal AS DOUBLE) AS bal FROM (
  SELECT 'customer' AS kind, c_custkey AS key, c_acctbal AS bal FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_suppkey AS key, s_acctbal AS bal FROM supplier
)
""",
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with name-based column alignment (unionByName)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_acctbal").cast("double").alias("bal"),
        F.col("s_suppkey").alias("key"),
        F.lit("supplier").alias("kind"),
    )
    return c.unionByName(s)


# --- classic TPC-H query shapes over the SQL entry point --------------
# These three run as literal SQL (spark.sql over registered views) so
# the engine's subquery machinery — EXISTS, IN + HAVING, outer join
# with compound ON — is exercised through the parser/analyzer, not just
# the DataFrame API. Catalyst rewrites EXISTS/IN to semi joins; the
# date filter pushes to the orders scan. (TPC-H Q4/Q13/Q18 shapes,
# adapted to the driver tables' columns.)


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: correlated EXISTS subquery, planned as a left-semi
    join with the date filter pushed to the orders scan."""
    from map_reduce_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= DATE '1996-01-01'
          AND o_orderdate < DATE '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey
) t
GROUP BY c_count
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: outer join with a compound ON predicate (the filter
    belongs to the JOIN, not a WHERE — moving it would change nulls),
    then a distribution over the per-customer counts (two shuffles:
    custkey, then count)."""
    from map_reduce_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_count, COUNT(*) AS custdist
        FROM (
          SELECT c_custkey, COUNT(o_orderkey) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderstatus <> 'F'
          GROUP BY c_custkey
        ) t
        GROUP BY c_count
        """
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT c_custkey, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey
                     HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: IN + GROUP BY + HAVING subquery (an aggregated semi
    join) feeding a three-way join and final rollup. Exact DECIMAL
    sums keep the HAVING threshold and output bit-identical across
    engines."""
    from map_reduce_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
        GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        """
    )


@register("agg_hll_sketch_union", oracle=None)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketches (Apache DataSketches, Spark 3.5+): build
    one sketch per nation, then UNION the sketches into a global
    distinct-customer estimate — the re-aggregatable rollup pattern for
    100 TB cardinalities (store per-partition sketch bytes, merge on
    demand; never re-scan raw keys). Register-maximum union is
    order-independent, so the estimate is deterministic for a given
    input set, but the sketch algorithm is engine-specific → rows-only;
    ``tests/test_sketches.py`` bounds the estimate against the exact
    distinct count.

    Scale shape: both levels are partial-agged (ObjectHashAggregate
    with partial_merge); only fixed-size sketch bytes cross the
    shuffle, never key sets.
    """
    c = load_table(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.count("*").alias("n"),
    )
    return per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias(
            "est_customers"
        ),
        F.sum("n").cast("long").alias("n_rows"),
        F.count("*").alias("n_groups"),
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT c_nationkey, COUNT(DISTINCT c_custkey) AS n_distinct
FROM customer GROUP BY 1
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable bitmaps
    (``bitmap_construct_agg``/``bitmap_count``, Spark 3.5+): values map
    to (bucket, bit position), per-bucket bitmaps OR together, and the
    final count is a bit-count sum. Unlike HLL this is exact, and
    unlike COUNT(DISTINCT) the partial state is a fixed-size bitmap per
    bucket rather than a hash set of raw values — the materialized-
    rollup pattern for exact distinct counts at 100 TB (store bitmaps
    per partition, OR-merge on demand; re-aggregatable across any
    dimension split). The oracle is plain COUNT(DISTINCT), proving
    exactness end-to-end.

    Scale shape: two partial-agged shuffles — (key, bucket) bitmaps,
    then per-key bit-count sums; raw values never cross the second
    shuffle.
    """
    c = load_table(spark, sf_dir, "customer")
    per_bucket = (
        c.select(
            "c_nationkey",
            F.expr("bitmap_bucket_number(c_custkey)").alias("bkt"),
            F.expr("bitmap_bit_position(c_custkey)").alias("pos"),
        )
        .groupBy("c_nationkey", "bkt")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bm"))
    )
    return per_bucket.groupBy("c_nationkey").agg(
        F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_distinct")
    )


@register(
    "listagg_funcs",
    oracle="""
SELECT c_mktsegment,
       string_agg(c_name, ',' ORDER BY c_custkey) AS names,
       COUNT(*) AS n
FROM customer WHERE c_custkey <= 120 GROUP BY 1
""",
)
def listagg_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (``LISTAGG ... WITHIN GROUP``,
    Spark 4.0+ SQL:2016 surface). Deterministic because the WITHIN
    GROUP order is a total order (unique c_custkey — NOTES rule 5).

    Scale note: LISTAGG materializes each group's concatenation in a
    single aggregation buffer — right for bounded groups (report
    labels, id lists), wrong for unbounded ones; the input here is
    deliberately capped the way a production use would bound it.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") <= 120)
    return c.groupBy("c_mktsegment").agg(
        F.expr(
            "listagg(c_name, ',') WITHIN GROUP (ORDER BY c_custkey)"
        ).alias("names"),
        F.count("*").alias("n"),
    )


@register("agg_theta_sketch_setops", oracle=None)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Apache DataSketches, Spark 4.1+): the sketch
    family that supports set ALGEBRA — union AND intersection — over
    mergeable per-group state. Estimates the customer populations that
    ordered under every order status vs any status, without ever
    materializing the underlying sets. Engine-specific sketch bytes →
    rows-only; ``tests/test_sketches.py`` bounds both estimates against
    the exact set sizes.

    Scale shape: one partial-agged shuffle to per-status sketches
    (fixed-size state), then a 3-row merge — raw keys never leave the
    first aggregation.
    """
    o = load_table(spark, sf_dir, "orders")
    sk = o.groupBy("o_orderstatus").agg(
        F.expr("theta_sketch_agg(o_custkey)").alias("sk")
    )
    return sk.agg(
        F.expr("theta_sketch_estimate(theta_union_agg(sk))")
        .cast("long")
        .alias("union_est"),
        F.expr("theta_sketch_estimate(theta_intersection_agg(sk))")
        .cast("long")
        .alias("inter_est"),
        F.count("*").alias("n_groups"),
    )
