"""Checklist completions: right / full-outer joins, map-typed scalar
functions, and a Python UDTF — the remaining SURVEY.md §2.2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register


@register(
    "join_right",
    oracle="""
SELECT n_name AS nation, COUNT(s_suppkey) AS n_suppliers
FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
""",
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join: every nation, with or without suppliers."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "join_full_outer",
    oracle="""
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COUNT(DISTINCT c.c_custkey) AS n_cust,
       COUNT(DISTINCT s.s_suppkey) AS n_supp
FROM customer c FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
GROUP BY COALESCE(c.c_nationkey, s.s_nationkey)
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations appearing on either side survive."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
        .groupBy(
            F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey")
        )
        .agg(
            F.countDistinct("c_custkey").alias("n_cust"),
            F.countDistinct("s_suppkey").alias("n_supp"),
        )
    )


@register(
    "map_funcs",
    oracle="""
SELECT event_id,
       event_type AS k_type,
       value AS v_value,
       2 AS n_keys
FROM events
""",
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns: build a map from columns, read it back via
    key access / map_keys (the map stays internal — output is plain
    columns so the oracle stays engine-neutral)."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type").cast("string"),
        F.lit("value"), F.col("value").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("k_type"),
        F.element_at(m, "value").cast("double").alias("v_value"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@register(
    "python_udtf",
    oracle="""
SELECT doc_id,
       unnest(string_split(text, ' ')) AS token,
       length(unnest(string_split(text, ' '))) AS token_len
FROM documents WHERE doc_id < 50
""",
)
def python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input row fans out to one row
    per token — the reference's mapper shape (flatMap UDF,
    word_count.ex:3-8) as a first-class SQL table function.

    The UDTF class is self-contained (no module references) so workers
    need no repo import path. Bounded to 50 docs: row-at-a-time Python
    is the demo path; the production tokenizer is the built-in
    explode(split()) in operators.wordcount.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, token string, token_len int")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for tok in text.split(" "):
                yield doc_id, tok, len(tok)

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    # lateral-join form: apply the UDTF per input row via SQL
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        "SELECT t.doc_id, t.token, t.token_len "
        "FROM udtf_docs, LATERAL tokenize_udtf(doc_id, text) t"
    )


@register(
    "udtf_table_polymorphic",
    oracle="""
SELECT 'c_nationkey' AS col_name, COUNT(*) AS n,
       CAST(SUM(CAST(c_nationkey AS DECIMAL(18,2))) AS DOUBLE) AS s
FROM customer
UNION ALL
SELECT 'c_acctbal', COUNT(*),
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
FROM customer
""",
)
def udtf_table_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4): the ``analyze()`` static
    method computes the OUTPUT schema at plan time from the TABLE
    argument — the table-function contract the reference's generic
    ``mapper/2`` hints at (mr_sequential.ex:10) but can't type. Here:
    a generic numeric unpivoter applied via
    ``FROM udtf(TABLE(SELECT ...))``, aggregated with the exact-decimal
    convention so the double sum is order-independent.

    Scale note: UDTF rows stream through Arrow batches partition-
    parallel; the demo keys off c_custkey, the aggregation is partial-
    agged on the tiny col_name key.
    """
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class UnpivotNumerics:
        @staticmethod
        def analyze(t: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(
                StructType(
                    [
                        StructField("row_key", LongType()),
                        StructField("col_name", StringType()),
                        StructField("value", DoubleType()),
                    ]
                )
            )

        def eval(self, row):
            d = row.asDict()
            key = d.get("c_custkey")
            for name, v in d.items():
                if name != "c_custkey" and isinstance(v, (int, float)):
                    yield (key, name, float(v))

    spark.udtf.register("unpivot_numerics", udtf(UnpivotNumerics))
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("udtf_cust_src")
    return spark.sql(
        """
        SELECT col_name, COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s
        FROM unpivot_numerics(TABLE(
            SELECT c_custkey, c_nationkey, c_acctbal FROM udtf_cust_src))
        GROUP BY col_name
        """
    )
