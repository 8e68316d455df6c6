"""Pandas-UDF operator family: the sanctioned Python escape hatch.

The reference's UDF surface is the mapper/reducer module contract
(mr_sequential.ex:10,25), preserved RDD-side in
map_reduce_spark.mapreduce. THIS module is the DataFrame-native UDF
inventory: scalar Pandas UDF, grouped-map (``applyInPandas``), and
grouped-aggregate Pandas UDF — each Arrow-batched, never row-at-a-time.

Every worker function is self-contained (imports inside, no module
globals) so cloudpickle ships it by value and workers need no repo on
their import path.

Scale notes: Pandas UDFs move columnar Arrow batches across the
JVM↔Python boundary — the only acceptable Python path at 100 TB. The
grouped-map shuffle is on the group key; group size, not table size,
bounds worker memory.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register


@register(
    "pandas_scalar_norm",
    oracle="""
SELECT vec_id,
       round(sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
                            FOR i IN range(1, len(embedding) + 1)])), 4) AS l2_norm
FROM embeddings
""",
)
def pandas_scalar_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF: vectorized L2 norm of the embedding column.

    (The pure-SQL twin lives in scalar_funcs.array_funcs; this is the
    same math through the Arrow batch path, rounded to absorb summation
    -order float jitter between numpy and sequential fold.)
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def l2(v: pd.Series) -> pd.Series:
        import numpy as np

        return v.map(lambda x: float(np.sqrt(np.sum(np.asarray(x, dtype="float64") ** 2))))

    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.round(l2("embedding"), 4).alias("l2_norm"))


@register(
    "pandas_zscore_by_label",
    oracle="""
SELECT vec_id, label,
       round((CAST(embedding[1] AS DOUBLE)
              - avg(CAST(embedding[1] AS DOUBLE)) OVER (PARTITION BY label))
             / stddev_samp(CAST(embedding[1] AS DOUBLE)) OVER (PARTITION BY label),
             4) AS z
FROM embeddings
""",
)
def pandas_zscore_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): z-score of the first
    embedding component within each label group.

    The oracle is the equivalent SQL window computation — checking that
    the Python group function agrees with the declarative plan.
    """
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.element_at("embedding", 1).cast("double").alias("x")
    )

    def zscore(pdf):
        import pandas as pd  # noqa: F401

        mu = pdf["x"].mean()
        sd = pdf["x"].std(ddof=1)
        out = pdf[["vec_id", "label"]].copy()
        out["z"] = ((pdf["x"] - mu) / sd).round(4)
        return out

    return e.groupBy("label").applyInPandas(zscore, schema="vec_id long, label int, z double")


@register(
    "pandas_grouped_agg",
    oracle="""
SELECT c_mktsegment,
       round(avg(c_acctbal), 4) AS mean_bal,
       round(stddev_samp(c_acctbal), 4) AS sd_bal
FROM customer GROUP BY c_mktsegment
""",
)
def pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDFs (vectorized UDAFs): mean and
    sample-stddev of account balance per market segment."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mean_udaf(s: pd.Series) -> float:
        return float(s.mean())

    @pandas_udf("double")
    def sd_udaf(s: pd.Series) -> float:
        return float(s.std(ddof=1))

    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(mean_udaf("c_acctbal"), 4).alias("mean_bal"),
        F.round(sd_udaf("c_acctbal"), 4).alias("sd_bal"),
    )


@register(
    "arrow_map_stats",
    oracle="""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_utf8,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
FROM documents
""",
)
def arrow_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy Arrow batch path — one level below
    Pandas UDFs (no pandas conversion at all; ``pyarrow.compute``
    kernels straight on the Arrow RecordBatch). The right tool when the
    Python-side logic is itself vectorized columnar work, e.g. handing
    batches to tokenizers/codecs that speak Arrow natively.

    Computes per-doc code-point length and whitespace word count with
    Arrow kernels; fully DuckDB-oracled since the kernels are exact.

    Scale shape: embarrassingly parallel batch map, Arrow-serialized
    both ways, no shuffle; batch size is bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``.
    """

    def stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            words = pc.split_pattern(text, " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                    pc.cast(pc.list_value_length(words), pa.int64()),
                ],
                ["doc_id", "n_chars_utf8", "n_words"],
            )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        stats, "doc_id long, n_chars_utf8 long, n_words long"
    )
