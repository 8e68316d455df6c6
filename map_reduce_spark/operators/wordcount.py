"""The reference's own operator inventory (SURVEY.md §2.1, keys #1-#11).

The reference computes one dataflow: scan dir → whole-file read → tokenize
on ``[^a-zA-Z]`` → drop empty tokens → uppercase+pair-with-1 → sort →
hash-partition → group-by-key → count → text sink
(/root/reference/lib/mr_apps/word_count.ex:3-13, lib/mr_sequential.ex:3-28,
lib/map_reduce/worker.ex:104-150). Here each step is a Catalyst-optimized
DataFrame operator over the ``documents`` table (``text`` ≈ file content,
``source`` ≈ filename), plus the composed flagship pipeline.

Scale notes (100 TB posture): everything below is a narrow projection +
explode + hash aggregation. The explode blows up row count ~text-length×,
so partial aggregation (map-side combine, automatic in HashAggregateExec)
does the heavy lifting before the shuffle; the only shuffle is on the
(word) or (source, word) grouping key. No driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register

# Tokenizer contract: split on [^a-zA-Z]; digits/punct/apostrophes are
# separators ("don't" -> "DON", "T") — word_count.ex:5.
TOKEN_SEP = "[^a-zA-Z]"


def tokens(spark: SparkSession, sf_dir: str, keep_empty: bool = False) -> DataFrame:
    """doc-id-tagged token stream: explode(split(text, sep))."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.col("source"),
        F.explode(F.split("text", TOKEN_SEP)).alias("token"),
    )
    if not keep_empty:
        tok = tok.filter(F.col("token") != "")
    return tok


def words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uppercased non-empty tokens (the mapper's emit keys)."""
    return tokens(spark, sf_dir).select(
        "doc_id", "source", F.upper("token").alias("word")
    )


# 1 ------------------------------------------------------------------
@register(
    "scan_dir",
    oracle="SELECT DISTINCT source AS filename FROM documents",
)
def scan_dir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory scan: each distinct source is one input split.

    Reference: File.ls!("priv/resources") — master.ex:112-115.
    """
    return load_table(spark, sf_dir, "documents").select(
        F.col("source").alias("filename")
    ).distinct()


# 2 ------------------------------------------------------------------
@register(
    "scan_file",
    oracle="SELECT doc_id, source AS filename, text AS content FROM documents",
)
def scan_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file read: (filename, content) pairs.

    Reference: File.read!(loc) per map task — worker.ex:106-108.
    """
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("source").alias("filename"), F.col("text").alias("content")
    )


# 3 ------------------------------------------------------------------
@register(
    "tokenize",
    oracle=(
        "SELECT doc_id, unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS token "
        "FROM documents"
    ),
)
def tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizing flatMap: split content on [^a-zA-Z], empties included.

    Reference: String.split(content, ~r{[^a-zA-Z]}) — word_count.ex:5.
    """
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", TOKEN_SEP)).alias("token")
    )


# 4 ------------------------------------------------------------------
@register(
    "filter_empty",
    oracle=(
        "SELECT doc_id, token FROM (SELECT doc_id, "
        "unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS token FROM documents) "
        "WHERE token <> ''"
    ),
)
def filter_empty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate filter dropping empty tokens.

    Reference: Enum.filter(fn w -> w != "" end) — word_count.ex:6.
    """
    return tokenize(spark, sf_dir).filter(F.col("token") != "")


# 5 ------------------------------------------------------------------
@register(
    "upper_map",
    oracle=(
        "SELECT doc_id, upper(token) AS word, 1 AS one FROM (SELECT doc_id, "
        "unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS token FROM documents) "
        "WHERE token <> ''"
    ),
)
def upper_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar projection: uppercase each word, pair with literal 1.

    Reference: {String.upcase(word), 1} — word_count.ex:7.
    """
    return filter_empty(spark, sf_dir).select(
        "doc_id", F.upper("token").alias("word"), F.lit(1).alias("one")
    )


# 6 ------------------------------------------------------------------
@register(
    "sort_by_key",
    oracle=(
        "SELECT word, row_number() OVER (ORDER BY word) AS rnk FROM ("
        "SELECT DISTINCT upper(token) AS word FROM (SELECT "
        "unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS token FROM documents) "
        "WHERE token <> '')"
    ),
)
def sort_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total sort by key, rank materialized so the order is observable.

    Reference: Enum.sort() of the emit list — worker.ex:112,
    mr_sequential.ex:12. Scale shape: range-partitioned sort +
    per-partition row_number + broadcast offsets (see
    map_reduce_spark.ranking) — no single-task global window.
    """
    from map_reduce_spark.ranking import global_row_number

    distinct_words = words(spark, sf_dir).select("word").distinct()
    return global_row_number(distinct_words, [F.col("word")], out="rnk").select(
        "word", "rnk"
    )


# 7 ------------------------------------------------------------------
# Portable hash so the DuckDB oracle can replicate the routing: first 8
# hex chars of md5, mod R=8 (reference routes with phash2(key) mod
# n_workers — worker.ex:144, R from config.exs:10; the CONSTANT matters,
# not the hash function, which is engine-private in both systems).
_PARTITION_ORACLE = (
    "SELECT CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) % 8 AS partition_id, "
    "count(*) AS n_keys, count(DISTINCT word) AS n_distinct FROM ("
    "SELECT upper(token) AS word FROM (SELECT "
    "unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS token FROM documents) "
    "WHERE token <> '') GROUP BY 1"
)


@register("hash_partition", oracle=_PARTITION_ORACLE)
def hash_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash partitioner: route each key to partition md5(word) mod 8.

    Reference: rem(:erlang.phash2(key), n_workers) routing each emit to an
    intermediate file — worker.ex:142-150. In Spark the shuffle does this
    natively (``repartition(8, "word")``); here the routing is also
    materialized as a column so the oracle can verify the distribution.
    """
    w = words(spark, sf_dir).select("word")
    routed = w.withColumn(
        "partition_id",
        (F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long") % 8),
    )
    # Physically co-locate by the routing key (the shuffle the reference
    # implements by hand with intermediate files).
    routed = routed.repartition(8, "partition_id")
    return routed.groupBy("partition_id").agg(
        F.count("*").alias("n_keys"),
        F.countDistinct("word").alias("n_distinct"),
    )


# 8 ------------------------------------------------------------------
@register(
    "group_by_key",
    oracle=(
        "SELECT source, upper(token) AS word, count(*) AS cnt FROM (SELECT source, "
        "unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS token FROM documents) "
        "WHERE token <> '' GROUP BY source, word"
    ),
)
def group_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by-key at the distributed path's granularity: per input file.

    Reference: chunk_by over each sorted intermediate file — worker.ex:130;
    the distributed path aggregates per (input file, partition)
    (worker.ex:116-140), i.e. per-source counts here.
    """
    return words(spark, sf_dir).groupBy("source", "word").agg(
        F.count("*").alias("cnt")
    )


# 9 ------------------------------------------------------------------
_COUNT_ORACLE = (
    "SELECT upper(token) AS word, count(*) AS cnt FROM (SELECT "
    "unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS token FROM documents) "
    "WHERE token <> '' GROUP BY 1"
)


@register("count_reduce", oracle=_COUNT_ORACLE)
def count_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-per-key reduce, global granularity (the sequential oracle's).

    Reference: reducer(_key, values) = Enum.count(values) —
    word_count.ex:10-13; global grouping per mr_sequential.ex:12-13.
    Spark plans partial (map-side) + final hash aggregation — the map-side
    combine the reference lacks (it shuffles every {word,1} line).
    """
    return words(spark, sf_dir).groupBy("word").agg(F.count("*").alias("cnt"))


# 10 -----------------------------------------------------------------
@register(
    "sink_text",
    oracle=f"SELECT word || ' ' || CAST(cnt AS VARCHAR) AS line FROM ({_COUNT_ORACLE})",
)
def sink_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-sink formatting: one "KEY count" line per key.

    Reference: IO.write(io, "#{key} #{count}\\n") — worker.ex:137,
    mr_sequential.ex:26. The write itself is DataFrameWriter.text
    (io.write_text_lines); the formatted projection is what's checkable.
    """
    return count_reduce(spark, sf_dir).select(
        F.concat_ws(" ", F.col("word"), F.col("cnt").cast("string")).alias("line")
    )


# 11 -----------------------------------------------------------------
@register(
    "mr_pipeline",
    oracle=f"SELECT word, cnt FROM ({_COUNT_ORACLE}) ORDER BY word",
)
def mr_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed flagship job: the reference's entire dataflow.

    scan → tokenize → filter → upper → group → count → sort
    (mr_sequential.ex:3-28). One narrow scan (only ``text`` is read —
    column pruning reaches the parquet footer), one shuffle (on word),
    partial aggregation before it, then a cheap global sort of ~19k keys.
    """
    return count_reduce(spark, sf_dir).orderBy("word")
