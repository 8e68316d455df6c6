"""Text-analysis operators — LLM-data-pipeline quality/stats family.

Language-ID (stopword-hit heuristic), quality scoring, token counting,
document fingerprinting, per-source corpus stats. All built-in string/
regex expressions (JVM-side); every query below is DuckDB-expressible,
so each is a full oracle check.

Scale notes: all of these are embarrassingly parallel per-row
projections plus (at most) one partial-aggregated groupBy — the shapes
that saturate scan bandwidth at 100 TB rather than shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register

# stopword profiles for the lang-id heuristic (tiny on purpose: the
# point is the operator shape — per-row token-set intersection against
# broadcast profiles — not linguistic accuracy)
_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}


def _sql_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in _PROFILES[lang])
    return f"len(list_intersect(string_split(lower(text), ' '), [{words}]))"


# SQL form of the argmax-with-fixed-tie-order prediction; shared with
# the end-to-end pipeline oracle (map_reduce_spark.pipelines)
PRED_LANG_SQL = f"""CASE
         WHEN {_sql_hits('en')} >= {_sql_hits('es')}
          AND {_sql_hits('en')} >= {_sql_hits('de')}
          AND {_sql_hits('en')} >= {_sql_hits('fr')} THEN 'en'
         WHEN {_sql_hits('es')} >= {_sql_hits('de')}
          AND {_sql_hits('es')} >= {_sql_hits('fr')} THEN 'es'
         WHEN {_sql_hits('de')} >= {_sql_hits('fr')} THEN 'de'
         ELSE 'fr'
       END"""


@register(
    "lang_id",
    oracle=f"""
SELECT doc_id, lang, {PRED_LANG_SQL} AS pred_lang
FROM documents
""",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: argmax of stopword-profile hits, with a
    fixed tie order (en > es > de > fr) so the result is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")

    def hits(lang: str):
        prof = F.array(*[F.lit(w) for w in _PROFILES[lang]])
        return F.size(F.array_intersect(toks, prof))

    en, es, de, fr = hits("en"), hits("es"), hits("de"), hits("fr")
    pred = (
        F.when((en >= es) & (en >= de) & (en >= fr), "en")
        .when((es >= de) & (es >= fr), "es")
        .when(de >= fr, "de")
        .otherwise("fr")
    )
    return docs.select("doc_id", "lang", pred.alias("pred_lang"))


@register(
    "token_count",
    oracle="""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       length(text) AS n_chars_actual,
       len(list_distinct(string_split(text, ' '))) AS n_unique_tokens,
       round(length(text) * 1.0 / greatest(len(string_split(text, ' ')), 1), 6) AS chars_per_token
FROM documents
""",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, unique tokens, chars/token."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_actual"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.round(
            F.length("text") / F.greatest(F.size(toks), F.lit(1)), 6
        ).alias("chars_per_token"),
    )


@register(
    "text_quality",
    oracle="""
SELECT doc_id,
       length(text) AS n_chars_actual,
       length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_non_alpha,
       round((length(text) - length(regexp_replace(text, '[^a-zA-Z]', '', 'g')))
             * 1.0 / greatest(length(text), 1), 6) AS non_alpha_ratio,
       len(list_intersect(string_split(lower(text), ' '),
           ['the','and','of','to','a','in','is','it'])) AS stopword_kinds,
       CASE WHEN length(text) >= 200
             AND len(string_split(text, ' ')) >= 30 THEN 'keep'
            ELSE 'filter' END AS quality_verdict
FROM documents
""",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: alpha ratio, stopword coverage, length gates —
    the keep/filter verdict shape of a pretraining quality filter."""
    docs = load_table(spark, sf_dir, "documents")
    alpha_only = F.regexp_replace("text", "[^a-zA-Z]", "")
    non_alpha = F.length("text") - F.length(alpha_only)
    stop = F.array(*[F.lit(w) for w in _PROFILES["en"]])
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars_actual"),
        non_alpha.cast("long").alias("n_non_alpha"),
        F.round(non_alpha / F.greatest(F.length("text"), F.lit(1)), 6).alias(
            "non_alpha_ratio"
        ),
        F.size(F.array_intersect(F.split(F.lower("text"), " "), stop)).alias(
            "stopword_kinds"
        ),
        F.when(
            (F.length("text") >= 200) & (F.size(F.split("text", " ")) >= 30), "keep"
        )
        .otherwise("filter")
        .alias("quality_verdict"),
    )


@register(
    "doc_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(trim(text))) AS fp,
       CAST(concat('0x', substr(md5(lower(trim(text))), 1, 8)) AS BIGINT) AS fp_bucket
FROM documents
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized content fingerprint (md5 of lower+trim) + a 32-bit
    routing bucket — the portable-hash dedup/shard key."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("fp"),
        F.conv(F.substring(F.md5(norm), 1, 8), 16, 10).cast("long").alias("fp_bucket"),
    )


_BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


@register(
    "bpe_token_count",
    oracle=f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe_tokens,
       len(list_distinct(regexp_extract_all(text, '{_BPE_PATTERN}'))) AS n_unique_bpe,
       round(len(regexp_extract_all(text, '{_BPE_PATTERN}')) * 1.0
             / greatest(length(text), 1), 6) AS tokens_per_char
FROM documents
""",
)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokenizer: letter runs / digit runs / single symbols —
    the GPT-2-style pre-tokenization shape, counted per document.
    Pure regexp_extract_all (JVM regex == DuckDB RE2 on this ASCII
    pattern), no Python."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN}', 0)")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_bpe"),
        F.round(F.size(toks) / F.greatest(F.length("text"), F.lit(1)), 6).alias(
            "tokens_per_char"
        ),
    )


@register(
    "pack_sequences",
    oracle="""
WITH toks AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS UNBOUNDED PRECEDING) AS running
  FROM toks
)
SELECT doc_id, source, n_tokens,
       CAST(ceil(running * 1.0 / 512) - 1 AS BIGINT) AS pack_id
FROM cum
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs
    (budget 512) within each source shard, by running token count.

    The packing rule is ceil(cumulative/budget)-1 over a deterministic
    doc order — declarative (one window over the shard key), so the
    oracle reproduces it. A document belongs to the pack containing its
    FINAL token, so a pack may exceed the budget by at most one
    straddling document's length (the streaming-friendly variant of
    bin packing — no lookahead, one pass). This is the training-batch
    assembly step of an LLM data pipeline, shuffling only on the shard
    key.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return toks.withColumn("running", F.sum("n_tokens").over(w)).select(
        "doc_id",
        "source",
        "n_tokens",
        (F.ceil(F.col("running") / 512) - 1).cast("long").alias("pack_id"),
    )


@register(
    "text_stats_by_source",
    oracle="""
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents GROUP BY source, lang
""",
)
def text_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus statistics rollup per (source, lang)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "tokenize_to_ids",
    oracle="""
WITH base AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
toks AS (
  SELECT doc_id, u.s.pos AS pos, u.s.tok AS tok
  FROM base, UNNEST([{'pos': i, 'tok': w[i]} FOR i IN range(1, len(w)+1)]) AS u(s)
),
counts AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
vocab AS (
  SELECT tok, ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS token_id
  FROM counts QUALIFY token_id <= 1000
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.token_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       CAST(SUM(COALESCE(v.token_id, 0) * t.pos) AS BIGINT) AS ids_checksum
FROM toks t LEFT JOIN vocab v USING (tok)
GROUP BY doc_id
""",
)
def tokenize_to_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary application — the tokenization-to-ids step of a
    training pipeline: build the top-1000 vocabulary (count desc, token
    asc — deterministic), broadcast it, and map every positional token
    to its id (OOV -> 0 in the checksum, counted separately).

    The id sequence itself stays internal (arrays don't hash in row
    canonicalizers); the position-weighted checksum pins every (pos,
    id) pair exactly, so a single transposition changes the output.

    Scale shape: the vocab is derived with the scale-safe global rank
    (no single-partition window), is tiny by construction, and is
    BROADCAST to the token stream — the corpus-wide explode never
    shuffles for the lookup; the only row shuffle is the final groupBy
    doc_id, which the posexplode preserves from the upstream
    repartition.
    """
    from map_reduce_spark.io import parallelize_if_narrow
    from map_reduce_spark.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    toks = parallelize_if_narrow(docs, "doc_id").select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    vocab = global_row_number(
        counts, [F.col("cnt").desc(), F.col("tok")], out="token_id"
    ).filter(F.col("token_id") <= 1000)
    joined = toks.join(F.broadcast(vocab.select("tok", "token_id")), "tok", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(
            F.when(F.col("token_id").isNull(), 1).otherwise(0)
        ).cast("long").alias("n_oov"),
        F.sum(F.coalesce("token_id", F.lit(0)) * (F.col("pos") + 1))
        .cast("long")
        .alias("ids_checksum"),
    )


# --- document chunking (RAG / context-window prep) --------------------

# word-window chunking: 64-word chunks, 16-word overlap (stride 48) —
# the standard fixed-window + overlap splitter used for both RAG
# indexing and long-document training prep
_CHUNK_W = 64
_CHUNK_OV = 16
_CHUNK_STRIDE = _CHUNK_W - _CHUNK_OV


@register(
    "doc_chunking",
    oracle=f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), n AS (
  SELECT doc_id, ws,
         CAST(ceil(greatest(len(ws) - {_CHUNK_OV}, 1) / {_CHUNK_STRIDE}.0)
              AS BIGINT) AS nch
  FROM w
), e AS (
  SELECT doc_id, ws, unnest(range(0, nch)) AS chunk_id FROM n
)
SELECT doc_id, chunk_id,
       chunk_id * {_CHUNK_STRIDE} AS start_word,
       len(ws[chunk_id * {_CHUNK_STRIDE} + 1 : chunk_id * {_CHUNK_STRIDE} + {_CHUNK_W}])
         AS n_words,
       md5(array_to_string(
             ws[chunk_id * {_CHUNK_STRIDE} + 1 : chunk_id * {_CHUNK_STRIDE} + {_CHUNK_W}],
             ' ')) AS chunk_md5
FROM e
""",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping fixed-size word windows (64
    words, stride 48) — the chunking stage of a RAG index build or a
    long-document training-data pipeline.

    Emits one row per (doc, chunk) with the chunk's word span and an
    md5 content fingerprint (the downstream join key for chunk-level
    dedup / embedding without shipping chunk text through the shuffle).

    Scale shape: per-row sequence+explode — narrow, no shuffle at all;
    chunk count scales with corpus length, and each output row is a
    fixed ~50 bytes regardless of chunk size.
    """
    docs = load_table(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    nch = F.ceil(
        F.greatest(F.size(ws) - _CHUNK_OV, F.lit(1)) / F.lit(float(_CHUNK_STRIDE))
    ).cast("long")
    chunk_words = F.slice(
        F.col("ws"), F.col("chunk_id") * _CHUNK_STRIDE + 1, _CHUNK_W
    )
    return (
        docs.select(
            "doc_id",
            ws.alias("ws"),
            F.explode(F.sequence(F.lit(0).cast("long"), nch - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            (F.col("chunk_id") * _CHUNK_STRIDE).alias("start_word"),
            F.size(chunk_words).cast("long").alias("n_words"),
            F.md5(F.concat_ws(" ", chunk_words)).alias("chunk_md5"),
        )
    )
