"""Training-data pipeline operators — splits, sampling, scrubbing,
normalization, quantization, skew-safe aggregation.

Not in the reference (its only job is word count, SURVEY §0); these are
the remaining first-class operations a 100 TB pretraining-data pipeline
runs between raw scans and training batches:

- deterministic hash splits (train/val/test must be stable across
  re-runs and machines — never ``rand()``);
- stratified per-source sampling (domain mixing) with the same
  portable-hash trick;
- PII scrubbing (email/phone/IP redaction) as pure JVM regex;
- text normalization (the canonicalization step before fingerprinting);
- int8 embedding quantization (4x memory cut for ANN serving);
- two-phase salted aggregation (the skew-safe shape for hot keys).

Scale notes: every operator here is a per-row projection or a
partial-agg'd groupBy — no joins except the salted demo, whose entire
point is that its shuffle keys are (key, salt). All expressions are
built-ins (JVM-side, codegen'd); every query has a full DuckDB oracle.

Cross-engine determinism: hash buckets come from md5 hex (identical in
both engines), never engine-specific hashes; quantization math is pure
IEEE-double ops (cast-double, abs, max, /, floor) that both engines
evaluate bit-identically, and ties round via ``floor(x + 0.5)`` so no
engine-specific round-half mode is involved.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from map_reduce_spark.io import load_table, parallelize_if_narrow
from map_reduce_spark.registry import register

# --- deterministic hash split ----------------------------------------


def _hash_bucket(col: Column, seed: str, mod: int = 100) -> Column:
    """Portable 0..mod-1 bucket: first 8 md5 hex chars of seed:key,
    read as an integer. Stable across engines, machines, and re-runs —
    the property ``rand()``-based splits lack."""
    h = F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % mod).cast("int")


def _sql_bucket(expr: str, seed: str, mod: int = 100) -> str:
    return (
        f"CAST(CAST(concat('0x', substr(md5(concat('{seed}:', "
        f"CAST({expr} AS VARCHAR))), 1, 8)) AS BIGINT) % {mod} AS INT)"
    )


@register(
    "split_train_val_test",
    oracle=f"""
SELECT doc_id, source,
       {_sql_bucket('doc_id', 'split')} AS bucket,
       CASE WHEN {_sql_bucket('doc_id', 'split')} < 80 THEN 'train'
            WHEN {_sql_bucket('doc_id', 'split')} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by deterministic content-key
    hash. Embarrassingly parallel, no shuffle; the split is a pure
    function of doc_id, so adding data never reshuffles old rows
    between splits."""
    docs = load_table(spark, sf_dir, "documents")
    b = _hash_bucket(F.col("doc_id"), "split")
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test")
    )
    return docs.select(
        "doc_id", "source", b.alias("bucket"), split.alias("split")
    )


@register(
    "stratified_sample",
    oracle=f"""
SELECT doc_id, source,
       CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 20 ELSE 60 END
         AS rate_pct
FROM documents
WHERE {_sql_bucket('doc_id', 'samp')}
      < CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 20 ELSE 60 END
""",
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source stratified sampling (domain mixing): even-numbered
    sources keep 20%, odd keep 60%, selected by a deterministic hash
    bucket — reproducible across runs, engines, and cluster sizes,
    unlike ``df.sampleBy`` (seed- and partitioning-dependent).

    The filter is a scan-level predicate: at 100 TB the sample never
    shuffles, and with source-partitioned storage the per-source rates
    prune at the file level."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.when(
        F.substring("source", 4, 8).cast("int") % 2 == 0, F.lit(20)
    ).otherwise(F.lit(60))
    return (
        docs.withColumn("rate_pct", rate)
        .filter(_hash_bucket(F.col("doc_id"), "samp") < F.col("rate_pct"))
        .select("doc_id", "source", "rate_pct")
    )


# --- PII scrubbing ----------------------------------------------------

_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PHONE = "\\d{3}-\\d{3}-\\d{4}"
_IP = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

# The synthetic corpus carries no PII, so both engines inject
# deterministic markers first — the redaction is then exercised on
# every 5th/7th/11th document and verified by md5 of the scrubbed text.
_AUG_SQL = """concat(text,
  CASE WHEN doc_id % 7 = 0
       THEN concat(' reach me at user', CAST(doc_id AS VARCHAR), '@example.com')
       ELSE '' END,
  CASE WHEN doc_id % 5 = 0 THEN ' call 415-555-0142' ELSE '' END,
  CASE WHEN doc_id % 11 = 0
       THEN concat(' host 10.0.', CAST(doc_id % 200 AS VARCHAR), '.1')
       ELSE '' END)"""


@register(
    "pii_scrub",
    oracle=f"""
WITH aug AS (SELECT doc_id, {_AUG_SQL} AS t FROM documents),
scrub AS (
  SELECT doc_id, t,
         regexp_replace(regexp_replace(regexp_replace(t,
             '{_EMAIL}', '<EMAIL>', 'g'),
             '{_PHONE}', '<PHONE>', 'g'),
             '{_IP}', '<IP>', 'g') AS clean
  FROM aug
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_EMAIL}')) AS n_emails,
       len(regexp_extract_all(t, '{_PHONE}')) AS n_phones,
       len(regexp_extract_all(t, '{_IP}')) AS n_ips,
       length(clean) AS clean_len,
       md5(clean) AS clean_md5
FROM scrub
""",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: emails, phone numbers, and IPv4 addresses are
    replaced by typed placeholders; per-document match counts and the
    md5 of the scrubbed text prove byte-exact redaction. Pure JVM
    regex per row — saturates scan bandwidth, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" reach me at user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com"),
            ),
        ).otherwise(""),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" call 415-555-0142")).otherwise(""),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" host 10.0."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".1"),
            ),
        ).otherwise(""),
    )
    t = docs.select("doc_id", aug.alias("t"))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("t"), _EMAIL, "<EMAIL>"), _PHONE, "<PHONE>"
        ),
        _IP,
        "<IP>",
    )
    return t.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE), F.lit(0))).alias("n_phones"),
        F.size(F.regexp_extract_all("t", F.lit(_IP), F.lit(0))).alias("n_ips"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


# --- text normalization ----------------------------------------------


@register(
    "text_normalize",
    oracle="""
WITH n AS (
  SELECT doc_id, length(text) AS original_len,
         trim(regexp_replace(regexp_replace(lower(text), '[^ -~]', '', 'g'),
                             ' +', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, original_len, length(norm) AS norm_len, md5(norm) AS norm_md5
FROM n
""",
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonicalization before fingerprinting: lowercase, strip
    non-printable/non-ASCII, collapse runs of spaces, trim. The md5 of
    the normalized text is the cross-engine witness that both engines
    produced identical bytes."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower("text"), "[^ -~]", ""), " +", " "
        )
    )
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("original_len"),
        F.length(norm).cast("long").alias("norm_len"),
        F.md5(norm).alias("norm_md5"),
    )


# --- int8 embedding quantization -------------------------------------


@register(
    "embedding_quantize",
    oracle="""
WITH s AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vd,
         greatest(list_max(list_transform(embedding,
                  x -> abs(CAST(x AS DOUBLE)))), 1e-30) / 127.0 AS scale
  FROM embeddings
),
q AS (
  SELECT vec_id, scale,
         list_transform(vd, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
  FROM s
)
SELECT vec_id, round(scale, 6) AS scale,
       CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
       CAST(list_min(qv) AS BIGINT) AS q_min,
       CAST(list_max(qv) AS BIGINT) AS q_max,
       len(list_filter(qv, x -> abs(x) >= 127)) AS n_sat
FROM q
""",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector (scale = max|x| / 127) —
    the 4x memory cut an ANN serving tier takes before indexing.

    The quantized array itself stays internal (row canonicalizers
    can't hash arrays — the agg_approx_distinct lesson); the emitted
    witnesses (sum, min, max, saturation count) pin every element
    exactly. Math is IEEE-double only, ties via floor(x + 0.5), so the
    DuckDB oracle reproduces it bit-for-bit."""
    e = load_table(spark, sf_dir, "embeddings")
    vd = F.transform("embedding", lambda x: x.cast("double"))
    mx = F.array_max(F.transform(vd, lambda x: F.abs(x)))
    scale = F.greatest(mx, F.lit(1e-30)) / F.lit(127.0)
    q = F.transform(vd, lambda x: F.floor(x / scale + F.lit(0.5)).cast("long"))
    return e.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.array_min(q).alias("q_min"),
        F.array_max(q).alias("q_max"),
        F.size(F.filter(q, lambda x: F.abs(x) >= 127)).alias("n_sat"),
    )


# --- two-phase salted aggregation (skew-safe shape) -------------------

_AGG_SALT = 16


@register(
    "skew_agg_twophase",
    oracle="""
SELECT l_suppkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
         AS avg_qty
FROM lineitem GROUP BY l_suppkey
""",
)
def skew_agg_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit two-phase salted aggregation: phase 1 groups on
    (key, salt) so one hot key spreads over 16 reducers; phase 2 merges
    the 16 partials per key — the shuffle carrying full rows is keyed
    by (key, salt), and only tiny partials move on the bare key.

    Spark's hash aggregate already does map-side partials; the salt
    adds the REDUCER-side spreading partials can't: when one key's
    partials alone overwhelm a task (true hot-key skew at 100 TB),
    phase-2 input per key is bounded by the salt count, not the data.
    Decomposable aggregates (sum, count -> avg) re-compose exactly;
    exact scaled-LONG partials (``_scaled_long``; r11, same value as
    the DECIMAL partials they replaced at ~half the aggregation cost)
    keep the re-composition order-independent — the phase-2 finish is
    the one decimal division of the exact sum (``_sumd`` contract)."""
    from map_reduce_spark.operators.relational import _scaled_long

    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(_AGG_SALT))
    )
    partial = salted.groupBy("l_suppkey", "salt").agg(
        F.sum(_scaled_long(F.col("l_quantity"))).alias("s"),
        F.count("*").alias("c"),
    )
    total = (F.sum("s").cast("decimal(38,0)") / F.lit(100)).cast("double")
    return partial.groupBy("l_suppkey").agg(
        total.alias("total_qty"),
        F.sum("c").alias("n_items"),
        (total / F.sum("c")).alias("avg_qty"),
    )


# --- temperature-weighted source mixing -------------------------------


@register(
    "mix_temperature",
    oracle=f"""
WITH c AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1000) AS BIGINT) AS w
  FROM documents GROUP BY source
),
t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n, CAST(SUM(w) AS BIGINT) AS wt FROM c),
sel AS (
  SELECT d.source
  FROM documents d JOIN c ON d.source = c.source CROSS JOIN t
  WHERE CAST({_sql_bucket('d.doc_id', 'mix', 1_000_000)} AS BIGINT) * t.wt * c.n_docs
        < ((t.n * 2) // 5) * c.w * 1000000
)
SELECT c.source, c.n_docs, c.w, COALESCE(s.k, 0) AS n_selected
FROM c LEFT JOIN (SELECT source, COUNT(*) AS k FROM sel GROUP BY source) s
  ON c.source = s.source
""",
)
def mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted domain mixing (alpha = 0.5): sample sources
    proportionally to sqrt(count) — up-weighting small domains, the
    standard multilingual/multi-domain rebalancing — targeting 40% of
    the corpus overall, selected by deterministic md5 bucket.

    The entire accept test is INTEGER math (``bucket * W * c_s <
    T * w_s * 1e6``): weights are floor(sqrt(c)*1000) BIGINTs (sqrt is
    IEEE-correctly-rounded in both engines, unlike pow, which is why
    the temperature is the sqrt point), so no float summation or
    engine-specific rounding exists anywhere. int64 headroom covers
    corpora to ~1e8 docs/source; DECIMAL(38,0) is the documented
    escalation (NOTES rule 2).

    Scale shape: one tiny per-source aggregate broadcast back, then a
    pure scan-level filter — the sample itself never shuffles (same
    posture as ``stratified_sample``).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    c = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n_docs"))
        .withColumn(
            "w", F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000).cast("long")
        )
    )
    t = c.agg(
        F.sum("n_docs").cast("long").alias("n"), F.sum("w").cast("long").alias("wt")
    )
    b = _hash_bucket(F.col("doc_id"), "mix", 1_000_000).cast("long")
    sel = (
        docs.join(F.broadcast(c), "source")
        .crossJoin(F.broadcast(t))
        .filter(b * F.col("wt") * F.col("n_docs") < F.expr("((n * 2) div 5) * w * 1000000"))
        .groupBy("source")
        .agg(F.count("*").alias("k"))
    )
    return (
        c.join(sel, "source", "left")
        .select(
            "source",
            "n_docs",
            "w",
            F.coalesce("k", F.lit(0)).alias("n_selected"),
        )
    )


# --- z-order layout (multi-dimensional clustering) --------------------

_ZBITS = 10


def _z_spark(x: str, y: str) -> str:
    """Bit-interleave two _ZBITS-wide ints (Morton code), Spark SQL."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"shiftleft((shiftright({x}, {i}) & 1), {2 * i})")
        terms.append(f"shiftleft((shiftright({y}, {i}) & 1), {2 * i + 1})")
    return " + ".join(terms)


def _z_duck(x: str, y: str) -> str:
    """Same Morton interleave in DuckDB's operator syntax."""
    terms = []
    for i in range(_ZBITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "zorder_layout",
    oracle=f"""
SELECT event_id,
       CAST(user_id % 1024 AS BIGINT) AS x,
       CAST((epoch_us(ts) // 3600000000) % 1024 AS BIGINT) AS y,
       CAST({_z_duck('CAST(user_id % 1024 AS BIGINT)',
                     'CAST((epoch_us(ts) // 3600000000) % 1024 AS BIGINT)')}
            AS BIGINT) AS zval,
       CAST({_z_duck('CAST(user_id % 1024 AS BIGINT)',
                     'CAST((epoch_us(ts) // 3600000000) % 1024 AS BIGINT)')}
            AS BIGINT) // 4096 AS file_group
FROM events
""",
)
def zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, hour): the
    multi-dimensional data-layout transform behind Delta/Iceberg's
    OPTIMIZE ZORDER — rows close in BOTH dimensions land in the same
    file group, so a scan filtered on either dimension prunes most
    groups (a linear sort can only serve one dimension).

    Pure integer bit arithmetic (shift/and/add — bit-identical in both
    engines), zero shuffle for the key computation itself; the layout
    step at rest is ``repartitionByRange(zval)`` + write, paying one
    range shuffle at ingest to make every later 2-D-filtered scan
    prune. Emitted here as (zval, file_group) so the clustering is
    hash-verifiable.
    """
    ev = load_table(spark, sf_dir, "events")
    x = "CAST(user_id % 1024 AS BIGINT)"
    y = "CAST((ts_us div 3600000000) % 1024 AS BIGINT)"
    z = _z_spark(x, y)
    return ev.select(
        "event_id",
        F.expr(x).alias("x"),
        F.expr(y).alias("y"),
        F.expr(z).cast("long").alias("zval"),
        F.expr(f"CAST({z} AS BIGINT) div 4096").alias("file_group"),
    )


@register(
    "dq_checks",
    oracle="""
SELECT 'orders_orphan_custkey' AS rule,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) AS n_violations,
       (SELECT COUNT(*) FROM orders) AS n_checked
UNION ALL
SELECT 'lineitem_qty_range',
       (SELECT COUNT(*) FROM lineitem
        WHERE l_quantity <= 0 OR l_quantity > 60),
       (SELECT COUNT(*) FROM lineitem)
UNION ALL
SELECT 'orders_null_orderdate',
       (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'orders_duplicate_pk',
       (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders),
       (SELECT COUNT(*) FROM orders)
UNION ALL
SELECT 'orders_nonpositive_price',
       (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0),
       (SELECT COUNT(*) FROM orders)
""",
)
def dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate: declarative rule suite evaluated in ONE pass
    per table — null checks, range checks, primary-key uniqueness, and
    cross-table referential integrity — emitting (rule, n_violations,
    n_checked). The admission-control step every training-data
    pipeline runs before a corpus drop is accepted.

    Scale shape: the three orders rules and the pk-uniqueness rule
    fold into a single aggregate scan each (conditional-sum partials;
    the scan is shared via one agg projection, not one job per rule);
    referential integrity is a broadcast-able anti-join keyed on the
    dimension; nothing materializes violation ROWS — counts only, so
    the output is fixed-size regardless of corpus size.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")

    n_orders = F.count("*")
    orders_stats = orders.agg(
        n_orders.alias("n"),
        F.sum((F.col("o_orderdate").isNull()).cast("long")).alias("null_date"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("dup_pk"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("bad_price"),
    )
    orphans = (
        orders.join(F.broadcast(cust.select("c_custkey")),
                    orders.o_custkey == F.col("c_custkey"), "left_anti")
        .agg(F.count("*").alias("orphans"))
    )
    li_stats = li.agg(
        F.count("*").alias("n_li"),
        F.sum(((F.col("l_quantity") <= 0) | (F.col("l_quantity") > 60)).cast("long")).alias("bad_qty"),
    )
    j = orders_stats.crossJoin(orphans).crossJoin(li_stats)  # three 1-row frames
    rules = F.array(
        F.struct(F.lit("orders_orphan_custkey").alias("rule"),
                 F.col("orphans").alias("n_violations"), F.col("n").alias("n_checked")),
        F.struct(F.lit("lineitem_qty_range").alias("rule"),
                 F.col("bad_qty").alias("n_violations"), F.col("n_li").alias("n_checked")),
        F.struct(F.lit("orders_null_orderdate").alias("rule"),
                 F.col("null_date").alias("n_violations"), F.col("n").alias("n_checked")),
        F.struct(F.lit("orders_duplicate_pk").alias("rule"),
                 F.col("dup_pk").alias("n_violations"), F.col("n").alias("n_checked")),
        F.struct(F.lit("orders_nonpositive_price").alias("rule"),
                 F.col("bad_price").alias("n_violations"), F.col("n").alias("n_checked")),
    )
    return j.select(F.explode(rules).alias("r")).select(
        "r.rule", "r.n_violations", "r.n_checked"
    )


@register(
    "weighted_sample",
    oracle=f"""
SELECT doc_id, n_chars,
       {_sql_bucket('doc_id', 'wsamp', 1000000)} AS u
FROM documents
WHERE CAST({_sql_bucket('doc_id', 'wsamp', 1000000)} AS BIGINT) * 2000
      < CAST(least(n_chars, 2000) AS BIGINT) * 1000000
""",
)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling: accept probability proportional
    to document length (capped at 2000 chars = certainty), decided by
    an md5-uniform draw per doc_id — integer cross-multiplication, so
    both engines evaluate the accept test exactly (no float division).
    The quality-weighted corpus downsampling step of a data mix, with
    the reproducibility-across-runs property ``rand()`` lacks: the
    same doc set survives on every engine, machine, and retry.

    Scale shape: per-row filter on a hash of the key — no shuffle, no
    state; composes with the scan's pushed filters.
    """
    u = _hash_bucket(F.col("doc_id"), "wsamp", 1_000_000)
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("u", u)
        .filter(
            F.col("u").cast("long") * 2000
            < F.least(F.col("n_chars"), F.lit(2000)).cast("long") * 1_000_000
        )
        .select("doc_id", "n_chars", "u")
    )


# --- model-score filtering (fastText-style hashed linear classifier) --

_QC_SEED = "qc"
_QC_WRANGE = 2001  # weights span -1000..+1000


@register(
    "quality_classifier",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), scored AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CAST(CAST(concat('0x', substr(md5(concat('{_QC_SEED}:', term)), 1, 8))
                       AS BIGINT) % {_QC_WRANGE} - 1000 AS BIGINT)) AS BIGINT) AS logit
  FROM tok GROUP BY doc_id
)
SELECT doc_id, n_tokens, logit,
       CASE WHEN logit > 0 THEN 'keep' ELSE 'drop' END AS verdict
FROM scored
""",
)
def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering, the fastText-classifier shape
    used by CCNet/GPT-3-style pipelines: each token hashes into a
    weight table (here derived from md5 so the oracle can recompute it;
    in production the same expression reads a broadcast weight array
    learned offline), the document's logit is the integer sum of its
    token weights, and the verdict thresholds the logit.

    Scale shape (100 TB): inference is ONE narrow explode + hash +
    integer aggregate — no model server, no Python, fully codegen'd,
    and the shuffle carries (doc_id, partial-sum) pairs only. Swapping
    the md5-derived weight for `weights[bucket]` over a broadcast
    array literal keeps the identical plan with a real trained model.
    """
    docs = parallelize_if_narrow(load_table(spark, sf_dir, "documents"))
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    w = (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{_QC_SEED}:"), F.col("term"))), 1, 8), 16, 10)
        .cast("long")
        % _QC_WRANGE
        - 1000
    )
    scored = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum(w).cast("bigint").alias("logit"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "logit",
        F.when(F.col("logit") > 0, "keep").otherwise("drop").alias("verdict"),
    )


# --- deterministic global corpus shuffle ------------------------------

_SHUF_SEED = "shuffle-epoch-0"


@register(
    "corpus_shuffle",
    oracle=f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY md5(concat('{_SHUF_SEED}:', CAST(doc_id AS VARCHAR)))) AS BIGINT) AS pos,
       doc_id,
       md5(concat('{_SHUF_SEED}:', CAST(doc_id AS VARCHAR))) AS shuffle_key
FROM documents
""",
)
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every epoch's data
    order must be (a) uniformly shuffled, (b) reproducible for
    checkpoint-resume, (c) computed without a single-machine sort.
    The shuffle key is md5(seed:doc_id) — changing the seed string
    re-shuffles; re-running the same seed reproduces the exact order.

    Scale shape (100 TB): the total order comes from
    `ranking.global_row_number` — range-repartition by the md5 key +
    per-partition local row_number + broadcast per-partition offsets.
    No `Exchange SinglePartition` anywhere (locked for the ranking
    family in tests/test_plans.py); this is how you hand a trainer a
    globally-shuffled epoch without ever materializing a global sort
    on one node.
    """
    from map_reduce_spark.ranking import global_row_number

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit(f"{_SHUF_SEED}:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    return global_row_number(keyed, [F.col("shuffle_key")], out="pos").select(
        F.col("pos").cast("bigint").alias("pos"), "doc_id", "shuffle_key"
    )


# --- per-domain document capping (RefinedWeb-style) -------------------

_CAP_N = 15
_CAP_SEED = "domain-cap"


@register(
    "domain_cap",
    oracle=f"""
WITH ranked AS (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(concat('{_CAP_SEED}:', CAST(doc_id AS VARCHAR))), doc_id
         ) AS BIGINT) AS pick
  FROM documents)
SELECT doc_id, source, pick FROM ranked WHERE pick <= {_CAP_N}
""",
)
def domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (RefinedWeb/C4 dominance control): no
    single source may contribute more than N documents; the survivors
    are a deterministic uniform sample per source, chosen by md5 rank
    so re-runs and backfills pick the identical set.

    Scale shape (100 TB): one hash-partitioned window per source key —
    partial top-N per partition is what Spark's WindowGroupLimit
    pushdown gives rank filters (rank <= N prunes inside the window
    exec, before the full sort materializes); the shuffle key is the
    domain, making this the same plan as any per-key top-k. Skewed
    mega-domains would salt the key exactly like `join_salted`.
    """
    docs = parallelize_if_narrow(load_table(spark, sf_dir, "documents"))
    key = F.md5(F.concat(F.lit(f"{_CAP_SEED}:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(key, "doc_id")
    return (
        docs.select("doc_id", "source", F.row_number().over(w).cast("bigint").alias("pick"))
        .filter(F.col("pick") <= _CAP_N)
    )


# --- snapshot diff (CDC between two table versions) -------------------


@register(
    "snapshot_diff",
    oracle="""
WITH v1 AS (
  SELECT o_orderkey,
         md5(concat(o_orderstatus, '|', o_orderpriority)) AS old_md5
  FROM orders WHERE o_orderkey % 7 != 0
), v2 AS (
  SELECT o_orderkey,
         md5(concat(CASE WHEN o_orderkey % 5 = 0 THEN 'X' ELSE o_orderstatus END,
                    '|', o_orderpriority)) AS new_md5
  FROM orders WHERE o_orderkey % 11 != 0
), j AS (
  SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
         v1.old_md5, v2.new_md5,
         v1.o_orderkey IS NULL AS ins, v2.o_orderkey IS NULL AS del
  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey)
SELECT o_orderkey,
       CASE WHEN ins THEN 'insert' WHEN del THEN 'delete' ELSE 'update' END AS change_type,
       old_md5, new_md5
FROM j WHERE ins OR del OR old_md5 != new_md5
""",
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / change-data-capture between two versions of a
    table (the Delta-CDF / audit-diff shape): classify every primary
    key as insert / delete / update by full-outer-joining the versions
    on the key and comparing row content hashes — unchanged rows are
    dropped so the output is exactly the changeset.

    The two versions are deterministic views of `orders` (v2 drops some
    keys, adds others back, rewrites some statuses) so the oracle can
    rebuild them; in production they are two table snapshots.

    Scale shape (100 TB): ONE full-outer hash join keyed on the primary
    key — both sides shuffle-partition on the same key (co-partitioned
    bucketed snapshots make it shuffle-free); row content travels as a
    16-byte md5, never as the row; the changeset output is typically
    tiny relative to the snapshots.
    """
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.md5(F.concat("o_orderstatus", F.lit("|"), "o_orderpriority")).alias("old_md5"),
    )
    status2 = F.when(F.col("o_orderkey") % 5 == 0, "X").otherwise(F.col("o_orderstatus"))
    v2 = orders.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey",
        F.md5(F.concat(status2, F.lit("|"), F.col("o_orderpriority"))).alias("new_md5"),
    )
    j = v1.join(v2, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_md5").isNull(), "insert")
        .when(F.col("new_md5").isNull(), "delete")
        .otherwise("update")
    )
    return (
        j.select("o_orderkey", change.alias("change_type"), "old_md5", "new_md5")
        .filter(
            F.col("old_md5").isNull()
            | F.col("new_md5").isNull()
            | (F.col("old_md5") != F.col("new_md5"))
        )
    )


# --- weighted reservoir sampling (Efraimidis-Spirakis) -----------------

_WRES_K = 150


@register(
    "weighted_reservoir_sample",
    oracle=f"""
SELECT doc_id, source, n_chars,
       round(ln((CAST(concat('0x', substr(md5(concat('wres:',
                 CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT) + 1) * 1.0
                / 4294967296)
             / greatest(n_chars, 1), 9) AS wkey
FROM documents
ORDER BY wkey DESC, doc_id
LIMIT {_WRES_K}
""",
)
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-size-K weighted sampling without replacement — the
    Efraimidis-Spirakis A-ES reservoir (2006): each item draws a
    uniform u and keeps key u^(1/w); the K largest keys are a weighted
    sample. Ordering by ln(u)/w is the same sample (monotone
    transform) without the cross-engine pow() hazard. The exact-K
    complement of ``weighted_sample``'s Bernoulli draw (expected-size),
    with weight = document length.

    Determinism: u comes from the portable md5-uniform (u32+1)/2^32 in
    (0, 1], and the key rounds to the 9dp decimal grid (the
    ``unigram_logprob`` ln idiom) with (key desc, doc_id) tie-break —
    the selected set is engine-identical. Scale shape: one narrow scan
    computing a per-row expression, then top-K planned as
    TakeOrderedAndProject — per-partition heaps ARE the distributed
    reservoir merge the algorithm calls for; no shuffle of the corpus,
    no global sort, mergeable across any partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    u32 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wres:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    wkey = F.round(
        F.log((u32 + 1).cast("double") / F.lit(4294967296.0))
        / F.greatest(F.col("n_chars"), F.lit(1)),
        9,
    )
    return (
        docs.select("doc_id", "source", "n_chars", wkey.alias("wkey"))
        .orderBy(F.col("wkey").desc(), "doc_id")
        .limit(_WRES_K)
    )
