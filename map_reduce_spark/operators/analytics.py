"""Event analytics: funnel, cohort retention, OHLC downsampling,
histograms, and median/MAD anomaly detection over the ``events`` table.

Not in the reference (word count only, SURVEY §0); these are the
product-analytics query shapes an engine claiming "streaming-adjacent
event processing" must run — the batch twins of what a warehouse's
funnel/retention dashboards compute.

Scale notes (100 TB posture):

- ``funnel_analysis`` is k-1 chained (filter -> groupBy user -> join)
  steps, every shuffle on the SAME key (user_id) so a cluster reuses
  one partitioning end-to-end; state per user is one timestamp per
  stage, never the event list.
- ``cohort_retention`` is two aggregations and one join, all keyed on
  user_id; output is cohorts x offsets, tiny relative to input.
- ``ohlc_hourly`` is the classic time-series downsample: one shuffle
  on (event_type, hour), one per-partition sort for the open/close
  picks, order statistics + decimal sums only.
- ``value_histogram`` is a pure projection to a bucket id + one
  partial-agg'd groupBy — the profile a 100 TB column scan wants.
- ``anomaly_mad`` picks medians positionally (lower median = the
  ceil(n/2)-th order statistic) instead of interpolating, so every
  number is an actual data value — deterministic across engines (no
  float summation anywhere) — then flags |v - med| > 3.5 * MAD.

Cross-engine determinism: event times are raw epoch integers
(``ts_us``), money-ish sums go through DECIMAL, medians are order
statistics (picks, not averages), and every filter compares doubles
produced by identical single IEEE ops in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.operators.relational import _sumd
from map_reduce_spark.registry import register

# DuckDB: epoch µs of the nanos timestamp — matches Spark-side ts_us.
_US = "epoch_us(ts)"

_FUNNEL_STAGES = ("signup", "view", "click", "purchase")


def _funnel_oracle() -> str:
    ctes = [
        f"s1 AS (SELECT user_id, MIN({_US}) AS t FROM events "
        f"WHERE event_type = '{_FUNNEL_STAGES[0]}' GROUP BY user_id)"
    ]
    for i in range(1, len(_FUNNEL_STAGES)):
        ctes.append(
            f"s{i + 1} AS (SELECT e.user_id, MIN({_US}) AS t FROM events e "
            f"JOIN s{i} p ON e.user_id = p.user_id "
            f"WHERE e.event_type = '{_FUNNEL_STAGES[i]}' AND {_US} > p.t "
            f"GROUP BY e.user_id)"
        )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1} AS stage, '{name}' AS stage_name, "
        f"COUNT(*) AS users FROM s{i + 1}"
        for i, name in enumerate(_FUNNEL_STAGES)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


@register("funnel_analysis", oracle=_funnel_oracle())
def funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup -> view -> click -> purchase.

    A user reaches stage k+1 at the EARLIEST stage-k+1 event strictly
    after their stage-k entry time (the standard strict-sequence funnel
    definition). Emits one row per stage with the surviving user count.

    Every step shuffles on user_id only; at scale all k aggregations
    and joins co-partition, and each join's right side is one
    (user_id, t) row per surviving user — monotonically shrinking.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts_us"
    )
    reached = (
        ev.filter(F.col("event_type") == _FUNNEL_STAGES[0])
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t"))
    )
    stages = [reached]
    for name in _FUNNEL_STAGES[1:]:
        reached = (
            ev.filter(F.col("event_type") == name)
            .join(reached.select("user_id", F.col("t").alias("prev_t")), "user_id")
            .filter(F.col("ts_us") > F.col("prev_t"))
            .groupBy("user_id")
            .agg(F.min("ts_us").alias("t"))
        )
        stages.append(reached)
    counts = [
        s.agg(F.count("*").alias("users")).select(
            F.lit(i + 1).alias("stage"),
            F.lit(name).alias("stage_name"),
            "users",
        )
        for i, (name, s) in enumerate(zip(_FUNNEL_STAGES, stages))
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionAll(c)
    return out


@register(
    "cohort_retention",
    oracle=f"""
WITH firsts AS (
  SELECT user_id, MIN({_US} // 86400000000) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       ({_US} // 86400000000) - f.cohort_day AS day_offset,
       COUNT(DISTINCT e.user_id) AS n_users
FROM events e JOIN firsts f ON e.user_id = f.user_id
GROUP BY 1, 2
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users bucketed by first-seen day,
    counted distinct on each subsequent activity day offset.

    Day buckets are epoch-day integers — session-TZ independent. Two
    aggregations + one join, all keyed on user_id; the countDistinct
    shuffles (cohort_day, day_offset, user_id) triples once (Spark
    plans distinct-agg as a two-phase expand), output is cohorts ×
    offsets.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", (F.col("ts_us") / F.lit(86_400_000_000)).cast("long").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        ev.join(firsts, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "ohlc_hourly",
    oracle="""
WITH base AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hb, value,
         row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
                            ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000
                            ORDER BY ts DESC, event_id DESC) AS rnd
  FROM events
)
SELECT event_type, hb,
       MAX(CASE WHEN rn = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rnd = 1 THEN value END) AS close,
       COUNT(*) AS volume,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM base GROUP BY event_type, hb
""",
)
def ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC (open/high/low/close) downsample per event type —
    the hypertable/candlestick rollup shape.

    Open/close are order-statistic picks via row_number with a
    (ts, event_id) total order (NOTES rule 5: unique tiebreak), not
    first/last over an unsorted frame. One shuffle on (event_type,
    hour), one per-partition sort, then a plain partial-agg'd groupBy.
    """
    ev = load_table(spark, sf_dir, "events")
    hb = (F.col("ts_us") / F.lit(3_600_000_000)).cast("long").alias("hb")
    base = ev.select("event_type", hb, "ts_us", "event_id", "value")
    w = Window.partitionBy("event_type", "hb").orderBy("ts_us", "event_id")
    wd = Window.partitionBy("event_type", "hb").orderBy(
        F.col("ts_us").desc(), F.col("event_id").desc()
    )
    tagged = base.withColumn("rn", F.row_number().over(w)).withColumn(
        "rnd", F.row_number().over(wd)
    )
    return tagged.groupBy("event_type", "hb").agg(
        F.max(F.when(F.col("rn") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rnd") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("volume"),
        _sumd(F.col("value"), alias="total_value"),
    )


@register(
    "value_histogram",
    oracle="""
SELECT event_type,
       CAST(LEAST(FLOOR(value / 25.0), 19) AS INT) AS bucket,
       CAST(LEAST(FLOOR(value / 25.0), 19) AS INT) * 25.0 AS bucket_lo,
       COUNT(*) AS n
FROM events GROUP BY 1, 2, 3
""",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of ``value`` (20 buckets of width 25,
    top-clamped) per event type — the column-profile scan.

    Pure projection to a bucket id + one partial-agg'd groupBy: at
    100 TB this is a single pass with map-side combine; the divide /
    floor / least are identical single IEEE ops in both engines.
    """
    ev = load_table(spark, sf_dir, "events")
    b = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("int")
    return (
        ev.select("event_type", b.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
        .select(
            "event_type",
            "bucket",
            (F.col("bucket") * 25.0).alias("bucket_lo"),
            "n",
        )
    )


@register(
    "anomaly_mad",
    oracle="""
WITH ranked AS (
  SELECT event_type, value, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM events
),
med AS (
  SELECT event_type, value AS med FROM ranked WHERE rn = (cnt + 1) // 2
),
devs AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         ABS(e.value - m.med) AS dev
  FROM events e JOIN med m ON e.event_type = m.event_type
),
dev_ranked AS (
  SELECT event_type, dev, event_id,
         row_number() OVER (PARTITION BY event_type ORDER BY dev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM devs
),
mad AS (
  SELECT event_type, dev AS mad FROM dev_ranked WHERE rn = (cnt + 1) // 2
)
SELECT d.event_id, d.event_type, d.value,
       ROUND(d.med, 6) AS med, ROUND(a.mad, 6) AS mad
FROM devs d JOIN mad a ON d.event_type = a.event_type
WHERE d.dev > 3.5 * a.mad
""",
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD outlier detection per event type: flag events with
    |value - median| > 3.5 × MAD (the robust z-score rule).

    Medians are LOWER medians picked positionally (row_number with an
    event_id tiebreak — actual data values, no interpolation), so both
    engines agree bit-for-bit and the strict `>` filter cannot
    straddle a float-summation difference (the ADVICE filter-then-round
    lesson: the filter uses the UNROUNDED dev; rounding happens only in
    the projection). Two windowed passes + two broadcast-sized joins
    (one row per event type).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    cw = Window.partitionBy("event_type")
    ranked = ev.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count("*").over(cw)
    )
    med = ranked.filter(
        F.col("rn") == ((F.col("cnt") + 1) / 2).cast("long")
    ).select("event_type", F.col("value").alias("med"))
    devs = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("dev"),
    )
    dw = Window.partitionBy("event_type").orderBy("dev", "event_id")
    dev_ranked = devs.withColumn("rn", F.row_number().over(dw)).withColumn(
        "cnt", F.count("*").over(cw)
    )
    mad = dev_ranked.filter(
        F.col("rn") == ((F.col("cnt") + 1) / 2).cast("long")
    ).select("event_type", F.col("dev").alias("mad"))
    return (
        devs.join(F.broadcast(mad), "event_type")
        .filter(F.col("dev") > 3.5 * F.col("mad"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
        )
    )


@register(
    "incremental_rollup",
    oracle="""
SELECT event_type, epoch_us(ts) // 3600000000 AS hb,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2
""",
)
def incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate maintenance: the hourly rollup folded
    incrementally over three disjoint event batches (split by
    event_id % 3 — standing in for three arrival days) through the
    MERGE upsert in ``map_reduce_spark.incremental``.

    The oracle is the one-shot aggregate over everything: the fold
    must be exactly associative — guaranteed because every measure is
    a decomposable exact integer (count, cents). Each fold shuffles
    only that batch's partial rollup; state at rest stays keyed by
    the group key (bucketed on a cluster -> shuffle-free merges).
    """
    from map_reduce_spark.incremental import merge_rollup

    ev = load_table(spark, sf_dir, "events")
    state = None
    for i in range(3):
        state = merge_rollup(state, ev.filter(F.col("event_id") % 3 == i))
    return state


# ANALYZE-style column statistics: (column, type-tagged min/max,
# nulls, exact distinct). One pass over the table: a single wide
# aggregate row, unpivoted to one output row per column.
_PROFILE_NUM = ("o_orderkey", "o_custkey", "o_totalprice")
_PROFILE_STR = ("o_orderstatus", "o_orderpriority")


def _profile_oracle() -> str:
    parts = [
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS DOUBLE) AS min_num,
       CAST(MAX({c}) AS DOUBLE) AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM orders"""
        for c in _PROFILE_NUM
    ] + [
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
       MIN({c}) AS min_str, MAX({c}) AS max_str
FROM orders"""
        for c in _PROFILE_STR
    ]
    return " UNION ALL ".join(parts)


@register("table_profile", oracle=_profile_oracle())
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style table profile: per-column row/null/exact-distinct
    counts and min/max, one output row per column.

    SINGLE pass over the table: all measures computed in one wide
    aggregate (Spark plans the multi-column COUNT DISTINCT via one
    Expand — cost ~ columns x rows map-side, still one scan + one
    shuffle of partials), then unpivoted driver-free with ``stack``.
    At 100 TB the same shape runs with approx_count_distinct instead
    of exact distinct — swap documented, exact kept here so the oracle
    can hash-match.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_NUM + _PROFILE_STR:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            (F.count("*") - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__dist"),
        ]
    for c in _PROFILE_NUM:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__minn"),
            F.max(c).cast("double").alias(f"{c}__maxn"),
        ]
    for c in _PROFILE_STR:
        aggs += [F.min(c).alias(f"{c}__mins"), F.max(c).alias(f"{c}__maxs")]
    wide = o.agg(*aggs)
    rows = []
    for c in _PROFILE_NUM:
        rows.append(
            f"'{c}', {c}__rows, {c}__nulls, {c}__dist, "
            f"{c}__minn, {c}__maxn, CAST(NULL AS STRING), CAST(NULL AS STRING)"
        )
    for c in _PROFILE_STR:
        rows.append(
            f"'{c}', {c}__rows, {c}__nulls, {c}__dist, "
            f"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), {c}__mins, {c}__maxs"
        )
    stack = (
        f"stack({len(rows)}, "
        + ", ".join(rows)
        + ") AS (col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
    )
    return wide.select(F.expr(stack))


# --- winsorization: percentile clipping as a data-quality transform ---

_WINSOR_ORACLE = """
WITH pct AS (
  SELECT event_type,
         round(quantile_cont(value, 0.05), 4) AS lo,
         round(quantile_cont(value, 0.95), 4) AS hi
  FROM events GROUP BY event_type
),
cl AS (
  SELECT e.event_type,
         e.value,
         CAST(e.value < p.lo AS INT) AS is_lo,
         CAST(e.value > p.hi AS INT) AS is_hi,
         CAST(round(least(greatest(e.value, p.lo), p.hi), 4)
              AS DECIMAL(18,4)) AS clipped
  FROM events e JOIN pct p ON e.event_type = p.event_type
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(is_lo) AS BIGINT) AS n_clipped_low,
       CAST(SUM(is_hi) AS BIGINT) AS n_clipped_high,
       round(CAST(SUM(clipped) AS DOUBLE) / COUNT(*), 6) AS winsorized_mean
FROM cl GROUP BY event_type
"""


@register("winsorize_values", oracle=_WINSOR_ORACLE)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the robust-statistics data-cleaning transform:
    clip each event's value into its type's [p05, p95] band and report
    per-type clip counts and the winsorized mean.

    Cross-engine determinism: Spark ``percentile`` and DuckDB
    ``quantile_cont`` implement the same linear interpolation (proven
    by ``percentiles_exact``) but their interpolation ARITHMETIC can
    differ by one ulp — and when the interpolated threshold coincides
    with a repeated data value, that ulp flips the clip verdict for
    every tied row (caught by the round-4 10x parity pass: 50 flips at
    a p05 that landed exactly on a 2dp value). Both engines therefore
    snap the thresholds to the 4dp grid (the ``clipped`` grid) before
    comparing; the mean is summed on the DECIMAL(18,4) grid (NOTES
    rule 1), not float order.

    Scale shape: one partial-agged percentile pass per type (the
    per-type value lists bound state, or swap in approx_percentile at
    extreme cardinalities), thresholds broadcast back (rows = distinct
    types), then a narrow projection + one partial-agged rollup — the
    corpus shuffles only for the two per-type aggregations.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    pct = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 4).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("hi"),
    )
    clipped = F.round(F.least(F.greatest("value", F.col("lo")), F.col("hi")), 4).cast(
        "decimal(18,4)"
    )
    return (
        ev.join(F.broadcast(pct), "event_type")
        .select(
            "event_type",
            (F.col("value") < F.col("lo")).cast("int").alias("is_lo"),
            (F.col("value") > F.col("hi")).cast("int").alias("is_hi"),
            clipped.alias("clipped"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("is_lo").cast("bigint").alias("n_clipped_low"),
            F.sum("is_hi").cast("bigint").alias("n_clipped_high"),
            F.round(F.sum("clipped").cast("double") / F.count("*"), 6).alias(
                "winsorized_mean"
            ),
        )
    )
