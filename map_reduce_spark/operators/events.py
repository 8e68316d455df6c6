"""Event-stream semantics in batch: tumbling / sliding / session
windows and event-type pivots over the ``events`` table.

The reference is batch-only word count; these are the required
streaming-adjacent shapes (SURVEY.md §2.2 "streaming" row). Batch-first
per the build plan — the same semantics run incrementally in
map_reduce_spark.streaming with watermarks; here they are
DuckDB-checkable.

Window starts are emitted as epoch seconds (bigint) — timestamp
precision differs across engines (Spark µs vs parquet ns), integers
don't.

Scale notes: tumbling/sliding windows are pure groupBy on a derived
bucket key (partial agg before one shuffle; sliding fans out each row
exactly windows-per-slide times). Sessionization shuffles once on
user_id and computes gaps/islands with a per-user sorted window — the
standard distributed sessionization plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.operators.relational import _scaled_long, _sumd
from map_reduce_spark.registry import register

_EPOCH = "CAST(floor(epoch(ts)) AS BIGINT)"  # duckdb: ns ts -> whole seconds
# duckdb: bucket start as a plain (TZ-free) TIMESTAMP string
_BUCKET_TS = (
    "strftime(TIMESTAMP '1970-01-01' + (({e} // {w}) * {w}) * INTERVAL 1 SECOND, "
    "'%Y-%m-%d %H:%M:%S')"
)


@register(
    "window_tumbling",
    oracle=f"""
SELECT {_BUCKET_TS.format(e=_EPOCH, w=300)} AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
""",
)
def window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation per event type.

    Implemented with ``F.window`` (the streaming-compatible operator);
    the emitted key is the window start as epoch seconds.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # exact 2dp sum as a scaled-long partial agg (see relational
            # _sumd: ~2x cheaper than the decimal partial agg, same bits)
            _sumd(F.col("value"), alias="total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
            "n_users",
        )
    )


@register(
    "window_sliding",
    oracle=f"""
SELECT strftime(TIMESTAMP '1970-01-01'
                + (({_EPOCH} // 300) * 300 - off) * INTERVAL 1 SECOND,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events, (SELECT UNNEST([0, 300]) AS off)
GROUP BY 1
""",
)
def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (each event lands in
    exactly two windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            _sumd(F.col("value"), alias="total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n",
            "total_value",
        )
    )


@register(
    "session_window",
    oracle="""
WITH seq AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session,
         event_id
  FROM events
),
tagged AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM seq
)
SELECT user_id,
       epoch_us(MIN(ts)) // 1000000 AS session_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
FROM tagged GROUP BY user_id, session_no
""",
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap, per user.

    Batch implementation is the gaps-and-islands pattern (lag + running
    sum) — one shuffle on user_id. The streaming twin uses
    ``F.session_window`` (see map_reduce_spark.streaming.jobs); both
    emit (user, session_start, n_events, value).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap = F.col("ts_us") - F.lag("ts_us").over(w)
    seq = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    tagged = seq.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return tagged.groupBy("user_id", "session_no").agg(
        F.expr("min(ts_us) div 1000000").alias("session_start"),
        F.count("*").alias("n_events"),
        _sumd(F.col("value"), alias="session_value"),
    ).drop("session_no")


@register(
    "pivot_event_counts",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events GROUP BY user_id
""",
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type count matrix (explicit value list, so
    the plan is one pass — no distinct-values pre-query)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
    )


@register(
    "gap_fill_hourly",
    oracle="""
WITH hourly AS (
  SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hb,
         COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(hb) AS mn, MAX(hb) AS mx FROM hourly GROUP BY 1),
spine AS (SELECT user_id, UNNEST(range(mn, mx + 1)) AS hb FROM bounds),
j AS (
  SELECT s.user_id, s.hb, COALESCE(h.n, 0) AS n, h.total
  FROM spine s LEFT JOIN hourly h USING (user_id, hb)
)
SELECT user_id, hb, n, (n = 0) AS is_gap,
       last_value(total IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY hb ROWS UNBOUNDED PRECEDING)
         AS filled_total
FROM j
""",
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: generate each user's complete hourly
    spine (min..max observed hour), zero-fill event counts, and
    forward-fill the hourly total into gap hours — the densification
    step feature pipelines and downsampled dashboards need.

    Hour buckets are epoch-hour integers (``ts_us div 3600e6``), so the
    result is independent of session timezone and timestamp precision.

    Scale shape: one partial-agg'd groupBy to hourly, a tiny per-user
    bounds aggregate, a narrow ``sequence``+``explode`` spine (rows =
    user-hours, the OUTPUT size — no blowup beyond it), one shuffled
    left join on (user_id, hb), and a per-user window for the forward
    fill. Nothing quadratic; state per user bounded by its hour range.
    """
    ev = load_table(spark, sf_dir, "events")
    hb = (F.col("ts_us") / F.lit(3_600_000_000)).cast("long")
    hourly = ev.groupBy("user_id", hb.alias("hb")).agg(
        F.count("*").alias("n"),
        _sumd(F.col("value"), alias="total"),
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("hb").alias("mn"), F.max("hb").alias("mx")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("hb")
    )
    j = spine.join(hourly, ["user_id", "hb"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n = F.coalesce("n", F.lit(0)).alias("n")
    return j.select(
        "user_id",
        "hb",
        n,
        (F.coalesce("n", F.lit(0)) == 0).alias("is_gap"),
        F.last("total", ignorenulls=True).over(w).alias("filled_total"),
    )


@register(
    "interpolate_hourly",
    oracle="""
WITH hourly AS (
  SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hb,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS vi
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(hb) AS mn, MAX(hb) AS mx FROM hourly GROUP BY 1),
spine AS (SELECT user_id, UNNEST(range(mn, mx + 1)) AS hb FROM bounds),
j AS (
  SELECT s.user_id, s.hb, h.vi
  FROM spine s LEFT JOIN hourly h USING (user_id, hb)
),
nb AS (
  SELECT user_id, hb, vi,
         last_value(vi IGNORE NULLS) OVER wp AS pv,
         last_value(CASE WHEN vi IS NOT NULL THEN hb END IGNORE NULLS)
           OVER wp AS ph,
         first_value(vi IGNORE NULLS) OVER wf AS nv,
         first_value(CASE WHEN vi IS NOT NULL THEN hb END IGNORE NULLS)
           OVER wf AS nh
  FROM j
  WINDOW wp AS (PARTITION BY user_id ORDER BY hb ROWS UNBOUNDED PRECEDING),
         wf AS (PARTITION BY user_id ORDER BY hb
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hb, (vi IS NULL) AS is_gap,
       CASE
         WHEN vi IS NOT NULL THEN round(vi / 100.0, 2)
         WHEN pv IS NULL OR nv IS NULL THEN NULL
         ELSE round((pv + CAST(floor(CAST((nv - pv) * (hb - ph) AS DOUBLE)
                                     / (nh - ph)) AS BIGINT))
                    / 100.0, 2)
       END AS interp
FROM nb
""",
)
def interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resampling with LINEAR interpolation across gaps — the
    time-series companion to ``gap_fill_hourly``'s forward fill.
    All-integer interpolation: hourly totals become 2-dp scaled
    integers, and each gap hour gets
    ``prev + floor((next-prev) * offset / span)`` — floor() (not
    integral div, which truncates toward zero and diverges on negative
    deltas), products bounded < 2^53 so the one double division is
    exact. Observed hours interpolate to themselves (offset 0); hours
    outside the observed range stay NULL.

    Scale shape: one partial-agged hourly rollup, a per-user spine
    explode (narrow), and two per-user ordered windows — state bounded
    by each user's hour range, nothing global.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            "user_id", F.expr("ts_us div 3600000000").alias("hb")
        )
        .agg(
            # the 2dp decimal sum times 100 IS the sum of exact cents:
            # sum the scaled longs directly (same value, long partial agg)
            F.sum(_scaled_long(F.col("value"))).alias("vi")
        )
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("hb").alias("mn"), F.max("hb").alias("mx")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("hb")
    )
    j = spine.join(hourly, ["user_id", "hb"], "left")

    from pyspark.sql import Window

    wp = (
        Window.partitionBy("user_id")
        .orderBy("hb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next observed" via a RUNNING last() over the DESC order, never
    # first() over (currentRow, unboundedFollowing): Spark evaluates
    # unbounded-FOLLOWING frames by re-scanning the partition tail for
    # EVERY row — O(range^2) per user (measured 22.8 s at sf0.1, the
    # catalog's most expensive query; 8.8 s cold after this rewrite,
    # and 10x data now costs 1.8x instead of 11x). The desc running
    # frame is the streaming O(range) equivalent.
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("hb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_hb = F.when(F.col("vi").isNotNull(), F.col("hb"))
    nb = j.select(
        "user_id",
        "hb",
        "vi",
        F.last("vi", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_hb, ignorenulls=True).over(wp).alias("ph"),
        F.last("vi", ignorenulls=True).over(wn).alias("nv"),
        F.last(obs_hb, ignorenulls=True).over(wn).alias("nh"),
    )
    interp_scaled = F.col("pv") + F.floor(
        ((F.col("nv") - F.col("pv")) * (F.col("hb") - F.col("ph"))).cast("double")
        / (F.col("nh") - F.col("ph"))
    ).cast("long")
    interp = (
        F.when(F.col("vi").isNotNull(), F.round(F.col("vi") / 100.0, 2))
        .when(F.col("pv").isNull() | F.col("nv").isNull(), F.lit(None))
        .otherwise(F.round(interp_scaled / 100.0, 2))
    )
    return nb.select(
        "user_id",
        "hb",
        F.col("vi").isNull().alias("is_gap"),
        interp.alias("interp"),
    )
