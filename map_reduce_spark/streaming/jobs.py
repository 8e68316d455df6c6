"""Structured Streaming jobs (SURVEY.md §2.2 "streaming" row; §7 P4).

The reference is batch-only; a complete engine needs incremental
execution: watermarks, windowed aggregation over event time, session
windows with late-data semantics, and exactly-once-style sinks
(``foreachBatch``).

Each job here is the streaming twin of a batch operator and reuses the
same transformation logic, so batch results are the correctness oracle.
For the driver contract, the ``streaming_*`` registry entries run the
stream to completion with ``Trigger.AvailableNow`` into a memory sink
and return the final table — a real incremental execution whose result
must equal the batch plan's, which is exactly what the DuckDB oracle
checks.

Scale notes: these plans run unchanged against Kafka/file sources on a
real cluster — state lives in the state store keyed by (window, key) or
session, watermarks bound state size, and AvailableNow becomes a
continuous trigger. Nothing below is local-mode-specific except the
memory sink used to surface results.

Checkpoint-compatibility note (r11 ADVICE): the r11 switch of the
streaming aggregates from DECIMAL sums to ``_sumd`` scaled-long
partials changed the aggregation STATE schema (decimal -> long), so a
deployment restoring a pre-r11 checkpoint across that upgrade must
reset its checkpoint (fresh offsets or a state rebuild); the in-repo
memory-sink runs always start fresh checkpoints and are unaffected.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.operators.relational import _sumd
from map_reduce_spark.registry import register

DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"
# ts arrives as raw nanos (TIMESTAMP(NANOS) parquet read under
# nanosAsLong, same as io.load_table)
EVENTS_SCHEMA_RAW = (
    "event_id long, ts long, user_id long, event_type string, value double, "
    "props string"
)


def _run_to_table(result: DataFrame, name: str, mode: str) -> DataFrame:
    """Execute a streaming plan to exhaustion (AvailableNow) into a
    memory sink; return the materialized table."""
    spark = result.sparkSession
    q = (
        result.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    # file streaming source wants a directory; select the one table via
    # a glob filter
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream with a proper event-time column."""
    from map_reduce_spark.io import _parquet_has_nanos

    path = os.path.join(sf_dir, "events.parquet")
    if _parquet_has_nanos(path):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = (
            spark.readStream.schema(EVENTS_SCHEMA_RAW)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )
        # Watermarks require TIMESTAMP (LTZ), so the stream keeps LTZ
        # event time; LTZ stores raw epoch micros, so window bucketing
        # and unix_timestamp() on it are session-timezone-independent.
        # Only *rendering* wall-clock strings needs the NTZ detour (see
        # streaming_tumbling_watermark).
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # µs-precision file: borrow the batch reader's scanned schema (file
    # streaming sources need one declared up front), then normalize ts to
    # LTZ via its epoch — TZ-free regardless of NTZ/LTZ inference.
    static_schema = spark.read.parquet(path).schema
    raw = (
        spark.readStream.schema(static_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = raw.schema["ts"].dataType.simpleString()
    if ts_type == "timestamp_ntz":
        return raw.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
            ),
        )
    return raw  # already TIMESTAMP (LTZ)


# --- jobs -------------------------------------------------------------


def streaming_word_count_plan(src: DataFrame) -> DataFrame:
    """Incremental word count — the reference's flagship job as a
    continuously-updating aggregation."""
    return (
        src.select(F.explode(F.split("text", "[^a-zA-Z]")).alias("token"))
        .filter(F.col("token") != "")
        .select(F.upper("token").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "streaming_word_count",
    oracle="""
SELECT upper(token) AS word, count(*) AS cnt FROM (SELECT
unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS token FROM documents)
WHERE token <> '' GROUP BY 1
""",
)
def streaming_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count executed INCREMENTALLY (Structured Streaming,
    AvailableNow) — must equal the batch pipeline's result."""
    plan = streaming_word_count_plan(stream_documents(spark, sf_dir))
    return _run_to_table(plan, "stream_wc", "complete")


def windowed_counts_plan(events: DataFrame) -> DataFrame:
    """5-minute tumbling window counts with a 10-minute watermark —
    the canonical late-data-tolerant streaming aggregation."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # exact scaled-long sum, decimal-division finish (_sumd):
            # same value as the decimal sum, 8-byte streaming state
            _sumd(F.col("value"), alias="total_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
    )


@register(
    "streaming_tumbling_watermark",
    oracle="""
SELECT strftime(TIMESTAMP '1970-01-01'
                + ((CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300)
                  * INTERVAL 1 SECOND,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
""",
)
def streaming_tumbling_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window aggregation, run incrementally; in
    complete mode every window survives to the final table, so the
    result equals the batch tumbling query (the approx-distinct column
    is dropped from the compared output)."""
    plan = windowed_counts_plan(stream_events(spark, sf_dir))
    out = _run_to_table(plan, "stream_tumble", "complete")
    return tumbling_render(out)


def tumbling_render(out: DataFrame) -> DataFrame:
    """TZ-free render of windowed_counts_plan output: LTZ -> epoch
    seconds -> NTZ calendar -> string (shared with the late-data
    certification in tests/test_streaming_late_data.py so the
    adversarial delivery is compared under the identical rendering)."""
    return out.select(
        F.expr(
            "date_format(timestampadd(SECOND, unix_timestamp(w.start), "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00'), 'yyyy-MM-dd HH:mm:ss')"
        ).alias("window_start"),
        "event_type",
        "n",
        "total_value",
    )


def session_plan(events: DataFrame) -> DataFrame:
    """Streaming sessionization: native session_window + watermark.

    Append mode only emits sessions the watermark has sealed; with
    AvailableNow over a finite source, that is every session except
    those within 30min+delay of the stream's max event time.
    """
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            _sumd(F.col("value"), alias="session_value"),
        )
    )


def run_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute streaming sessionization (append mode): only sessions
    the watermark has sealed are emitted."""
    out = _run_to_table(session_plan(stream_events(spark, sf_dir)), "stream_sess", "append")
    return out.select(
        "user_id",
        F.unix_timestamp(F.col("sw.start")).alias("session_start"),
        "n_events",
        "session_value",
    )


# Append-mode watermark semantics DO have an exact batch twin for a
# finite source: the gaps-and-islands sessions whose close precedes the
# final watermark (max event time - 10 min). The oracle reproduces
# Spark's sealing rule exactly: a session window ends 30 min after its
# last event, a >= 30 min gap starts a new session (session_window
# intervals are half-open), and a session is emitted iff its end < the
# final watermark.
_SESSION_ORACLE = """
WITH s AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
g AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
),
agg AS (
  SELECT user_id,
         CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start,
         MAX(ts) AS last_ts,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
  FROM g GROUP BY user_id, sid
)
SELECT user_id, session_start, n_events, session_value
FROM agg, (SELECT MAX(ts) AS mx FROM events)
WHERE last_ts + INTERVAL 30 MINUTE < mx - INTERVAL 10 MINUTE
"""


@register("streaming_session_window", oracle=_SESSION_ORACLE)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization (native ``session_window`` + watermark,
    append mode) — the sealed-session set must equal the batch
    gaps-and-islands sessions that close before the final watermark."""
    return run_streaming_sessions(spark, sf_dir)


@register(
    "streaming_sliding_window",
    oracle="""
SELECT strftime(TIMESTAMP '1970-01-01'
                + ((CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 - off)
                  * INTERVAL 1 SECOND,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       COUNT(*) AS n
FROM events, (SELECT UNNEST([0, 300]) AS off)
GROUP BY 1
""",
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min / 5 min slide) computed incrementally
    with a watermark; complete-mode result equals the batch sliding
    aggregation."""
    ev = stream_events(spark, sf_dir)
    plan = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    out = _run_to_table(plan, "stream_slide", "complete")
    return out.select(
        F.expr(
            "date_format(timestampadd(SECOND, unix_timestamp(w.start), "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00'), 'yyyy-MM-dd HH:mm:ss')"
        ).alias("window_start"),
        "n",
    )


@register(
    "streaming_dedup_exact",
    oracle="SELECT DISTINCT md5(text) AS fp FROM documents",
)
def streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup: streaming ``dropDuplicates`` on the
    content fingerprint — the state-store-backed dedup a continuous
    ingestion pipeline runs. The emitted fingerprint set must equal the
    batch DISTINCT (which is exactly what the oracle checks)."""
    src = stream_documents(spark, sf_dir)
    deduped = (
        src.select(F.md5("text").alias("fp"))
        .dropDuplicates(["fp"])
    )
    out = _run_to_table(deduped, "stream_dedup", "append")
    return out.select("fp")


@register(
    "streaming_static_join",
    oracle="""
SELECT c_mktsegment, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
""",
)
def streaming_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: the event stream enriched with a batch
    dimension (customer segment), then incrementally aggregated.

    The static side is planned as a broadcast hash join against every
    micro-batch — the standard dimension-enrichment topology (stream
    from Kafka, dims from a warehouse snapshot). Complete-mode totals
    must equal the batch join+aggregate, which the oracle checks.
    """
    from map_reduce_spark.io import load_table

    ev = stream_events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    plan = (
        ev.join(F.broadcast(cust), "user_id")
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count("*").alias("n"),
            _sumd(F.col("value"), alias="total_value"),
        )
    )
    return _run_to_table(plan, "stream_static_join", "complete")


@register(
    "streaming_stream_join",
    oracle="""
SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id,
       CAST(floor(epoch(b.ts)) AS BIGINT) - CAST(floor(epoch(a.ts)) AS BIGINT)
         AS gap_s
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 10 MINUTE
""",
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join with an event-time range condition:
    click→purchase attribution within 10 minutes, per user.

    Both sides carry watermarks and the join carries the time-range
    constraint, so the state store can evict rows once the watermark
    passes — the bounded-state topology for funnels/attribution at
    scale. With AvailableNow over a finite source every qualifying pair
    is emitted, so the result equals the batch self-join (the oracle).
    gap_s subtracts truncated epoch seconds (unix_timestamp), TZ-free.
    """
    clicks = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    purchases = (
        stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "10 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    out = _run_to_table(joined, "stream_stream_join", "append")
    return out.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias(
            "gap_s"
        ),
    )


def run_stateful_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    a running per-user event counter held in the state store.

    The state schema is one long per user; each micro-batch folds its
    rows into the state and emits the updated total. At scale the state
    store shards by the group key across executors and survives
    restarts via the checkpoint — this is the building block for any
    custom incremental aggregate Spark lacks natively.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = stream_events(spark, sf_dir).select("user_id", "event_id")

    def update(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [total]})

    out = events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long",
        stateStructType="n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stream_state_counts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # Latest emitted total per user == MAX(n_events): the counter is
    # monotone across micro-batches. (Ordering the memory sink by
    # monotonically_increasing_id would encode partition index, not
    # batch order — wrong once the source splits into multiple batches.)
    t = spark.table("stream_state_counts")
    return t.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


def run_foreach_batch_sink(spark: SparkSession, sf_dir: str, out_dir: str) -> int:
    """foreachBatch sink: per-microbatch custom writer (the exactly-once
    composition point for arbitrary sinks). Writes each batch's word
    counts as parquet under out_dir/batch=<id>; returns batches seen."""
    plan = streaming_word_count_plan(stream_documents(spark, sf_dir))
    seen: list[int] = []

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        seen.append(epoch_id)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={epoch_id}"))

    q = (
        plan.writeStream.outputMode("complete")
        .foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(out_dir, "_chk"))
        .start()
    )
    q.awaitTermination()
    return len(seen)


@register(
    "streaming_stateful_counts",
    oracle="SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id",
)
def streaming_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (``applyInPandasWithState``
    running per-user counters in the state store): with NoTimeout and a
    finite AvailableNow source, each user's final emitted total must
    equal the batch COUNT(*) — which is exactly what the oracle checks,
    making the custom-state path hash-verifiable, not just smoke-run."""
    return run_stateful_user_counts(spark, sf_dir)


def _tws_available() -> bool:
    """transformWithStateInPandas' driver worker speaks protobuf to the
    JVM state server (pyspark/sql/streaming/proto/StateMessage_pb2);
    without the ``protobuf`` package the runner crashes at init. Gate
    exactly like the jar-less JDBC/Delta sources (io.py)."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def run_tws_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator on the NEW Spark-4 API
    (``transformWithStateInPandas``): a ``StatefulProcessor`` holding
    TWO value states per user — running event count and running value
    total in integer cents.

    vs. ``applyInPandasWithState`` (the previous-generation API, kept
    in ``run_stateful_user_counts``): the processor object gets an
    explicit handle with named, independently-typed state variables
    (value/list/map state), timers, and TTL — the composition surface
    for real custom operators. State shards by group key across the
    cluster and survives restarts via the checkpoint, exactly like the
    old API. Cents are exact integers so the emitted totals are
    hash-comparable (NOTES rule 1: never a raw float aggregate).
    """
    if not _tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas requires the protobuf package "
            "(pyspark state-server protocol); not installed in this image"
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    events = stream_events(spark, sf_dir).select("user_id", "value")

    class UserStats(StatefulProcessor):
        # self-contained: worker-side imports only (NOTES rule 6)
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._n = handle.getValueState("n", "n long")
            self._cents = handle.getValueState("cents", "cents long")

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = self._n.get()[0] if self._n.exists() else 0
            cents = self._cents.get()[0] if self._cents.exists() else 0
            for pdf in rows:
                n += len(pdf)
                cents += int(round(float(pdf["value"].sum()) * 100))
            self._n.update((n,))
            self._cents.update((cents,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "value_cents": [cents]}
            )

        def close(self) -> None:
            pass

    out = events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType="user_id long, n_events long, value_cents long",
        outputMode="Update",
        timeMode="None",
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("tws_user_stats")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # both counters are monotone across micro-batches, so the final
    # state is the per-user MAX of each emitted column
    t = spark.table("tws_user_stats")
    return t.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max("value_cents").alias("value_cents"),
    )


def streaming_tws_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 ``transformWithStateInPandas`` stateful processor
    (two named value states per user) driven to completion on a finite
    AvailableNow source: final per-user (count, cents-total) must equal
    the batch aggregate — the new-generation custom-state path is
    hash-verified, not just smoke-run.

    Registered only when the protobuf dependency for pyspark's state-
    server protocol is importable (capability gate, like JDBC/Delta);
    ``applyInPandasWithState`` (streaming_stateful_counts) covers the
    custom-state category unconditionally."""
    return run_tws_user_stats(spark, sf_dir)


if _tws_available():
    streaming_tws_stats = register(
        "streaming_tws_stats",
        oracle="""
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
""",
    )(streaming_tws_stats)


@register(
    "streaming_dedup_watermark",
    oracle="""
SELECT DISTINCT user_id, event_type FROM events
""",
)
def streaming_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state: ``dropDuplicatesWithinWatermark``
    keeps the first arrival per key and — unlike plain
    ``dropDuplicates`` — EVICTS key state once the watermark passes it,
    so state stays proportional to the watermark window instead of the
    full key cardinality. That eviction bound is what makes streaming
    dedup viable on an unbounded 100 TB/day key stream.

    Under AvailableNow on a single input file everything lands in one
    micro-batch (watermark still at -inf), so no state is evicted and
    the emitted key set equals the batch DISTINCT — which is the
    oracle. Only key columns are emitted: "first row wins" picks a
    nondeterministic witness, the surviving KEY SET is deterministic.
    """
    ev = stream_events(spark, sf_dir).withWatermark("ts", "10 minutes")
    out = ev.select("user_id", "event_type", "ts").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    res = _run_to_table(
        out.select("user_id", "event_type"), "stream_ddw", "append"
    )
    return res.select("user_id", "event_type").distinct()


@register(
    "streaming_foreach_batch",
    oracle="""
SELECT upper(token) AS word, count(*) AS cnt FROM (SELECT
unnest(regexp_split_to_array(text, '[^a-zA-Z]')) AS token FROM documents)
WHERE token <> '' GROUP BY 1
""",
)
def streaming_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``foreachBatch`` custom sink: each micro-batch lands as parquet
    under ``batch=<epoch>`` through an idempotent overwrite keyed by
    the epoch id — the exactly-once composition point for sinks Spark
    has no native writer for (the safe version of the reference's
    append-mode output, worker.ex:124,147, which double-writes on
    retry). Complete mode means the LAST batch directory holds the full
    word count, which must equal the batch oracle."""
    import shutil
    import tempfile

    # stable per-process scratch path, wiped before each run — repeated
    # bench/correctness invocations reuse it instead of leaking a fresh
    # mkdtemp every call
    out = os.path.join(tempfile.gettempdir(), f"mr_spark_fb_sink_{os.getpid()}")
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    n_batches = run_foreach_batch_sink(spark, sf_dir, out)
    if n_batches < 1:
        raise RuntimeError(f"foreachBatch sink produced no micro-batches at {out}")
    last = max(
        int(d.split("=")[1]) for d in os.listdir(out) if d.startswith("batch=")
    )
    return spark.read.parquet(os.path.join(out, f"batch={last}"))


def streaming_psi_counts_plan(src: DataFrame) -> DataFrame:
    """Incremental (source, bin) histogram under the batch binning
    contract (monitoring.psi_bins) — the stateful half of the drift
    monitor. State is sources x 10 rows regardless of stream volume."""
    from map_reduce_spark.operators.monitoring import psi_bins

    return psi_bins(src).groupBy("source", "bin").agg(F.count("*").alias("c"))


def _psi_oracle() -> str:
    from map_reduce_spark.operators.monitoring import _PSI_ORACLE

    return _PSI_ORACLE


@register("streaming_drift_psi", oracle=_psi_oracle())
def streaming_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift alarm deployed on the ingest stream: the (source, bin)
    length histogram is maintained INCREMENTALLY by the state store
    (complete-mode aggregation — constant-size state, sources x 10
    rows), and each trigger a constant-size downstream job rescales it
    into per-source PSI vs the running whole-corpus distribution
    (monitoring.psi_from_counts — the identical math the batch
    `drift_psi` runs, so after draining the stream the emitted table
    must equal the batch result, which is what the shared oracle
    checks).

    Scale shape: the per-batch input is the only corpus-grain work
    (narrow select + partial agg into the state store); everything
    downstream of the state is sources x 10 rows. On a real cluster
    the same plan runs off Kafka with a processing-time trigger, and
    the PSI finish reads the state snapshot each interval.
    """
    from map_reduce_spark.operators.monitoring import psi_from_counts

    plan = streaming_psi_counts_plan(stream_documents(spark, sf_dir))
    counts = _run_to_table(plan, "stream_psi_counts", "complete")
    return psi_from_counts(counts)


# --- exactly-once state folds maintained ON the ingest stream ---------


def _chk_lineage_id(chk_dir: str) -> str | None:
    """The checkpoint's persistent query id (written by Spark at query
    start; stable across restarts of the SAME checkpoint, different for
    a fresh one) — the token that ties a state commit to its stream."""
    import json as _json

    path = os.path.join(chk_dir, "metadata")
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        raw = fh.read()
    # v1 metadata files carry a "v1\n" header line before the JSON
    return _json.loads(raw.splitlines()[-1])["id"]


def run_stream_state_fold(
    spark: SparkSession,
    state_dir: str,
    source: DataFrame,
    legs: tuple[str, ...],
    batch_state,
    merge,
    append_legs: frozenset[str] = frozenset(),
    consolidate_over: int | None = None,
) -> tuple[DataFrame, ...]:
    """Generic foreachBatch maintenance of mergeable state as
    parquet-at-rest tables — the engine's reusable exactly-once fold
    primitive (instantiated by the corpus-health report, the ANN
    index-delta fold, and the dedup signature-index fold).

    ``batch_state(df, cache)`` computes one micro-batch's state as a
    tuple of frames aligned with ``legs`` (``cache`` persists a shared
    subframe for the duration of the fold; the runner releases it).
    ``merge(stored, batch)`` folds two such tuples — it must be
    associative/commutative so replays and arbitrary micro-batch splits
    cannot change the result.

    The commit protocol makes the fold exactly-once under every failure
    the streaming runtime can replay (the streaming analog of the
    staged-commit sink; the reference's append-mode retry bug,
    worker.ex:124,147, is exactly this class):

    - all legs of epoch N are written under ONE fresh version directory
      ``v<N>/`` derived from the previous committed version;
    - a single marker file (``_commit``, atomic ``os.replace``) then
      commits ``{lineage, epoch}`` — so a crash anywhere mid-write
      leaves the previous commit fully intact (no per-leg torn state),
      and a replay of epoch N after a crash-before-commit re-folds
      from the old version onto a fresh ``v<N>/``;
    - a replay of epoch N after the commit is skipped by the epoch
      guard; an epoch OLDER than the committed one raises (a healthy
      checkpoint never rewinds — it means the offset log was
      lost/reset while the metadata file survived, and the stream is
      re-delivering folded data);
    - the marker records the checkpoint's persistent query id: folding
      a DIFFERENT stream lineage (a reset/relocated checkpoint, which
      would re-deliver already-folded data) into existing state raises
      loudly instead of silently double-counting or skipping.

    Durability envelope: the marker is fsynced (file + directory
    rename), so process crashes are exactly-once unconditionally; the
    parquet legs are not individually fsynced, so against power loss
    the immediately previous committed version is retained one extra
    commit for recovery.

    ``append_legs`` names legs whose state folds by DISJOINT union
    (e.g. a signature index: each doc's rows arrive in exactly one
    batch). For those, ``merge`` must return only the batch's NEW rows
    (the delta), and the commit materializes the full leg under
    ``v<N>/`` by hard-linking the previous version's parquet part
    files next to the freshly written delta files — per-commit DATA IO
    is O(batch), not O(accumulated index), while the read path and the
    versioned atomic-marker protocol are unchanged (Spark part-file
    names embed a per-job uuid, so linked and new files never
    collide; the sweep of superseded versions only drops directory
    entries — inodes survive through the links). On an object store
    the same shape is a manifest of immutable delta objects per
    version; hard links are the local-filesystem expression of it.

    Priced honestly, the link scheme's METADATA cost is NOT O(batch):
    every epoch adds >=1 part file per append leg and every commit
    re-links all prior files, so the per-commit link loop and every
    read-path file listing are O(epochs so far) — a long-running
    stream degrades into a many-small-files index. ``consolidate_over``
    bounds it: when a previous committed append leg holds at least
    that many part files, THIS commit rewrites the full leg (stored
    union delta, coalesced to a bounded file count) instead of
    delta+links. That makes the amortized data IO O(batch +
    index/consolidate_over) per commit — the standard LSM-style
    compaction trade — and it doubles as the state VACUUM: the
    consolidated version holds no links to the old delta files, so
    when the superseded version dirs are swept (post-commit, marker
    already landed) the delta inodes' last directory entries drop and
    the space is actually reclaimed. Crash-safety is inherited, not
    re-derived: a consolidation is just a different materialization of
    ``v<N>/`` under the identical write-everything-then-one-marker
    protocol (crash mid-rewrite -> previous version intact, nothing
    was deleted; crash after marker -> orphan sweep next fold), and
    because the one-extra-version retention applies unchanged, the
    vacuum frees an epoch's deltas one commit AFTER they were folded
    into a consolidation.

    Runs the stream to exhaustion (AvailableNow) and returns the
    committed state tuple, read from the final version directory."""
    import json as _json
    import shutil

    chk_dir = os.path.join(state_dir, "_chk")
    marker = os.path.join(state_dir, "_commit")

    def read_marker() -> dict | None:
        if not os.path.exists(marker):
            return None
        with open(marker) as fh:
            return _json.loads(fh.read())

    def fold_batch(df: DataFrame, epoch_id: int) -> None:
        cur = read_marker()
        lineage = _chk_lineage_id(chk_dir)
        if cur is not None:
            if cur["lineage"] != lineage:
                raise RuntimeError(
                    "stream state at "
                    f"{state_dir} was committed under stream lineage "
                    f"{cur['lineage']}, but this query runs lineage "
                    f"{lineage} (a fresh/relocated checkpoint re-delivers "
                    "already-folded data): reset the state dir with the "
                    "checkpoint, or restore the original checkpoint"
                )
            if epoch_id == cur["epoch"]:
                return  # post-commit replay of this epoch: already folded
            if epoch_id < cur["epoch"]:
                # a healthy checkpoint never rewinds: Spark re-runs at
                # most the LAST uncommitted batch (== the marker epoch).
                # Seeing an OLDER epoch means the checkpoint's offset
                # log was lost/reset while its metadata file survived —
                # the stream is re-delivering data this state already
                # folded, and silently skipping could also drop NEW
                # rows batched under a recycled epoch id. Refuse.
                raise RuntimeError(
                    f"stream state at {state_dir} is committed through "
                    f"epoch {cur['epoch']} but the stream re-delivered "
                    f"epoch {epoch_id} under the same lineage (offset "
                    "log lost/reset?): reset the state dir together "
                    "with the checkpoint, or restore the full checkpoint"
                )
        # share one source scan (+ whatever subframes batch_state
        # registers) across the leg jobs; purely local lifecycle
        # (persist and release inside this call, after the writes
        # materialize) so nothing leaks past the micro-batch regardless
        # of which thread runs it
        local = [df]
        df.persist()

        def lcache(frame: DataFrame) -> DataFrame:
            frame.persist()
            local.append(frame)
            return frame

        try:
            state = batch_state(df, lcache)
            if cur is not None:
                stored = tuple(
                    spark.read.parquet(
                        os.path.join(state_dir, f"v{cur['epoch']}", leg)
                    )
                    for leg in legs
                )
                merged = merge(stored, state)
            else:
                merged = state
            vdir = os.path.join(state_dir, f"v{epoch_id}")
            shutil.rmtree(vdir, ignore_errors=True)  # crashed attempt
            for i, (leg, frame) in enumerate(zip(legs, merged)):
                dest = os.path.join(vdir, leg)
                if leg in append_legs and cur is not None:
                    prev = os.path.join(state_dir, f"v{cur['epoch']}", leg)
                    prev_files = [
                        f for f in os.listdir(prev) if f.endswith(".parquet")
                    ]
                    if (
                        consolidate_over is not None
                        and len(prev_files) >= consolidate_over
                    ):
                        # consolidation commit (see docstring): rewrite
                        # stored ∪ delta into a bounded file count; no
                        # links, so the post-commit sweep vacuums the
                        # folded-in delta inodes one version later
                        stored[i].unionByName(frame).coalesce(
                            max(1, consolidate_over // 4)
                        ).write.parquet(dest)
                    else:
                        # append commit: write the delta, link the
                        # previous version's data files alongside
                        # (metadata-only ops, zero data copied)
                        frame.write.parquet(dest)
                        for fname in prev_files:
                            os.link(
                                os.path.join(prev, fname),
                                os.path.join(dest, fname),
                            )
                else:
                    frame.write.parquet(dest)
            tmp = marker + ".tmp"
            with open(tmp, "w") as fh:
                fh.write(_json.dumps({"lineage": lineage, "epoch": epoch_id}))
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, marker)  # THE commit point, atomic
            dirfd = os.open(state_dir, os.O_RDONLY)
            try:
                os.fsync(dirfd)  # persist the rename itself
            finally:
                os.close(dirfd)
            # post-commit cleanup of superseded versions (crash here is
            # harmless — orphans are swept on the next fold). The
            # IMMEDIATELY previous committed version is retained one
            # extra commit: the parquet legs are not individually
            # fsynced, so on a power loss that persists the marker but
            # not all of v<N>'s data blocks, the prior version is still
            # on disk for manual recovery.
            keep = {f"v{epoch_id}"}
            if cur is not None:
                keep.add(f"v{cur['epoch']}")
            for d in os.listdir(state_dir):
                if d.startswith("v") and d not in keep:
                    shutil.rmtree(os.path.join(state_dir, d), ignore_errors=True)
        finally:
            for frame in local:
                frame.unpersist()

    q = (
        source.writeStream.outputMode("append")
        .foreachBatch(fold_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", chk_dir)
        .start()
    )
    q.awaitTermination()
    committed = read_marker()
    if committed is None:
        raise RuntimeError(
            f"stream drained without committing any state at {state_dir} "
            "— either the source matched no input files (check the "
            "path/glob: a zero-batch AvailableNow run commits nothing) "
            "or every micro-batch failed before its commit"
        )
    vdir = os.path.join(state_dir, f"v{committed['epoch']}")
    return tuple(spark.read.parquet(os.path.join(vdir, leg)) for leg in legs)


def run_streaming_health_fold(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    source: DataFrame | None = None,
) -> DataFrame:
    """foreachBatch maintenance of the corpus-health state
    (monitoring.health_batch_state legs) as parquet-at-rest tables:
    ``run_stream_state_fold`` instantiated with the health legs, each
    micro-batch folding its own mergeable state into the stored legs
    via the SAME merge_health_states the batch fold uses. After the
    stream drains, the committed state finishes into the per-source
    report with health_report_from_state."""
    from map_reduce_spark.operators.monitoring import (
        health_batch_state,
        health_report_from_state,
        merge_health_states,
    )

    if source is None:
        source = stream_documents(spark, sf_dir)
    stored = run_stream_state_fold(
        spark,
        state_dir,
        source,
        legs=("psic", "gate", "dup", "sig"),
        batch_state=lambda df, cache: health_batch_state(df, cache=cache),
        merge=merge_health_states,
    )
    return health_report_from_state(*stored)


def _health_fold_oracle() -> str:
    from map_reduce_spark.operators.monitoring import _HEALTH_FOLD_ORACLE

    return _HEALTH_FOLD_ORACLE


@register("streaming_health_report", oracle=_health_fold_oracle())
def streaming_health_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """health_report_fold deployed ON the ingest stream: foreachBatch
    folds each micro-batch's mergeable health state into parquet-at-
    rest state tables (single-marker atomic commit, epoch- and
    lineage-guarded — see run_streaming_health_fold), and draining the
    stream finishes the stored state into the identical per-source
    admission report — same merge, same finish, same oracle as the
    batch fold, so the continuously-maintained report can never drift
    from the per-drop recomputation.

    Scale shape: per micro-batch the corpus-grain work is that batch's
    one-scan state computation; the stored legs are state-sized
    (sources x 10 / x 2 / x 64 + the index-grain dup ledger), so each
    fold moves state, never history. On a real cluster the same
    foreachBatch runs off Kafka with a processing-time trigger and the
    state legs live as bucketed tables, making the merge shuffle-free.
    """
    import tempfile

    # fresh dir per invocation: concurrent or repeated calls in one
    # process must not clobber each other's live state (the returned
    # frame stays lazy over these parquet legs, so reap at exit, not
    # here — bounding the leak to the process lifetime)
    state_dir = tempfile.mkdtemp(prefix="mr_spark_health_state_")
    _reap_at_exit(state_dir)
    return run_streaming_health_fold(spark, sf_dir, state_dir)


def _reap_at_exit(path: str) -> None:
    import atexit
    import shutil

    atexit.register(shutil.rmtree, path, ignore_errors=True)


# --- the ANN index maintained ON the ingest stream --------------------

EMBEDDINGS_SCHEMA = "vec_id long, embedding array<float>, label int"


def stream_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(EMBEDDINGS_SCHEMA)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
    )


def run_streaming_ann_delta_fold(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    source: DataFrame | None = None,
) -> DataFrame:
    """The incremental-ANN maintenance loop deployed ON the ingest
    stream: each micro-batch of new vectors becomes a metadata DELTA
    (similarity.ann_delta_frame — exact assignment to the STORED
    centroids, per-cell sums/counts) folded into the parquet-at-rest
    accumulated delta by ``run_stream_state_fold``; draining the stream
    consolidates stored metadata + fold with ann_compact_frames, the
    identical finish the periodic batch compaction uses.

    The certified output drops ``n_deltas`` (how many micro-batches
    touched a cell is trigger-dependent; every other column folds by
    SUM of vector-grain measures, so the result is invariant to how the
    runtime split the stream). Scale shape: per micro-batch the only
    corpus-grain work is that batch's explode + broadcast argmin
    (O(batch)); the stored accumulated delta and the index metadata are
    both (cells x dims) frames, so the fold and the finish move
    metadata, never the corpus."""
    from map_reduce_spark.io import load_table
    from map_reduce_spark.operators.similarity import (
        _UPSERT_MOD,
        _batch_terms,
        _iv4,
        _ivf_cell_stats,
        _upsert_assign,
        ann_compact_frames,
        ann_delta_frame,
        merge_ann_deltas,
    )

    # the stored index's metadata table, written once at rest (a
    # production index already persists this); every fold reads and
    # broadcasts it — the index side never contributes corpus-grain work
    cent_dir = os.path.join(state_dir, "index_cent")
    if not os.path.exists(cent_dir):
        iv = _iv4(load_table(spark, sf_dir, "embeddings")).filter(
            F.col("vec_id") % _UPSERT_MOD != 0
        )
        _ivf_cell_stats(iv).write.parquet(cent_dir)
    cent = spark.read.parquet(cent_dir)

    def batch_state(df: DataFrame, cache) -> tuple[DataFrame, ...]:
        bterms = cache(_batch_terms(_iv4(df)))
        assign = cache(_upsert_assign(bterms, cent))
        return (ann_delta_frame(assign, bterms),)

    if source is None:
        # today's arrivals: the batch side of the upsert split
        source = stream_embeddings(spark, sf_dir).filter(
            F.col("vec_id") % _UPSERT_MOD == 0
        )
    (delta,) = run_stream_state_fold(
        spark,
        state_dir,
        source,
        legs=("delta",),
        batch_state=batch_state,
        merge=lambda a, b: (merge_ann_deltas(a[0], b[0]),),
    )
    return ann_compact_frames(cent, delta).drop("n_deltas")


def _ann_stream_oracle() -> str:
    from map_reduce_spark.operators.similarity import _compact_oracle

    return _compact_oracle(include_deltas=False)


@register("streaming_ann_upsert", oracle=_ann_stream_oracle())
def streaming_ann_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ann_index_upsert/compact deployed ON the ingest stream — the
    third fold the exactly-once primitive hosts (with the health report
    and streaming_drift_psi): new vectors arrive as micro-batches, each
    folds an O(batch) metadata delta into parquet-at-rest state, and
    the drained stream finishes into the consolidated (cell, dim) index
    metadata — same assignment, same merge, same finish as the batch
    maintenance operators, so the continuously-maintained index can
    never drift from the periodic recomputation. Cites reference
    worker.ex:124,147 (the append-mode retry class this protocol
    fixes). See run_streaming_ann_delta_fold for the commit protocol
    and scale shape."""
    import tempfile

    state_dir = tempfile.mkdtemp(prefix="mr_spark_ann_state_")
    _reap_at_exit(state_dir)
    return run_streaming_ann_delta_fold(spark, sf_dir, state_dir)


# --- the dedup signature index maintained ON the ingest stream --------


def run_streaming_dedup_fold(
    spark: SparkSession,
    sf_dir: str,
    state_dir: str,
    source: DataFrame | None = None,
    consolidate_over: int = 64,
) -> DataFrame:
    """The incremental-dedup maintenance loop deployed ON the ingest
    stream: each micro-batch of new documents contributes its band
    table (the signature-index delta) and its collision candidates
    (within the batch from batch_state; against the accumulated index
    from the merge), both APPEND legs — each commit writes O(batch +
    collisions) and hard-links the existing index (see
    run_stream_state_fold's append_legs). Draining the stream
    compacts: one Jaccard verify over the accumulated candidate
    ledger, kill the min-id losers, emit the consolidated survivor
    index — the identical finish, merge, and oracle as the periodic
    batch compaction (dedup.dedup_index_compact), so the continuously
    maintained index can never drift from the one-shot recomputation.

    Scale shape: per micro-batch the corpus-grain work is the batch's
    signature pass; the candidate join probes the stored index on
    (band, bucket) — bucketed storage makes it shuffle-free on the
    index side — and the ledger grows only with true collisions. Text
    is touched once, at compaction, for colliding ids only.
    ``consolidate_over`` bounds the append legs' file count (and
    retires folded-in delta files): every time a leg accumulates that
    many part files, the next commit rewrites it consolidated — see
    run_stream_state_fold for the amortized cost and crash story.
    """
    from map_reduce_spark.io import load_table
    from map_reduce_spark.operators.dedup import (
        dedup_batch_state,
        dedup_compact_finish,
        merge_dedup_states,
    )

    if source is None:
        source = stream_documents(spark, sf_dir)
    bands, cand = run_stream_state_fold(
        spark,
        state_dir,
        source,
        legs=("bands", "cand"),
        batch_state=lambda df, cache: dedup_batch_state(df, cache=cache),
        merge=lambda s, b: merge_dedup_states(s, b, deltas_only=True),
        append_legs=frozenset({"bands", "cand"}),
        consolidate_over=consolidate_over,
    )
    return dedup_compact_finish(
        bands, cand, load_table(spark, sf_dir, "documents")
    )


def _dedup_compact_oracle() -> str:
    from map_reduce_spark.operators.dedup import _DEDUP_COMPACT_ORACLE

    return _DEDUP_COMPACT_ORACLE


@register("streaming_dedup_incremental", oracle=_dedup_compact_oracle())
def streaming_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedup_index_compact deployed ON the ingest stream — the fourth
    fold the exactly-once primitive hosts, and the first with APPEND
    legs (the signature index folds by disjoint union, so each commit
    appends O(batch) instead of rewriting the corpus-sized index).
    Cites reference worker.ex:124,147 (the append-mode retry class the
    commit protocol fixes). See run_streaming_dedup_fold for the fold
    and scale shape."""
    import tempfile

    state_dir = tempfile.mkdtemp(prefix="mr_spark_dedup_state_")
    _reap_at_exit(state_dir)
    return run_streaming_dedup_fold(spark, sf_dir, state_dir)
