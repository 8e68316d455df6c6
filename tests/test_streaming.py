"""Streaming jobs vs their batch twins (the batch plan is the oracle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_streaming_word_count_equals_batch(spark, sf_dir):
    from map_reduce_spark.operators.wordcount import count_reduce
    from map_reduce_spark.streaming.jobs import streaming_word_count

    got = {(r.word, r.cnt) for r in streaming_word_count(spark, sf_dir).collect()}
    want = {(r.word, r.cnt) for r in count_reduce(spark, sf_dir).collect()}
    assert got == want


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from map_reduce_spark.operators.events import window_tumbling
    from map_reduce_spark.streaming.jobs import streaming_tumbling_watermark

    got = {
        (r.window_start, r.event_type, r.n, round(r.total_value, 6))
        for r in streaming_tumbling_watermark(spark, sf_dir).collect()
    }
    want = {
        (r.window_start, r.event_type, r.n, round(r.total_value, 6))
        for r in window_tumbling(spark, sf_dir).select(
            "window_start", "event_type", "n", "total_value"
        ).collect()
    }
    assert got == want


def test_streaming_sessions_subset_of_batch(spark, sf_dir):
    from map_reduce_spark.operators.events import session_window
    from map_reduce_spark.streaming.jobs import run_streaming_sessions

    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in run_streaming_sessions(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.session_start, r.n_events)
        for r in session_window(spark, sf_dir).collect()
    }
    assert got, "append-mode stream should seal at least the early sessions"
    assert got <= want, "streamed sessions must be a subset of batch sessions"
    # everything sealed by the final watermark must have been emitted:
    # only sessions near the stream's max event time may be withheld
    missing = want - got
    if missing:
        max_start = max(s for _, s, _ in want)
        assert all(s >= max_start - 3 * 3600 for _, s, _ in missing), (
            "only tail sessions may be unsealed"
        )


def test_stateful_user_counts_equals_batch(spark, sf_dir):
    from map_reduce_spark.io import load_table
    from map_reduce_spark.streaming.jobs import run_stateful_user_counts

    got = {
        (r.user_id, r.n_events)
        for r in run_stateful_user_counts(spark, sf_dir).collect()
    }
    want = {
        (r.user_id, r.n)
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_foreach_batch_sink(spark, sf_dir, tmp_path):
    from map_reduce_spark.streaming.jobs import run_foreach_batch_sink

    n = run_foreach_batch_sink(spark, sf_dir, str(tmp_path))
    assert n >= 1
    out = spark.read.parquet(str(tmp_path / "batch=0"))
    assert out.count() > 0 and set(out.columns) == {"word", "cnt"}


def test_tws_gate_matches_capability(spark, sf_dir):
    """transformWithStateInPandas registers only when its protobuf
    dependency exists; either way the capability is handled cleanly."""
    from map_reduce_spark.registry import all_queries
    from map_reduce_spark.streaming import jobs

    registered = "streaming_tws_stats" in all_queries()
    assert registered == jobs._tws_available()
    if not jobs._tws_available():
        with pytest.raises(NotImplementedError, match="protobuf"):
            jobs.run_tws_user_stats(spark, str(sf_dir))


def test_stateful_agg_on_rocksdb_state_store(spark, sf_dir, tmp_path):
    """Production state-store posture: the same watermarked streaming
    aggregation runs on the RocksDB provider (state off-heap + spill,
    the 100 TB configuration) and matches the batch answer."""
    from map_reduce_spark.streaming.jobs import stream_documents, streaming_word_count_plan

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = stream_documents(spark, str(sf_dir))
        q = (
            streaming_word_count_plan(stream)
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocksdb_wc")
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r["word"], r["cnt"]) for r in spark.table("rocksdb_wc").collect()
        }
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        want = {
            (r["word"], r["cnt"])
            for r in docs.select(
                F.explode(F.split("text", "[^a-zA-Z]")).alias("t")
            )
            .filter(F.col("t") != "")
            .select(F.upper("t").alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_streaming_drift_psi_equals_batch(spark, sf_dir):
    from map_reduce_spark.operators.monitoring import drift_psi
    from map_reduce_spark.session import release_caches
    from map_reduce_spark.streaming.jobs import streaming_drift_psi

    got = {
        (r.source, r.n_docs, r.psi)
        for r in streaming_drift_psi(spark, sf_dir).collect()
    }
    want = {
        (r.source, r.n_docs, r.psi) for r in drift_psi(spark, sf_dir).collect()
    }
    assert got == want
    release_caches()
