"""Checkpoint recovery: a restarted stream must resume from its
checkpoint — no reprocessing of already-committed source files, and a
final result identical to the batch answer over everything seen.

This is the streaming half of the fault-tolerance parity story
(tests/test_fault_tolerance.py covers task retry): the reference
re-executes a dead worker's whole backlog (master.ex:89-101) and can
double-write (worker.ex:124,147); Structured Streaming's checkpoint
commits source offsets per micro-batch, so a restart is exactly-once
with respect to the file source.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from map_reduce_spark.streaming.jobs import DOCS_SCHEMA, streaming_word_count_plan


def _run_available_now(spark, src_dir: str, chk_dir: str, name: str):
    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        streaming_word_count_plan(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", chk_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows_in = sum(p["numInputRows"] for p in (q.recentProgress or []))
    return spark.table(name), rows_in



def test_restart_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_total = docs.count()
    first = docs.filter(F.col("doc_id") % 3 == 0)
    rest = docs.filter(F.col("doc_id") % 3 != 0)
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")

    # phase 1: only the first slice exists; stream runs to completion
    first.coalesce(1).write.mode("append").parquet(src)
    out1, rows1 = _run_available_now(spark, src, chk, "recov_phase1")
    assert rows1 == first.count()

    # phase 2: more files arrive; the SAME checkpoint resumes — it must
    # read ONLY the new files (offsets for phase 1 are committed)...
    rest.coalesce(2).write.mode("append").parquet(src)
    out2, rows2 = _run_available_now(spark, src, chk, "recov_phase2")
    assert rows2 == rest.count(), "restart reprocessed committed files"

    # ...and the state restored from the checkpoint makes the final
    # complete-mode counts equal the batch answer over ALL rows.
    expect = (
        docs.select(F.explode(F.split("text", "[^a-zA-Z]")).alias("token"))
        .filter(F.col("token") != "")
        .select(F.upper("token").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    got = {r["word"]: r["cnt"] for r in out2.collect()}
    want = {r["word"]: r["cnt"] for r in expect.collect()}
    assert got == want
    assert rows1 + rows2 == n_total


def test_python_stream_source_restart_exactly_once(spark, tmp_path):
    """Checkpoint-restart for the CUSTOM Python streaming source
    contract (python_datasource_stream's SimpleDataSourceStreamReader):
    phase 1 is stopped mid-stream, phase 2 resumes from the same
    checkpoint — committed offset ranges are not re-read, the
    interrupted range is replayed via readBetweenOffsets, and the file
    sink lands every row exactly once."""
    import json
    import time

    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    n_rows, step = 4000, 400

    class _SlowReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            time.sleep(0.25)  # pace batches so phase 1 stops mid-stream
            pos = start["pos"]
            end = min(pos + step, n_rows)
            return iter([(n,) for n in range(pos, end)]), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return iter([(n,) for n in range(start["pos"], end["pos"])])

    class SlowSource(DataSource):
        @classmethod
        def name(cls):
            return "synth_stream_slow"

        def schema(self):
            return "n bigint"

        def simpleStreamReader(self, schema):
            return _SlowReader()

    spark.dataSource.register(SlowSource)
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    def start():
        return (
            spark.readStream.format("synth_stream_slow")
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )

    def committed_count():
        try:
            return spark.read.parquet(sink).count()
        except Exception:
            return 0

    # phase 1: stop after some but (paced) not all batches landed
    q = start()
    deadline = time.time() + 120
    while committed_count() < step:
        assert q.exception() is None, q.exception()
        assert time.time() < deadline, "phase 1 never produced a batch"
        time.sleep(0.1)
    q.stop()
    q.awaitTermination(30)
    mid = committed_count()
    assert 0 < mid < n_rows, f"phase 1 should stop mid-stream, landed {mid}"

    # phase 2: same checkpoint resumes; runs to completion
    q = start()
    deadline = time.time() + 120
    while committed_count() < n_rows:
        assert q.exception() is None, q.exception()
        assert time.time() < deadline, "phase 2 stalled"
        time.sleep(0.1)
    q.stop()
    q.awaitTermination(30)

    ns = sorted(r.n for r in spark.read.parquet(sink).collect())
    assert ns == list(range(n_rows)), (
        "restart must replay uncommitted ranges exactly once "
        f"(got {len(ns)} rows, {len(set(ns))} distinct)"
    )


def test_delta_cdf_stream_checkpoint_restart_no_duplicates(spark, tmp_path):
    """Kill the CDF stream mid-history, restart from the checkpoint,
    land more commits: the drained feed has every change exactly
    once."""
    import os
    import time

    import map_reduce_spark.sources.delta_py as D
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    d = spark.createDataFrame([(i, i * 10) for i in range(8)], "id bigint, v bigint")
    D.write_delta_py(d, tbl, mode="overwrite", stats_cols=("id",))
    D.set_delta_table_property(tbl, "delta.enableChangeDataFeed", "true")
    D.update_where(spark, tbl, F.col("id") == 1, {"v": F.lit(111).cast("long")})
    out_dir, chk = str(tmp_path / "out"), str(tmp_path / "chk")

    def sink(df, epoch_id):
        df.write.mode("append").parquet(out_dir)

    def drain(n_target):
        q = (
            D.stream_delta_cdf(spark, tbl)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .start()
        )
        try:
            deadline = time.time() + 120
            while True:
                if q.exception() is not None:
                    raise q.exception()
                try:
                    n = spark.read.parquet(out_dir).count()
                except Exception:
                    n = 0
                if n >= n_target:
                    return
                assert time.time() < deadline, "stream stalled"
                time.sleep(0.2)
        finally:
            q.stop()
            q.awaitTermination(30)

    drain(8 + 2)  # insert x8 + pre/post
    D.delete_where(spark, tbl, F.col("id") == 7)  # lands while stream is DOWN
    drain(8 + 2 + 1)  # restart picks up exactly the delete
    got = sorted(
        (r["_change_type"], r["id"], r["v"])
        for r in spark.read.parquet(out_dir).collect()
    )
    want = sorted(
        [("insert", i, i * 10) for i in range(8)]
        + [("update_preimage", 1, 10), ("update_postimage", 1, 111),
           ("delete", 7, 70)]
    )
    assert got == want
