"""Out-of-order / late-data certification of the watermark family
(round-8 verdict item 7): the registered streaming queries drain
near-ordered file sources, so these tests re-drive the same plans
through the adversarial offset-tracked Python source
(``streaming.adversarial``) that delivers shuffled, late event-time
batches on a KNOWN schedule — making the exact drop/seal behavior
predictable and assertable — plus a checkpoint-recovery run under the
same adversarial delivery."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from map_reduce_spark.streaming.adversarial import (
    interleaved_schedule,
    late_events_source,
)
from map_reduce_spark.streaming.jobs import tumbling_render, windowed_counts_plan

MIN_US = 60 * 1_000_000


def _end_batch(progress) -> int | None:
    """Extract the source endOffset's batch number from a progress
    event; Spark renders the offset dict in JSON or Python-repr form
    depending on path, so parse the number, not the syntax."""
    import re

    if not progress["sources"]:
        return None
    end = progress["sources"][0]["endOffset"]
    if end is None:
        return None
    m = re.search(r"batch\D*(\d+)", str(end))
    return int(m.group(1)) if m else None



BASE_MIN = 600  # synthetic schedules start 10h after epoch: the engine
# INITIALIZES the event-time watermark to epoch 0, and row-level
# watermark consumers (dropDuplicatesWithinWatermark) drop input rows
# with ts <= watermark — epoch-adjacent event times silently vanish in
# the very first batch (round-8 lesson, NOTES rule 37)


def _with_ts(src):
    return src.withColumn("ts", F.timestamp_micros("ts_us"))


def _run(
    spark,
    plan,
    name: str,
    mode: str,
    total_rows: int,
    chk: str | None = None,
    gate: str | None = None,
):
    """Drain the adversarial source: SimpleDataSourceStreamReader has no
    AvailableNow support, so run the default micro-batch trigger and
    stop once (a) every scheduled row was delivered and (b) progress has
    gone quiet for 3 s — long enough for the post-advance no-data batch
    that emits newly-sealed windows / evicts state. With ``gate`` set,
    each completed micro-batch (observed via its source endOffset)
    unlocks the NEXT scheduled batch, pinning one scheduled batch per
    micro-batch."""
    import os
    import time

    w = plan.writeStream.outputMode(mode).format("memory").queryName(name)
    if chk is not None:
        w = w.option("checkpointLocation", chk)
    q = w.start()
    try:
        deadline = time.time() + 240
        seen_batches: dict[int, int] = {}
        last_change = time.time()
        while True:
            if q.exception() is not None:
                raise q.exception()
            for p in q.recentProgress or []:
                bid = p["batchId"]
                if bid not in seen_batches:
                    seen_batches[bid] = p["numInputRows"]
                    last_change = time.time()
                if gate is not None:
                    nb = _end_batch(p)
                    if nb is not None:
                        nxt = os.path.join(gate, f"allow_{nb}")
                        if not os.path.exists(nxt):
                            with open(nxt, "w") as fh:
                                fh.write("go")
                            last_change = time.time()
            if (
                sum(seen_batches.values()) >= total_rows
                and time.time() - last_change > 3.0
            ):
                break
            if time.time() > deadline:
                raise RuntimeError(f"adversarial stream stalled: {name}")
            time.sleep(0.2)
    finally:
        q.stop()
    q.awaitTermination(30)
    return spark.table(name)


def _real_event_rows(sf_dir: str) -> list[tuple]:
    """(ts_us, user_id, event_type, value) straight from the parquet
    file, TZ-free (pyarrow read; ts may be us or ns per SF)."""
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id", "event_type", "value"]
    )
    unit = t.column("ts").type.unit
    div = {"us": 1, "ns": 1000}[unit]
    ts = [v.value // div for v in t.column("ts")]
    return list(
        zip(
            ts,
            t.column("user_id").to_pylist(),
            t.column("event_type").to_pylist(),
            t.column("value").to_pylist(),
        )
    )


def test_tumbling_complete_invariant_under_shuffled_delivery(
    spark, duck, sf_dir, tmp_path
):
    """Complete-mode windowed aggregation must equal the batch oracle no
    matter how the stream interleaves event time: the real events table
    dealt round-robin into 7 batches (every batch after the first is
    entirely 'late' w.r.t. the previous maximum) must reproduce the
    registered streaming_tumbling_watermark oracle exactly."""
    from map_reduce_spark.registry import all_queries
    from tests.oracle import assert_frames_match

    rows = _real_event_rows(sf_dir)
    batches = interleaved_schedule(rows, 7)
    gate = str(tmp_path / "gate")
    os.makedirs(gate)
    src = late_events_source(spark, batches, "real7", gate_dir=gate)
    out = _run(
        spark,
        windowed_counts_plan(_with_ts(src)),
        "late_tumble",
        "complete",
        total_rows=len(rows),
        gate=gate,
    )
    got = tumbling_render(out)
    oracle = all_queries()["streaming_tumbling_watermark"].oracle
    assert_frames_match(
        got, duck.execute(oracle).fetchdf(), "late_tumble_complete"
    )


def test_append_drop_and_seal_exactly_per_watermark(spark, tmp_path):
    """Append mode under a hand-built schedule where every row is FAR
    from any watermark boundary, so Spark's exact drop/seal behavior is
    fully predictable: (a) late rows whose window closed before the
    batch's starting watermark are DROPPED; (b) late rows within the
    delay are ACCEPTED; (c) a window is emitted exactly when the
    watermark passes its end; (d) the unsealed tail is withheld."""
    e = lambda minute: ((BASE_MIN + minute) * MIN_US, 1, "a", 1.0)  # noqa: E731
    batches = [
        # b0: three rows in [0,5) + one at 30 -> watermark after b0 = 20
        [e(0), e(1), e(2), e(30)],
        # b1 (wm=20): two 'late' copies at minute 2 -> window [0,5) end 5
        # << 20 -> DROPPED; minute 22 -> window [20,25) end 25 > 20 ->
        # ACCEPTED; minute 60 advances wm to 50 after b1
        [e(2), e(2), e(22), e(60)],
        # b2 (wm=50): minute 100 advances wm to 90, sealing [60,65);
        # its own window [100,105) stays unsealed forever
        [e(100)],
    ]
    gate = str(tmp_path / "gate")
    os.makedirs(gate)
    src = late_events_source(spark, batches, "dropseal", gate_dir=gate)
    out = _run(
        spark,
        windowed_counts_plan(_with_ts(src)),
        "late_dropseal",
        "append",
        total_rows=sum(len(b) for b in batches),
        chk=str(tmp_path / "chk"),
        gate=gate,
    )
    got = {
        (r["window_start"], r["n"], r["total_value"])
        for r in tumbling_render(out).collect()
    }
    want = {
        ("1970-01-01 10:00:00", 3, 3.0),  # late copies dropped
        ("1970-01-01 10:20:00", 1, 1.0),  # in-delay late row accepted
        ("1970-01-01 10:30:00", 1, 1.0),
        ("1970-01-01 11:00:00", 1, 1.0),  # sealed by b2's wm advance
        # minute-100 window withheld: end 105 > final wm 90
    }
    assert got == want


def test_dedup_within_watermark_drops_and_evicts(spark, tmp_path):
    """dropDuplicatesWithinWatermark under adversarial delivery: a
    duplicate arriving shuffled/late but within the delay is dropped;
    once the watermark passes a key's expiry its state is evicted and
    the key re-emits. Schedule keeps every comparison >= 10 minutes
    away from a boundary."""
    r = lambda minute, uid: ((BASE_MIN + minute) * MIN_US, uid, "x", 1.0)  # noqa: E731
    batches = [
        # b0: first arrivals (emit) + an in-batch dup (dropped)
        [r(0, 7), r(3, 7), r(0, 99)],
        # b1 (wm=-10): late shuffled dup of key 7 (dropped); key 99 at
        # minute 30 is a dup while its state is alive (dropped), and
        # advances wm to 20 after b1
        [r(5, 7), r(30, 99)],
        # b2 (wm=20): key 7 expired at 13 (=3+10) < 20 -> evicted ->
        # this arrival re-emits
        [r(40, 7)],
    ]
    gate = str(tmp_path / "gate")
    os.makedirs(gate)
    src = late_events_source(spark, batches, "ddw", gate_dir=gate)
    ev = _with_ts(src).withWatermark("ts", "10 minutes")
    plan = ev.select("user_id", "ts").dropDuplicatesWithinWatermark(["user_id"])
    out = _run(
        spark,
        plan.select("user_id", F.expr("unix_timestamp(ts)").alias("ts_s")),
        "late_ddw",
        "append",
        total_rows=sum(len(b) for b in batches),
        chk=str(tmp_path / "chk"),
        gate=gate,
    )
    got = {(r["user_id"], r["ts_s"] // 60 - BASE_MIN) for r in out.collect()}
    # key 99's minute-30 arrival is a dup while its state is alive (the
    # delay counts from the FIRST arrival, watermark hadn't evicted yet)
    # -> dropped; key 7's minute-40 arrival lands after eviction ->
    # re-emits. The in-batch witness for key 7 is nondeterministic
    # (partition order), so accept either first-cluster row.
    assert (7, 40) in got and (99, 0) in got
    assert len(got) == 3 and (got & {(7, 0), (7, 3)})


def test_append_recovery_under_adversarial_delivery(spark, tmp_path):
    """Kill/restart between adversarial batches: a first run drains
    batches 0-1 into a recoverable foreachBatch parquet sink, then a
    restarted query on the SAME checkpoint receives the full schedule
    and must emit exactly the missing sealed windows — union equals an
    uninterrupted run (state store + offset log recovery, with
    readBetweenOffsets available for uncommitted-range replay). The
    memory sink cannot recover from a checkpoint, hence the file sink
    here."""
    import time

    e = lambda minute: ((BASE_MIN + minute) * MIN_US, 1, "a", 1.0)  # noqa: E731
    b0 = [e(0), e(1), e(2), e(30)]
    b1 = [e(2), e(2), e(22), e(60)]
    b2 = [e(100)]
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")

    def drive(batches, name, total_rows, chk_dir, sink_dir):
        gate = str(tmp_path / f"gate_{name}")
        os.makedirs(gate, exist_ok=True)
        src = late_events_source(spark, batches, name, gate_dir=gate)
        plan = windowed_counts_plan(_with_ts(src))

        def sink(df, epoch_id):
            df.write.mode("append").parquet(sink_dir)

        q = (
            plan.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", chk_dir)
            .start()
        )
        try:
            deadline = time.time() + 240
            seen: dict[int, int] = {}
            last_change = time.time()
            while True:
                if q.exception() is not None:
                    raise q.exception()
                for p in q.recentProgress or []:
                    if p["batchId"] not in seen:
                        seen[p["batchId"]] = p["numInputRows"]
                        last_change = time.time()
                    nb = _end_batch(p)
                    if nb is not None:
                        nxt = os.path.join(gate, f"allow_{nb}")
                        if not os.path.exists(nxt):
                            open(nxt, "w").write("go")
                            last_change = time.time()
                if (
                    sum(seen.values()) >= total_rows
                    and time.time() - last_change > 3.0
                ):
                    break
                if time.time() > deadline:
                    raise RuntimeError(f"stalled: {name}")
                time.sleep(0.2)
        finally:
            q.stop()
        q.awaitTermination(30)

    def emitted(sink_dir):
        return {
            (r["window_start"], r["n"], r["total_value"])
            for r in tumbling_render(spark.read.parquet(sink_dir)).collect()
        }

    # phase 1: schedule ends at b1; wm after b1 = 50 seals three windows
    drive([b0, b1], "recov_p1", len(b0) + len(b1), chk, out_dir)
    rows1 = emitted(out_dir)
    assert rows1 == {
        ("1970-01-01 10:00:00", 3, 3.0),
        ("1970-01-01 10:20:00", 1, 1.0),
        ("1970-01-01 10:30:00", 1, 1.0),
    }

    # phase 2: restart on the SAME checkpoint; the source now carries b2
    # (same prefix — committed offsets are never re-read, and an
    # uncommitted tail would replay via readBetweenOffsets verbatim)
    drive([b0, b1, b2], "recov_p1", len(b2), chk, out_dir)
    rows2 = emitted(out_dir)
    assert rows2 == rows1 | {("1970-01-01 11:00:00", 1, 1.0)}

    # uninterrupted reference over the identical schedule
    ref_dir = str(tmp_path / "out_ref")
    drive([b0, b1, b2], "recov_ref", 9, str(tmp_path / "chk_ref"), ref_dir)
    assert emitted(ref_dir) == rows2
