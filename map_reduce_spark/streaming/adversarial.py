"""Adversarial event-time delivery for certifying watermark semantics.

The file-streaming sources the registered ``streaming_*`` queries drain
deliver event time in near-arrival order (one parquet file per
trigger). Real ingestion does not: events arrive shuffled, late, and
split across micro-batches arbitrarily. This module builds an
offset-tracked Python DataSource stream (Spark 4
``SimpleDataSourceStreamReader`` — the same contract as
``python_datasource_stream``) that delivers a FIXED, caller-chosen
batch schedule of (ts_us, user_id, event_type, value) rows: each
trigger serves exactly one predetermined batch, so tests can plant
late rows on either side of the watermark with wide margins and know
precisely which micro-batch the watermark advanced in.

Offsets are ``{"batch": n}``; ``read`` is driver-side prefetch
returning a PICKLABLE iterator (NOTES rule 19), ``readBetweenOffsets``
replays any committed range verbatim on restart — which is what makes
the checkpoint-recovery test honest: the replayed rows are
byte-identical to the lost ones.

Used by tests/test_streaming_late_data.py; kept in the package because
an adversarial replayable source is also the deployment-side tool for
REPRODUCING a production watermark incident from logged batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# one registered source name per (process, schedule-id): re-registering
# under the same name replaces the class, so distinct schedules in one
# session need distinct ids
_SCHEMA = "ts_us long, user_id long, event_type string, value double"


def late_events_source(
    spark: SparkSession,
    batches: list[list[tuple]],
    name: str,
    gate_dir: str | None = None,
) -> DataFrame:
    """A streaming DataFrame that delivers ``batches[i]`` (rows of
    ``(ts_us, user_id, event_type, value)``) as micro-batch ``i`` and
    then reports caught-up. The batch list is captured by value into
    the DataSource (self-contained closure — executors and the
    driver-side prefetcher never import this module).

    ``gate_dir`` makes the schedule's micro-batch alignment EXACT: the
    engine's driver-side prefetcher polls ``read`` eagerly and would
    otherwise coalesce several scheduled batches into one micro-batch,
    collapsing the per-batch watermark advances the certification
    relies on (and ``SimpleDataSourceStreamReader.commit`` is not
    forwarded by the runner in this Spark build, so commit-gating is
    unavailable). With a gate dir, batch ``n`` is served only once
    ``<gate_dir>/allow_<n>`` exists; the test drops each allow file
    after OBSERVING the previous micro-batch complete in the query
    progress — one scheduled batch per micro-batch, deterministically.
    The first offset the reader is asked for is always served (a
    checkpoint restart begins mid-schedule and must not deadlock)."""
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    all_batches = [list(map(tuple, b)) for b in batches]
    schema = _SCHEMA
    src_name = f"late_events_{name}"
    gate = gate_dir

    class _LateReader(SimpleDataSourceStreamReader):
        def __init__(self):
            self._first: int | None = None

        def initialOffset(self):
            return {"batch": 0}

        def _allowed(self, n: int) -> bool:
            import os

            if gate is None:
                return True
            if self._first is None:
                self._first = n
            return n == self._first or os.path.exists(
                os.path.join(gate, f"allow_{n}")
            )

        def read(self, start):
            n = start["batch"]
            if n >= len(all_batches) or not self._allowed(n):
                return iter([]), {"batch": n}
            return iter(all_batches[n]), {"batch": n + 1}

        def readBetweenOffsets(self, start, end):
            rows: list[tuple] = []
            for n in range(start["batch"], end["batch"]):
                rows.extend(all_batches[n])
            return iter(rows)

    class LateEventsSource(DataSource):
        @classmethod
        def name(cls):
            return src_name

        def schema(self):
            return schema

        def simpleStreamReader(self, schema):
            return _LateReader()

    spark.dataSource.register(LateEventsSource)
    return spark.readStream.format(src_name).load()


def interleaved_schedule(rows: list[tuple], n_batches: int) -> list[list[tuple]]:
    """The canonical adversarial schedule: sort by event time, deal
    round-robin into ``n_batches`` — every batch spans the whole time
    range, so every batch after the first is full of rows that are LATE
    relative to the previous batch's maximum (the worst sustained
    out-of-orderness with no dropped data when the plan tolerates the
    full range). Deterministic: no randomness, derived only from the
    row order."""
    ordered = sorted(rows)
    return [ordered[i::n_batches] for i in range(n_batches)]
