"""Incremental aggregate maintenance (continuous-aggregate /
materialized-view upsert): fold new data into a persisted rollup
without recomputing history.

The reference recomputes everything per job (its master schedules the
full input each run); a 100 TB engine cannot — the hourly rollup over
an append-only event stream must cost O(new data), not O(history).
The batch primitive here is the MERGE shape:

    state' = FULL OUTER JOIN(state, partial_agg(batch)) ON keys
             -> coalesce-sum every decomposable measure

which is exactly what Structured Streaming's stateful aggregation does
inside the state store (streaming/jobs.py holds the streaming twin);
this module is the batch-side, parquet-at-rest version a backfill or
late-partition repair runs.

Correctness requirements (tested in tests/test_incremental.py and
hash-verified via the ``incremental_rollup`` registered query):
- decomposable measures only (count/sum — avg derived at read time),
  carried as exact integers/decimals so re-composition is
  order-independent (NOTES rule 1);
- folding any partition of the input in any order equals the direct
  one-shot aggregate;
- each fold shuffles ONLY the new batch's partial aggregate (the
  state side is already keyed at rest — on a cluster, both sides
  bucketed by the group key makes the merge join shuffle-free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# measure columns carried by the rollup state
_MEASURES = ("n", "value_cents")


def rollup_batch(batch: DataFrame) -> DataFrame:
    """Partial hourly rollup of one batch of events:
    (event_type, hb) -> (n, value_cents). Cents are exact integers."""
    return batch.groupBy(
        "event_type", (F.col("ts_us") / F.lit(3_600_000_000)).cast("long").alias("hb")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("value_cents"),
    )


def merge_rollup(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Fold one batch into the rollup state (the MERGE upsert shape).

    Full outer join on the group keys + coalesce-sum of each measure:
    new keys insert, existing keys accumulate. With both sides bucketed
    by (event_type, hb) at rest this is a shuffle-free sort-merge; the
    batch side is partial-aggregated BEFORE the join, so the merge
    moves rollup-sized rows, never raw events.
    """
    delta = rollup_batch(batch)
    if state is None:
        return delta
    s = state.select(
        "event_type", "hb", *[F.col(m).alias(f"s_{m}") for m in _MEASURES]
    )
    d = delta.select(
        "event_type", "hb", *[F.col(m).alias(f"d_{m}") for m in _MEASURES]
    )
    merged = s.join(d, ["event_type", "hb"], "full_outer")
    return merged.select(
        "event_type",
        "hb",
        *[
            (
                F.coalesce(f"s_{m}", F.lit(0)) + F.coalesce(f"d_{m}", F.lit(0))
            ).alias(m)
            for m in _MEASURES
        ],
    )
