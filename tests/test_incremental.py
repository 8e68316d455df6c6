"""Incremental aggregate maintenance: folding any partition of the
input in any order — including through parquet at rest between folds —
must equal the one-shot aggregate exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_spark.incremental import merge_rollup, rollup_batch
from map_reduce_spark.io import load_table


def _as_dict(df):
    return {
        (r["event_type"], r["hb"]): (r["n"], r["value_cents"])
        for r in df.collect()
    }


def test_fold_equals_oneshot_any_order(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    want = _as_dict(rollup_batch(ev))
    for order in ([0, 1, 2], [2, 0, 1]):
        state = None
        for i in order:
            state = merge_rollup(state, ev.filter(F.col("event_id") % 3 == i))
        assert _as_dict(state) == want, f"fold order {order} diverged"


def test_fold_through_parquet_state_at_rest(spark, sf_dir, tmp_path):
    """State persisted between arrivals (the real deployment shape):
    write after each fold, reload before the next."""
    ev = load_table(spark, sf_dir, "events")
    want = _as_dict(rollup_batch(ev))
    state_path = str(tmp_path / "rollup_state")
    state = None
    for i in range(3):
        state = merge_rollup(state, ev.filter(F.col("event_id") % 3 == i))
        state.write.mode("overwrite").parquet(state_path)
        state = spark.read.parquet(state_path)
    assert _as_dict(state) == want

    # re-folding an empty batch is a no-op (idempotent wrt. no-data runs)
    state = merge_rollup(state, ev.filter(F.lit(False)))
    assert _as_dict(state) == want
