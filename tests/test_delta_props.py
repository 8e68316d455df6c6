"""Model-based property tests for the Delta codec: arbitrary
interleavings of append / overwrite / delete / merge / optimize /
stream-batch commits against an in-memory reference model, with the
table read back (latest AND at every historical version) after each
step; plus a REAL two-thread concurrency race (no monkeypatching) that
must serialize to one of the legal outcomes."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

import map_reduce_spark.sources.delta_py as D

# deterministic op scripts (NOTES rule 15: no entropy in fixtures) —
# each exercises a different interleaving of the commit kinds across
# checkpoint boundaries (interval 3)
SCRIPTS = [
    ["a10", "a20", "d<15", "m25", "o5", "a30", "opt", "d<8", "m40"],
    ["a50", "opt", "d<10", "a10", "m60", "opt", "o20", "a5", "d<22"],
    ["a1", "a1", "a1", "opt", "a1", "d<2", "m3", "opt", "a4"],
]


def _rows(spark, ids):
    if not ids:
        return spark.createDataFrame([], "id long, v long")
    return spark.createDataFrame([(i, i * 7) for i in sorted(ids)], "id long, v long")


def _read_ids(spark, tbl, version=None):
    df = D.read_delta_py(spark, tbl, version)
    return {(r.id, r.v) for r in df.collect()}


@pytest.mark.parametrize("script", SCRIPTS, ids=["s0", "s1", "s2"])
def test_log_replay_matches_model(spark, tmp_path, script):
    tbl = str(tmp_path / "t")
    model: dict[int, int] = {}  # id -> v
    history = []  # model snapshot after each committed version
    next_id = 0

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    for step in script:
        kind, arg = ("opt", "") if step == "opt" else (step[0], step[1:])
        n_before = len(D._list_log(tbl)[0])
        if kind == "a":  # append n fresh rows
            ids = fresh(int(arg))
            D.write_delta_py(
                _rows(spark, ids), tbl,
                mode="overwrite" if not history else "append",
                stats_cols=("id",), checkpoint_interval=3,
            )
            model.update({i: i * 7 for i in ids})
        elif kind == "o":  # overwrite with n fresh rows
            ids = fresh(int(arg))
            D.write_delta_py(
                _rows(spark, ids), tbl, mode="overwrite",
                stats_cols=("id",), checkpoint_interval=3,
            )
            model = {i: i * 7 for i in ids}
        elif kind == "d":  # delete ids < threshold (relative to min)
            if not model:
                continue
            thr = min(model) + int(arg[1:])
            D.delete_where(
                spark, tbl, F.col("id") < thr,
                stats_cols=("id",), checkpoint_interval=3,
            )
            model = {i: x for i, x in model.items() if i >= thr}
        elif kind == "m":  # merge: bump v of the top half + insert n new
            ids = fresh(int(arg))
            top = sorted(model)[len(model) // 2:]
            src_rows = [(i, model[i] + 1) for i in top] + [(i, i * 7) for i in ids]
            src = spark.createDataFrame(sorted(src_rows), "id long, v long")
            D.merge_upsert(spark, tbl, src, "id", stats_cols=("id",),
                           checkpoint_interval=3)
            model.update(dict(src_rows))
        elif kind == "opt":
            D.optimize_compact(spark, tbl, stats_cols=("id",),
                               checkpoint_interval=3)
        if len(D._list_log(tbl)[0]) == n_before:
            continue  # no-op (nothing to delete/compact): no version cut
        history.append(dict(model))
        assert _read_ids(spark, tbl) == {(i, x) for i, x in model.items()}

    # time travel: EVERY committed version must replay to its model
    # snapshot, whether reconstruction seeds from a checkpoint or not
    js, cps = D._list_log(tbl)
    assert len(js) == len(history)
    for v, snap_model in zip(js, history):
        assert _read_ids(spark, tbl, v) == {(i, x) for i, x in snap_model.items()}, (
            f"version {v} diverged (checkpoints at {cps})"
        )


def test_real_concurrent_appends_serialize(spark, tmp_path):
    """Eight racing threads, real put-if-absent contention: every
    append must land exactly once, versions must be a contiguous
    0..N-1, and the final table must hold all rows."""
    tbl = str(tmp_path / "t")
    D.write_delta_py(_rows(spark, [0]), tbl, mode="overwrite", stats_cols=("id",))
    errs = []

    def worker(k):
        try:
            ids = list(range(1000 * (k + 1), 1000 * (k + 1) + 10))
            D.write_delta_py(_rows(spark, ids), tbl, mode="append",
                             stats_cols=("id",))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    js, _ = D._list_log(tbl)
    assert js == list(range(9))  # contiguous versions, no gaps
    got = _read_ids(spark, tbl)
    want = {(0, 0)} | {
        (i, i * 7) for k in range(8) for i in range(1000 * (k + 1), 1000 * (k + 1) + 10)
    }
    assert got == want


def test_real_concurrent_stream_epochs_dedupe(spark, tmp_path):
    """Two incarnations of the SAME stream app race the same epochs:
    each epoch's rows must land exactly once regardless of which
    incarnation wins each commit."""
    tbl = str(tmp_path / "t")
    errs = []

    def incarnation():
        try:
            for epoch in range(4):
                ids = list(range(100 * epoch, 100 * epoch + 5))
                D.append_stream_batch(_rows(spark, ids), tbl, "app", epoch,
                                      stats_cols=("id",))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=incarnation) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    got = _read_ids(spark, tbl)
    want = {(i, i * 7) for e in range(4) for i in range(100 * e, 100 * e + 5)}
    assert got == want
    assert D.snapshot(tbl).txns == {"app": 3}


CDF_SCRIPTS = [
    ["a10", "d<5", "m8", "a6", "d<3", "opt", "m4"],
    ["a7", "m5", "opt", "d<4", "a3", "m2", "d<6"],
]


@pytest.mark.parametrize("script", CDF_SCRIPTS, ids=["c0", "c1"])
def test_cdf_feed_folds_to_final_state(spark, tmp_path, script):
    """Model-based CDF property: replaying the change feed (inserts,
    deletes, update postimages, in commit order) over an empty state
    must reproduce EXACTLY the final table — the CDC-consumer
    guarantee. Any leaked carry row, lost change, or misordered commit
    breaks the fold; preimages must match the pre-commit state."""
    tbl = str(tmp_path / "t")
    model: dict[int, int] = {}
    next_id = 0

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    first = True
    for step in script:
        kind, arg = ("opt", "") if step == "opt" else (step[0], step[1:])
        if kind == "a":
            ids = fresh(int(arg))
            D.write_delta_py(
                _rows(spark, ids), tbl,
                mode="overwrite" if first else "append",
                stats_cols=("id",), checkpoint_interval=3,
            )
            if first:
                D.set_delta_table_property(
                    tbl, "delta.enableChangeDataFeed", "true"
                )
                first = False
            model.update({i: i * 7 for i in ids})
        elif kind == "d":
            if not model:
                continue
            thr = min(model) + int(arg[1:])
            D.delete_where(spark, tbl, F.col("id") < thr,
                           stats_cols=("id",), checkpoint_interval=3)
            model = {i: x for i, x in model.items() if i >= thr}
        elif kind == "m":
            ids = fresh(int(arg))
            top = sorted(model)[len(model) // 2:]
            src_rows = [(i, model[i] + 1) for i in top] + [(i, i * 7) for i in ids]
            src = spark.createDataFrame(sorted(src_rows), "id long, v long")
            D.merge_upsert(spark, tbl, src, "id", stats_cols=("id",),
                           checkpoint_interval=3)
            model.update(dict(src_rows))
        elif kind == "opt":
            D.optimize_compact(spark, tbl, stats_cols=("id",),
                               checkpoint_interval=3)

    feed = D.read_delta_changes_cdf(spark, tbl, since_version=-1)
    by_commit: dict[int, list] = {}
    for r in feed.collect():
        by_commit.setdefault(r["_commit_version"], []).append(
            (r["_change_type"], r["id"], r["v"])
        )
    state: dict[int, int] = {}
    for v in sorted(by_commit):
        batch = by_commit[v]
        # phase 1: preimages and deletes verify against the PRE-commit
        # state (pre/post of one id interleave within a commit)
        for ct, rid, rv in batch:
            if ct == "update_preimage":
                assert state[rid] == rv, (v, rid)
            elif ct == "delete":
                assert state.pop(rid) == rv, (v, rid)
        # phase 2: postimages and inserts land
        for ct, rid, rv in batch:
            if ct == "insert":
                assert rid not in state, (v, rid)
                state[rid] = rv
            elif ct == "update_postimage":
                state[rid] = rv
    assert state == model
    assert state == dict(
        (r.id, r.v) for r in D.read_delta_py(spark, tbl).collect()
    )


@pytest.mark.parametrize("script", SCRIPTS, ids=["v0", "v1", "v2"])
def test_v2_checkpoint_equals_json_replay_at_head(spark, tmp_path, script):
    """After ANY mutation script: a v2 checkpoint cut at head, with
    every json commit and classic checkpoint at or below it expired,
    must reconstruct the identical head state (schema, adds, DV-free
    row set)."""
    import os

    tbl = str(tmp_path / "t")
    next_id = 0
    model: dict[int, int] = {}
    first = True

    def fresh(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        next_id += n
        return ids

    for step in script:
        kind, arg = ("opt", "") if step == "opt" else (step[0], step[1:])
        if kind == "a":
            ids = fresh(int(arg))
            D.write_delta_py(_rows(spark, ids), tbl,
                             mode="overwrite" if first else "append",
                             stats_cols=("id",), checkpoint_interval=3)
            first = False
            model.update({i: i * 7 for i in ids})
        elif kind == "o":
            ids = fresh(int(arg))
            D.write_delta_py(_rows(spark, ids), tbl, mode="overwrite",
                             stats_cols=("id",), checkpoint_interval=3)
            model = {i: i * 7 for i in ids}
        elif kind == "d":
            if not model:
                continue
            thr = min(model) + int(arg[1:])
            D.delete_where(spark, tbl, F.col("id") < thr,
                           stats_cols=("id",), checkpoint_interval=3)
            model = {i: x for i, x in model.items() if i >= thr}
        elif kind == "m":
            ids = fresh(int(arg))
            top = sorted(model)[len(model) // 2:]
            src_rows = [(i, model[i] + 1) for i in top] + [(i, i * 7) for i in ids]
            src = spark.createDataFrame(sorted(src_rows), "id long, v long")
            D.merge_upsert(spark, tbl, src, "id", stats_cols=("id",),
                           checkpoint_interval=3)
            model.update(dict(src_rows))
        elif kind == "opt":
            D.optimize_compact(spark, tbl, stats_cols=("id",),
                               checkpoint_interval=3)

    before = _read_ids(spark, tbl)
    assert before == {(i, x) for i, x in model.items()}
    snap = D.snapshot(tbl)
    D.write_checkpoint_v2(tbl, snap)
    logd = os.path.join(tbl, "_delta_log")
    for f in list(os.listdir(logd)):
        expired = (
            f.endswith(".json") and f[:20].isdigit() and not D._V2_CKPT_RE.match(f)
        ) or f.endswith(".checkpoint.parquet")
        if expired and int(f[:20]) <= snap.version:
            os.remove(os.path.join(logd, f))
    back = D.snapshot(tbl)
    assert back.version == snap.version
    assert back.metadata["schemaString"] == snap.metadata["schemaString"]
    assert set(back.adds) == set(snap.adds)
    assert _read_ids(spark, tbl) == before
