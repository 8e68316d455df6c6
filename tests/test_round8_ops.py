"""Round-8 operators: append-leg consolidation/vacuum in the stream
state fold, the Avro scan's registry wiring, and the ANN maintenance
decision (recall gate -> selective rebuild set)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.session import release_caches


def _rows(df):
    return sorted(map(tuple, (tuple(r) for r in df.collect())))


def _leg_files(state_dir: str, version: int, leg: str) -> list[str]:
    d = os.path.join(state_dir, f"v{version}", leg)
    return [f for f in os.listdir(d) if f.endswith(".parquet")]


def test_dedup_fold_consolidation_vacuum_lifecycle(spark, sf_dir, tmp_path):
    """The full append-leg GC story on one state dir: a 4-batch stream
    folds with consolidate_over=2 (so consolidation commits interleave
    with delta+link commits), matches the one-shot compaction; then
    torn garbage from two simulated crash points (mid-write before
    marker; superseded version missed by the sweep) is planted, a 5th
    batch resumes the SAME checkpoint, and the final state must still
    equal the one-shot, with the garbage swept and the leg's file
    count bounded far below epoch count."""
    from map_reduce_spark.operators.dedup import dedup_index_compact
    from map_reduce_spark.streaming.jobs import (
        DOCS_SCHEMA,
        run_streaming_dedup_fold,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    src_dir = str(tmp_path / "docs_stream")
    for d in range(4):
        docs.filter(F.col("doc_id") % 5 == d).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)

    def make_source():
        return (
            spark.readStream.schema(DOCS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )

    run_streaming_dedup_fold(
        spark, sf_dir, state_dir, source=make_source(), consolidate_over=2
    )
    release_caches()

    # crash point A: a torn consolidation attempt (files written, marker
    # never moved) must be inert on resume
    torn = os.path.join(state_dir, "v999", "bands")
    os.makedirs(torn)
    with open(os.path.join(torn, "part-00000.parquet"), "w") as fh:
        fh.write("garbage from a crashed consolidation")
    # crash point B: a superseded version the post-commit sweep never
    # reached (crash after marker, before sweep)
    stale = os.path.join(state_dir, "v0", "bands")
    os.makedirs(stale, exist_ok=True)
    with open(os.path.join(stale, "part-stale.parquet"), "w") as fh:
        fh.write("stale")

    # batch 5 arrives; the resumed stream folds it and its commit sweeps
    docs.filter(F.col("doc_id") % 5 == 4).coalesce(1).write.mode(
        "append"
    ).parquet(src_dir)
    got = _rows(
        run_streaming_dedup_fold(
            spark, sf_dir, state_dir, source=make_source(), consolidate_over=2
        )
    )
    release_caches()
    want = _rows(dedup_index_compact(spark, sf_dir))
    release_caches()
    assert got == want

    versions = sorted(
        int(v[1:]) for v in os.listdir(state_dir) if v.startswith("v")
    )
    # garbage swept: only the committed version + its recovery point
    assert len(versions) == 2 and 999 not in versions and 0 not in versions

    # consolidation engaged: the recovery-point version's bands leg is
    # a single consolidated file (epoch 3 rewrote the 9-file pile), and
    # the committed version is that file linked + one epoch's delta —
    # bounded by (delta partitions + threshold), NOT by epoch count
    assert len(_leg_files(state_dir, versions[0], "bands")) == 1
    final_files = _leg_files(state_dir, versions[-1], "bands")
    assert 1 <= len(final_files) <= 16

    # vacuum actually reclaimed the folded-in deltas: every parquet
    # file still on disk under the state dir belongs to the two
    # retained versions (nothing orphaned elsewhere), and none of the
    # committed leg's files is a many-epochs link pile
    all_parquet = []
    for root, _, files in os.walk(state_dir):
        all_parquet += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    assert all(f"v{versions[0]}" in p or f"v{versions[-1]}" in p for p in all_parquet)


def test_dedup_fold_every_commit_consolidates(spark, sf_dir, tmp_path):
    """Threshold 1 = consolidate on every commit after the first: the
    most adversarial schedule for the rewrite path (stored state is
    ALWAYS a fresh consolidation, never a link chain) must still equal
    the one-shot compaction, with a single-file leg."""
    from map_reduce_spark.operators.dedup import dedup_index_compact
    from map_reduce_spark.streaming.jobs import (
        DOCS_SCHEMA,
        run_streaming_dedup_fold,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    src_dir = str(tmp_path / "docs_stream")
    for d in range(3):
        docs.filter(F.col("doc_id") % 3 == d).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
    state_dir = str(tmp_path / "state")
    os.makedirs(state_dir)
    source = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    got = _rows(
        run_streaming_dedup_fold(
            spark, sf_dir, state_dir, source=source, consolidate_over=1
        )
    )
    release_caches()
    want = _rows(dedup_index_compact(spark, sf_dir))
    release_caches()
    assert got == want
    versions = sorted(int(v[1:]) for v in os.listdir(state_dir) if v.startswith("v"))
    for leg in ("bands", "cand"):
        files = _leg_files(state_dir, versions[-1], leg)
        assert len(files) == 1
        # consolidated files are owned, not linked from prior versions
        full = os.path.join(state_dir, f"v{versions[-1]}", leg, files[0])
        assert os.stat(full).st_nlink == 1


# --- ann_maintenance_decision ------------------------------------------


def test_ann_maintenance_decision_matches_oracle(spark, duck, sf_dir):
    from map_reduce_spark.registry import all_queries
    from tests.oracle import assert_frames_match

    q = all_queries()["ann_maintenance_decision"]
    got = q.fn(spark, sf_dir)
    assert_frames_match(
        got, duck.execute(q.oracle).fetchdf(), "ann_maintenance_decision"
    )
    release_caches()


def test_ann_maintenance_decision_semantics(spark, sf_dir):
    """The decision must be exactly (growth flag from the compaction)
    OR (cell harbors recall misses): cross-check both inputs against
    the operators that own them."""
    from map_reduce_spark.operators.similarity import (
        _RECALL_K,
        ann_index_compact,
        ann_maintenance_decision,
        ann_recall_eval,
    )

    rows = {r["cell"]: r for r in ann_maintenance_decision(spark, sf_dir).collect()}
    release_caches()
    # growth side == the compaction's per-cell flag
    comp = ann_index_compact(spark, sf_dir).collect()
    release_caches()
    comp_flag = {}
    for r in comp:
        comp_flag[r["cell"]] = max(comp_flag.get(r["cell"], 0), r["needs_retrain"])
    for cell, flag in comp_flag.items():
        assert rows[cell]["growth_flagged"] == flag
    # miss side: total misses across cells == panel misses from the gate
    ev = ann_recall_eval(spark, sf_dir).collect()
    release_caches()
    total_missed = sum(_RECALL_K - r["hits"] for r in ev)
    assert sum(r["miss_count"] for r in rows.values()) == total_missed
    for r in rows.values():
        assert r["rebuild"] == int(r["growth_flagged"] == 1 or r["miss_count"] > 0)
