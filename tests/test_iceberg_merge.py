"""Iceberg copy-on-write MERGE: row-level correctness, candidate-file
write-amplification bounds, the stale-base commit pin, replay
idempotence, and the merge-on-read resurrection gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import map_reduce_spark.sources.iceberg_py as I


def _mk(spark, n=100):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 5).alias("grp"),
        (F.col("id") * 100).alias("cents"),
        F.concat(F.lit("row#"), F.col("id").cast("string")).alias("name"),
    )


def _merged_expect(spark, n=100):
    d = _mk(spark, n)
    kept = d.filter("id < 90")
    upd = d.filter("id >= 90").withColumn("cents", F.col("cents") + 1)
    ins = _mk(spark, 110).filter("id >= 100")
    return kept.unionByName(upd).unionByName(ins)


def _source(spark, n=100):
    upd = _mk(spark, n).filter("id >= 90").withColumn("cents", F.col("cents") + 1)
    ins = _mk(spark, 110).filter("id >= 100")
    return upd.unionByName(ins)


def test_merge_rowlevel_and_write_amplification(spark, tmp_path):
    tbl = str(tmp_path / "t")
    I.append_iceberg_snapshot(
        _mk(spark).repartitionByRange(5, "id"), tbl, [("grp", "bucket[2]")]
    )
    meta = I.load_table_metadata(tbl)
    snap = I._pick_snapshot(meta, None)
    total = len(I.scan_plan_for_snapshot(tbl, meta, snap)["data_files"])
    # the source keys live in the top id range: candidate files must be
    # a strict subset (per-file id bounds do the skipping)
    keys = tuple(range(90, 110))
    plan = I.scan_plan_for_snapshot(
        tbl, meta, snap, predicates=[("id", "in", keys)]
    )
    assert 0 < len(plan["data_files"]) < total
    I.merge_iceberg_upsert(spark, tbl, _source(spark), "id")
    got = I.read_iceberg_py(spark, tbl)
    want = _merged_expect(spark)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # untouched files must be carried, not rewritten: the new snapshot
    # adds at most candidates+inserts worth of files
    meta2 = I.load_table_metadata(tbl)
    snap2 = I._pick_snapshot(meta2, None)
    files2 = set(I.scan_plan_for_snapshot(tbl, meta2, snap2)["data_files"])
    files1 = set(I.scan_plan_for_snapshot(tbl, meta, snap)["data_files"])
    assert files1 & files2, "every file rewritten — skipping never engaged"


def test_merge_is_replay_idempotent(spark, tmp_path):
    tbl = str(tmp_path / "t")
    I.append_iceberg_snapshot(_mk(spark).repartition(3), tbl)
    I.merge_iceberg_upsert(spark, tbl, _source(spark), "id")
    first = I.read_iceberg_py(spark, tbl)
    want = _merged_expect(spark)
    assert first.exceptAll(want).count() == 0
    # second replay: inserts re-match as same-value updates
    I.merge_iceberg_upsert(spark, tbl, _source(spark), "id")
    again = I.read_iceberg_py(spark, tbl)
    assert again.exceptAll(want).count() == 0
    assert want.exceptAll(again).count() == 0


def test_rewrite_commit_pinned_to_planned_version(spark, tmp_path):
    """A racer landing between plan and commit must fail the rewrite
    publish (stale base) — never silently commit against the winner."""
    tbl = str(tmp_path / "t")
    I.append_iceberg_snapshot(_mk(spark, 20), tbl)
    base = I._load_meta_versioned(tbl)
    I.append_iceberg_snapshot(_mk(spark, 5).withColumn("id", F.col("id") + 500), tbl)
    descs = I._stage_parquet_files(
        _mk(spark, 3).withColumn("id", F.col("id") + 900), tbl, "m"
    )
    for d in descs:
        d["content"] = 0
    assert I._try_commit_rewrite(tbl, set(), descs, base=base) is None
    # table state unchanged by the failed attempt
    assert I.read_iceberg_py(spark, tbl).count() == 25


def test_merge_duplicate_source_keys_fail_loudly(spark, tmp_path):
    tbl = str(tmp_path / "t")
    I.append_iceberg_snapshot(_mk(spark, 10), tbl)
    dup = _mk(spark, 4).unionByName(_mk(spark, 2))
    with pytest.raises(Exception, match="duplicate keys"):
        I.merge_iceberg_upsert(spark, tbl, dup, "id")


def test_merge_refuses_mor_tables(spark, tmp_path):
    """Rewriting files without applying their delete files resurrects
    rows — the merge must gate, not guess (NOTES rule 42)."""
    tbl = str(tmp_path / "t")
    I.append_iceberg_snapshot(_mk(spark, 30), tbl)
    I.commit_positional_deletes(spark, tbl, F.col("id") < 3)
    with pytest.raises(NotImplementedError, match="merge-on-read"):
        I.merge_iceberg_upsert(spark, tbl, _source(spark), "id")


def test_delete_where_null_predicate_rows_kept(spark, tmp_path):
    """SQL DELETE keeps NULL-predicate rows — the exact trap the r8
    advisor found in the Delta delete: a victim file mixing TRUE and
    NULL rows must keep its NULL rows in the rewrite."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, None), (5, 50)], "id bigint, v bigint"
    )
    I.append_iceberg_snapshot(d, tbl)
    I.delete_iceberg_where(spark, tbl, F.col("v") > 20)  # NULL for 2,4
    got = sorted(r["id"] for r in I.read_iceberg_py(spark, tbl).collect())
    assert got == [1, 2, 4]  # NULL rows kept, only v>20 deleted


def test_delete_where_touches_only_victim_files(spark, tmp_path):
    tbl = str(tmp_path / "t")
    I.append_iceberg_snapshot(
        _mk(spark).repartitionByRange(5, "id"), tbl
    )
    meta = I.load_table_metadata(tbl)
    snap = I._pick_snapshot(meta, None)
    before = set(I.scan_plan_for_snapshot(tbl, meta, snap)["data_files"])
    I.delete_iceberg_where(spark, tbl, F.col("id") >= 95)
    meta2 = I.load_table_metadata(tbl)
    snap2 = I._pick_snapshot(meta2, None)
    after = set(I.scan_plan_for_snapshot(tbl, meta2, snap2)["data_files"])
    assert before & after, "non-victim files must be carried untouched"
    assert I.read_iceberg_py(spark, tbl).count() == 95
    # replay is a no-op commit (content-idempotent)
    v = I.delete_iceberg_where(spark, tbl, F.col("id") >= 95)
    assert I.read_iceberg_py(spark, tbl).count() == 95
    assert v == I._pick_snapshot(I.load_table_metadata(tbl), None)["snapshot-id"]


def test_delete_where_all_rows_of_a_file(spark, tmp_path):
    """A victim file whose every row matches produces an EMPTY rewrite:
    the commit carries only the manifest filter, no new files."""
    tbl = str(tmp_path / "t")
    I.append_iceberg_snapshot(_mk(spark, 50).repartitionByRange(5, "id"), tbl)
    I.delete_iceberg_where(spark, tbl, F.lit(True))
    assert I.read_iceberg_py(spark, tbl).count() == 0


def test_update_where_semantics(spark, tmp_path):
    """UPDATE applies set_exprs to predicate-TRUE rows only, keeps
    NULL-predicate rows unchanged, touches only victim files, and
    refuses MOR tables."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, 40)], "id bigint, v bigint"
    )
    I.append_iceberg_snapshot(d, tbl)
    I.update_iceberg_where(
        spark, tbl, F.col("v") > 20, {"v": F.col("v") * 2}
    )
    got = {r["id"]: r["v"] for r in I.read_iceberg_py(spark, tbl).collect()}
    assert got == {1: 10, 2: None, 3: 60, 4: 80}  # NULL row untouched
    import pytest as _pt

    with _pt.raises(KeyError, match="unknown columns"):
        I.update_iceberg_where(spark, tbl, F.lit(True), {"nope": F.lit(1)})
    I.commit_positional_deletes(spark, tbl, F.col("id") == 1)
    with _pt.raises(NotImplementedError, match="merge-on-read"):
        I.update_iceberg_where(spark, tbl, F.lit(True), {"v": F.lit(0)})


def test_rollback_restores_state_keeps_history(spark, tmp_path):
    tbl = str(tmp_path / "t")
    I.append_iceberg_snapshot(_mk(spark, 50), tbl)
    good = I._pick_snapshot(I.load_table_metadata(tbl), None)["snapshot-id"]
    I.delete_iceberg_where(spark, tbl, F.col("id") < 40)
    bad = I._pick_snapshot(I.load_table_metadata(tbl), None)["snapshot-id"]
    assert I.read_iceberg_py(spark, tbl).count() == 10
    I.rollback_iceberg(tbl, good)
    assert I.read_iceberg_py(spark, tbl).count() == 50
    # the bad snapshot stays time-travelable until expiry
    assert I.read_iceberg_py(spark, tbl, snapshot_id=bad).count() == 10
    import pytest as _pt

    with _pt.raises(KeyError, match="not in table history"):
        I.rollback_iceberg(tbl, 999999)
