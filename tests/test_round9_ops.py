"""Round-9 regression tests: the advisor-found correctness fixes
(NULL-predicate DELETE semantics, schema re-merge after a lost
evolution race, Iceberg change-feed snapshot-id inheritance, the
io-level native-fallback specificity, sqlite partition-column
affinity gate) plus the `_NPART_CACHE` LRU cap."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import map_reduce_spark.io as mio
import map_reduce_spark.sources.delta_py as D
import map_reduce_spark.sources.iceberg_py as I


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _mk(spark, n=100, parts=1):
    return (
        spark.range(n)
        .withColumn("y", (F.col("id") % 2).cast("string"))
        .withColumn("v", F.col("id") * 3)
        .repartitionByRange(parts, "id")
    )


# ------------------------------------------------------------------
# DELETE keeps NULL-predicate rows (SQL semantics)
# ------------------------------------------------------------------


def test_delete_where_keeps_null_predicate_rows(spark, tbl):
    # v: NULL for ids 10..19, so `v < 15` is NULL there — SQL DELETE
    # must keep those rows; pre-fix they vanished from the rewrite
    df = _mk(spark, 30).withColumn(
        "v", F.when((F.col("id") >= 10) & (F.col("id") < 20), None).otherwise(F.col("v"))
    )
    D.write_delta_py(df, tbl, mode="overwrite", stats_cols=("id",))
    D.delete_where(spark, tbl, F.col("v") < 15, stats_cols=("id",))
    got = D.read_delta_py(spark, tbl)
    # deleted: v in {0,3,6,9,12} (ids 0..4); NULL-v rows all survive
    assert got.count() == 25
    assert got.filter(F.col("v").isNull()).count() == 10
    assert got.agg(F.min("id")).first()[0] == 5


# ------------------------------------------------------------------
# evolution race: the retry must re-merge the winner's schema
# ------------------------------------------------------------------


def test_evolution_race_remerges_winner_schema(spark, tbl, monkeypatch):
    D.write_delta_py(_mk(spark, 20), tbl, mode="overwrite", stats_cols=("id",))
    real_commit = D.try_commit
    state = {"lost": False}

    def racing_commit(table, version, actions):
        if not state["lost"]:
            # first attempt: a competing writer lands col_x and wins
            # the version slot before us
            state["lost"] = True
            winner = (
                _mk(spark, 10)
                .withColumn("id", F.col("id") + 20)
                .withColumn("col_x", F.lit("w"))
            )
            D.append_with_evolution(winner, table)
            return real_commit(table, version, actions)  # slot taken -> False
        return real_commit(table, version, actions)

    monkeypatch.setattr(D, "try_commit", racing_commit)
    ours = (
        _mk(spark, 10)
        .withColumn("id", F.col("id") + 30)
        .withColumn("col_y", F.lit(7).cast("long"))
    )
    D.append_with_evolution(ours, tbl)
    snap = D.snapshot(tbl)
    names = {f.name for f in snap.schema.fields}
    # pre-fix: the retry committed a schemaString merged against the
    # stale snapshot, dropping the winner's col_x from table metadata
    assert {"col_x", "col_y"} <= names
    got = D.read_delta_py(spark, tbl)
    assert got.count() == 40
    assert got.filter(F.col("col_x").isNotNull()).count() == 10
    assert got.filter(F.col("col_y").isNotNull()).count() == 10


# ------------------------------------------------------------------
# Iceberg change feed: inherited snapshot ids + EXISTING entries
# ------------------------------------------------------------------


def test_iceberg_changes_inherits_manifest_snapshot_id(spark, tmp_path):
    tbl = str(tmp_path / "ice")
    I.append_iceberg_snapshot(_mk(spark, 10), tbl)
    I.append_iceberg_snapshot(
        _mk(spark, 5).withColumn("id", F.col("id") + 10), tbl
    )
    # rewrite snapshot 2's manifest the way a real engine may have:
    # entry snapshot_id null (inherited from added_snapshot_id) and
    # status EXISTING for an in-range add re-recorded by a merge
    av = I.make_generic_avro()
    meta = I.load_table_metadata(tbl)
    snap = I._pick_snapshot(meta, None)
    _, manifests = av.read_file(snap["manifest-list"])
    target = [m for m in manifests if m["added_snapshot_id"] == 2]
    assert target
    mpath = target[0]["manifest_path"]
    schema, entries = av.read_file(mpath)
    for e in entries:
        e["snapshot_id"] = None  # inherit
        e["status"] = 0  # EXISTING (manifest merge re-record)
    av.write_file(mpath, schema, entries)
    feed = I.read_iceberg_changes(spark, tbl, from_snapshot=1)
    # pre-fix: null/EXISTING entries were silently excluded -> empty
    assert feed.count() == 5
    assert feed.agg(F.min("id")).first()[0] == 10


# ------------------------------------------------------------------
# io-level fallback specificity
# ------------------------------------------------------------------


def test_missing_datasource_detector():
    assert mio._is_missing_datasource(
        Exception("[DATA_SOURCE_NOT_FOUND] Failed to find data source: delta.")
    )
    assert not mio._is_missing_datasource(
        Exception("Delta log for '/t' is not contiguous")
    )
    assert not mio._is_missing_datasource(Exception("disk quota exceeded"))


# ------------------------------------------------------------------
# sqlite partition column affinity gate
# ------------------------------------------------------------------


def test_sqlite_text_partition_column_gates(spark, tmp_path):
    import sqlite3

    db = str(tmp_path / "d.db")
    with sqlite3.connect(db) as con:
        con.execute("CREATE TABLE t (k TEXT, v INTEGER)")
        con.execute("INSERT INTO t VALUES ('a', 1), ('b', 2)")
    from map_reduce_spark.sources.sqlite_py import read_sqlite

    with pytest.raises(NotImplementedError, match="integer partition column"):
        read_sqlite(spark, db, "t", partition_column="k")
    with pytest.raises(ValueError, match="not in 't'"):
        read_sqlite(spark, db, "t", partition_column="nope")
    # integer column still reads fine
    assert read_sqlite(spark, db, "t", partition_column="v").count() == 2


# ------------------------------------------------------------------
# _NPART_CACHE is LRU-capped
# ------------------------------------------------------------------


def test_npart_cache_evicts_past_cap(spark, monkeypatch):
    monkeypatch.setattr(mio, "_NPART_CACHE_MAX", 4)
    mio._NPART_CACHE.clear()
    frames = [spark.range(i + 1).withColumn("k", F.lit(i)) for i in range(6)]
    for f in frames:
        mio.parallelize_if_narrow(f)
    assert len(mio._NPART_CACHE) == 4
    # oldest plans evicted, newest retained
    keys = list(mio._NPART_CACHE)
    app = spark.sparkContext.applicationId
    assert (app, frames[5].semanticHash()) in keys
    assert (app, frames[0].semanticHash()) not in keys
    # a hit refreshes recency: touch #2, then add a new plan -> #3 evicts
    mio.parallelize_if_narrow(frames[2])
    mio.parallelize_if_narrow(spark.range(99).withColumn("k", F.lit(99)))
    keys = list(mio._NPART_CACHE)
    assert (app, frames[2].semanticHash()) in keys
    assert (app, frames[3].semanticHash()) not in keys
    mio._NPART_CACHE.clear()
