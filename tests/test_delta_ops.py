"""OPTIMIZE + streaming-sink tests for the Delta codec: small-file
compaction under dataChange=false, spec ``txn`` exactly-once batch
commits (replay, cross-instance race, checkpoint persistence), and
stream restart behavior against the same table."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

import map_reduce_spark.sources.delta_py as D


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


def test_optimize_compacts_small_files(spark, tbl):
    # 5 append commits -> >=5 small files per partition dir
    for i in range(5):
        D.write_delta_py(
            _mk(spark, 100).withColumn("id", F.col("id") + 100 * i),
            tbl, mode="append", partition_by=("y",), stats_cols=("id",),
        )
    before = D.snapshot(tbl)
    assert len(before.adds) >= 10
    v = D.optimize_compact(spark, tbl, stats_cols=("id",))
    after = D.snapshot(tbl)
    assert v == 5 and len(after.adds) < len(before.adds)
    # content identical, commit marked dataChange=false throughout
    got = D.read_delta_py(spark, tbl)
    assert got.count() == 500
    # v was derived before the id shift: each append carries v = 3*(0..99)
    assert got.agg(F.sum("v")).first()[0] == 5 * sum(3 * i for i in range(100))
    acts = D._read_commit(tbl, v)
    flags = [
        (a.get("add") or a.get("remove"))["dataChange"]
        for a in acts
        if "add" in a or "remove" in a
    ]
    assert flags and not any(flags)
    # pre-OPTIMIZE version still time-travels to the same rows
    assert D.read_delta_py(spark, tbl, version=4).count() == 500
    # a second pass finds nothing to do (each partition now holds one file)
    assert D.optimize_compact(spark, tbl, stats_cols=("id",)) is None


def test_txn_replay_is_skipped(spark, tbl):
    df = _mk(spark, 50)
    assert D.append_stream_batch(df, tbl, "app", 0) == 0
    assert D.append_stream_batch(_mk(spark, 50), tbl, "app", 0) is None  # replay
    assert D.append_stream_batch(_mk(spark, 50), tbl, "app", 1) == 1
    assert D.append_stream_batch(_mk(spark, 50), tbl, "app", 1) is None
    assert D.read_delta_py(spark, tbl).count() == 100
    assert D.snapshot(tbl).txns == {"app": 1}
    # a different appId is independent bookkeeping
    assert D.append_stream_batch(_mk(spark, 10), tbl, "other", 0) == 2
    assert D.snapshot(tbl).txns == {"app": 1, "other": 0}


def test_txn_race_against_own_incarnation(spark, tbl, monkeypatch):
    """Two incarnations of the same stream commit the same epoch: the
    loser must detect the winner's txn, orphan its staged files, and
    report the batch as already applied."""
    D.append_stream_batch(_mk(spark, 30), tbl, "app", 0)
    real = D.try_commit
    state = {"raced": False}

    def racing(table, version, actions):
        if not state["raced"]:
            state["raced"] = True
            # the other incarnation lands epoch 1 first, with data
            D.append_stream_batch(_mk(spark, 30), tbl, "app", 1)
        return real(table, version, actions)

    monkeypatch.setattr(D, "try_commit", racing)
    # restore unproxied commits for the competitor inside the hook:
    # append_stream_batch calls module-level try_commit, so the hook
    # recurses once; guard via the state flag above
    assert D.append_stream_batch(_mk(spark, 30), tbl, "app", 1) is None
    monkeypatch.undo()
    assert D.read_delta_py(spark, tbl).count() == 60
    assert D.snapshot(tbl).txns == {"app": 1}
    # loser's duplicate data files were orphaned; vacuum may or may not
    # find leftovers (remove happens eagerly), but the table must be clean
    D.vacuum_delta(tbl)
    assert D.read_delta_py(spark, tbl).count() == 60


def test_txns_survive_checkpoint(spark, tbl):
    for e in range(3):
        D.append_stream_batch(
            _mk(spark, 20), tbl, "app", e, checkpoint_interval=1
        )
    js, cps = D._list_log(tbl)
    assert cps  # checkpoints were cut
    snap = D.snapshot(tbl)  # seeded from the newest checkpoint
    assert snap.txns == {"app": 2}
    # and a replayed old epoch is still rejected off the checkpoint
    assert D.append_stream_batch(_mk(spark, 20), tbl, "app", 1) is None
    assert D.read_delta_py(spark, tbl).count() == 60


def test_stream_restart_no_duplicates(spark, tmp_path, sf_dir):
    """Draining the same source twice — once with the retained
    checkpoint, once with a reset checkpoint (re-delivery) — must leave
    the table unchanged both times."""
    from map_reduce_spark.streaming.jobs import stream_events

    table = str(tmp_path / "tbl")
    chk1 = str(tmp_path / "chk1")
    src = stream_events(spark, sf_dir).select("event_id", "event_type", "value")
    D.write_stream_delta(src, table, app_id="app", checkpoint_dir=chk1)
    n = D.read_delta_py(spark, table).count()
    assert n > 0
    # retained checkpoint: no new offsets, no new commits
    v_before = D.latest_version(table)
    D.write_stream_delta(src, table, app_id="app", checkpoint_dir=chk1)
    assert D.latest_version(table) == v_before
    # reset checkpoint: epochs restart at 0 and re-deliver folded data;
    # the txn ledger rejects them
    chk2 = str(tmp_path / "chk2")
    D.write_stream_delta(src, table, app_id="app", checkpoint_dir=chk2)
    assert D.read_delta_py(spark, table).count() == n


def test_optimize_preserves_stats_for_skipping(spark, tbl):
    for i in range(4):
        D.write_delta_py(
            _mk(spark, 100, parts=1).withColumn("id", F.col("id") + 100 * i),
            tbl, mode="append", stats_cols=("id",),
        )
    D.optimize_compact(spark, tbl, stats_cols=("id",))
    snap = D.snapshot(tbl)
    assert all(
        "minValues" in json.loads(a["stats"]) for a in snap.adds.values()
    )
    # post-compaction skipping still prunes on the merged ranges
    assert len(D.skip_files(snap, "id", 0, 10)) <= len(snap.adds)


def test_change_feed_skips_optimize(spark, tbl):
    D.write_delta_py(_mk(spark, 100), tbl, mode="overwrite", stats_cols=("id",))
    D.write_delta_py(
        _mk(spark, 50).withColumn("id", F.col("id") + 100), tbl,
        mode="append", stats_cols=("id",),
    )
    assert D.optimize_compact(spark, tbl, stats_cols=("id",)) == 2
    D.write_delta_py(
        _mk(spark, 25).withColumn("id", F.col("id") + 150), tbl,
        mode="append", stats_cols=("id",),
    )
    feed = D.read_delta_changes(spark, tbl, since_version=0)
    assert feed.count() == 75  # appends only; compacted copies invisible
    assert feed.agg(F.min("id")).first()[0] == 100
    # bounded range
    assert D.read_delta_changes(spark, tbl, 0, to_version=1).count() == 50
    assert D.read_delta_changes(spark, tbl, 3).count() == 0


def test_change_feed_refuses_rewrites(spark, tbl):
    D.write_delta_py(_mk(spark, 100), tbl, mode="overwrite", stats_cols=("id",))
    D.delete_where(spark, tbl, F.col("id") < 10, stats_cols=("id",))
    with pytest.raises(NotImplementedError, match="rewrites data"):
        D.read_delta_changes(spark, tbl, since_version=0)
    # a range that stops before the rewrite is still served
    assert D.read_delta_changes(spark, tbl, -1, to_version=0).count() == 100


def test_schema_evolution_append(spark, tbl):
    D.write_delta_py(_mk(spark, 60), tbl, mode="overwrite", stats_cols=("id",))
    wide = (
        _mk(spark, 40)
        .withColumn("id", F.col("id") + 60)
        .withColumn("extra", (F.col("id") % 5).cast("long"))
    )
    v = D.append_with_evolution(wide, tbl, stats_cols=("id",))
    got = D.read_delta_py(spark, tbl)
    assert set(got.columns) == {"id", "y", "v", "extra"}
    assert got.count() == 100
    # pre-evolution files read the new column as NULL
    assert got.filter(F.col("extra").isNull()).count() == 60
    assert got.filter(F.col("extra").isNotNull()).count() == 40
    # time travel still renders the OLD schema
    assert set(D.read_delta_py(spark, tbl, version=v - 1).columns) == {"id", "y", "v"}
    # type change is refused loudly
    bad = _mk(spark, 5).withColumn("v", F.lit(1.5))
    with pytest.raises(TypeError, match="not schema EVOLUTION"):
        D.append_with_evolution(bad, tbl)


def test_schema_evolution_noop_when_same(spark, tbl):
    D.write_delta_py(_mk(spark, 30), tbl, mode="overwrite")
    v = D.append_with_evolution(_mk(spark, 30), tbl)
    acts = D._read_commit(tbl, v)
    assert not any("metaData" in a for a in acts)  # no gratuitous schema churn
    assert D.read_delta_py(spark, tbl).count() == 60


def test_zorder_prunes_both_dimensions(spark, tbl):
    """The point of ZORDER: after the clustered rewrite, stats skipping
    prunes on EITHER dimension; the pre-layout table (insertion order,
    uncorrelated with both dims) prunes on neither."""
    n = 4096
    df = (
        spark.range(n)
        .withColumn("a", (F.col("id") * 2654435761 % 1024).cast("long"))
        .withColumn("b", (F.col("id") * 40503 % 1024).cast("long"))
        .repartitionByRange(8, "id")  # files ordered by id: a/b scattered
    )
    D.write_delta_py(df, tbl, mode="overwrite", stats_cols=("a", "b"))
    before = D.snapshot(tbl)
    # insertion-ordered files: every file spans ~the full a/b range
    assert len(D.skip_files(before, "a", 0, 63)) == len(before.adds)
    assert len(D.skip_files(before, "b", 0, 63)) == len(before.adds)
    v = D.optimize_compact(
        spark, tbl, target_bytes=1, stats_cols=("a", "b"), zorder_by=("a", "b")
    )
    assert v == 1
    after = D.snapshot(tbl)
    assert len(after.adds) >= 4
    # both dimensions now prune: a narrow slice of either axis touches
    # a strict subset of files
    a_hit = len(D.skip_files(after, "a", 0, 63))
    b_hit = len(D.skip_files(after, "b", 0, 63))
    assert a_hit < len(after.adds)
    assert b_hit < len(after.adds)
    # and the rewrite moved no rows
    got = D.read_delta_py(spark, tbl)
    assert got.count() == n
    assert got.agg(F.sum("a"), F.sum("b")).first() == df.agg(
        F.sum("a"), F.sum("b")
    ).first()


def test_update_where_and_restore(spark, tmp_path):
    """Delta UPDATE (NULL rows untouched, victim-file-only rewrite)
    and RESTORE (log arithmetic back to a prior version, history
    intact)."""
    import map_reduce_spark.sources.delta_py as D

    tbl = str(tmp_path / "t")
    d = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, 40)], "id bigint, v bigint"
    )
    D.write_delta_py(d.repartition(2), tbl, mode="overwrite", stats_cols=("id",))
    v0 = D.latest_version(tbl)
    D.update_where(spark, tbl, F.col("v") > 20, {"v": F.col("v") * 2})
    got = {r["id"]: r["v"] for r in D.read_delta_py(spark, tbl).collect()}
    assert got == {1: 10, 2: None, 3: 60, 4: 80}
    D.restore_table(spark, tbl, v0)
    back = {r["id"]: r["v"] for r in D.read_delta_py(spark, tbl).collect()}
    assert back == {1: 10, 2: None, 3: 30, 4: 40}
    # history intact: the updated version still time-travels
    mid = {r["id"]: r["v"] for r in D.read_delta_py(spark, tbl, v0 + 1).collect()}
    assert mid == {1: 10, 2: None, 3: 60, 4: 80}
    # restoring to the current state is a no-op commit
    v_now = D.latest_version(tbl)
    assert D.restore_table(spark, tbl, v_now) == v_now


def test_restore_across_schema_change_recommits_metadata(spark, tmp_path):
    """RESTORE across a schema-evolution boundary must re-commit the
    TARGET version's metaData (real Delta RESTORE does): without it
    the restored files read under the NEW schema — the post-evolution
    column ghosts back as all-NULL instead of disappearing."""
    tbl = str(tmp_path / "t")
    d0 = spark.createDataFrame([(1, 10), (2, 20)], "id bigint, v bigint")
    D.write_delta_py(d0, tbl, mode="overwrite", stats_cols=("id",))
    v0 = D.latest_version(tbl)
    schema0 = D.snapshot(tbl).metadata["schemaString"]
    d1 = spark.createDataFrame([(3, 30, "x")], "id bigint, v bigint, extra string")
    D.append_with_evolution(d1, tbl)
    assert "extra" in D.snapshot(tbl).metadata["schemaString"]
    D.restore_table(spark, tbl, v0)
    snap = D.snapshot(tbl)
    assert snap.metadata["schemaString"] == schema0  # metaData restored
    got = D.read_delta_py(spark, tbl)
    assert got.columns == ["id", "v"]  # no ghost column
    assert sorted((r["id"], r["v"]) for r in got.collect()) == [(1, 10), (2, 20)]
    # history above the restore stays time-travelable under ITS schema
    mid = D.read_delta_py(spark, tbl, v0 + 1)
    assert "extra" in mid.columns and mid.count() == 3


def test_restore_into_dv_state_is_gated(spark, tmp_path):
    """Restoring INTO a version that carries deletion vectors is
    refused loudly (the target gate): silent file re-adds without DV
    awareness would resurrect deleted rows."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame([(i, i * 2) for i in range(10)], "id bigint, v bigint")
    D.write_delta_py(d, tbl, mode="overwrite", stats_cols=("id",))
    D.delete_where_dv(spark, tbl, F.col("id") < 3)
    v_dv = D.latest_version(tbl)
    # cleanse the CURRENT state via the documented escape hatch
    # (read + overwrite) so only the TARGET carries DVs
    D.write_delta_py(
        D.read_delta_py(spark, tbl), tbl, mode="overwrite", stats_cols=("id",)
    )
    assert not any(a.get("deletionVector") for a in D.snapshot(tbl).adds.values())
    with pytest.raises(NotImplementedError, match="target snapshot"):
        D.restore_table(spark, tbl, v_dv)


def test_v2_checkpoint_roundtrip_and_log_truncation(spark, tmp_path):
    """V2 checkpoint write -> read: a uuid manifest + parquet sidecars
    fully reconstructs the snapshot (adds, removes, DVs, txns, schema)
    after EVERY json commit and classic checkpoint at or below it is
    expired; replay above the checkpoint still applies."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame([(i, i * 2) for i in range(20)], "id bigint, v bigint")
    D.write_delta_py(d.repartition(2), tbl, mode="overwrite", stats_cols=("id",))
    D.delete_where_dv(spark, tbl, F.col("id") < 3)  # DV must survive the ckpt
    snap = D.snapshot(tbl)
    path = D.write_checkpoint_v2(tbl, snap)
    assert os.path.basename(path).split(".")[1] == "checkpoint"
    # expire the pre-checkpoint log
    logd = os.path.join(tbl, "_delta_log")
    for f in list(os.listdir(logd)):
        if (
            f.endswith(".json") and f[:20].isdigit() and not D._V2_CKPT_RE.match(f)
        ) or f.endswith(".checkpoint.parquet"):
            if int(f[:20]) <= snap.version:
                os.remove(os.path.join(logd, f))
    # checkpoint-only snapshot service
    back = D.snapshot(tbl)
    assert back.version == snap.version
    assert back.metadata["schemaString"] == snap.metadata["schemaString"]
    got = {r["id"]: r["v"] for r in D.read_delta_py(spark, tbl).collect()}
    assert got == {i: i * 2 for i in range(3, 20)}  # DVs applied
    # replay ABOVE the checkpoint still layers on
    D.write_delta_py(
        spark.createDataFrame([(100, 200)], "id bigint, v bigint"),
        tbl, mode="append", checkpoint_interval=10_000,
    )
    got2 = {r["id"]: r["v"] for r in D.read_delta_py(spark, tbl).collect()}
    assert got2 == {**{i: i * 2 for i in range(3, 20)}, 100: 200}


def test_v2_checkpoint_json_manifest_form(spark, tmp_path):
    """The v2 manifest may be JSON (one action per line) instead of
    parquet — same sidecars, same reconstruction."""
    import glob
    import json as _json

    tbl = str(tmp_path / "t")
    d = spark.createDataFrame([(i, str(i)) for i in range(10)], "id bigint, s string")
    D.write_delta_py(d, tbl, mode="overwrite", stats_cols=("id",))
    snap = D.snapshot(tbl)
    pq_manifest = D.write_checkpoint_v2(tbl, snap)
    # transcribe the parquet manifest to the json form
    import pyarrow.parquet as _pq

    actions = []
    for row in _pq.read_table(pq_manifest).to_pylist():
        for kind, v in row.items():
            if v is None:
                continue
            if kind == "metaData" and isinstance(v.get("configuration"), list):
                v = dict(v, configuration=dict(v["configuration"]))
            if kind == "checkpointMetadata" and isinstance(v.get("tags"), list):
                v = dict(v, tags=dict(v["tags"]))
            if kind == "protocol":
                v = {k: x for k, x in v.items() if x is not None}
            actions.append({kind: v})
    json_manifest = pq_manifest.rsplit(".", 1)[0].replace(
        os.path.basename(pq_manifest).split(".")[0],
        f"{snap.version:020d}",
    ) + ".json"
    with open(json_manifest, "w") as fh:
        for a in actions:
            fh.write(_json.dumps(a) + "\n")
    os.remove(pq_manifest)
    # expire the plain log below
    logd = os.path.join(tbl, "_delta_log")
    for f in list(os.listdir(logd)):
        if f.endswith(".json") and f[:20].isdigit() and not D._V2_CKPT_RE.match(f):
            if int(f[:20]) <= snap.version:
                os.remove(os.path.join(logd, f))
    assert glob.glob(os.path.join(logd, "*.checkpoint.*.json"))
    got = {r["id"]: r["s"] for r in D.read_delta_py(spark, tbl).collect()}
    assert got == {i: str(i) for i in range(10)}


def test_multipart_classic_checkpoint_read(spark, tmp_path):
    """Multipart classic checkpoints (<v>.checkpoint.<part>.<of>.parquet)
    read as one action set; a TORN part set is ignored as a seed (json
    replay still serves) but an explicit read of it refuses loudly."""
    import pyarrow.parquet as _pq

    tbl = str(tmp_path / "t")
    d = spark.createDataFrame([(i, i * 3) for i in range(30)], "id bigint, v bigint")
    D.write_delta_py(d.repartition(3), tbl, mode="overwrite", stats_cols=("id",))
    D.write_delta_py(
        spark.createDataFrame([(100, 1)], "id bigint, v bigint"), tbl, mode="append"
    )
    snap = D.snapshot(tbl)
    # build the multipart form by sharding a classic checkpoint's rows
    D.write_checkpoint(tbl, snap)
    classic = D._checkpoint_path(tbl, snap.version)
    rows = _pq.read_table(classic)
    k = 3
    per = (rows.num_rows + k - 1) // k
    logd = os.path.join(tbl, "_delta_log")
    for i in range(k):
        part = rows.slice(i * per, per)
        _pq.write_table(
            part,
            os.path.join(
                logd, f"{snap.version:020d}.checkpoint.{i + 1:010d}.{k:010d}.parquet"
            ),
        )
    os.remove(classic)
    # expire the json log at/below the checkpoint: multipart is the seed
    for f in list(os.listdir(logd)):
        if f.endswith(".json") and f[:20].isdigit() and int(f[:20]) <= snap.version:
            os.remove(os.path.join(logd, f))
    got = {r["id"]: r["v"] for r in D.read_delta_py(spark, tbl).collect()}
    assert got == {**{i: i * 3 for i in range(30)}, 100: 1}
    # tear the part set: no longer offered as a checkpoint version
    os.remove(
        os.path.join(logd, f"{snap.version:020d}.checkpoint.{2:010d}.{k:010d}.parquet")
    )
    js, cps = D._list_log(tbl)
    assert snap.version not in cps
    with pytest.raises(RuntimeError, match="INCOMPLETE"):
        D._read_checkpoint(tbl, snap.version)


def test_cdf_feed_exact_changes(spark, tmp_path):
    """CDF: appends read as inserts from their adds; UPDATE/DELETE
    commits read from cdc files ALONE (carried rows never appear);
    pre/postimages pair up; _commit_version stamps each row."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame([(i, i * 10) for i in range(8)], "id bigint, v bigint")
    D.write_delta_py(d.repartition(2), tbl, mode="overwrite", stats_cols=("id",))
    D.set_delta_table_property(tbl, "delta.enableChangeDataFeed", "true")
    v_prop = D.latest_version(tbl)
    D.write_delta_py(
        spark.createDataFrame([(100, 1)], "id bigint, v bigint"), tbl, mode="append"
    )
    D.update_where(spark, tbl, F.col("id") == 3, {"v": F.lit(999).cast("long")})
    D.delete_where(spark, tbl, F.col("id").isin(5, 6))
    feed = D.read_delta_changes_cdf(spark, tbl, since_version=v_prop)
    rows = {(r["_change_type"], r["id"], r["v"]) for r in feed.collect()}
    assert rows == {
        ("insert", 100, 1),
        ("update_preimage", 3, 30),
        ("update_postimage", 3, 999),
        ("delete", 5, 50),
        ("delete", 6, 60),
    }
    # carried rows of the rewritten files never leak into the feed
    assert feed.count() == 5
    vers = {r["_change_type"]: r["_commit_version"] for r in feed.collect()}
    assert vers["insert"] < vers["update_preimage"] < vers["delete"]


def test_cdf_refuses_pre_enablement_rewrites(spark, tmp_path):
    """A data-changing rewrite WITHOUT cdc files (CDF was off) must
    refuse — per-row changes are unrecoverable from add/remove."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame([(i, i) for i in range(6)], "id bigint, v bigint")
    D.write_delta_py(d, tbl, mode="overwrite", stats_cols=("id",))
    D.delete_where(spark, tbl, F.col("id") == 1)  # CDF off: no cdc
    with pytest.raises(NotImplementedError, match="without cdc"):
        D.read_delta_changes_cdf(spark, tbl, since_version=0)


def test_cdf_partitioned_and_vacuum_safe(spark, tmp_path):
    """cdc files hive-partition like the table, survive vacuum, and
    the feed recovers partition values from the directory layout."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame(
        [(i, i * 10, "a" if i % 2 == 0 else "b") for i in range(10)],
        "id bigint, v bigint, p string",
    )
    D.write_delta_py(d, tbl, mode="overwrite", partition_by=("p",), stats_cols=("id",))
    D.set_delta_table_property(tbl, "delta.enableChangeDataFeed", "true")
    v_prop = D.latest_version(tbl)
    D.delete_where(spark, tbl, F.col("id") < 4)
    assert D.vacuum_delta(tbl) == 0  # cdc files are referenced, not orphans
    feed = D.read_delta_changes_cdf(spark, tbl, since_version=v_prop)
    got = {(r["id"], r["p"]) for r in feed.collect()}
    assert got == {(0, "a"), (1, "b"), (2, "a"), (3, "b")}


def test_cdf_merge_emits_exact_changes(spark, tmp_path):
    """MERGE on a CDF table: matched keys emit pre/postimages, new
    keys emit inserts, untouched candidate-file rows never appear."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame([(i, i * 10) for i in range(6)], "id bigint, v bigint")
    D.write_delta_py(d, tbl, mode="overwrite", stats_cols=("id",))
    D.set_delta_table_property(tbl, "delta.enableChangeDataFeed", "true")
    v_prop = D.latest_version(tbl)
    src = spark.createDataFrame([(2, 999), (100, 1)], "id bigint, v bigint")
    D.merge_upsert(spark, tbl, src, key="id", stats_cols=("id",))
    feed = D.read_delta_changes_cdf(spark, tbl, since_version=v_prop)
    rows = {(r["_change_type"], r["id"], r["v"]) for r in feed.collect()}
    assert rows == {
        ("update_preimage", 2, 20),
        ("update_postimage", 2, 999),
        ("insert", 100, 1),
    }
