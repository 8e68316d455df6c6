"""Delta deletion-vector tests: the DV codec (z85, RoaringBitmapArray
portable format, .bin layout), the merge-on-read read path (all three
storage types, checkpoint survival), the DV DELETE writer (NULL
semantics, stacking, protocol upgrade), rewrite gates, and vacuum's
DV awareness."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

import map_reduce_spark.sources.delta_py as D


@pytest.fixture()
def tbl(tmp_path):
    return str(tmp_path / "t")


def _mk(spark, n=100, parts=2):
    return (
        spark.range(n)
        .withColumn("y", (F.col("id") % 2).cast("string"))
        .withColumn("v", F.col("id") * 3)
        .repartitionByRange(parts, "id")
    )


# ------------------------------------------------------------------
# codec units
# ------------------------------------------------------------------


def test_z85_roundtrip():
    c = D.make_dv_codec()
    for raw in (b"", b"\x00" * 16, bytes(range(16)), b"hello world!", b"xyz"):
        enc = c.z85_encode(raw)
        assert c.z85_decode(enc)[: len(raw)] == raw


def test_roaring_roundtrip_array_and_bitmap_containers():
    c = D.make_dv_codec()
    # array containers (sparse), bitmap container (>4096 dense in one
    # key), and multi-key spread
    cases = [
        np.array([], dtype=np.int64),
        np.array([0, 1, 5, 65535, 65536, 1 << 20], dtype=np.int64),
        np.arange(10_000, dtype=np.int64),  # dense -> bitmap container
        np.arange(0, 1 << 21, 7, dtype=np.int64),
    ]
    for pos in cases:
        data = c.bitmap_array_encode(pos)
        back = c.bitmap_array_decode(data)
        assert np.array_equal(back, np.unique(pos))


def test_roaring_run_container_decodes():
    """Our encoder never writes runs; real engines do — craft one by
    hand (cookie 12347, run bitset set) and decode it."""
    import struct

    c = D.make_dv_codec()
    # one container, key 0, cardinality 10, runs: [3..7], [20..24]
    payload = bytearray()
    payload += struct.pack("<i", 12347 | (0 << 16))  # 1 container
    payload += b"\x01"  # run bitset: container 0 is a run
    payload += struct.pack("<HH", 0, 9)  # key 0, card-1
    payload += struct.pack("<H", 2)  # n_runs
    payload += struct.pack("<HH", 3, 4)  # start 3, len-1 4 -> 3..7
    payload += struct.pack("<HH", 20, 4)  # 20..24
    data = struct.pack("<iq", 1681511377, 1) + bytes(payload)
    got = c.bitmap_array_decode(data)
    assert got.tolist() == [3, 4, 5, 6, 7, 20, 21, 22, 23, 24]


def test_dv_file_roundtrip(tmp_path):
    c = D.make_dv_codec()
    data = c.bitmap_array_encode(np.array([1, 2, 3, 99], dtype=np.int64))
    path = str(tmp_path / "deletion_vector_test.bin")
    offset = c.write_dv_file(path, data)
    assert c.read_dv_blob(path, offset, len(data)) == data
    with pytest.raises(ValueError, match="stored size"):
        c.read_dv_blob(path, offset, len(data) + 1)


# ------------------------------------------------------------------
# DV DELETE writer + MOR read
# ------------------------------------------------------------------


def test_dv_delete_roundtrip_no_rewrite(spark, tbl):
    D.write_delta_py(_mk(spark, 100), tbl, mode="overwrite", stats_cols=("id",))
    files_before = sorted(D.snapshot(tbl).adds)
    v = D.delete_where_dv(spark, tbl, F.col("id") % 10 == 3)
    assert v == 1
    snap = D.snapshot(tbl)
    # same data files, now carrying DVs — nothing rewritten
    assert sorted(snap.adds) == files_before
    assert all(a.get("deletionVector") for a in snap.adds.values())
    assert snap.protocol["minReaderVersion"] == 3
    assert snap.protocol["readerFeatures"] == ["deletionVectors"]
    got = D.read_delta_py(spark, tbl)
    assert got.count() == 90
    assert got.filter(F.col("id") % 10 == 3).count() == 0
    # time travel to v0 still sees everything
    assert D.read_delta_py(spark, tbl, version=0).count() == 100


def test_dv_delete_null_predicate_keeps_rows(spark, tbl):
    df = _mk(spark, 30).withColumn(
        "v", F.when(F.col("id") < 10, None).otherwise(F.col("v"))
    )
    D.write_delta_py(df, tbl, mode="overwrite")
    D.delete_where_dv(spark, tbl, F.col("v") < 45)
    got = D.read_delta_py(spark, tbl)
    # v < 45 true only for ids 10..14 (v=30..42); NULL-v rows kept
    assert got.count() == 25
    assert got.filter(F.col("v").isNull()).count() == 10


def test_dv_deletes_stack_and_are_idempotent(spark, tbl):
    D.write_delta_py(_mk(spark, 100), tbl, mode="overwrite")
    D.delete_where_dv(spark, tbl, F.col("id") < 10)
    # re-deleting already-deleted rows commits nothing
    v = D.delete_where_dv(spark, tbl, F.col("id") < 10)
    assert v == 1
    D.delete_where_dv(spark, tbl, F.col("id") >= 90)
    got = D.read_delta_py(spark, tbl)
    assert got.count() == 80
    assert got.agg(F.min("id"), F.max("id")).first() == (10, 89)
    # cardinality in the descriptor matches the union
    snap = D.snapshot(tbl)
    assert sum(a["deletionVector"]["cardinality"] for a in snap.adds.values()) == 20


def test_dv_survives_checkpoint_replay(spark, tbl):
    D.write_delta_py(_mk(spark, 60), tbl, mode="overwrite", checkpoint_interval=0)
    D.delete_where_dv(spark, tbl, F.col("id") < 15, checkpoint_interval=0)
    D.write_checkpoint(tbl, D.snapshot(tbl))
    # force the checkpoint to be the ONLY source of v0..v1 state
    os.remove(D._json_path(tbl, 0))
    got = D.read_delta_py(spark, tbl)
    assert got.count() == 45
    assert got.agg(F.min("id")).first()[0] == 15
    snap = D.snapshot(tbl)
    assert snap.protocol["readerFeatures"] == ["deletionVectors"]


def test_dv_partitioned_table(spark, tbl):
    D.write_delta_py(
        _mk(spark, 80), tbl, mode="overwrite", partition_by=("y",), stats_cols=("id",)
    )
    D.delete_where_dv(spark, tbl, (F.col("y") == "1") & (F.col("id") < 40))
    got = D.read_delta_py(spark, tbl)
    assert got.count() == 60
    assert got.filter((F.col("y") == "1") & (F.col("id") < 40)).count() == 0
    # narrowed read (skip_files path) also applies DVs
    sub = D.read_delta_py(
        spark, tbl, files=D.skip_files(D.snapshot(tbl), "id", 0, 39)
    )
    assert sub.filter(F.col("id") < 40).count() == 20  # only y=0 survive


def test_dv_inline_and_absolute_storage_types(spark, tbl):
    """Reader handles storageType 'i' (inline z85) and 'p' (absolute
    path) — rewrite the committed 'u' descriptors into each form."""
    D.write_delta_py(_mk(spark, 50, parts=1), tbl, mode="overwrite")
    v = D.delete_where_dv(spark, tbl, F.col("id") < 20)
    codec = D.make_dv_codec()
    acts = D._read_commit(tbl, v)
    for form in ("i", "p"):
        out = []
        for a in acts:
            if "add" in a and a["add"].get("deletionVector"):
                dv = dict(a["add"]["deletionVector"])
                _, path = D._resolve_dv_location(tbl, dv, codec)
                data = codec.read_dv_blob(path, dv["offset"], dv["sizeInBytes"])
                if form == "i":
                    dv = {
                        "storageType": "i",
                        "pathOrInlineDv": codec.z85_encode(data),
                        "sizeInBytes": len(data),
                        "cardinality": dv["cardinality"],
                    }
                else:
                    dv = dict(dv, storageType="p", pathOrInlineDv=path)
                a = {"add": dict(a["add"], deletionVector=dv)}
            out.append(a)
        with open(D._json_path(tbl, v), "w") as fh:
            for a in out:
                fh.write(json.dumps(a) + "\n")
        got = D.read_delta_py(spark, tbl)
        assert got.count() == 30
        assert got.agg(F.min("id")).first()[0] == 20


def test_rewrite_ops_gate_on_dv_tables(spark, tbl):
    D.write_delta_py(_mk(spark, 40), tbl, mode="overwrite", stats_cols=("id",))
    D.delete_where_dv(spark, tbl, F.col("id") < 5)
    with pytest.raises(NotImplementedError, match="deletion-vector"):
        D.delete_where(spark, tbl, F.col("id") < 10)
    with pytest.raises(NotImplementedError, match="deletion-vector"):
        D.merge_upsert(spark, tbl, _mk(spark, 5), key="id")
    with pytest.raises(NotImplementedError, match="deletion-vector"):
        D.optimize_compact(spark, tbl)


def test_protocol_gate_still_refuses_other_features(spark, tbl):
    D.write_delta_py(_mk(spark, 10), tbl, mode="overwrite")
    acts = D._read_commit(tbl, 0)
    for a in acts:
        if "protocol" in a:
            a["protocol"] = {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors", "timestampNtz"],
            }
    with open(D._json_path(tbl, 0), "w") as fh:
        for a in acts:
            fh.write(json.dumps(a) + "\n")
    with pytest.raises(NotImplementedError, match="minReaderVersion"):
        D.read_delta_py(spark, tbl)


def test_vacuum_sweeps_orphan_dvs_keeps_referenced(spark, tbl):
    D.write_delta_py(_mk(spark, 40), tbl, mode="overwrite")
    D.delete_where_dv(spark, tbl, F.col("id") < 5)
    live = set(glob.glob(os.path.join(tbl, "deletion_vector_*.bin")))
    assert live
    orphan = os.path.join(tbl, "deletion_vector_00000000-0000-0000-0000-00000000dead.bin")
    with open(orphan, "wb") as fh:
        fh.write(b"\x01junk")
    assert D.vacuum_delta(tbl) == 1
    assert not os.path.exists(orphan)
    assert set(glob.glob(os.path.join(tbl, "deletion_vector_*.bin"))) == live
    assert D.read_delta_py(spark, tbl).count() == 35


def test_dv_fixture_query_matches_predicate(spark, sf_dir):
    """Row-level content check over the MANY-file fixture (42 files at
    sf0.001): the surviving set must be exactly the NOT-deleted
    predicate — this is the granularity that catches a DV attached to
    the wrong file (set-iteration ordering class of bug), which
    aggregate counts can mask."""
    tbl = D.ensure_delta_dv_fixture(spark, sf_dir)
    snap = D.snapshot(tbl)
    assert any(a.get("deletionVector") for a in snap.adds.values())
    got = D.read_delta_py(spark, tbl)
    d = D._orders_frame(spark, sf_dir)
    b16 = D._bucket(F.col("o_orderkey"), 16)
    expected = d.filter(
        ~((b16 == 3) | ((F.col("o_orderstatus") == "O") & (b16 == 5)))
    )
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
