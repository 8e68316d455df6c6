"""Iceberg partitioned tables: spec transforms (murmur3 locked to the
public spec's test vectors), the partitioned writer, and the three
pruning layers (manifest summaries, partition tuples, column bounds) —
each proven SOUND by row-level equality against the unpruned scan."""

from __future__ import annotations

import datetime
import struct

from pyspark.sql import functions as F

import map_reduce_spark.sources.iceberg_py as I
from map_reduce_spark.sources.iceberg_transforms import (
    bucket_value,
    murmur3_32,
    sv_deserialize,
    sv_serialize,
    transform_value,
)


def test_murmur3_spec_vectors():
    """Appendix B of the Iceberg spec publishes these exact values."""
    assert murmur3_32(struct.pack("<q", 34)) == 2017239379  # int/long 34
    assert murmur3_32(struct.pack("<q", 17486)) == -653330422  # date 2017-11-16
    assert (
        murmur3_32(struct.pack("<q", 1510871468000000)) == -2047944441
    )  # timestamp 2017-11-16T22:31:08
    assert murmur3_32(b"iceberg") == 1210000089  # string


def test_transform_values():
    assert transform_value(-7, "truncate", 10, "long") == -10  # floor, not trunc
    assert transform_value("abcdef", "truncate", 3, "string") == "abc"
    ts = datetime.datetime(1994, 2, 15, 7, 30)
    assert transform_value(ts, "year", None, "timestamp") == 24
    assert transform_value(ts, "month", None, "timestamp") == (1994 - 1970) * 12 + 1
    us = int((ts - datetime.datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    assert transform_value(us, "day", None, "timestamp") == us // 86_400_000_000
    assert transform_value(us, "hour", None, "timestamp") == us // 3_600_000_000
    d = datetime.date(1994, 2, 15)
    assert transform_value(d, "month", None, "date") == (1994 - 1970) * 12 + 1
    assert transform_value(None, "bucket", 8, "long") is None


def test_sv_serialization_roundtrip():
    for v, t in [
        (42, "int"), (-3, "int"), (2**62, "long"), (-(2**62), "long"),
        (1.5, "double"), ("héllo", "string"), (True, "boolean"),
        (17486, "date"), (1510871468000000, "timestamp"),
    ]:
        assert sv_deserialize(sv_serialize(v, t), t) == v


def test_bucket_udf_matches_scalar(spark):
    """The write path's vectorized numpy murmur3 must agree with the
    scalar spec implementation on every value — negatives, extremes,
    nulls, and strings."""
    from map_reduce_spark.sources.iceberg_transforms import _bucket_udf

    vals = [0, 1, -1, 34, -34, 2**62, -(2**62), 12345678901, None]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    got = [r["b"] for r in
           df.select(_bucket_udf(16, "long")(F.col("v")).alias("b")).collect()]
    want = [bucket_value(v, 16, "long") for v in vals]
    assert got == want
    svals = ["iceberg", "", "héllo wörld", "x" * 500, None]
    sdf = spark.createDataFrame([(v,) for v in svals], "v string")
    got_s = [r["b"] for r in
             sdf.select(_bucket_udf(16, "string")(F.col("v")).alias("b")).collect()]
    assert got_s == [bucket_value(v, 16, "string") for v in svals]


def _mk(spark, n=60):
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 7).alias("grp"),
        F.expr(
            "timestampadd(DAY, CAST(id * 37 AS INT), "
            "TIMESTAMP_NTZ '1995-03-01 00:00:00')"
        ).alias("ts"),
        (F.col("id") * 100).alias("cents"),
    )


def test_partitioned_roundtrip_and_inheritance(spark, tmp_path):
    """Partitioned write → read returns exactly the input rows; a
    spec-less second append INHERITS the stored spec; a conflicting
    spec is refused."""
    import pytest

    tbl = str(tmp_path / "t")
    spec = [("ts", "month"), ("grp", "bucket[4]")]
    d = _mk(spark)
    I.append_iceberg_snapshot(d.filter("id < 30"), tbl, spec)
    I.append_iceberg_snapshot(d.filter("id >= 30"), tbl)  # inherits
    back = I.read_iceberg_py(spark, tbl)
    assert back.exceptAll(d).count() == 0 and d.exceptAll(back).count() == 0
    meta = I.load_table_metadata(tbl)
    fields = meta["partition-specs"][0]["fields"]
    assert [f["transform"] for f in fields] == ["month", "bucket[4]"]
    assert [f["name"] for f in fields] == ["ts_month", "grp_bucket"]
    with pytest.raises(NotImplementedError, match="spec evolution"):
        I.append_iceberg_snapshot(d.limit(1), tbl, [("grp", "identity")])


def test_pruning_is_sound_and_effective(spark, tmp_path):
    """For a battery of predicates: pruned-scan + residual filter must
    equal full-scan + filter ROW-FOR-ROW, and each predicate must
    actually drop files."""
    tbl = str(tmp_path / "t")
    d = _mk(spark, 120)
    I.append_iceberg_snapshot(
        d.filter("id % 2 = 0").repartition(3), tbl,
        [("ts", "month"), ("grp", "bucket[4]")],
    )
    I.append_iceberg_snapshot(d.filter("id % 2 = 1").repartition(3), tbl)
    meta = I.load_table_metadata(tbl)
    snap = I._pick_snapshot(meta, None)
    full = I.read_iceberg_py(spark, tbl)
    us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    lo = 820_454_400_000_000  # 1996-01-01
    cases = [
        ([("grp", "=", 3)], F.col("grp") == 3),
        ([("grp", "in", (1, 5))], F.col("grp").isin(1, 5)),
        ([("ts", ">=", lo)], F.expr(us) >= lo),
        ([("ts", "<", lo), ("grp", "=", 2)], (F.expr(us) < lo) & (F.col("grp") == 2)),
        ([("cents", ">=", 9000)], F.col("cents") >= 9000),  # bounds, non-partition
    ]
    for preds, residual in cases:
        plan = I.scan_plan_for_snapshot(tbl, meta, snap, predicates=preds)
        assert plan["files_pruned"] > 0, preds
        got = I.read_iceberg_py(spark, tbl, predicates=preds).filter(residual)
        want = full.filter(residual)
        assert got.exceptAll(want).count() == 0, preds
        assert want.exceptAll(got).count() == 0, preds


def test_manifest_level_pruning(spark, tmp_path):
    """Two appends with DISJOINT month ranges → a predicate inside one
    range kills the other manifest wholesale via the manifest-list
    value summaries (no manifest read at all)."""
    tbl = str(tmp_path / "t")
    d = _mk(spark, 80)
    # id*37 days from 1995-03-01: id<20 stays < 1997-03; id>=40 well after
    I.append_iceberg_snapshot(d.filter("id < 20"), tbl, [("ts", "month")])
    I.append_iceberg_snapshot(d.filter("id >= 40"), tbl)
    meta = I.load_table_metadata(tbl)
    snap = I._pick_snapshot(meta, None)
    lo = 820_454_400_000_000  # 1996-01-01: below everything in append 2
    plan = I.scan_plan_for_snapshot(tbl, meta, snap, predicates=[("ts", "<", lo)])
    assert plan["manifests_pruned"] == 1
    assert plan["data_files"]


def test_null_partition_values(spark, tmp_path):
    """Rows whose source column is NULL land in a null partition; an
    equality predicate prunes that file (transforms map null → null,
    so no row can match), and a plain read still returns them."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (4, None)], "id bigint, k string"
    )
    I.append_iceberg_snapshot(d, tbl, [("k", "identity")])
    back = I.read_iceberg_py(spark, tbl)
    assert back.count() == 4
    assert back.filter("k IS NULL").count() == 2
    meta = I.load_table_metadata(tbl)
    snap = I._pick_snapshot(meta, None)
    plan = I.scan_plan_for_snapshot(tbl, meta, snap, predicates=[("k", "=", "a")])
    assert plan["files_pruned"] >= 1  # the null-partition file died
    got = I.read_iceberg_py(spark, tbl, predicates=[("k", "=", "a")]).filter(
        F.col("k") == "a"
    )
    assert [r["id"] for r in got.collect()] == [1]


def test_bounds_recorded_without_strings(spark, tmp_path):
    """Manifest entries must carry lower/upper bounds for numeric and
    timestamp columns but never strings (truncated physical stats
    would be unsound)."""
    tbl = str(tmp_path / "t")
    d = spark.createDataFrame(
        [(1, "aaa", 2.5), (9, "zzz", -1.0)], "id bigint, s string, x double"
    )
    I.append_iceberg_snapshot(d, tbl)
    av, meta = I.make_generic_avro(), I.load_table_metadata(tbl)
    snap = I._pick_snapshot(meta, None)
    _, manifests = av.read_file(snap["manifest-list"])
    _, entries = av.read_file(manifests[0]["manifest_path"])
    dfm = entries[0]["data_file"]
    ids = {kv["key"] for kv in dfm["lower_bounds"]}
    schema_fields = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    assert schema_fields["id"] in ids and schema_fields["x"] in ids
    assert schema_fields["s"] not in ids
    lo = {kv["key"]: kv["value"] for kv in dfm["lower_bounds"]}
    hi = {kv["key"]: kv["value"] for kv in dfm["upper_bounds"]}
    assert sv_deserialize(lo[schema_fields["id"]], "long") == 1
    assert sv_deserialize(hi[schema_fields["x"]], "double") == 2.5


def test_partition_spec_evolution(spark, tmp_path):
    """Evolving the spec rewrites ZERO data files; each manifest prunes
    under its own spec afterwards; the pre-evolution append's files
    never move."""
    import map_reduce_spark.sources.iceberg_py as II

    tbl = str(tmp_path / "t")
    d = _mk(spark, 120)
    II.append_iceberg_snapshot(d.filter("id < 60"), tbl, [("ts", "month")])
    meta1 = II.load_table_metadata(tbl)
    snap1 = II._pick_snapshot(meta1, None)
    files_before = set(II.scan_plan_for_snapshot(tbl, meta1, snap1)["data_files"])
    new_sid = II.evolve_iceberg_partition_spec(
        tbl, [("ts", "month"), ("grp", "bucket[4]")]
    )
    assert new_sid == 1
    II.append_iceberg_snapshot(d.filter("id >= 60"), tbl)  # inherits spec 1
    meta2 = II.load_table_metadata(tbl)
    assert meta2["default-spec-id"] == 1
    assert [s["spec-id"] for s in meta2["partition-specs"]] == [0, 1]
    # spec-1 field ids continue past spec-0's (global partition id space)
    ids0 = [f["field-id"] for f in meta2["partition-specs"][0]["fields"]]
    ids1 = [f["field-id"] for f in meta2["partition-specs"][1]["fields"]]
    assert min(ids1) > max(ids0)
    snap2 = II._pick_snapshot(meta2, None)
    files_after = set(II.scan_plan_for_snapshot(tbl, meta2, snap2)["data_files"])
    assert files_before <= files_after  # zero rewrites: old files carried
    # the grp predicate prunes only spec-1 manifests (spec-0 ones keep
    # all their files — grp wasn't a partition column there)
    plan = II.scan_plan_for_snapshot(tbl, meta2, snap2, predicates=[("grp", "=", 2)])
    assert plan["files_pruned"] > 0
    assert files_before <= set(plan["data_files"]) | files_before
    full = II.read_iceberg_py(spark, tbl)
    got = II.read_iceberg_py(spark, tbl, predicates=[("grp", "=", 2)]).filter(
        F.col("grp") == 2
    )
    want = full.filter(F.col("grp") == 2)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_hour_transform_negative_epoch_write_read_agreement(spark):
    """Pre-1970 instants: the write-side Column transform and the
    driver-side literal projection must agree (floor, never
    truncate-toward-zero) — disagreement is an unsound prune."""
    from map_reduce_spark.sources.iceberg_transforms import (
        transform_column,
        transform_value,
    )

    rows = [
        (-1,),  # 1969-12-31 23:59:59.999999 -> hour -1, day -1
        (-3_600_000_001,),
        (0,), (1,), (3_599_999_999,), (86_400_000_000,),
        (-86_400_000_000,),
    ]
    df = spark.createDataFrame(rows, "us bigint").select(
        F.expr(
            "timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("ts"),
        "us",
    )
    for kind in ("hour", "day", "month", "year"):
        got = [
            r["p"]
            for r in df.select(
                transform_column("ts", kind, None, "timestamp").alias("p")
            ).collect()
        ]
        want = [transform_value(us, kind, None, "timestamp") for (us,) in rows]
        assert got == want, (kind, got, want)


def test_summary_missing_bounds_is_unknown_not_empty():
    """A foreign engine may write contains_null=false with NO value
    bounds for a manifest full of live rows — the summary must KEEP,
    never infer emptiness."""
    from map_reduce_spark.sources.iceberg_transforms import summary_survives

    schema = {"fields": [{"id": 1, "name": "k", "type": "long"}]}
    spec = [{"source-id": 1, "field-id": 1000, "name": "k", "transform": "identity"}]
    summaries = [{"contains_null": False, "lower_bound": None, "upper_bound": None}]
    assert summary_survives([(0, "=", 7)], summaries, spec, schema)
