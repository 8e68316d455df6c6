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


def test_bucket_write_path_temporal_spec_vectors(spark):
    """Write-side bucket[N] over date/timestamp/timestamptz must hash
    the spec Appendix B inputs — day ordinals and epoch MICROseconds —
    not pandas' datetime64[ns] int64 view (ns vs µs puts the same
    instant in a different bucket) and not session-local wall time.
    Locked to the published vectors: date 2017-11-16 hashes
    -653330422, timestamp[tz] 2017-11-16T22:31:08[Z] hashes
    -2047944441."""
    from map_reduce_spark.sources.iceberg_transforms import transform_column

    n = 16
    us = 1_510_871_468_000_000  # 2017-11-16T22:31:08Z
    days = 17486  # 2017-11-16
    want_ts = bucket_value(us, n, "timestamp")
    want_d = bucket_value(days, n, "date")
    assert want_ts == ((-2047944441 & 0x7FFFFFFF) % n)
    assert want_d == ((-653330422 & 0x7FFFFFFF) % n)

    # -2208988800000000 = 1900-01-01 (negative epoch, inside the
    # datetime64[ns] envelope pandas conversion requires)
    extra_us = [0, 1, -1, us, 999_999_999_999_999, -2_208_988_800_000_000]
    df = spark.createDataFrame([(u,) for u in extra_us] + [(None,)], "us bigint").select(
        F.timestamp_micros(F.col("us")).alias("tz"),
        F.expr(
            "timestampadd(MICROSECOND, us, TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("ntz"),
    )
    want = [bucket_value(u, n, "timestamp") for u in extra_us] + [None]

    for tz in ("UTC", "America/New_York"):
        old = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", tz)
        try:
            got_tz = [
                r["b"]
                for r in df.select(
                    transform_column("tz", "bucket", n, "timestamptz").alias("b")
                ).collect()
            ]
            got_ntz = [
                r["b"]
                for r in df.select(
                    transform_column("ntz", "bucket", n, "timestamp").alias("b")
                ).collect()
            ]
        finally:
            spark.conf.set("spark.sql.session.timeZone", old)
        assert got_tz == want, f"timestamptz bucket drift under {tz}"
        assert got_ntz == want, f"timestamp bucket drift under {tz}"

    ddf = spark.createDataFrame(
        [(datetime.date(2017, 11, 16),), (datetime.date(1969, 12, 31),), (None,)],
        "d date",
    )
    got_d = [
        r["b"]
        for r in ddf.select(transform_column("d", "bucket", n, "date").alias("b")).collect()
    ]
    assert got_d == [want_d, bucket_value(-1, n, "date"), None]


def test_bucket_udf_normalizes_raw_datetime_series(spark):
    """Direct _bucket_udf use on a raw timestamp column (bypassing
    transform_column's JVM-side conversion) must still hash epoch µs:
    the UDF normalizes datetime64[ns] input itself."""
    from map_reduce_spark.sources.iceberg_transforms import _bucket_udf

    us = 1_510_871_468_000_000
    df = spark.createDataFrame([(us,), (0,), (None,)], "us bigint").select(
        F.timestamp_micros(F.col("us")).alias("t")
    )
    got = [
        r["b"] for r in df.select(_bucket_udf(16, "timestamptz")(F.col("t")).alias("b")).collect()
    ]
    assert got == [bucket_value(us, 16, "timestamp"), bucket_value(0, 16, "timestamp"), None]


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


def test_bucket_timestamp_prune_soundness(spark, tmp_path):
    """End-to-end regression for the write/read bucket disagreement on
    temporal columns: a table partitioned by bucket[8] over a
    timestamp must return EVERY row matching an exact-instant
    predicate after pruning. Under the old ns-hashing writer the
    partition values disagreed with the read-side inclusive
    projection and matching files were silently pruned."""
    tbl = str(tmp_path / "t")
    d = _mk(spark, 96)
    I.append_iceberg_snapshot(d.repartition(4), tbl, [("ts", "bucket[8]")])
    full = I.read_iceberg_py(spark, tbl)
    us = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    meta = I.load_table_metadata(tbl)
    snap = I._pick_snapshot(meta, None)
    probed = 0
    for row in full.filter("id % 17 = 0").select(F.expr(us).alias("u")).collect():
        preds = [("ts", "=", row["u"])]
        got = I.read_iceberg_py(spark, tbl, predicates=preds).filter(
            F.expr(us) == row["u"]
        )
        want = full.filter(F.expr(us) == row["u"])
        assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
        plan = I.scan_plan_for_snapshot(tbl, meta, snap, predicates=preds)
        probed += 1 if plan["files_pruned"] > 0 else 0
    assert probed > 0  # pruning engaged on at least some probes


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


def test_rewrite_after_spec_evolution_records_default_spec_id(spark, tmp_path):
    """A COW rewrite (DELETE) on a table whose default-spec-id != 0
    must stamp its new manifest with the DEFAULT spec id — its entries
    and partition summaries are built under that spec, and a reader
    pruning them under spec 0's field order/transforms can silently
    drop live manifests."""
    import map_reduce_spark.sources.iceberg_py as II

    tbl = str(tmp_path / "t")
    d = _mk(spark, 80)
    # spec 0: bucket over grp; spec 1 REORDERS and retypes the fields
    II.append_iceberg_snapshot(d.filter("id < 40"), tbl, [("grp", "bucket[4]")])
    II.evolve_iceberg_partition_spec(tbl, [("ts", "month"), ("grp", "bucket[4]")])
    II.append_iceberg_snapshot(d.filter("id >= 40"), tbl)
    II.delete_iceberg_where(spark, tbl, F.col("id") % 10 == 3)
    meta = II.load_table_metadata(tbl)
    assert meta["default-spec-id"] == 1
    snap = II._pick_snapshot(meta, None)
    _, mrows = II.make_generic_avro().read_file(snap["manifest-list"])
    added = [m for m in mrows if m["added_snapshot_id"] == snap["snapshot-id"]]
    assert added and all(m["partition_spec_id"] == 1 for m in added)
    # reads stay row-correct under both partition predicates
    want = d.filter("id % 10 <> 3")
    got = II.read_iceberg_py(spark, tbl)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    for preds, residual in [
        ([("grp", "=", 2)], F.col("grp") == 2),
        ([("ts", ">=", 820_454_400_000_000)], F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ) >= 820_454_400_000_000),
    ]:
        g = II.read_iceberg_py(spark, tbl, predicates=preds).filter(residual)
        w = want.filter(residual)
        assert g.exceptAll(w).count() == 0 and w.exceptAll(g).count() == 0, preds


def test_string_partition_empty_vs_null_not_conflated(spark, tmp_path):
    """Hive layout writes BOTH null and '' to
    __HIVE_DEFAULT_PARTITION__; the stage-time 'v' prefix keeps them
    distinct so a col = '' predicate still returns the empty-string
    rows instead of null-pruning their file away."""
    import map_reduce_spark.sources.iceberg_py as II

    tbl = str(tmp_path / "t")
    d = spark.createDataFrame(
        [(1, ""), (2, ""), (3, None), (4, "alpha"), (5, "beta")], "id int, k string"
    )
    II.append_iceberg_snapshot(d, tbl, [("k", "identity")])
    got_empty = II.read_iceberg_py(spark, tbl, predicates=[("k", "=", "")]).filter(
        F.col("k") == ""
    )
    assert sorted(r["id"] for r in got_empty.collect()) == [1, 2]
    got_alpha = II.read_iceberg_py(spark, tbl, predicates=[("k", "=", "alpha")]).filter(
        F.col("k") == "alpha"
    )
    assert [r["id"] for r in got_alpha.collect()] == [4]
    # full read returns all five rows with values intact
    back = II.read_iceberg_py(spark, tbl)
    assert back.exceptAll(d).count() == 0 and d.exceptAll(back).count() == 0
    # truncate over string: '' truncates to '' — same hazard
    tbl2 = str(tmp_path / "t2")
    II.append_iceberg_snapshot(d, tbl2, [("k", "truncate[2]")])
    got2 = II.read_iceberg_py(spark, tbl2, predicates=[("k", "=", "")]).filter(
        F.col("k") == ""
    )
    assert sorted(r["id"] for r in got2.collect()) == [1, 2]


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


def test_bucket_time_fixture_prunes_and_is_sound(spark, sf_dir):
    """The registry's bucket-over-temporal sentinel must actually
    PRUNE on its IN-list (bucket projection over timestamp + date) and
    stay row-identical to the unpruned scan + filter."""
    import map_reduce_spark.sources.iceberg_py as II

    tbl = II.ensure_iceberg_bucket_time_fixture(spark, sf_dir)
    meta = II.load_table_metadata(tbl)
    snap = II._pick_snapshot(meta, None)
    preds = [
        ("o_orderdate", "in", II._BT_DATES_US),
        ("od_day", "in", II._BT_DATES_DAYS),
    ]
    plan = II.scan_plan_for_snapshot(tbl, meta, snap, predicates=preds)
    assert plan["files_pruned"] > 0
    us = F.expr(II._ODATE_US)
    full = II.read_iceberg_py(spark, tbl).filter(us.isin(*II._BT_DATES_US))
    got = II.read_iceberg_py(spark, tbl, predicates=preds).filter(
        us.isin(*II._BT_DATES_US)
    )
    assert got.count() > 0
    assert got.exceptAll(full).count() == 0 and full.exceptAll(got).count() == 0


def test_bucket_udf_object_dtype_tz_aware_hashes_utc_instant(spark):
    """The object-dtype fallback in _bucket_udf must hash a tz-aware
    datetime's UTC instant (spec: bucket over timestamptz evaluates in
    UTC), matching the datetime64 branch's tz_convert('UTC') — not the
    local wall-clock after a bare tzinfo strip (ADVICE r10)."""
    import datetime as dt

    import pandas as pd

    from map_reduce_spark.sources.iceberg_transforms import _bucket_udf, bucket_value

    fn = _bucket_udf(16, "timestamptz").func
    naive = dt.datetime(2017, 11, 16, 22, 31, 8, 123456)
    us = (naive - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
    utc = naive.replace(tzinfo=dt.timezone.utc)
    est = utc.astimezone(dt.timezone(dt.timedelta(hours=-5)))
    got = list(fn(pd.Series([utc, est, naive, None], dtype=object)))
    want = bucket_value(us, 16, "timestamp")
    assert got[0] == want
    assert got[1] == want  # same instant, -05:00 rendering
    assert got[2] == want  # naive treated as already-UTC civil value
    assert pd.isna(got[3])
