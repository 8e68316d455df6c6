"""Delta → Iceberg migration: zero data movement (shared inodes),
row-level equality, immediate pruning citizenship, and the three
honesty gates (DV, column mapping, hive partitions)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import map_reduce_spark.sources.delta_py as D
import map_reduce_spark.sources.iceberg_py as I


def _mk(spark, n=80):
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 7).alias("v"),
        F.concat(F.lit("r"), F.col("id").cast("string")).alias("s"),
    )


def test_migration_shares_bytes_and_rows(spark, tmp_path):
    delta = str(tmp_path / "d")
    ice = str(tmp_path / "i")
    d = _mk(spark)
    D.write_delta_py(d.repartitionByRange(4, "id"), delta, mode="overwrite")
    I.migrate_delta_to_iceberg(spark, delta, ice)
    got = I.read_iceberg_py(spark, ice)
    assert got.exceptAll(d).count() == 0 and d.exceptAll(got).count() == 0
    # zero data movement: every iceberg data file is a hardlink of a
    # delta data file (same inode)
    delta_inodes = {
        os.stat(os.path.join(delta, f)).st_ino
        for f in os.listdir(delta)
        if f.endswith(".parquet")
    }
    ice_files = os.listdir(os.path.join(ice, "data"))
    assert ice_files
    for f in ice_files:
        assert os.stat(os.path.join(ice, "data", f)).st_ino in delta_inodes
    # immediate pruning citizenship: footer bounds landed in manifests
    meta = I.load_table_metadata(ice)
    snap = I._pick_snapshot(meta, None)
    plan = I.scan_plan_for_snapshot(ice, meta, snap, predicates=[("id", ">=", 60)])
    assert plan["files_pruned"] > 0
    # and the migrated table accepts ordinary Iceberg writes
    I.append_iceberg_snapshot(_mk(spark).withColumn("id", F.col("id") + 100), ice)
    assert I.read_iceberg_py(spark, ice).count() == 160


def test_migration_gates(spark, tmp_path):
    # hive-partitioned delta layouts
    delta = str(tmp_path / "p")
    D.write_delta_py(
        _mk(spark).withColumn("g", F.col("id") % 2),
        delta, mode="overwrite", partition_by=("g",),
    )
    with pytest.raises(NotImplementedError, match="partition"):
        I.migrate_delta_to_iceberg(spark, delta, str(tmp_path / "i1"))
    # deletion-vector tables
    delta2 = str(tmp_path / "dv")
    D.write_delta_py(_mk(spark), delta2, mode="overwrite")
    D.delete_where_dv(spark, delta2, F.col("id") < 5)
    with pytest.raises(NotImplementedError, match="deletion-vector"):
        I.migrate_delta_to_iceberg(spark, delta2, str(tmp_path / "i2"))


def test_reverse_migration_roundtrip(spark, tmp_path):
    """Iceberg → Delta: shared inodes, row equality — including from a
    PARTITIONED iceberg table (hidden partitioning keeps source
    columns in the files, so the Delta import is lossless)."""
    ice = str(tmp_path / "i")
    delta = str(tmp_path / "d")
    d = _mk(spark)
    I.append_iceberg_snapshot(
        d.withColumn("g", F.col("id") % 3), ice, [("g", "bucket[2]")]
    )
    I.migrate_iceberg_to_delta(spark, ice, delta, stats_cols=("id",))
    got = D.read_delta_py(spark, delta)
    want = d.withColumn("g", F.col("id") % 3)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    ice_inodes = {
        os.stat(os.path.join(ice, "data", f)).st_ino
        for f in os.listdir(os.path.join(ice, "data"))
    }
    for f in os.listdir(delta):
        if f.endswith(".parquet"):
            assert os.stat(os.path.join(delta, f)).st_ino in ice_inodes
    # stats landed: delta-side skipping prunes on id immediately
    snap = D.snapshot(delta)
    assert len(D.skip_files(snap, "id", 70, 200)) < len(snap.adds)
    # destination-exists and MOR gates
    with pytest.raises(ValueError, match="already a Delta table"):
        I.migrate_iceberg_to_delta(spark, ice, delta)
    I.commit_positional_deletes(spark, ice, F.col("id") < 3)
    with pytest.raises(NotImplementedError, match="merge-on-read"):
        I.migrate_iceberg_to_delta(spark, ice, str(tmp_path / "d2"))
