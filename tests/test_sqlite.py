"""SQLite source tests: filter-to-WHERE translation (with escaping),
JDBC-style stride-range coverage (boundaries, NULL keys, skew tails),
executor-observed predicate pushdown, schema mapping, and fixture
parity with the parquet ground truth."""

from __future__ import annotations

import os
import sqlite3

import pytest
from pyspark.sql import functions as F

from map_reduce_spark.sources.sqlite_py import (
    _partition_ranges,
    ensure_sqlite_fixture,
    filters_to_where,
    read_sqlite,
    table_schema,
    write_sqlite_table,
)


def test_filters_to_where_translation():
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        In,
        IsNull,
        LessThan,
        Not,
        StringContains,
        StringStartsWith,
    )

    frags, rest = filters_to_where(
        [
            EqualTo(("a",), 3),
            GreaterThanOrEqual(("b",), 2.5),
            LessThan(("c",), "o'brien"),  # quote must double
            In(("d",), (1, 2, 3)),
            IsNull(("e",)),
            StringStartsWith(("f",), "10%"),  # LIKE meta must escape
            StringContains(("g",), "x_y"),
            Not(EqualTo(("a",), 1)),  # unsupported -> returned
            EqualTo(("nested", "col"), 1),  # nested -> returned
        ]
    )
    assert '"a" = 3' in frags
    assert '"b" >= 2.5' in frags
    assert "'o''brien'" in " ".join(frags)
    assert '"d" IN (1, 2, 3)' in frags
    assert '"e" IS NULL' in frags
    assert any("10\\%" in f and "ESCAPE" in f for f in frags)
    assert any("x\\_y" in f for f in frags)
    assert len(rest) == 2


def _mkdb(path, rows, cols=(("k", "BIGINT"), ("v", "TEXT"))):
    write_sqlite_table(rows, list(cols), path, "t")


def test_stride_ranges_cover_exactly_once(spark, tmp_path):
    """Boundary keys, NULL keys and the skewed tail must each land in
    exactly one partition (Spark JDBC's clause contract)."""
    db = str(tmp_path / "t.db")
    rows = [(k, f"r{k}") for k in range(0, 15)] + [(None, "null1"), (None, "null2")]
    _mkdb(db, rows)
    ranges = _partition_ranges(db, "t", "k", 8)
    assert ranges[0][0] is None and ranges[-1][1] is None
    df = read_sqlite(spark, db, "t", partition_column="k", num_partitions=8)
    assert df.rdd.getNumPartitions() == len(ranges)
    got = df.select("v").toPandas()["v"].tolist()
    assert sorted(got) == sorted(r[1] for r in rows)  # no dup, no loss


def test_single_partition_degenerate_cases(spark, tmp_path):
    db = str(tmp_path / "one.db")
    _mkdb(db, [(7, "a"), (7, "b")])
    assert _partition_ranges(db, "t", "k", 8) == [(None, None)]  # lo == hi
    df = read_sqlite(spark, db, "t", partition_column="k", num_partitions=8)
    assert df.count() == 2
    empty = str(tmp_path / "empty.db")
    _mkdb(empty, [])
    assert _partition_ranges(empty, "t", "k", 8) == [(None, None)]
    assert read_sqlite(spark, empty, "t", partition_column="k").count() == 0


def test_pushdown_reaches_task_sql(spark, tmp_path):
    """The probe seam records, per task, how many pushed fragments the
    WHERE carried — >0 proves the filter was evaluated database-side,
    and the result must equal the unfiltered-scan + Spark-side filter."""
    db = str(tmp_path / "p.db")
    _mkdb(db, [(k, f"r{k}") for k in range(100)])
    probe = str(tmp_path / "probe")
    os.makedirs(probe)
    df = read_sqlite(
        spark, db, "t", partition_column="k", num_partitions=4, probe_dir=probe
    ).filter((F.col("k") >= 10) & (F.col("k") < 20))
    assert df.count() == 10
    marks = [open(os.path.join(probe, f)).read() for f in os.listdir(probe)]
    assert marks and all(int(m) >= 2 for m in marks)  # both conjuncts pushed
    # unsupported shapes fall back to Spark-side evaluation, same rows
    df2 = read_sqlite(spark, db, "t").filter(F.col("k") % 7 == 0)
    assert df2.count() == len([k for k in range(100) if k % 7 == 0])


def test_schema_mapping(tmp_path):
    db = str(tmp_path / "s.db")
    write_sqlite_table(
        [(1, "x", 1.5, b"\x00")],
        [("a", "INTEGER"), ("b", "VARCHAR(10)"), ("c", "REAL"), ("d", "BLOB")],
        db,
        "t",
    )
    assert table_schema(db, "t") == [
        ("a", "bigint"), ("b", "string"), ("c", "double"), ("d", "binary"),
    ]
    con = sqlite3.connect(db)
    con.execute("CREATE TABLE weird (x DATETIME)")
    con.commit()
    con.close()
    with pytest.raises(NotImplementedError, match="no supported Spark mapping"):
        table_schema(db, "weird")
    with pytest.raises(ValueError, match="not found"):
        table_schema(db, "missing")


def test_fixture_matches_parquet(spark, sf_dir):
    import pyarrow.parquet as pq

    db = ensure_sqlite_fixture(sf_dir)
    df = read_sqlite(spark, db, "supplier", partition_column="s_suppkey")
    want = pq.read_table(os.path.join(sf_dir, "supplier.parquet"))
    assert df.count() == want.num_rows
    got_bal = df.agg(F.sum(F.round(F.col("s_acctbal") * 100, 0).cast("long"))).first()[0]
    import math

    want_bal = sum(
        int(math.floor(v * 100 + 0.5)) if v >= 0 else -int(math.floor(-v * 100 + 0.5))
        for v in want.column("s_acctbal").to_pylist()
    )
    assert got_bal == want_bal


def test_row_scale_stride_read(spark, tmp_path):
    """The registered query reads a fixed dim (flat sweep by design);
    this pins the row-scaling behavior: 200k rows over 16 stride
    ranges, all partitions non-trivial, pushdown + aggregate exact."""
    db = str(tmp_path / "big.db")
    rows = [(k, k % 97, float(k) / 8) for k in range(200_000)]
    write_sqlite_table(
        rows, [("k", "BIGINT"), ("g", "BIGINT"), ("x", "DOUBLE")], db, "t"
    )
    df = read_sqlite(spark, db, "t", partition_column="k", num_partitions=16)
    assert df.rdd.getNumPartitions() == 16
    got = (
        df.filter(F.col("g") < 10)
        .agg(
            F.count("*").alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.sum(F.round(F.col("x") * 8, 0).cast("long")).alias("sum_x8"),
        )
        .first()
    )
    want = [r for r in rows if r[1] < 10]
    assert got.cnt == len(want)
    assert got.sum_k == sum(r[0] for r in want)
    assert got.sum_x8 == sum(r[0] for r in want)  # x*8 == k exactly
