"""Source/sink roundtrips: text, csv, json, parquet (SURVEY §2.2 rows
"scans / sources" and "sinks"). Spark's task-commit protocol replaces
the reference's unsafe append-mode sinks (worker.ex:124,147)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_spark import io as mio


def test_parquet_roundtrip(spark, sf_dir, tmp_path):
    df = mio.load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_pq")
    mio.write_parquet(df, out)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parquet_partitioned_write(spark, sf_dir, tmp_path):
    df = mio.load_table(spark, sf_dir, "customer")
    out = str(tmp_path / "cust_part")
    mio.write_parquet(df, out, partition_by=["c_mktsegment"])
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # partition pruning: a segment filter must read only that partition
    one = back.filter(F.col("c_mktsegment") == "BUILDING")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "c_mktsegment=BUILDING" in plan or one.count() == df.filter(
        F.col("c_mktsegment") == "BUILDING"
    ).count()


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    df = mio.load_table(spark, sf_dir, "region")
    out = str(tmp_path / "region_csv")
    mio.write_csv(df, out)
    back = mio.read_csv(spark, out, schema="r_regionkey int, r_name string")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_roundtrip(spark, sf_dir, tmp_path):
    df = mio.load_table(spark, sf_dir, "supplier")
    out = str(tmp_path / "supp_json")
    df.write.mode("overwrite").json(out)
    back = mio.read_json(
        spark,
        out,
        schema="s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ).select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    want = df.select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, want.collect()))


def test_text_sink_roundtrip(spark, sf_dir, tmp_path):
    from map_reduce_spark.operators.wordcount import sink_text

    lines = sink_text(spark, sf_dir)
    out = str(tmp_path / "wc_text")
    mio.write_text_lines(lines, out)
    back = spark.read.text(out)
    assert sorted(r.value for r in back.collect()) == sorted(
        r.line for r in lines.collect()
    )


def test_overwrite_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running a sink must not double-append (the reference's
    append-mode recovery hazard, removed by construction)."""
    df = mio.load_table(spark, sf_dir, "region")
    out = str(tmp_path / "idem")
    mio.write_parquet(df, out)
    mio.write_parquet(df, out)
    assert spark.read.parquet(out).count() == df.count()


def test_gated_connectors_raise_cleanly(spark):
    import pytest

    with pytest.raises(NotImplementedError, match="JDBC"):
        mio.read_jdbc(spark, "jdbc:postgresql://nowhere/db", "t")
    # Avro and Delta are NOT gated anymore (round 8): the jar-less
    # paths fall back to the pure-Python readers, which report a
    # missing path as a plain file error, not a capability gate
    with pytest.raises(FileNotFoundError):
        mio.read_avro(spark, "/tmp/no-such-avro")
    with pytest.raises(FileNotFoundError, match="no Delta log"):
        mio.read_delta(spark, "/tmp/no-such-delta")


def test_salted_join_equals_plain_on_skewed_data(spark):
    """Hot-key skew: 90% of the fact rows share one key; the salted
    join must produce exactly the plain join's aggregate."""
    from pyspark.sql import functions as F

    n = 20_000
    fact = spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 1000).alias("v"),
        (F.col("id") % 8).cast("int").alias("salt"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = (
        fact.join(dim, "k")
        .agg(F.sum(F.col("v") * F.col("w")).alias("s"), F.count("*").alias("c"))
        .collect()[0]
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(s) for s in range(8)]))
    )
    salted = (
        fact.join(dim_salted, ["k", "salt"])
        .agg(F.sum(F.col("v") * F.col("w")).alias("s"), F.count("*").alias("c"))
        .collect()[0]
    )
    assert (plain.s, plain.c) == (salted.s, salted.c)


def test_whole_text_files(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("alpha beta")
    (d / "b.txt").write_text("gamma")
    df = mio.whole_text_files(spark, str(d))
    got = {r.filename.split("/")[-1]: r.content for r in df.collect()}
    assert got == {"a.txt": "alpha beta", "b.txt": "gamma"}


def test_binary_file_source_feeds_multimodal_decode(spark, tmp_path):
    """binaryFile source -> extract_features: real files on disk become
    (doc_id, payload) rows and the header parser returns true
    dimensions — the end-to-end multimodal ingestion path."""
    from pyspark.sql import functions as F

    from map_reduce_spark.operators.multimodal import extract_features

    d = tmp_path / "media"
    d.mkdir()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + (13).to_bytes(4, "big") + b"IHDR"
        + (320).to_bytes(4, "big") + (240).to_bytes(4, "big")
        + bytes([8, 6, 0, 0, 0])  # RGBA
        + b"\x00\x00\x00\x00"
    )
    (d / "img1.png").write_bytes(png)
    (d / "skip.txt").write_text("not media")
    df = mio.read_binary_files(spark, str(d), glob="*.png")
    assert df.count() == 1  # pathGlobFilter pruned the .txt at listing
    rows = extract_features(
        df.select(F.lit(1).cast("long").alias("doc_id"), F.col("content").alias("payload"))
    ).collect()
    assert (rows[0].width, rows[0].height, rows[0].channels) == (320, 240, 4)


def test_orc_round_trip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation.orc")
    nation = mio.load_table(spark, sf_dir, "nation")
    mio.write_orc(nation, out)
    back = mio.read_orc(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_xml_round_trip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "nation.xml")
    nation = mio.load_table(spark, sf_dir, "nation")
    mio.write_xml(nation, out, row_tag="nation")
    back = mio.read_xml(spark, out, row_tag="nation").select(*nation.columns)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, nation.collect()))


def test_partitioned_layout_prunes_at_read(spark, sf_dir, tmp_path):
    """Hive-partitioned parquet + a partition-key predicate must prune
    at PLANNING time (PartitionFilters), not post-scan — at 100 TB the
    difference is reading one directory vs the whole table."""
    from map_reduce_spark import io

    docs = io.load_table(spark, str(sf_dir), "documents")
    path = str(tmp_path / "by_lang")
    io.write_parquet(docs, path, partition_by=["lang"])

    back = spark.read.parquet(path).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:120]
    assert "lang" in pf
    # the non-partition data filter list must NOT carry the lang predicate
    assert back.count() == docs.filter(F.col("lang") == "en").count()


def test_compact_small_files_preserves_rows(spark, sf_dir, tmp_path):
    from map_reduce_spark import io

    docs = io.load_table(spark, str(sf_dir), "documents")
    path = str(tmp_path / "fragmented")
    docs.repartition(24).write.parquet(path)  # 24 sliver files
    import glob

    assert len(glob.glob(path + "/*.parquet")) == 24
    n = io.compact_small_files(spark, path, target_mb=128)
    assert n == 1  # tiny table -> one file
    assert len(glob.glob(path + "/*.parquet")) == 1
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert sorted(back.columns) == sorted(docs.columns)


def test_write_read_delta_roundtrip(spark, tmp_path):
    """The io-level delegators: write_delta commits transactionally,
    read_delta serves the same rows through the jar-less fallback."""
    from pyspark.sql import functions as F

    tbl = str(tmp_path / "t")
    df = spark.range(500).withColumn("v", F.col("id") * 2)
    assert mio.write_delta(df, tbl, mode="overwrite", stats_cols=("id",)) == 0
    assert mio.write_delta(df.withColumn("id", F.col("id") + 500), tbl) == 1
    got = mio.read_delta(spark, tbl)
    assert got.count() == 1000
