"""df.observe(): accumulator-style metrics collected DURING a job — the
Spark-native replacement for the reference master's hand-rolled
progress bookkeeping (master.ex:183-196 completion detection), and the
zero-extra-pass way to audit row counts / quality gates in a 100 TB
pipeline (a second COUNT(*) scan would re-read the input)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table


def test_observe_collects_metrics_in_flight(spark, sf_dir):
    li = load_table(spark, str(sf_dir), "lineitem")
    obs = Observation("q1_audit")
    audited = li.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum((F.col("l_quantity") <= 0).cast("long")).alias("bad_qty_rows"),
    )
    out = (
        audited.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    got = obs.get
    assert got["rows_scanned"] == sum(r["n"] for r in out)
    assert got["bad_qty_rows"] == 0


def test_observe_matches_independent_count(spark, sf_dir):
    docs = load_table(spark, str(sf_dir), "documents")
    obs = Observation("doc_audit")
    docs.observe(obs, F.count(F.lit(1)).alias("n")).agg(
        F.max("n_chars")
    ).collect()
    assert obs.get["n"] == docs.count()
