"""Parity with the reference's golden output.

The reference's de-facto golden result is /root/reference/mr-out-0 —
the global word count over the 8 Gutenberg books in
priv/resources/ produced by the sequential oracle
(lib/mr_sequential.ex). Our DataFrame pipeline and our generic
run_job() API must both reproduce it exactly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

REF_CORPUS = "/root/reference/priv/resources"
GOLDEN = "/root/reference/mr-out-0"

needs_reference = pytest.mark.skipif(
    not (os.path.isdir(REF_CORPUS) and os.path.isfile(GOLDEN)),
    reason="reference corpus not available",
)


def load_golden() -> dict[str, int]:
    out = {}
    with open(GOLDEN, encoding="utf-8") as f:
        for line in f:
            word, cnt = line.rsplit(" ", 1)
            out[word] = int(cnt)
    return out


@needs_reference
def test_dataframe_wordcount_matches_golden(spark):
    df = (
        spark.read.text(REF_CORPUS)
        .select(F.explode(F.split("value", "[^a-zA-Z]")).alias("token"))
        .filter(F.col("token") != "")
        .select(F.upper("token").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    got = {r["word"]: r["cnt"] for r in df.collect()}
    assert got == load_golden()


@needs_reference
def test_run_job_api_matches_golden(spark):
    from map_reduce_spark.mapreduce import word_count

    got = dict(word_count(spark, REF_CORPUS).collect())
    assert got == load_golden()


def test_run_job_generic_contract(spark, tmp_path):
    """run_job honors the mapper/reducer UDF contract on arbitrary apps."""
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.txt").write_text("x y x\n")
    (d / "b.txt").write_text("y z\n")

    from map_reduce_spark.mapreduce import run_job

    # a non-wordcount app: emit (token, len(token)), reduce by summing
    def mapper(fname, content):
        return [(t, len(t)) for t in content.split()]

    def reducer(key, values):
        return sum(values)

    got = dict(run_job(spark, mapper, reducer, str(d)).collect())
    assert got == {"x": 2, "y": 2, "z": 1}
