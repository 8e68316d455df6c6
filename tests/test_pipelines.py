"""End-to-end training-data pipeline: composition of quality gate,
exact + near dedup, annotation, partitioned write."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_prepare_training_data(spark, sf_dir, tmp_path):
    from map_reduce_spark.io import load_table
    from map_reduce_spark.pipelines import prepare_training_data

    out = str(tmp_path / "prepared")
    df = prepare_training_data(spark, sf_dir, out)
    rows = df.collect()
    n_docs = load_table(spark, sf_dir, "documents").count()

    # the gates only remove rows, never invent them
    assert 0 < len(rows) <= n_docs
    # exact dedup held: no two survivors share content
    texts = [r.text for r in rows]
    assert len(texts) == len(set(texts))
    # annotation columns present and sane
    assert all(r.pred_lang in ("en", "es", "de", "fr") for r in rows)
    assert all(r.n_tokens > 0 and r.n_chars_actual >= 200 for r in rows)

    # partitioned layout on disk, readable back to the same count
    parts = [d for d in os.listdir(out) if d.startswith("pred_lang=")]
    assert parts, "expected pred_lang= partition directories"
    back = spark.read.parquet(out)
    assert back.count() == len(rows)

    # partition pruning applies on the partition column
    one = back.filter(F.col("pred_lang") == rows[0].pred_lang)
    assert one.count() == sum(1 for r in rows if r.pred_lang == rows[0].pred_lang)

    # deterministic across runs
    again = prepare_training_data(spark, sf_dir)
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in rows}


def test_prepare_training_data_split_column(spark, sf_dir):
    from map_reduce_spark.pipelines import prepare_training_data

    rows = prepare_training_data(spark, sf_dir).collect()
    assert all(r.split in ("train", "val", "test") for r in rows)
    # split agrees with the registered split operator on shared docs
    from map_reduce_spark.operators.pipeline_ops import split_train_val_test

    expected = {
        r.doc_id: r.split for r in split_train_val_test(spark, sf_dir).collect()
    }
    assert all(expected[r.doc_id] == r.split for r in rows)
