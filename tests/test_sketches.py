"""HLL sketch union: the estimate merged across group sketches must
track the exact global distinct count within the sketch's error bound
(lgConfigK=12 -> ~1.6% rsd; assert a loose 5%)."""

from __future__ import annotations

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import queries

_QS = queries()


def test_hll_union_estimate_tracks_exact(spark, sf_dir):
    row = _QS["agg_hll_sketch_union"](spark, str(sf_dir)).collect()[0]
    exact = (
        load_table(spark, str(sf_dir), "customer")
        .select("c_custkey")
        .distinct()
        .count()
    )
    assert row["n_rows"] >= exact
    assert abs(row["est_customers"] - exact) <= max(2, 0.05 * exact)


def test_hll_union_is_deterministic(spark, sf_dir):
    a = _QS["agg_hll_sketch_union"](spark, str(sf_dir)).collect()[0]
    b = _QS["agg_hll_sketch_union"](spark, str(sf_dir)).collect()[0]
    assert a == b


# --- doc_chunking invariants (beyond the exact oracle) ----------------


def test_chunking_covers_every_word_with_correct_overlap(spark, sf_dir):
    """Every document's words are fully covered: chunk k starts at word
    k*48, consecutive chunks overlap by exactly 16 words (except the
    tail), and the last chunk reaches the document's end."""
    from pyspark.sql import functions as F

    from map_reduce_spark.io import load_table
    from map_reduce_spark.registry import queries

    ch = queries()["doc_chunking"](spark, str(sf_dir))
    agg = (
        ch.groupBy("doc_id")
        .agg(
            F.max(F.col("start_word") + F.col("n_words")).alias("covered"),
            F.count("*").alias("n_chunks"),
            F.min("n_words").alias("min_words"),
            F.max("n_words").alias("max_words"),
        )
    )
    docs = load_table(spark, str(sf_dir), "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("nw")
    )
    joined = agg.join(docs, "doc_id")
    # full coverage: the furthest chunk end equals the word count
    assert joined.filter(F.col("covered") != F.col("nw")).count() == 0
    # every chunk is 1..64 words
    assert joined.filter((F.col("min_words") < 1) | (F.col("max_words") > 64)).count() == 0
    # chunk count formula: ceil(max(nw-16,1)/48)
    assert (
        joined.filter(
            F.col("n_chunks") != F.ceil(F.greatest(F.col("nw") - 16, F.lit(1)) / 48.0)
        ).count()
        == 0
    )


def test_theta_setops_track_exact(spark, sf_dir):
    """Theta union/intersection estimates vs exact set sizes (default
    lgK=12 -> ~3% rsd even through intersection; assert 10%)."""
    from pyspark.sql import functions as F

    from map_reduce_spark.io import load_table

    row = _QS["agg_theta_sketch_setops"](spark, str(sf_dir)).collect()[0]
    o = load_table(spark, str(sf_dir), "orders")
    n_status = row["n_groups"]
    exact_union = o.select("o_custkey").distinct().count()
    exact_inter = (
        o.groupBy("o_custkey")
        .agg(F.count_distinct("o_orderstatus").alias("k"))
        .filter(F.col("k") == n_status)
        .count()
    )
    assert abs(row["union_est"] - exact_union) <= max(2, 0.10 * exact_union)
    assert abs(row["inter_est"] - exact_inter) <= max(2, 0.10 * exact_inter)


def test_wav_parser_handles_real_wave_files(tmp_path):
    """The RIFF parser must read genuine WAV files (stdlib wave
    writer), not just our synthesized containers."""
    import wave

    from map_reduce_spark.operators.multimodal import parse_wav_fields

    f = tmp_path / "real.wav"
    with wave.open(str(f), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(44100)
        w.writeframes(b"\x00\x01" * 2 * 44100)  # 1 second
    fields = parse_wav_fields(f.read_bytes())
    assert fields == (44100, 2, 16, 44100, 1000)
