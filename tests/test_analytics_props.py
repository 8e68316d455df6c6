"""Structural properties of the analytics/graph family that the
DuckDB oracles cannot express (cross-row invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_spark.registry import queries

_QS = queries()


def test_funnel_counts_are_monotone_nonincreasing(spark, sf_dir):
    rows = sorted(
        _QS["funnel_analysis"](spark, str(sf_dir)).collect(),
        key=lambda r: r["stage"],
    )
    counts = [r["users"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert rows[0]["stage_name"] == "signup"


def test_cohort_day_zero_is_full_cohort(spark, sf_dir):
    """Offset 0 of every cohort contains exactly the cohort's users
    (everyone is active on their own first day)."""
    ret = _QS["cohort_retention"](spark, str(sf_dir))
    day0 = {
        r["cohort_day"]: r["n_users"]
        for r in ret.filter(F.col("day_offset") == 0).collect()
    }
    later = ret.filter(F.col("day_offset") > 0).collect()
    for r in later:
        assert r["n_users"] <= day0[r["cohort_day"]]


def test_ohlc_bounds(spark, sf_dir):
    """low <= open, close <= high on every bar; volume positive."""
    for r in _QS["ohlc_hourly"](spark, str(sf_dir)).collect():
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["volume"] >= 1


def test_textrank_ranks_positive_and_bounded(spark, sf_dir):
    """Integer PageRank: every rank >= the damping floor; the top-20
    are returned in strictly ordered (rank desc, token) form."""
    rows = _QS["textrank_keywords"](spark, str(sf_dir)).collect()
    assert 0 < len(rows) <= 20
    floor = 15 * 1_000_000_000 // 100
    keys = [(-r["rank"], r["token"]) for r in rows]
    assert keys == sorted(keys)
    assert all(r["rank"] >= floor for r in rows)


def test_zorder_locality_beats_linear_for_second_dim(spark, sf_dir):
    """The point of z-order: filtering on the SECOND dimension (hour)
    touches a small fraction of z-ordered file groups, whereas a
    linear sort on user_id alone would spread any hour filter across
    essentially all of them."""
    df = _QS["zorder_layout"](spark, str(sf_dir)).cache()
    total_groups = df.select("file_group").distinct().count()
    one_hour = df.filter(F.col("y") == df.agg(F.min("y")).collect()[0][0])
    touched = one_hour.select("file_group").distinct().count()
    assert touched < total_groups * 0.5, (touched, total_groups)
    df.unpersist()


def test_table_profile_consistency(spark, sf_dir):
    prof = {r["col_name"]: r for r in _QS["table_profile"](spark, str(sf_dir)).collect()}
    n = prof["o_orderkey"]["n_rows"]
    for r in prof.values():
        assert r["n_rows"] == n
        assert 0 <= r["n_nulls"] <= n
        assert r["n_distinct"] <= n - r["n_nulls"]
    # o_orderkey is the primary key: all-distinct, no nulls
    assert prof["o_orderkey"]["n_distinct"] == n
    assert prof["o_orderkey"]["n_nulls"] == 0
