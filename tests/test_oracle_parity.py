"""Differential test: every registered query vs its DuckDB oracle.

This mirrors the driver's CORRECTNESS gate (row count + columns +
order-insensitive values) at sf0.001 so regressions surface locally.
"""

from __future__ import annotations

import pytest

from map_reduce_spark import registry
from map_reduce_spark.session import release_caches
from tests.oracle import assert_frames_match

_QUERIES = registry.all_queries()


def _assert_no_leaked_caches(spark, name):
    """The engine-wide cache convention (session.stage_cache): after a
    query's result is materialized and release_caches() runs, the JVM
    must report zero persisted RDDs — a long-lived session calling the
    whole catalog accumulates nothing (r4 ADVICE leak, r4 verdict #2)."""
    release_caches()
    leaked = spark.sparkContext._jsc.getPersistentRDDs()
    assert leaked.isEmpty(), f"{name}: leaked persisted RDDs: {leaked}"


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    q = _QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0  # runs at all
    if q.oracle is None:
        _assert_no_leaked_caches(spark, name)
        pytest.skip(f"{name}: rows-only (no SQL oracle)")
    duck_df = duck.execute(q.oracle).fetchdf()
    assert_frames_match(df, duck_df, name)
    _assert_no_leaked_caches(spark, name)
