"""Plain-format scan tests: ORC / CSV / JSON-lines fixtures, the
explicit-schema discipline, and the plan-level evidence the scan
docstrings claim (ORC pushdown, split parallelism, pruned read
schemas)."""

from __future__ import annotations

import os

from map_reduce_spark.sources.plain_formats import (
    csv_scan,
    ensure_csv_fixture,
    ensure_json_fixture,
    ensure_orc_fixture,
    json_scan,
    orc_scan,
)


def test_fixtures_materialize_multifile(sf_dir):
    for fn, ext in (
        (ensure_orc_fixture, ".orc"),
        (ensure_csv_fixture, ".csv"),
        (ensure_json_fixture, ".jsonl"),
    ):
        d = fn(sf_dir)
        files = [f for f in os.listdir(d) if f.endswith(ext)]
        assert len(files) == 4, (d, files)
        # cached: second call returns the same directory without rebuild
        assert fn(sf_dir) == d


def test_orc_scan_pushdown_and_pruning(spark, sf_dir):
    """The status filter must reach the ORC scan as a pushed filter,
    and the read schema must carry only the selected columns."""
    plan = orc_scan(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "o_orderstatus" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], plan
    assert "Batched: true" in plan  # vectorized ORC reader engaged


def test_orc_scan_values(spark, sf_dir):
    df = orc_scan(spark, sf_dir)
    row = df.filter("o_orderkey = 1").collect()
    if row:  # sf-dependent; at least assert shape + date rendering
        assert row[0]["orderdate"].count("-") == 2
    assert df.schema["totalprice_cents"].dataType.simpleString() == "bigint"


def test_csv_scan_no_inference(spark, sf_dir):
    """The CSV read must be single-pass: explicit schema, so the scan
    plan exists without any inference job having materialized rows —
    and the money column is an exact bigint, never a re-parsed double."""
    df = csv_scan(spark, sf_dir)
    assert df.schema["acctbal_cents"].dataType.simpleString() == "bigint"
    # split parallelism: 4 files -> at least 4 input partitions possible;
    # a single-file funnel would show 1 here
    assert df.rdd.getNumPartitions() >= 2


def test_json_scan_props_extraction(spark, sf_dir):
    df = json_scan(spark, sf_dir)
    rows = df.limit(50).collect()
    assert rows and all(
        r["prop_k"] is None or isinstance(r["prop_k"], int) for r in rows
    )
    assert df.schema["ts_us"].dataType.simpleString() == "bigint"
