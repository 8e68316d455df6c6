#!/usr/bin/env python
"""Drive the ENTIRE registered catalog (not just the 50-entry driver
window) against the DuckDB oracle in a DRIVER-STYLE VANILLA session —
no engine conf from ``map_reduce_spark.session``, an explicit session
timezone — the round-end certification pass (SCALE_rN
``full_catalog_tz_drive_sf001``). Run it from a foreign cwd (/tmp) so
plan-time Python workers exercise NOTES rule 39.

Usage: python scripts/full_catalog_drive.py [sf_dir] [tz]
Prints one JSON line: {"sf", "tz", "oracled_ok", "rows_only_ok",
"failed": [[name, err], ...], "sec"}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tz = sys.argv[2] if len(sys.argv) > 2 else "UTC"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", tz)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry
    from map_reduce_spark.session import release_caches
    from tests.oracle import assert_frames_match

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, oracles = entry.queries(), entry.oracle_sql()
    t_start = time.time()
    oracled_ok = rows_only_ok = 0
    failed: list[list[str]] = []
    for i, (name, fn) in enumerate(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                assert_frames_match(sdf, con.execute(oracles[name]).df(), name)
                oracled_ok += 1
                tag = "OK"
            else:
                assert sdf.count() >= 0
                rows_only_ok += 1
                tag = "rows-only"
            print(
                f"  [{i + 1:3d}/{len(qs)}] {name:36s} {tag:9s} {time.time() - t0:5.1f}s",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 - report-and-continue harness
            failed.append([name, str(e)[:300]])
            print(f"  [{i + 1:3d}/{len(qs)}] {name:36s} FAIL {e}", file=sys.stderr)
        finally:
            release_caches()
    print(
        json.dumps(
            {
                "sf": sf_dir,
                "tz": tz,
                "oracled_ok": oracled_ok,
                "rows_only_ok": rows_only_ok,
                "failed": failed,
                "sec": round(time.time() - t_start, 1),
            }
        )
    )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
