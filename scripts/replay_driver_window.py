"""Replay the driver's correctness gate locally at an arbitrary SF.

The per-round driver hash-compares the FIRST 50 entries of
``__spark_entry__.queries()`` against ``oracle_sql()`` via DuckDB at
sf0.01.  The pytest parity suite replays the same check at sf0.001 for
speed; this script replays it at the driver's actual SF (default
sf0.01) over the actual driver window so surprises surface before the
round gate, not during it.

Usage:  python scripts/replay_driver_window.py [sf_dir] [n] [names...]
"""

from __future__ import annotations

import itertools
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    only = set(sys.argv[3:])

    import __spark_entry__ as entry
    from map_reduce_spark.session import get_spark
    from tests.oracle import assert_frames_match

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    window = list(itertools.islice(qs, n))
    if only:
        window = [w for w in window if w in only]

    failures = []
    for name in window:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            if name not in oracles:
                rows = sdf.count()
                print(f"  {name:32s} rows-only  rows={rows:>7d}  {time.time() - t0:5.1f}s")
                continue
            ddf = con.execute(oracles[name]).df()
            assert_frames_match(sdf, ddf, name)
            print(f"  {name:32s} OK         rows={len(ddf):>7d}  {time.time() - t0:5.1f}s")
        except Exception as e:  # noqa: BLE001 - report-and-continue harness
            failures.append(name)
            print(f"  {name:32s} FAIL  {e}")
            traceback.print_exc(limit=3)

    print(f"\n{len(window) - len(failures)}/{len(window)} passed at {sf_dir}")
    if failures:
        print("FAILED:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
