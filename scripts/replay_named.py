"""Replay ANY named registered queries against their DuckDB oracles at
an arbitrary SF — the surgical twin of replay_driver_window.py for
queries outside the 50-entry driver window (optimization-round A/B
verification).

Usage:  python scripts/replay_named.py [sf_dir] <name> [<name> ...]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and "/" in args[0]:
        sf_dir, args = args[0], args[1:]
    names = args

    from map_reduce_spark.registry import oracle_sql, queries
    from map_reduce_spark.session import get_spark, release_caches

    sys.path.insert(0, "/root/repo/tests")
    from oracle import assert_frames_match

    spark = get_spark("replay_named")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, osql = queries(), oracle_sql()
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            if name not in osql or osql[name] is None:
                rows = sdf.count()
                print(f"  {name:32s} rows-only  rows={rows:>7d}  {time.time() - t0:5.1f}s")
                continue
            ddf = con.execute(osql[name]).df()
            assert_frames_match(sdf, ddf, name)
            print(f"  {name:32s} OK         rows={len(ddf):>7d}  {time.time() - t0:5.1f}s")
        except Exception as e:
            failures.append(name)
            print(f"  {name:32s} FAIL  {e}")
            traceback.print_exc()
        finally:
            release_caches()
    print(f"\n{len(names) - len(failures)}/{len(names)} passed at {sf_dir}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
