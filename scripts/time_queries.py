#!/usr/bin/env python
"""Time named queries through the noop sink (bench.py methodology):
one cold pass + N warm passes, min-of-warm reported per query.

Usage: python scripts/time_queries.py [-n 3] <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    from map_reduce_spark.registry import queries
    from map_reduce_spark.session import get_spark, release_caches

    spark = get_spark("time_queries")
    qs = queries()
    # tiny warmup for JIT
    spark.range(0, 10_000_000, 1, 32).selectExpr(
        "bit_xor(xxhash64(id)) h"
    ).write.format("noop").mode("overwrite").save()
    results: dict[str, list[float]] = {q: [] for q in args}
    for pass_i in range(n + 1):
        for name in args:
            spark.sparkContext.setJobDescription(f"{name} pass{pass_i}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            release_caches()
            if pass_i > 0:  # pass 0 = cold
                results[name].append(dt)
            else:
                print(f"cold {name}: {dt:.3f}", flush=True)
    for name in args:
        r = results[name]
        print(
            f"warm {name}: min {min(r):.3f}  all "
            + " ".join(f"{x:.3f}" for x in r),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
