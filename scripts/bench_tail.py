#!/usr/bin/env python
"""Heavy-tail scale trend: run the most expensive bench queries at an
arbitrary SF dir (default the synthesized sf1-equivalent slice from
scripts/synth_sf1.py) and print one JSON line — min-of-2 warm passes
through the noop sink, same methodology as bench.py.

Usage: python scripts/bench_tail.py [SF_DIR [query ...]]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAIL = [
    "knn_graph",
    "dedup_simhash_portable",
    "entity_resolution",
    "dedup_semantic",
    "bpe_train_merges",
]


def main() -> None:
    from map_reduce_spark.registry import queries
    from map_reduce_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1synth"
    names = sys.argv[2:] or TAIL
    spark = get_spark("bench-tail")
    qs = queries()

    for name in names:  # warm-up pass (JIT + codegen)
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    timings: dict[str, float] = {}
    for _ in range(2):
        for name in names:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            spark.catalog.clearCache()

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "total_sec": round(sum(timings.values()), 3),
                "queries": timings,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
