#!/usr/bin/env python
"""Per-query cost split: DataFrame BUILD time (driver-side py4j plan
construction, fixture mutation commits, eager checkpoints) vs noop
EXECUTION time, plus job count — the measurement §1 of the
optimization guide asks for before touching anything.

Usage: python scripts/profile_queries.py q1 q2 ...   (defaults: top set)
Env:   SPARK_GRAFT_SF_DIR (default sf0.1), REPS (default 3, min taken)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("REPS", "3"))


def main() -> None:
    names = sys.argv[1:]
    from map_reduce_spark.registry import queries
    from map_reduce_spark.session import get_spark, release_caches

    spark = get_spark("profile")
    sc = spark.sparkContext
    qs = queries()
    if not names:
        names = list(qs)

    # JVM warm-up
    spark.range(0, 10_000_000, 1, 32).selectExpr(
        "bit_xor(xxhash64(id)) h"
    ).write.format("noop").mode("overwrite").save()

    out = {}
    for name in names:
        best = None
        for _ in range(REPS + 1):  # +1 cold rep, not recorded as min
            j0 = sc._jsc.sc().dagScheduler().nextJobId()
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            release_caches()
            j1 = sc._jsc.sc().dagScheduler().nextJobId()
            rec = {
                "build": round(t1 - t0, 3),
                "exec": round(t2 - t1, 3),
                "total": round(t2 - t0, 3),
                "jobs": j1 - j0,
            }
            if best is None or rec["total"] < best["total"]:
                best = dict(rec, cold=round(t2 - t0, 3)) if best is None else {
                    **rec, "cold": best["cold"]}
        out[name] = best
        print(f"{best['total']:8.3f} total {best['build']:7.3f} build "
              f"{best['exec']:7.3f} exec {best['jobs']:4d} jobs  {name}",
              flush=True)
    with open("/tmp/profile_queries.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
