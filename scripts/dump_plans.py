#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named queries to plans/r11/.

Usage:
    python scripts/dump_plans.py before q1 q2 ...
    python scripts/dump_plans.py after  q1 q2 ...

Writes plans/r11/<query>_<tag>.txt (the optimization-round evidence
files: the judge checks plan claims against these).  Queries are built
at sf0.001 (plan shape is SF-invariant; building at the small SF keeps
fixture-mutating queries cheap) unless SPARK_GRAFT_SF_DIR overrides.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r11")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)

    from map_reduce_spark.registry import queries
    from map_reduce_spark.session import get_spark, release_caches

    spark = get_spark("dump_plans")
    qs = queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        release_caches()
        print(f"wrote {path} ({len(txt)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
