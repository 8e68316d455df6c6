#!/usr/bin/env python
"""Scale PARITY pass: replay the driver's DuckDB hash-compare at an
arbitrary (usually larger) SF dir — the check that caught the round-4
size-dependent correctness bugs (NOTES rules 23-25: decimal->double
frontiers, repartitionByRange boundary re-sampling, percentile
threshold ulps). sf0.01 can never exercise these; run this at each
new scale decade.

Usage: python scripts/parity_at_scale.py [SF_DIR] [--include-heavy]

Default SF_DIR is the 10x slice from scripts/synth_sf1.py. The
default skip list drops (a) oracles that embed the
quadratic-by-design exact-compare CTEs (their Spark twins are the
scale path; the oracle itself cannot run at volume) and (b) queries
whose output exceeds driver-collect size at 10x. --include-heavy
keeps the expensive-but-feasible oracles (portable minhash/simhash,
BPE chain, the coarse-cell family) — budget ~10 min and give the JVM
memory (this script asks for 24g driver heap).

Prints one JSON line: {"checked": n, "match": n, "mismatch": [...],
"error": [...], "skipped": [...]}.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUADRATIC_ORACLES = [
    "entity_resolution",
    "ngram_jaccard_dupes",
    "dedup_components",
    "dedup_components_lss",
    "prepare_training_data",
    "select_pretraining_data",
]
BIG_OUTPUT = ["interpolate_hourly", "gap_fill_hourly"]
HEAVY = [
    "bpe_train_merges",
    "bpe_encode",
    "bpe_pair_counts",
    "dedup_semantic",
    "knn_graph",
    "dedup_embedding_cosine",
    "ann_lsh_topk_portable",
    "dedup_minhash_lsh_portable",
    "dedup_simhash_portable",
    "contamination_minhash",
]


def main() -> None:
    import duckdb
    from pyspark.sql import SparkSession

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    include_heavy = "--include-heavy" in sys.argv
    sf = args[0] if args else "/root/repo/.sf1synth"

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as E

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    qs, os_ = E.queries(), E.oracle_sql()
    skip = set(QUADRATIC_ORACLES + BIG_OUTPUT)
    if not include_heavy:
        skip |= set(HEAVY)
    match, mismatch, error, skipped = 0, [], [], sorted(skip & set(os_))
    for name in sorted(os_):
        if name in skip:
            continue
        try:
            sp = qs[name](spark, sf).toPandas()
            du = con.execute(os_[name]).fetchdf()
            sp, du = sp[sorted(sp.columns)], du[sorted(du.columns)]
            a = sorted(map(tuple, sp.astype(str).values.tolist()))
            b = sorted(map(tuple, du.astype(str).values.tolist()))
            if a == b:
                match += 1
            else:
                mismatch.append(name)
            print(f"# {name} {'MATCH' if a == b else 'MISMATCH'}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report and continue
            error.append(name)
            print(f"# {name} ERROR {str(e)[:120]}", file=sys.stderr)
        spark.catalog.clearCache()
    print(
        json.dumps(
            {
                "sf_dir": sf,
                "checked": match + len(mismatch) + len(error),
                "match": match,
                "mismatch": mismatch,
                "error": error,
                "skipped": skipped,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
