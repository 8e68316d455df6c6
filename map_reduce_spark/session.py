"""SparkSession factory tuned for this engine.

Local test posture is ``local[N]`` (one JVM), but every setting here is
chosen to also hold on a 1000-executor cluster at ~100 TB:

- AQE on (coalesce shuffle partitions, auto broadcast conversion,
  skew-join splitting) so plans re-optimize at runtime when the static
  estimate is off — the key knob at scale.
- UTC session timezone so timestamp semantics match the DuckDB oracle
  and are cluster-location independent.
- Arrow enabled so any unavoidable Python boundary (Pandas UDFs,
  ``applyInPandas``) is batch-vectorized, never row-at-a-time pickling.
- ``spark.sql.shuffle.partitions`` defaults to local core count here;
  on a real cluster AQE's coalescing makes the static value mostly a
  ceiling, and we'd raise it to ~2-3× total cores.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# --- tracked stage caches -------------------------------------------------
#
# Operators persist multi-consumer subtrees (stage barriers). Persisted
# frames outlive the operator call: Spark has no scope-exit unpersist, so
# a long-lived session that calls many operators would accumulate cached
# frames without bound (the r4 ADVICE leak: _coarse_cells / bench had to
# clearCache() between queries to compensate). The engine-wide convention:
#
# - every operator-internal ``persist()`` goes through ``stage_cache``,
#   which tracks the frame in a session-scoped list;
# - callers (bench.py, tests, library users) call ``release_caches()``
#   once the operator's result has been FULLY materialized (collected /
#   written). Releasing earlier is unsafe for the barriers that guard
#   nondeterministic subtrees (sampling, repartitionByRange boundary
#   sampling — NOTES rule 24): an un-persisted nondeterministic frame
#   recomputed by a later action can diverge from what the first action
#   saw. After materialization, release is always safe.
#
# tests/test_oracle_parity.py asserts the convention catalog-wide: after
# each query materializes and releases, the JVM reports zero persisted
# RDDs.

_TRACKED_CACHES: list[object] = []  # DataFrames (caches) or java RDDs (checkpoints)


def stage_cache(df: DataFrame) -> DataFrame:
    """Persist a multi-consumer subtree and track it for ``release_caches``."""
    df.persist()
    _TRACKED_CACHES.append(df)
    return df


def stage_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``localCheckpoint`` with tracked release.

    Iterative operators (connected components, PageRank, BPE) checkpoint
    each round to truncate lineage (NOTES rule 12); the checkpoint blocks
    are persisted RDDs and would otherwise accumulate exactly like stage
    caches. ``DataFrame.unpersist`` cannot release them (localCheckpoint
    persists the internal RDD directly, bypassing the CacheManager), so
    we track the checkpointed RDD off the returned frame's LogicalRDD
    plan node and unpersist THAT. NOTE: unlike a released cache, a
    released checkpoint cannot recompute (lineage is gone) — release
    only after the operator's result is fully materialized, per the
    module convention."""
    out = df.localCheckpoint(eager=eager)
    _TRACKED_CACHES.append(out._jdf.queryExecution().logical().rdd())
    return out


def release_caches() -> int:
    """Unpersist every frame tracked by ``stage_cache``/``stage_checkpoint``;
    returns the count. Call after materializing operator results (see
    module comment). Blocking so callers can assert the JVM cache map is
    empty immediately after."""
    n = 0
    while _TRACKED_CACHES:
        tracked = _TRACKED_CACHES.pop()
        try:
            if isinstance(tracked, DataFrame):
                tracked.unpersist(blocking=True)
            else:  # java RDD handle from stage_checkpoint
                tracked.unpersist(True)
        except Exception:
            pass  # session already stopped — nothing to release
        n += 1
    return n


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(app_name: str = "map_reduce_spark", cpus: int | None = None) -> SparkSession:
    """Create (or fetch) the engine's SparkSession.

    Safe to call repeatedly — Spark returns the active session.
    """
    n = cpus or _cpus()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # managed-table location for bucketed tables (kept out of the
        # repo; on a cluster this is the metastore-governed warehouse)
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
