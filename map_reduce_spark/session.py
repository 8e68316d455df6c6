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

import logging
import os
import threading

from pyspark.sql import DataFrame, SparkSession

_log = logging.getLogger(__name__)

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
#
# The tracked list is THREAD-LOCAL (r5 ADVICE): two concurrent operator
# invocations sharing one SparkSession each track into their own list,
# so one caller's release_caches() can never unpersist another caller's
# still-live stage barrier (which, for barriers guarding
# nondeterministic subtrees — NOTES rule 24 — could make a post-release
# recompute silently diverge). The invariant this relies on: an
# operator's stage_cache/stage_checkpoint calls and the caller's
# release_caches() happen on the same thread, which holds for every
# caller in the repo (bench, tests, parity scripts) and is the natural
# library contract (materialize, then release, in the calling thread).


class _CacheTracker(threading.local):
    def __init__(self) -> None:
        # (handle, SparkContext): the context rides along so release can
        # distinguish "session stopped" (nothing to do) from a genuine
        # unpersist failure (logged, counted).
        self.items: list[tuple[object, object]] = []


_TRACKED = _CacheTracker()

# Every tracked item ALSO enters this lock-guarded global registry so
# ``release_all_caches`` can free barriers tracked on threads that no
# longer exist (r6 ADVICE: a pool-thread caller whose worker exits, or
# a library user releasing from a different thread, would otherwise
# leak the persisted RDDs for the session's lifetime — the per-thread
# lists are unreachable from outside their thread).
_ALL_LOCK = threading.Lock()
_ALL_TRACKED: dict[int, tuple[object, object]] = {}


def _track(handle: object, sc: object) -> None:
    item = (handle, sc)
    _TRACKED.items.append(item)
    with _ALL_LOCK:
        _ALL_TRACKED[id(item)] = item


def stage_cache(df: DataFrame) -> DataFrame:
    """Persist a multi-consumer subtree and track it for ``release_caches``.

    SAME-THREAD CONTRACT: the tracked list is thread-local, so the
    ``release_caches()`` that frees this barrier must run on the SAME
    thread that called ``stage_cache`` (materialize, then release, in
    the calling thread — the natural library flow). A caller that
    builds frames on a worker/pool thread but releases elsewhere must
    use ``release_all_caches()`` instead, or the barrier leaks for the
    session's lifetime."""
    df.persist()
    _track(df, df.sparkSession.sparkContext)
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
    _track(out._jdf.queryExecution().logical().rdd(), out.sparkSession.sparkContext)
    return out


def release_caches() -> int:
    """Unpersist every frame tracked by ``stage_cache``/``stage_checkpoint``
    ON THIS THREAD; returns the count. Call after materializing operator
    results (see module comment). Blocking so callers can assert the JVM
    cache map is empty immediately after.

    A stopped session is skipped silently (its JVM cache died with it);
    any OTHER unpersist failure is logged and counted rather than
    swallowed (r5 ADVICE), so a py4j/plan-shape regression surfaces in
    logs instead of masquerading as a clean release."""
    items = _TRACKED.items
    popped = []
    while items:
        popped.append(items.pop())
    with _ALL_LOCK:
        for item in popped:
            _ALL_TRACKED.pop(id(item), None)
    return _release(popped, "release_caches")


def release_all_caches() -> int:
    """Cross-thread escape hatch: unpersist EVERY tracked barrier in the
    session, regardless of which thread tracked it; returns the count.

    For callers that cannot honor ``stage_cache``'s same-thread
    contract (frames built on a pool thread, released from the main
    thread, or a worker thread that has exited). Entries stay in their
    origin thread's local list, but a later same-thread
    ``release_caches()`` just re-unpersists — a harmless no-op on an
    already-released frame. Unsafe while ANY thread's operator results
    are not yet fully materialized (same rule as ``release_caches``,
    applied globally)."""
    with _ALL_LOCK:
        popped = list(_ALL_TRACKED.values())
        _ALL_TRACKED.clear()
    return _release(popped, "release_all_caches")


def _release(popped: list[tuple[object, object]], who: str) -> int:
    n = 0
    failures = 0
    for handle, sc in popped:
        if getattr(sc, "_jsc", None) is None:
            n += 1  # session stopped — nothing left to release
            continue
        try:
            if isinstance(handle, DataFrame):
                handle.unpersist(blocking=True)
            else:  # java RDD handle from stage_checkpoint
                handle.unpersist(True)
        except Exception as exc:
            failures += 1
            _log.warning(
                "%s: unpersist failed for %s: %s", who, type(handle).__name__, exc
            )
        n += 1
    if failures:
        _log.warning("%s: %d of %d tracked releases failed", who, failures, n)
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
