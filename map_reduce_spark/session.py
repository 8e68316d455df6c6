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

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


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
