"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API).

The reference engine owns its input format end-to-end (workers read
task files themselves — worker.ex:96-114). The Spark-native analogue
of "bring your own source" is the Python DataSource API: a class that
declares a schema, splits itself into ``InputPartition``s, and yields
rows per partition — Spark schedules one task per partition, so the
source scales out exactly like a built-in file format.

The demo source here is a deterministic synthetic table (id, bucket,
md5 hex) — no I/O, so the partition-parallel plumbing is the whole
point — and the registered query proves the rows land correctly by
aggregating them against a DuckDB ``range()`` oracle.

Scale notes: ``partitions()`` returns a fixed fan-out independent of
row count (each partition generates its slice lazily), the reader is
an iterator (no row buffering), and everything downstream of the scan
is ordinary codegen'd aggregation. A production source would carve
partitions from its remote layout (file ranges, topic offsets) the
same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.registry import register

_N_ROWS = 10_000
_N_PARTS = 8
_N_BUCKETS = 16


@register(
    "python_datasource_scan",
    oracle=f"""
SELECT CAST(n % {_N_BUCKETS} AS BIGINT) AS bucket,
       COUNT(*) AS cnt,
       CAST(SUM(n) AS BIGINT) AS sum_n,
       MIN(md5(CAST(n AS VARCHAR))) AS min_h
FROM (SELECT unnest(range(0, {_N_ROWS})) AS n)
GROUP BY 1
""",
)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read a custom Python DataSource and aggregate per bucket.

    The source classes are defined locally so cloudpickle ships them by
    value — executors never need this module on their import path (the
    same self-containment rule every worker-side closure here follows).
    """
    import hashlib

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    n_rows, n_parts, n_buckets = _N_ROWS, _N_PARTS, _N_BUCKETS

    class _RangePartition(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class _SynthReader(DataSourceReader):
        def partitions(self):
            step = (n_rows + n_parts - 1) // n_parts
            return [
                _RangePartition(i * step, min((i + 1) * step, n_rows))
                for i in range(n_parts)
            ]

        def read(self, partition):
            for n in range(partition.start, partition.end):
                h = hashlib.md5(str(n).encode()).hexdigest()
                yield (n, n % n_buckets, h)

    class SynthDataSource(DataSource):
        @classmethod
        def name(cls):
            return "synth_range"

        def schema(self):
            return "n bigint, bucket int, h string"

        def reader(self, schema):
            return _SynthReader()

    spark.dataSource.register(SynthDataSource)
    df = spark.read.format("synth_range").load()
    return df.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count("*").alias("cnt"),
        F.sum("n").alias("sum_n"),
        F.min("h").alias("min_h"),
    )


@register(
    "python_datasource_stream",
    oracle=f"""
SELECT CAST(n % {_N_BUCKETS} AS BIGINT) AS bucket,
       COUNT(*) AS cnt,
       CAST(SUM(n) AS BIGINT) AS sum_n,
       MIN(md5(CAST(n AS VARCHAR))) AS min_h
FROM (SELECT unnest(range(0, {_N_ROWS})) AS n)
GROUP BY 1
""",
)
def python_datasource_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom STREAMING Python DataSource (Spark 4
    ``SimpleDataSourceStreamReader``): the same deterministic synthetic
    table as ``python_datasource_scan``, delivered as an unbounded
    micro-batch stream with offset tracking — the pure-Python analogue
    of writing a Kafka-style connector.

    The reader walks an integer offset in fixed batches; Spark persists
    each (start, end] offset range to the checkpoint/commit log and
    replays ranges via ``readBetweenOffsets`` on recovery, which is the
    exactly-once contract every real streaming connector implements.
    Once every row is delivered the source returns empty batches; the
    driver stops the query and aggregates the landed micro-batches —
    the result must equal the batch scan (and the same DuckDB
    ``range()`` oracle), proving no batch was lost or doubled across
    the streaming hop.

    Scale notes: offsets are O(1) metadata regardless of throughput;
    each micro-batch is generated lazily executor-side; downstream of
    the source everything is ordinary codegen'd aggregation. A real
    deployment swaps the integer offset for topic/partition offsets
    and keeps the identical read/commit skeleton.
    """
    import hashlib
    import time
    import uuid

    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    n_rows, n_buckets, step = _N_ROWS, _N_BUCKETS, 2_000

    def _rows(lo: int, hi: int):
        # iter(list), not a generator: the simple-reader contract wants
        # an ITERATOR, and the prefetched rows are PICKLED to the
        # executors — a list_iterator satisfies both, a generator
        # neither
        return iter(
            [
                (n, n % n_buckets, hashlib.md5(str(n).encode()).hexdigest())
                for n in range(lo, hi)
            ]
        )

    class _SynthStreamReader(SimpleDataSourceStreamReader):
        def initialOffset(self):
            return {"pos": 0}

        def read(self, start):
            pos = start["pos"]
            end = min(pos + step, n_rows)
            return _rows(pos, end), {"pos": end}

        def readBetweenOffsets(self, start, end):
            return _rows(start["pos"], end["pos"])

    class SynthStreamSource(DataSource):
        @classmethod
        def name(cls):
            return "synth_stream"

        def schema(self):
            return "n bigint, bucket int, h string"

        def simpleStreamReader(self, schema):
            return _SynthStreamReader()

    spark.dataSource.register(SynthStreamSource)
    tbl = f"synth_stream_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("synth_stream")
        .load()
        .writeStream.format("memory")
        .queryName(tbl)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while spark.table(tbl).count() < n_rows:
            if q.exception() is not None:
                raise q.exception()
            if time.time() > deadline:
                raise RuntimeError(f"streaming source stalled: {tbl}")
            time.sleep(0.2)
    finally:
        q.stop()
    q.awaitTermination(30)
    return (
        spark.table(tbl)
        .groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum("n").alias("sum_n"),
            F.min("h").alias("min_h"),
        )
    )


@register(
    "python_datasource_write",
    oracle=f"""
SELECT CAST(n % {_N_BUCKETS} AS BIGINT) AS bucket,
       COUNT(*) AS cnt,
       CAST(SUM(n) AS BIGINT) AS sum_n
FROM (SELECT unnest(range(0, {_N_ROWS})) AS n)
GROUP BY 1
""",
)
def python_datasource_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource WRITER (Spark 4 ``DataSourceWriter``):
    a staged-commit sink in pure Python, closing the connector-SDK
    loop (batch read `python_datasource_scan`, streaming read
    `python_datasource_stream`, write here).

    The reference engine's sink is an APPEND-mode file (worker.ex:124,
    147): a re-executed task double-appends, so recovery is not
    idempotent (SURVEY §2 "semantic hazards"). This writer demonstrates
    the task-commit protocol that fixes it: each write task lands its
    partition in a uniquely-named STAGING file and returns a commit
    message; only the driver-side ``commit()`` publishes the staged
    files into a manifest, and ``abort()`` discards them — a retried or
    speculative task can never double-publish because publication is a
    single driver-side commit of the winning attempts' messages. The
    read-back goes through the manifest, so the query verifies
    exactly-once landing against the same DuckDB ``range()`` oracle.

    Scale notes: this is precisely how FileOutputCommitter/Iceberg
    commits work — O(tasks) staging renames, one atomic manifest
    publish; per-task state is its own output file, commit messages
    are O(1) metadata.
    """
    import json
    import os
    import shutil
    import tempfile
    import uuid

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceWriter,
        WriterCommitMessage,
    )

    import time

    # fresh per-invocation dir under a common root: concurrent sessions
    # never share staging. Cleanup is scoped to STALE runs only (>1h
    # old by mtime) — wiping the whole root would delete a concurrent
    # invocation's in-flight staging/manifest.
    root = os.path.join(tempfile.gettempdir(), "synth_sink_demo")
    os.makedirs(root, exist_ok=True)
    now = time.time()
    for stale in os.listdir(root):
        p = os.path.join(root, stale)
        try:
            if now - os.path.getmtime(p) > 3600:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass
    out_dir = os.path.join(root, uuid.uuid4().hex[:8])
    os.makedirs(os.path.join(out_dir, "_staging"), exist_ok=True)
    # No module-global handoff of out_dir (r4 ADVICE: concurrent
    # invocations in one process would race on it) — the returned
    # frame's inputFiles() names the committed files, so callers
    # recover THIS invocation's sink dir from the result itself.

    class _Msg(WriterCommitMessage):
        def __init__(self, filename: str, rows: int):
            self.filename = filename
            self.rows = rows

    class _SinkWriter(DataSourceWriter):
        def __init__(self, path: str):
            self.path = path

        def write(self, iterator):
            # one uniquely-named staging file per task ATTEMPT: retries
            # stage separate files; only committed messages publish
            name = f"part-{uuid.uuid4().hex}.jsonl"
            staged = os.path.join(self.path, "_staging", name)
            rows = 0
            with open(staged, "w") as f:
                for row in iterator:
                    f.write(json.dumps({"n": row[0], "bucket": row[1]}) + "\n")
                    rows += 1
            return _Msg(name, rows)

        def commit(self, messages):
            files = [m.filename for m in messages]
            for name in files:
                os.replace(
                    os.path.join(self.path, "_staging", name),
                    os.path.join(self.path, name),
                )
            manifest = {"files": files, "rows": sum(m.rows for m in messages)}
            # atomic publish: a crash mid-dump must never leave a
            # truncated manifest visible (the exact partial-publish
            # window this operator exists to demonstrate closing)
            tmp = os.path.join(self.path, "_MANIFEST.json.tmp")
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

        def abort(self, messages):
            shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)

    class SynthSink(DataSource):
        @classmethod
        def name(cls):
            return "synth_sink"

        def schema(self):
            return "n bigint, bucket int"

        def writer(self, schema, overwrite):
            return _SinkWriter(self.options["path"])

    spark.dataSource.register(SynthSink)
    src = spark.range(0, _N_ROWS, numPartitions=8).select(
        F.col("id").alias("n"), (F.col("id") % _N_BUCKETS).cast("int").alias("bucket")
    )
    src.write.format("synth_sink").option("path", out_dir).mode("append").save()

    with open(os.path.join(out_dir, "_MANIFEST.json")) as f:
        manifest = json.load(f)
    committed = [os.path.join(out_dir, name) for name in manifest["files"]]
    back = spark.read.schema("n bigint, bucket int").json(committed)
    return back.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count("*").alias("cnt"), F.sum("n").alias("sum_n")
    )
