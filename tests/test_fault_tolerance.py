"""Fault-tolerance parity with the reference's raison d'être.

The reference's main body of code is failure handling: the master
heartbeats workers and re-queues jobs from dead ones
(/root/reference/lib/map_reduce/master.ex:85-108, backlog re-execution
:89-101). Spark delegates that to its DAG scheduler
(``spark.task.maxFailures`` retries + task-commit protocol). This test
DEMONSTRATES the claim instead of taking it on faith:

- every partition's first task attempt dies mid-flight (after
  producing some rows — the worst case for duplication);
- Spark retries the task, the job completes;
- the parquet sink contains exactly one copy of every row: the output
  committer publishes only the successful attempt, unlike the
  reference's append-mode text sink (worker.ex:124,147) which would
  double-write on re-execution.

Task retry requires ``local[N, maxFailures]`` at context construction,
so this runs in its own subprocess rather than the shared session.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = r"""
import glob, os, sys, tempfile

sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

work = tempfile.mkdtemp(prefix="ft_")
marker_dir = os.path.join(work, "attempts")
os.makedirs(marker_dir)
out = os.path.join(work, "out.parquet")

# local[4, 2]: 4 threads, 2 task attempts — the second arg IS
# spark.task.maxFailures in local mode
spark = (
    SparkSession.builder.master("local[4, 2]")
    .appName("fault-tolerance")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)

df = spark.range(0, 1000, 1, 4)  # 4 partitions, ids 0..999

def flaky(batches):
    import pandas as pd
    from pyspark import TaskContext

    ctx = TaskContext.get()
    marker = os.path.join(marker_dir, f"p{{ctx.partitionId()}}")
    first_attempt = not os.path.exists(marker)
    if first_attempt:
        open(marker, "w").close()
    emitted = 0
    for pdf in batches:
        yield pd.DataFrame({{"id": pdf["id"], "doubled": pdf["id"] * 2}})
        emitted += len(pdf)
        if first_attempt and emitted > 0:
            # die AFTER emitting rows: a retry that appended (like the
            # reference's text sink) would now double-write
            raise RuntimeError("injected task failure (first attempt)")

mapped = df.mapInPandas(flaky, schema="id long, doubled long")
mapped.write.mode("overwrite").parquet(out)

back = spark.read.parquet(out)
rows = back.collect()
ids = sorted(r.id for r in rows)
assert len(rows) == 1000, f"expected 1000 rows, got {{len(rows)}} (duplicates or loss)"
assert ids == list(range(1000)), "row set mismatch after retry"
assert all(r.doubled == r.id * 2 for r in rows)
# every partition really did fail once: all 4 markers exist
assert len(glob.glob(os.path.join(marker_dir, "p*"))) == 4
print("FAULT_TOLERANCE_OK")
spark.stop()
"""


def test_task_retry_with_idempotent_sink(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "FAULT_TOLERANCE_OK" in proc.stdout


_WRITER_SCRIPT = r"""
import glob, json, os, sys, tempfile, uuid

sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

work = tempfile.mkdtemp(prefix="ftw_")
marker_dir = os.path.join(work, "attempts")
sink = os.path.join(work, "sink")
os.makedirs(marker_dir)
os.makedirs(os.path.join(sink, "_staging"))

spark = (
    SparkSession.builder.master("local[4, 2]")
    .appName("writer-fault-tolerance")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

from pyspark.sql.datasource import DataSource, DataSourceWriter, WriterCommitMessage

class Msg(WriterCommitMessage):
    def __init__(self, filename, rows):
        self.filename = filename
        self.rows = rows

class FlakyWriter(DataSourceWriter):
    def __init__(self, path, markers):
        self.path = path
        self.markers = markers

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        name = f"part-{{uuid.uuid4().hex}}.jsonl"
        staged = os.path.join(self.path, "_staging", name)
        rows = 0
        with open(staged, "w") as f:
            for row in iterator:
                f.write(json.dumps({{"n": row[0]}}) + "\n")
                rows += 1
        # die AFTER staging a complete file on the first attempt: the
        # orphaned staged file is the hazard a manifest commit filters
        marker = os.path.join(self.markers, f"p{{ctx.partitionId()}}")
        if not os.path.exists(marker):
            open(marker, "w").close()
            raise RuntimeError("injected write-task failure (first attempt)")
        return Msg(name, rows)

    def commit(self, messages):
        files = [m.filename for m in messages]
        for name in files:
            os.replace(os.path.join(self.path, "_staging", name),
                       os.path.join(self.path, name))
        tmp = os.path.join(self.path, "_MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump({{"files": files, "rows": sum(m.rows for m in messages)}}, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages):
        pass

class FlakySink(DataSource):
    @classmethod
    def name(cls):
        return "flaky_sink"

    def schema(self):
        return "n bigint"

    def writer(self, schema, overwrite):
        return FlakyWriter(self.options["path"], self.options["markers"])

spark.dataSource.register(FlakySink)
(spark.range(0, 1000, 1, 4)
 .selectExpr("id AS n")
 .write.format("flaky_sink")
 .option("path", sink).option("markers", marker_dir)
 .mode("append").save())

with open(os.path.join(sink, "_MANIFEST.json")) as f:
    manifest = json.load(f)
assert manifest["rows"] == 1000, manifest
assert len(manifest["files"]) == 4, manifest

published = [os.path.join(sink, n) for n in manifest["files"]]
seen = []
for p in published:
    with open(p) as f:
        seen += [json.loads(line)["n"] for line in f]
assert sorted(seen) == list(range(1000)), "manifest rows must be exactly-once"

# every partition failed once, so 4 orphaned first-attempt files remain
# staged — present on disk, but INVISIBLE to manifest readers
assert len(glob.glob(os.path.join(marker_dir, "p*"))) == 4
orphans = glob.glob(os.path.join(sink, "_staging", "*.jsonl"))
assert len(orphans) == 4, f"expected 4 orphaned attempts, got {{len(orphans)}}"
print("WRITER_FAULT_TOLERANCE_OK")
spark.stop()
"""


def test_writer_commit_protocol_under_task_retry(tmp_path):
    """The staged-commit Python DataSource writer pattern under real
    task retries: every partition's first write attempt stages a
    COMPLETE file and then dies; Spark retries; the manifest commit
    publishes exactly the four winning attempts (1000 rows exactly
    once) while the four orphaned first-attempt files stay staged and
    invisible — the double-publish hazard of the reference's
    append-mode sink (worker.ex:124,147), closed."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _WRITER_SCRIPT.format(repo=repo)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "WRITER_FAULT_TOLERANCE_OK" in proc.stdout
