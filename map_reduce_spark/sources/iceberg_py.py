"""Pure-Python Apache Iceberg v1/v2 table READER — closing the last
table-format gap jar-lessly (``io.read_iceberg`` falls back here; with
the iceberg-spark runtime jar present the native path wins).

Format: the public Iceberg table spec (iceberg.apache.org/spec). A
table is ``data/`` parquet files plus ``metadata/``:
``v{N}.metadata.json`` (schemas, snapshots, current-snapshot-id, with
``version-hint.text`` naming the live version), per-snapshot
*manifest lists* and *manifests* — both Avro object-container files.
Reading at snapshot S: parse the metadata JSON, read S's manifest
list (one row per manifest: path + content kind), read each DATA
manifest and keep entries whose ``status`` is not DELETED (2) — the
surviving ``data_file.file_path`` set feeds a plain native parquet
scan, exactly like the Delta reader's active-file list (pushdown,
column pruning, codegen intact; Iceberg data files carry partition
columns in-file, so no hive-path recovery is needed).

Deliberate gates (raise loudly, never mis-read): DELETE manifests
(``content=1`` — v2 row-level position/equality deletes, the analogue
of Delta's deletion vectors) and non-parquet data files.

The manifest plane is DRIVER-side metadata — manifests are KBs — so
the Avro decode here needs no Spark plumbing at all. It uses a
self-contained GENERIC Avro codec (records -> dicts, recursive
records/arrays/maps/unions/fixed, null+deflate codecs): real-world
manifests carry nested structs and maps the engine's columnar
``sources/avro_py`` subset deliberately excludes, and keeping this
decoder local leaves that certified scan path untouched.

Scale shape: metadata cost is O(manifests touched) — the spec's own
design goal (manifest lists exist so planning can skip whole
manifests); the data plane is the same native FileScan every other
source here bottoms out in. The writer half below exists for the
FIXTURE (building a spec-layout table so the read path has something
real to parse) and for tests; production writes belong to engines
with the full commit protocol.

Reference parity: SURVEY.md §2.2 scans/sources — the reference engine
(ghostdsb/map_reduce, worker.ex:96-114) reads only local text files;
table formats are this engine's widened surface, same rubric row as
Delta (sources/delta_py.py).
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import struct
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from map_reduce_spark.registry import register

_MAGIC = b"Obj\x01"


# --------------------------------------------------------------------
# generic Avro codec (driver-side; records as dicts)
# --------------------------------------------------------------------


def make_generic_avro():
    """Self-contained generic Avro object-container codec: full
    recursive type tree (record/array/map/union/fixed/primitives),
    named-type references, null+deflate codecs. Rows decode to dicts
    keyed by field name — the natural shape for metadata records."""

    def enc_long(n, out):
        n = (n << 1) ^ (n >> 63)
        while True:
            b = n & 0x7F
            n >>= 7
            if n:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    def dec_long(buf, pos):
        shift = acc = 0
        while True:
            b = buf[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1), pos

    def resolve(t, names):
        """Normalize a schema node; register/lookup named types."""
        if isinstance(t, str):
            return names.get(t, t)
        if isinstance(t, list):
            return ["union", [resolve(b, names) for b in t]]
        kind = t.get("type")
        if kind == "record":
            node = ["record", []]
            if t.get("name"):
                names[t["name"]] = node
            node[1] = [(f["name"], resolve(f["type"], names)) for f in t["fields"]]
            return node
        if kind == "array":
            return ["array", resolve(t["items"], names)]
        if kind == "map":
            return ["map", resolve(t["values"], names)]
        if kind == "fixed":
            node = ["fixed", t["size"]]
            if t.get("name"):
                names[t["name"]] = node
            return node
        if isinstance(kind, (str, list, dict)):  # logical type wrapper
            return resolve(kind, names)
        raise NotImplementedError(f"iceberg_py avro: unsupported schema {t!r}")

    def dec_datum(nt, buf, pos):
        if isinstance(nt, str):
            if nt == "null":
                return None, pos
            if nt == "boolean":
                return buf[pos] == 1, pos + 1
            if nt in ("long", "int"):
                return dec_long(buf, pos)
            if nt == "float":
                return struct.unpack("<f", buf[pos:pos + 4])[0], pos + 4
            if nt == "double":
                return struct.unpack("<d", buf[pos:pos + 8])[0], pos + 8
            if nt in ("bytes", "string"):
                n, pos = dec_long(buf, pos)
                raw = bytes(buf[pos:pos + n])
                return (raw.decode() if nt == "string" else raw), pos + n
            raise NotImplementedError(f"iceberg_py avro: primitive {nt!r}")
        kind = nt[0]
        if kind == "record":
            row = {}
            for name, ft in nt[1]:
                row[name], pos = dec_datum(ft, buf, pos)
            return row, pos
        if kind == "union":
            ix, pos = dec_long(buf, pos)
            return dec_datum(nt[1][ix], buf, pos)
        if kind == "fixed":
            return bytes(buf[pos:pos + nt[1]]), pos + nt[1]
        out = [] if kind == "array" else {}
        while True:  # blocked collections; negative count carries a size
            n, pos = dec_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                _, pos = dec_long(buf, pos)
                n = -n
            for _ in range(n):
                if kind == "array":
                    v, pos = dec_datum(nt[1], buf, pos)
                    out.append(v)
                else:
                    k, pos = dec_datum("string", buf, pos)
                    v, pos = dec_datum(nt[1], buf, pos)
                    out[k] = v

    def enc_datum(nt, v, out):
        if isinstance(nt, str):
            if nt == "null":
                return
            if nt == "boolean":
                out.append(1 if v else 0)
            elif nt in ("long", "int"):
                enc_long(int(v), out)
            elif nt == "float":
                out += struct.pack("<f", v)
            elif nt == "double":
                out += struct.pack("<d", v)
            elif nt in ("bytes", "string"):
                raw = v.encode() if nt == "string" else bytes(v)
                enc_long(len(raw), out)
                out += raw
            else:
                raise NotImplementedError(f"iceberg_py avro: primitive {nt!r}")
            return
        kind = nt[0]
        if kind == "record":
            for name, ft in nt[1]:
                enc_datum(ft, v.get(name) if isinstance(v, dict) else None, out)
        elif kind == "union":
            branches = nt[1]
            ix = 0 if v is None and "null" in branches else (
                branches.index("null") ^ 1 if "null" in branches else 0
            )
            if v is None:
                ix = branches.index("null")
            enc_long(ix, out)
            enc_datum(branches[ix], v, out)
        elif kind == "fixed":
            out += bytes(v)
        elif kind == "array":
            if v:
                enc_long(len(v), out)
                for item in v:
                    enc_datum(nt[1], item, out)
            enc_long(0, out)
        elif kind == "map":
            if v:
                enc_long(len(v), out)
                for k, item in v.items():
                    enc_datum("string", k, out)
                    enc_datum(nt[1], item, out)
            enc_long(0, out)

    def read_file(path):
        """-> (schema_json, [row dicts])."""
        with open(path, "rb") as fh:
            raw = fh.read()
        if raw[:4] != _MAGIC:
            raise ValueError(f"{path!r}: not an Avro object container")
        pos, meta = 4, {}
        while True:
            n, pos = dec_long(raw, pos)
            if n == 0:
                break
            if n < 0:
                _, pos = dec_long(raw, pos)
                n = -n
            for _ in range(n):
                k, pos = dec_datum("string", raw, pos)
                v, pos = dec_datum("bytes", raw, pos)
                meta[k] = v
        sync = raw[pos:pos + 16]
        pos += 16
        schema = json.loads(meta["avro.schema"])
        codec = meta.get("avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise NotImplementedError(f"iceberg_py avro: codec {codec!r}")
        nt = resolve(schema, {})
        rows = []
        end = len(raw)
        while pos < end:
            n_rows, pos = dec_long(raw, pos)
            n_bytes, pos = dec_long(raw, pos)
            payload = raw[pos:pos + n_bytes]
            pos += n_bytes
            if raw[pos:pos + 16] != sync:
                raise ValueError(f"{path!r}: sync marker mismatch")
            pos += 16
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            p = 0
            for _ in range(n_rows):
                row, p = dec_datum(nt, payload, p)
                rows.append(row)
        return schema, rows

    def write_file(path, schema, rows, codec="deflate"):
        nt = resolve(schema, {})
        out = bytearray(_MAGIC)
        meta = {
            "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
            "avro.codec": codec.encode(),
        }
        enc_long(len(meta), out)
        for k, v in meta.items():
            enc_datum("string", k, out)
            enc_datum("bytes", v, out)
        enc_long(0, out)
        sync = hashlib.md5(path.encode()).digest()  # deterministic sync
        out += sync
        payload = bytearray()
        for row in rows:
            enc_datum(nt, row, payload)
        body = bytes(payload)
        if codec == "deflate":
            c = zlib.compressobj(wbits=-15)
            body = c.compress(body) + c.flush()
        enc_long(len(rows), out)
        enc_long(len(body), out)
        out += body + sync
        tmp = f"{path}.tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(out)
        os.replace(tmp, path)

    from types import SimpleNamespace

    return SimpleNamespace(read_file=read_file, write_file=write_file)


# --------------------------------------------------------------------
# Iceberg metadata plane
# --------------------------------------------------------------------

_ICE_TO_SPARK = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "binary",
    "date": "date",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
}


def _iceberg_schema_to_ddl(schema: dict) -> str:
    cols = []
    for f in schema["fields"]:
        t = f["type"]
        if isinstance(t, str):
            if t.startswith("decimal"):
                spark_t = t  # decimal(p, s) spells identically
            elif t in _ICE_TO_SPARK:
                spark_t = _ICE_TO_SPARK[t]
            else:
                raise NotImplementedError(f"iceberg_py: field type {t!r}")
        else:
            raise NotImplementedError(
                f"iceberg_py: nested field type {t!r} (flat columns only)"
            )
        cols.append(f"`{f['name']}` {spark_t}")
    return ", ".join(cols)


def load_table_metadata(table: str) -> dict:
    """Parse the live ``v{N}.metadata.json`` (via version-hint.text,
    falling back to the highest N on disk)."""
    mdir = os.path.join(table, "metadata")
    if not os.path.isdir(mdir):
        raise FileNotFoundError(f"no Iceberg metadata at {table!r}")
    hint = os.path.join(mdir, "version-hint.text")
    version = None
    if os.path.isfile(hint):
        with open(hint) as fh:
            version = int(fh.read().strip())
    else:
        vs = [
            int(f[1:].split(".")[0])
            for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".metadata.json")
        ]
        if vs:
            version = max(vs)
    if version is None:
        raise FileNotFoundError(f"no metadata.json versions at {table!r}")
    with open(os.path.join(mdir, f"v{version}.metadata.json")) as fh:
        return json.load(fh)


def _pick_snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots") or []
    if not snaps:
        raise ValueError("Iceberg table has no snapshots")
    if snapshot_id is None:
        cur = meta.get("current-snapshot-id")
        for s in snaps:
            if s["snapshot-id"] == cur:
                return s
        raise ValueError(f"current-snapshot-id {cur} not in snapshot list")
    for s in snaps:
        if s["snapshot-id"] == snapshot_id:
            return s
    raise ValueError(f"snapshot {snapshot_id} not found")


def _schema_for_snapshot(meta: dict, snap: dict) -> dict:
    sid = snap.get("schema-id")
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == sid:
            return s
    if "schema" in meta:  # v1 single-schema layout
        return meta["schema"]
    schemas = meta.get("schemas") or []
    if schemas:
        return schemas[-1]
    raise ValueError("no schema in table metadata")


def data_files_for_snapshot(table: str, meta: dict, snap: dict) -> list[str]:
    """Manifest-list -> manifests -> live data files (absolute paths).
    Gates loudly on v2 DELETE manifests and non-parquet files."""
    av = make_generic_avro()

    def _local(p: str) -> str:
        # the spec stores absolute URIs; accept file: or plain paths and
        # re-anchor anything under the recorded table location so
        # fixtures survive being moved/cloned
        if p.startswith("file:"):
            p = p[len("file:"):]
        loc = meta.get("location", "")
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        if loc and p.startswith(loc):
            return os.path.join(table, p[len(loc):].lstrip("/"))
        return p

    _, manifests = av.read_file(_local(snap["manifest-list"]))
    files: list[str] = []
    for m in manifests:
        if m.get("content", 0) == 1:
            raise NotImplementedError(
                "iceberg_py: DELETE manifests (v2 row-level deletes) are "
                "not supported by this reader — compact the table or use "
                "an engine with merge-on-read"
            )
        _, entries = av.read_file(_local(m["manifest_path"]))
        for e in entries:
            if e.get("status") == 2:  # DELETED
                continue
            df = e["data_file"]
            fmt = (df.get("file_format") or "PARQUET").upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"iceberg_py: data file format {fmt!r} not supported"
                )
            files.append(_local(df["file_path"]))
    return files


def read_iceberg_py(
    spark: SparkSession, table: str, snapshot_id: int | None = None
) -> DataFrame:
    """Read an Iceberg table at the current (or a pinned) snapshot:
    metadata plane on the driver, then a plain NATIVE parquet scan
    over the live data-file set (module docstring)."""
    meta = load_table_metadata(table)
    if meta.get("format-version", 1) > 2:
        raise NotImplementedError(
            f"iceberg_py: format-version {meta['format-version']} > 2"
        )
    snap = _pick_snapshot(meta, snapshot_id)
    schema = StructType.fromDDL(_iceberg_schema_to_ddl(_schema_for_snapshot(meta, snap)))
    files = data_files_for_snapshot(table, meta, snap)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


# --------------------------------------------------------------------
# fixture writer (spec-layout table so the read path parses the real thing)
# --------------------------------------------------------------------

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string", "field-id": 100},
                    {"name": "file_format", "type": "string", "field-id": 101},
                    {"name": "record_count", "type": "long", "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
                ],
            },
        },
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
    ],
}


def _spark_to_iceberg_type(t: str) -> str:
    inv = {v: k for k, v in _ICE_TO_SPARK.items()}
    if t in inv:
        return inv[t]
    if t.startswith("decimal"):
        return t
    raise NotImplementedError(f"iceberg_py writer: Spark type {t!r}")


def append_iceberg_snapshot(spark_df: DataFrame, table: str) -> int:
    """Fixture/test writer: stage ``spark_df`` as parquet data files,
    wrap them in a spec-layout manifest + manifest list, and publish
    the next ``v{N}.metadata.json`` + version-hint. Single-writer only
    (fixtures build under an atomic-rename publish; this is NOT the
    optimistic commit protocol — delta_py owns that story)."""
    av = make_generic_avro()
    os.makedirs(os.path.join(table, "metadata"), exist_ok=True)
    data_dir = os.path.join(table, "data")
    staging = os.path.join(table, ".staging")
    shutil.rmtree(staging, ignore_errors=True)
    spark_df.write.mode("overwrite").parquet(staging)
    try:
        meta = load_table_metadata(table)
        version = max(
            int(f[1:].split(".")[0])
            for f in os.listdir(os.path.join(table, "metadata"))
            if f.startswith("v") and f.endswith(".metadata.json")
        )
    except FileNotFoundError:
        meta, version = None, 0
    snap_id = version + 1
    os.makedirs(data_dir, exist_ok=True)
    entries = []
    for name in sorted(os.listdir(staging)):
        if not name.endswith(".parquet"):
            continue
        dest = os.path.join(data_dir, f"s{snap_id}-{name}")
        os.rename(os.path.join(staging, name), dest)
        import pyarrow.parquet as pq

        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snap_id,
                "data_file": {
                    "content": 0,
                    "file_path": dest,
                    "file_format": "PARQUET",
                    "record_count": pq.ParquetFile(dest).metadata.num_rows,
                    "file_size_in_bytes": os.path.getsize(dest),
                },
            }
        )
    shutil.rmtree(staging, ignore_errors=True)
    mdir = os.path.join(table, "metadata")
    manifest = os.path.join(mdir, f"manifest-{snap_id}.avro")
    av.write_file(manifest, _MANIFEST_ENTRY_SCHEMA, entries)
    prev_manifests = []
    if meta is not None:
        cur = _pick_snapshot(meta, None)
        _, prev_manifests = av.read_file(cur["manifest-list"])
    mlist = os.path.join(mdir, f"snap-{snap_id}.avro")
    av.write_file(
        mlist,
        _MANIFEST_LIST_SCHEMA,
        prev_manifests
        + [
            {
                "manifest_path": manifest,
                "manifest_length": os.path.getsize(manifest),
                "partition_spec_id": 0,
                "content": 0,
                "added_snapshot_id": snap_id,
            }
        ],
    )
    fields = [
        {"id": i + 1, "name": n, "required": False, "type": _spark_to_iceberg_type(t)}
        for i, (n, t) in enumerate(spark_df.dtypes)
    ]
    snapshots = (meta.get("snapshots") if meta else None) or []
    new_meta = {
        "format-version": 2,
        "table-uuid": hashlib.md5(os.path.abspath(table).encode()).hexdigest(),
        "location": table,
        "last-sequence-number": snap_id,
        "last-updated-ms": 0,
        "last-column-id": len(fields),
        "current-schema-id": 0,
        "schemas": [{"type": "struct", "schema-id": 0, "fields": fields}],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "current-snapshot-id": snap_id,
        "snapshots": snapshots
        + [
            {
                "snapshot-id": snap_id,
                "sequence-number": snap_id,
                "timestamp-ms": 0,
                "manifest-list": mlist,
                "schema-id": 0,
                "summary": {"operation": "append"},
            }
        ],
    }
    mpath = os.path.join(mdir, f"v{snap_id}.metadata.json")
    tmp = mpath + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(new_meta, fh, indent=1)
    os.replace(tmp, mpath)
    hint = os.path.join(mdir, "version-hint.text")
    tmp = hint + f".tmp{os.getpid()}"
    with open(tmp, "w") as fh:
        fh.write(str(snap_id))
    os.replace(tmp, hint)
    return snap_id


# --------------------------------------------------------------------
# registered queries
# --------------------------------------------------------------------

_L_B8_SQL = (
    "CAST(CAST(concat('0x', substr(md5(CAST(l_orderkey * 10 + l_linenumber "
    "AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INT)"
)


def _lineitem_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    from map_reduce_spark.io import load_table

    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("price_cents"),
        F.round(F.col("l_quantity") * 100, 0).cast("long").alias("qty_cents"),
    )


def _li_bucket(n: int):
    key = (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")
    return (F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % n).cast("int")


def ensure_iceberg_fixture(spark: SparkSession, sf_dir: str) -> str:
    """A lineitem-derived Iceberg v2 table with TWO snapshots —
    snapshot 1 = md5-bucket8 < 5, snapshot 2 appends buckets 5-7 —
    under the system tmp dir, once per sf_dir, atomic-rename
    published. The read path then exercises the full metadata chain:
    version hint -> metadata.json -> manifest list (Avro) -> manifests
    (Avro) -> live parquet set."""
    import tempfile

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    dest = os.path.join(tempfile.gettempdir(), f"mr_spark_iceberg_{key}")
    if os.path.isdir(dest):
        return dest
    tmp = f"{dest}.tmp{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    d = _lineitem_frame(spark, sf_dir)
    b8 = _li_bucket(8)
    append_iceberg_snapshot(d.filter(b8 < 5).repartition(4), tmp)
    append_iceberg_snapshot(d.filter(b8 >= 5).repartition(2), tmp)
    try:
        os.rename(tmp, dest)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # lost the race: theirs won
    return dest


@register(
    "iceberg_scan",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_price_cents,
       CAST(SUM(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
         AS sum_qty_cents
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
)
def iceberg_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the CURRENT snapshot of an Iceberg-resident lineitem table
    through ``io.read_iceberg`` (jar-less fallback path) and aggregate
    per return flag/status. The current snapshot is the union of both
    appends = all of lineitem, so the oracle is the plain batch SQL —
    a dropped manifest, a resurrected deleted entry, or a wrong
    snapshot pick all hash-mismatch."""
    from map_reduce_spark.io import read_iceberg

    df = read_iceberg(spark, ensure_iceberg_fixture(spark, sf_dir))
    return df.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.sum("price_cents").alias("sum_price_cents"),
        F.sum("qty_cents").alias("sum_qty_cents"),
    )


@register(
    "iceberg_snapshot_travel",
    oracle=f"""
WITH d AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
         {_L_B8_SQL} AS b8
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS cnt,
       CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents
FROM d
WHERE b8 < 5
GROUP BY l_returnflag
""",
)
def iceberg_snapshot_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-pinned read (Iceberg's time travel): snapshot 1 holds
    only the first append (md5-bucket8 < 5); rows the second snapshot
    added must NOT appear. The oracle is the first append's predicate
    itself."""
    df = read_iceberg_py(
        spark, ensure_iceberg_fixture(spark, sf_dir), snapshot_id=1
    )
    return df.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum("price_cents").alias("sum_price_cents"),
    )


def read_iceberg_changes(
    spark: SparkSession,
    table: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
) -> DataFrame:
    """Incremental snapshot-diff read (Iceberg's incremental-append
    scan): the rows added by snapshots in (from_snapshot, to_snapshot].
    Manifest entries carry the snapshot id that ADDED them, so the
    selection is pure metadata — entries with ``status == ADDED`` and
    an id inside the range — and the scan reads O(changed files),
    never the table. Exact for append-only history; a range containing
    a DELETE manifest gates loudly (the same exactness-over-guessing
    rule as ``delta_py.read_delta_changes``)."""
    av = make_generic_avro()
    meta = load_table_metadata(table)
    snap = _pick_snapshot(meta, to_snapshot)
    hi = snap["snapshot-id"]

    def _local(p):
        if p.startswith("file:"):
            p = p[len("file:"):]
        loc = meta.get("location", "")
        if loc.startswith("file:"):
            loc = loc[len("file:"):]
        if loc and p.startswith(loc):
            return os.path.join(table, p[len(loc):].lstrip("/"))
        return p

    _, manifests = av.read_file(_local(snap["manifest-list"]))
    files = []
    for m in manifests:
        if m.get("content", 0) == 1:
            raise NotImplementedError(
                "iceberg_py: DELETE manifests in an incremental range — "
                "row-level diffs need a CDF-capable engine"
            )
        if m.get("added_snapshot_id", 0) <= from_snapshot:
            continue  # manifest predates the range: skip WITHOUT reading it
        _, entries = av.read_file(_local(m["manifest_path"]))
        for e in entries:
            # spec: a null entry snapshot_id inherits the manifest's
            # added_snapshot_id, and manifest merges re-record in-range
            # adds as status EXISTING (0) — both still belong to the
            # diff; only DELETED (2) entries are out
            sid = e.get("snapshot_id")
            if sid is None:
                sid = m.get("added_snapshot_id", 0)
            if e.get("status") in (0, 1) and from_snapshot < sid <= hi:
                files.append(_local(e["data_file"]["file_path"]))
    schema = StructType.fromDDL(_iceberg_schema_to_ddl(_schema_for_snapshot(meta, snap)))
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


@register(
    "iceberg_changes_scan",
    oracle=f"""
WITH d AS (
  SELECT l_returnflag,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
         {_L_B8_SQL} AS b8
  FROM lineitem
)
SELECT l_returnflag,
       COUNT(*) AS cnt,
       CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents
FROM d
WHERE b8 >= 5
GROUP BY l_returnflag
""",
)
def iceberg_changes_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental consumption on the Iceberg fixture: the snapshot
    diff since snapshot 1 must return exactly the second append
    (md5-bucket8 >= 5) — rows the first snapshot loaded must NOT
    reappear. Together with ``delta_changes_scan`` this closes the
    incremental-consumer contract across BOTH table formats: a daily
    fold reads each drop once, at O(drop) cost, whichever format the
    corpus lives in."""
    df = read_iceberg_changes(
        spark, ensure_iceberg_fixture(spark, sf_dir), from_snapshot=1
    )
    return df.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum("price_cents").alias("sum_price_cents"),
    )
