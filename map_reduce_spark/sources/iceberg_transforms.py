"""Iceberg partition transforms, single-value serialization, and the
inclusive-projection pruning evaluator.

Everything here implements the PUBLIC Apache Iceberg table spec
(https://iceberg.apache.org/spec/ — "Partition Transforms", "Appendix
B: 32-bit Hash Requirements", "Appendix D: Single-value
serialization"):

- ``bucket[N]``: ``(murmur3_x86_32(serialize(v)) & Int.MAX) % N``,
  with int/date promoted to long, long/timestamp hashed as 8-byte
  little-endian, strings as UTF-8 bytes. The murmur3 implementation
  is locked to the spec's published test vectors
  (34 → 2017239379, 'iceberg' → 1210000089, …) in tests.
- ``truncate[W]``: floor-to-width for ints/longs, codepoint prefix
  for strings.
- ``year``/``month``/``day``/``hour``: ordinal-from-1970 on the UTC
  (for timestamptz) or stored civil (for timestamp/date) value.

Pruning is Iceberg's *inclusive projection*: a predicate on a source
column projects to a predicate on the partition space that is TRUE
whenever any row in the file could match, so dropping a file/manifest
whose partition value (or summary range) fails the projection is
always sound, and kept files still need the residual row filter.
That is the 100 TB contract: planning cost is manifest-metadata-
sized, the scan reads only implicated files, and correctness never
depends on pruning (it only removes provably-dead IO).

No row-at-a-time Python in the data path: write-side bucket values
are computed by an Arrow-batched pandas UDF whose int64 fast path is
fully vectorized numpy (two-block murmur3 over the little-endian
words); driver-side usage is per-LITERAL / per-file, never per-row.
"""

from __future__ import annotations

import datetime
import struct

_M32 = 0xFFFFFFFF


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (Austin Appleby's public-domain algorithm), as
    required by the Iceberg spec's Appendix B. Returns a SIGNED int32
    like the Java reference."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & _M32
    n = len(data)
    body = n - n % 4
    for i in range(0, body, 4):
        k = int.from_bytes(data[i : i + 4], "little")
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
        h = ((h << 13) | (h >> 19)) & _M32
        h = (h * 5 + 0xE6546B64) & _M32
    k = 0
    for i, b in enumerate(data[body:]):
        k |= b << (8 * i)
    if k:
        k = (k * c1) & _M32
        k = ((k << 15) | (k >> 17)) & _M32
        k = (k * c2) & _M32
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _M32
    h ^= h >> 16
    return h - (1 << 32) if h >= 1 << 31 else h


def _hash_bytes_for(value, ice_type: str) -> bytes:
    """Spec Appendix B hash input: ints/dates promote to long; long /
    timestamp(µs) as 8-byte little-endian two's complement; string as
    UTF-8."""
    if ice_type in ("int", "long", "date", "timestamp", "timestamptz", "time"):
        return struct.pack("<q", int(value))
    if ice_type == "string":
        return str(value).encode("utf-8")
    if ice_type == "binary":
        return bytes(value)
    raise NotImplementedError(f"iceberg bucket over type {ice_type!r}")


def bucket_value(value, n: int, ice_type: str) -> int | None:
    """bucket[N] partition value of ``value`` (None maps to None)."""
    if value is None:
        return None
    return (murmur3_32(_hash_bytes_for(value, ice_type)) & 0x7FFFFFFF) % n


def parse_transform(t: str) -> tuple[str, int | None]:
    """'bucket[8]' -> ('bucket', 8); 'month' -> ('month', None)."""
    t = t.strip()
    if "[" in t:
        kind, arg = t[:-1].split("[", 1)
        return kind, int(arg)
    return t, None


def transform_result_type(kind: str, source_ice_type: str) -> str:
    if kind == "identity":
        return source_ice_type
    if kind == "bucket":
        return "int"
    if kind == "truncate":
        return source_ice_type
    if kind in ("year", "month", "hour"):
        return "int"
    if kind == "day":
        return "int"  # days-from-epoch ordinal (avro date reads as int)
    raise NotImplementedError(f"iceberg transform {kind!r}")


def _civil_from_micros(us: int) -> datetime.datetime:
    """UTC civil rendering of an epoch-µs instant — TZ-free by
    construction (spec: timestamptz transforms evaluate in UTC; the
    engine's NTZ fixtures are epoch-built so their civil value IS
    this)."""
    return datetime.datetime(1970, 1, 1) + datetime.timedelta(microseconds=us)


def _as_micros(value, ice_type: str) -> int:
    """Literal → epoch µs. Accepts raw ints (already µs) or datetimes."""
    if isinstance(value, datetime.datetime):
        return int(
            (value.replace(tzinfo=None) - datetime.datetime(1970, 1, 1))
            / datetime.timedelta(microseconds=1)
        )
    return int(value)


def _as_days(value) -> int:
    if isinstance(value, datetime.date) and not isinstance(
        value, datetime.datetime
    ):
        return (value - datetime.date(1970, 1, 1)).days
    return int(value)


def transform_value(value, kind: str, arg: int | None, ice_type: str):
    """Driver-side transform of a single value (a predicate literal or
    a spec test) into partition space. Timestamp literals may be epoch
    µs ints or naive datetimes; date literals day ordinals or dates."""
    if value is None:
        return None
    if kind == "identity":
        return value
    if kind == "bucket":
        return bucket_value(value, arg, ice_type)
    if kind == "truncate":
        if ice_type in ("int", "long"):
            v = int(value)
            return v - (v % arg)  # Python % floors: spec semantics
        if ice_type == "string":
            return str(value)[:arg]
        raise NotImplementedError(f"truncate over {ice_type!r}")
    if ice_type == "date":
        d = datetime.date(1970, 1, 1) + datetime.timedelta(days=_as_days(value))
        if kind == "year":
            return d.year - 1970
        if kind == "month":
            return (d.year - 1970) * 12 + d.month - 1
        if kind == "day":
            return _as_days(value)
        raise NotImplementedError(f"{kind} over date")
    if ice_type in ("timestamp", "timestamptz"):
        us = _as_micros(value, ice_type)
        if kind == "hour":
            return us // 3_600_000_000
        c = _civil_from_micros(us)
        if kind == "year":
            return c.year - 1970
        if kind == "month":
            return (c.year - 1970) * 12 + c.month - 1
        if kind == "day":
            return us // 86_400_000_000
        raise NotImplementedError(f"{kind} over timestamp")
    raise NotImplementedError(f"iceberg transform {kind!r} over {ice_type!r}")


def transform_column(col_name: str, kind: str, arg: int | None, ice_type: str):
    """Spark Column computing the partition value of ``col_name`` —
    the WRITE-path twin of ``transform_value``, kept TZ-free: civil
    parts (year/month) come off NTZ values directly and off
    timestamptz via its µs epoch rebuilt as UTC-civil NTZ, never
    through the session zone."""
    from pyspark.sql import functions as F

    c = F.col(col_name)
    if kind == "identity":
        return c
    if kind == "bucket":
        # Temporal sources convert to their spec hash inputs JVM-side
        # (date -> day ordinal, timestamp/tz -> epoch MICROseconds as
        # long) BEFORE the UDF: pandas timestamps arrive as
        # datetime64[ns] (and tz-naive in the SESSION zone for
        # timestamptz), so an int64 view inside the UDF would hash
        # nanoseconds / local time — bucket values inconsistent with
        # the read-side inclusive projection (spec Appendix B hashes
        # epoch µs), silently pruning files that hold matching rows.
        if ice_type == "date":
            c = F.datediff(c, F.lit("1970-01-01").cast("date")).cast("long")
        elif ice_type == "timestamptz":
            c = F.unix_micros(c)
        elif ice_type == "timestamp":
            c = F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                f" `{col_name}`)"
            )
        return _bucket_udf(arg, ice_type)(c)
    if kind == "truncate":
        if ice_type in ("int", "long"):
            w = F.lit(arg)
            return (c - F.pmod(c, w)).cast("long" if ice_type == "long" else "int")
        if ice_type == "string":
            return F.substring(c, 1, arg)
        raise NotImplementedError(f"truncate over {ice_type!r}")
    if ice_type == "date":
        if kind == "year":
            return F.year(c) - F.lit(1970)
        if kind == "month":
            return (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
        if kind == "day":
            return F.datediff(c, F.lit("1970-01-01").cast("date"))
        raise NotImplementedError(f"{kind} over date")
    if ice_type in ("timestamp", "timestamptz"):
        if ice_type == "timestamptz":
            # UTC civil, session-TZ-free: epoch µs -> NTZ from the NTZ epoch
            c = F.expr(
                f"timestampadd(MICROSECOND, unix_micros(`{col_name}`), "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            )
            us = F.unix_micros(F.col(col_name))
        else:
            us = F.expr(
                f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
                f" `{col_name}`)"
            )
        if kind == "hour":
            # F.floor, NOT a truncating cast: pre-1970 instants have
            # negative epochs, and truncation-toward-zero would put the
            # write-side partition value one hour ABOVE the read-side
            # projection (transform_value floors) — an unsound prune
            return F.floor(us / F.lit(3_600_000_000)).cast("int")
        if kind == "year":
            return F.year(c) - F.lit(1970)
        if kind == "month":
            return (F.year(c) - F.lit(1970)) * F.lit(12) + F.month(c) - F.lit(1)
        if kind == "day":
            return F.floor(us / F.lit(86_400_000_000)).cast("int")
        raise NotImplementedError(f"{kind} over timestamp")
    raise NotImplementedError(f"iceberg transform {kind!r} over {ice_type!r}")


def _bucket_udf(n: int, ice_type: str):
    """Arrow-batched bucket[N] as a pandas UDF. The int64 family is
    vectorized numpy murmur3 (8-byte input = exactly two mix blocks +
    the len-8 finalizer — no loop over bytes); strings take a per-value
    scalar path (variable length defeats the block vectorization).
    Self-contained closure: no module references survive into the
    worker (NOTES rule 39 — plan/exec-time Python workers don't
    inherit the driver's sys.path)."""
    import pandas as pd  # noqa: F401 (type hints resolve at define time)
    from pyspark.sql.functions import pandas_udf

    is_int = ice_type in ("int", "long", "date", "timestamp", "timestamptz")

    @pandas_udf("int")
    def _bucket(vals):
        import numpy as np
        import pandas as pd
        import struct as _struct

        M = 0xFFFFFFFF

        def scalar_m3(data: bytes) -> int:
            c1, c2 = 0xCC9E2D51, 0x1B873593
            h = 0
            ln = len(data)
            body = ln - ln % 4
            for i in range(0, body, 4):
                k = int.from_bytes(data[i : i + 4], "little")
                k = (k * c1) & M
                k = ((k << 15) | (k >> 17)) & M
                k = (k * c2) & M
                h ^= k
                h = ((h << 13) | (h >> 19)) & M
                h = (h * 5 + 0xE6546B64) & M
            k = 0
            for i, b in enumerate(data[body:]):
                k |= b << (8 * i)
            if k:
                k = (k * c1) & M
                k = ((k << 15) | (k >> 17)) & M
                k = (k * c2) & M
                h ^= k
            h ^= ln
            h ^= h >> 16
            h = (h * 0x85EBCA6B) & M
            h ^= h >> 13
            h = (h * 0xC2B2AE35) & M
            h ^= h >> 16
            return h

        if is_int:
            # Defensive normalization for direct (non-transform_column)
            # callers: datetime series must hash as spec epoch
            # MICROseconds (dates as day ordinals), never the raw
            # datetime64[ns] int64 view — ns vs µs puts every instant
            # in the wrong bucket.
            if str(vals.dtype).startswith("datetime64"):
                if getattr(vals.dtype, "tz", None) is not None:
                    vals = vals.dt.tz_convert("UTC").dt.tz_localize(None)
                unit = "D" if ice_type == "date" else "us"
                nums = vals.to_numpy(dtype=f"datetime64[{unit}]").astype("int64")
                vals = pd.Series(nums, index=vals.index, dtype="Int64").mask(
                    vals.isna()
                )
            elif vals.dtype == object:
                import datetime as _dt

                def _norm(x):
                    if x is None:
                        return None
                    if isinstance(x, _dt.datetime):
                        # tz-aware values must hash their UTC instant,
                        # matching the datetime64 branch's tz_convert —
                        # stripping tzinfo directly would hash local
                        # wall-clock and silently mis-bucket.
                        if x.tzinfo is not None:
                            x = x.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                        else:
                            x = x.replace(tzinfo=None)
                        delta = x - _dt.datetime(1970, 1, 1)
                        return (
                            delta.days * 86_400_000_000
                            + delta.seconds * 1_000_000
                            + delta.microseconds
                        )
                    if isinstance(x, _dt.date):
                        return (x - _dt.date(1970, 1, 1)).days
                    return int(x)

                vals = vals.map(_norm)
            mask = vals.isna().to_numpy()
            v = vals.fillna(0).to_numpy(dtype="int64").view("uint64")
            # murmur3_x86_32 over the 8 little-endian bytes: two u32
            # blocks (low word, high word), then the len=8 finalizer.
            # Arithmetic in uint64, masked back to 32 bits after every
            # wrapping op.
            k1 = v & 0xFFFFFFFF
            k2 = (v >> np.uint64(32)) & 0xFFFFFFFF
            h = np.zeros(len(v), dtype="uint64")
            for k in (k1, k2):
                k = (k * 0xCC9E2D51) & M
                k = ((k << np.uint64(15)) | (k >> np.uint64(17))) & M
                k = (k * 0x1B873593) & M
                h = h ^ k
                h = ((h << np.uint64(13)) | (h >> np.uint64(19))) & M
                h = (h * 5 + 0xE6546B64) & M
            h = h ^ 8
            h = h ^ (h >> np.uint64(16))
            h = (h * 0x85EBCA6B) & M
            h = h ^ (h >> np.uint64(13))
            h = (h * 0xC2B2AE35) & M
            h = h ^ (h >> np.uint64(16))
            out = ((h & 0x7FFFFFFF) % n).astype("int32")
            res = pd.array(out, dtype="Int32")
            res[mask] = None
            return pd.Series(res)

        def one(s):
            if s is None:
                return None
            return (scalar_m3(str(s).encode("utf-8")) & 0x7FFFFFFF) % n

        return vals.map(one).astype("Int32")

    return _bucket


# --------------------------------------------------------------------
# single-value serialization (spec Appendix D) — bounds in manifests
# --------------------------------------------------------------------


def sv_serialize(value, ice_type: str) -> bytes:
    if ice_type == "int" or ice_type == "date":
        return struct.pack("<i", int(value))
    if ice_type in ("long", "timestamp", "timestamptz", "time"):
        return struct.pack("<q", int(value))
    if ice_type == "float":
        return struct.pack("<f", float(value))
    if ice_type == "double":
        return struct.pack("<d", float(value))
    if ice_type == "string":
        return str(value).encode("utf-8")
    if ice_type == "boolean":
        return b"\x01" if value else b"\x00"
    raise NotImplementedError(f"single-value serialization of {ice_type!r}")


def sv_deserialize(b: bytes, ice_type: str):
    if b is None:
        return None
    b = bytes(b)
    if ice_type == "int" or ice_type == "date":
        return struct.unpack("<i", b)[0]
    if ice_type in ("long", "timestamp", "timestamptz", "time"):
        return struct.unpack("<q", b)[0]
    if ice_type == "float":
        return struct.unpack("<f", b)[0]
    if ice_type == "double":
        return struct.unpack("<d", b)[0]
    if ice_type == "string":
        return b.decode("utf-8")
    if ice_type == "boolean":
        return b != b"\x00"
    raise NotImplementedError(f"single-value deserialization of {ice_type!r}")


# --------------------------------------------------------------------
# inclusive projection + pruning evaluators
# --------------------------------------------------------------------

_MONOTONIC = ("identity", "truncate", "year", "month", "day", "hour")
_OPS = ("=", "<", "<=", ">", ">=", "in")


def _norm_literal(lit, ice_type: str):
    if ice_type in ("timestamp", "timestamptz"):
        return _as_micros(lit, ice_type)
    if ice_type == "date":
        return _as_days(lit)
    return lit


def project_predicates(
    predicates, spec_fields: list[dict], ice_schema: dict
) -> list[tuple[int, str, object]]:
    """Project row-space conjuncts onto the partition space.

    ``predicates``: iterable of ``(column, op, literal)`` with op in
    =, <, <=, >, >=, in (literal a set/list for ``in``; timestamps as
    epoch µs or naive datetimes, dates as day ordinals or dates).
    Returns ``[(spec_field_index, op, partition_literal)]`` — the
    inclusive projection: monotonic transforms turn strict ranges into
    inclusive ones on the transformed literal; bucket projects only
    equality/IN. Unprojectable conjuncts are simply not represented
    (they still run as the residual row filter)."""
    by_id = {f["id"]: f for f in ice_schema["fields"]}
    by_name = {f["name"]: f for f in ice_schema["fields"]}
    out: list[tuple[int, str, object]] = []
    for col, op, lit in predicates:
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op {op!r}")
        src = by_name.get(col)
        if src is None:
            continue
        for idx, pf in enumerate(spec_fields):
            if by_id.get(pf["source-id"], {}).get("name") != col:
                continue
            kind, arg = parse_transform(pf["transform"])
            ice_t = src["type"]
            if kind == "bucket":
                if op == "=":
                    out.append((idx, "=", transform_value(lit, kind, arg, ice_t)))
                elif op == "in":
                    out.append(
                        (
                            idx,
                            "in",
                            {transform_value(v, kind, arg, ice_t) for v in lit},
                        )
                    )
                continue
            if kind not in _MONOTONIC:
                continue
            t = lambda v: transform_value(  # noqa: E731
                _norm_literal(v, ice_t), kind, arg, ice_t
            )
            if op == "=":
                out.append((idx, "=", t(lit)))
            elif op == "in":
                out.append((idx, "in", {t(v) for v in lit}))
            elif op in ("<", "<="):
                out.append((idx, "<=", t(lit)))
            else:  # > / >=
                out.append((idx, ">=", t(lit)))
    return out


def partition_value_survives(projected, part_record: dict, spec_fields) -> bool:
    """Entry-level pruning: does a file with this partition tuple
    possibly contain matching rows? Null partition value ⇒ every
    source value in the file is null ⇒ any comparison with a non-null
    literal is false ⇒ prune (sound because transforms map null to
    null and these are conjuncts)."""
    for idx, op, lit in projected:
        name = spec_fields[idx]["name"]
        if name not in part_record:
            continue  # foreign/evolved spec wrote no such field: keep
        v = part_record[name]
        if v is None:
            return False
        if op == "=" and v != lit:
            return False
        if op == "in" and v not in lit:
            return False
        if op == "<=" and v > lit:
            return False
        if op == ">=" and v < lit:
            return False
    return True


def summary_survives(projected, summaries, spec_fields, ice_schema) -> bool:
    """Manifest-level pruning against the manifest-list ``partitions``
    field summaries (lower/upper single-value bounds per spec field).
    Missing/NULL bounds keep the manifest — unknown is never pruned."""
    if not summaries:
        return True
    by_id = {f["id"]: f for f in ice_schema["fields"]}
    for idx, op, lit in projected:
        if idx >= len(summaries):
            continue
        s = summaries[idx]
        pf = spec_fields[idx]
        kind, _ = parse_transform(pf["transform"])
        src = by_id.get(pf["source-id"])
        vt = transform_result_type(kind, src["type"] if src else "int")
        lo = sv_deserialize(s.get("lower_bound"), vt) if s.get("lower_bound") else None
        hi = sv_deserialize(s.get("upper_bound"), vt) if s.get("upper_bound") else None
        if lo is None or hi is None:
            # missing bounds are UNKNOWN, never "empty": the spec makes
            # field-summary bounds optional, so a foreign engine may
            # write contains_null=false and omit them for a manifest
            # full of live values — inferring emptiness there would
            # over-prune. Unknown keeps (entry-level checks still run).
            continue
        if op == "=" and not (lo <= lit <= hi):
            return False
        if op == "in" and not any(lo <= v <= hi for v in lit):
            return False
        if op == "<=" and lo > lit:
            return False
        if op == ">=" and hi < lit:
            return False
    return True


def bounds_survive(predicates, lower: dict, upper: dict, ice_schema) -> bool:
    """File-level min/max skipping on ANY column via the entry's
    ``lower_bounds``/``upper_bounds`` (field-id → single-value bytes).
    Missing bounds keep the file. Strict ops use the strict compare —
    a file whose entire range is one tied value below a ``<`` literal
    still prunes."""
    if not (lower or upper):
        return True
    by_name = {f["name"]: f for f in ice_schema["fields"]}
    for col, op, lit in predicates:
        f = by_name.get(col)
        if f is None or not isinstance(f["type"], str):
            continue
        fid, ice_t = f["id"], f["type"]
        if ice_t == "string":
            continue  # writer records no string bounds (truncation trap)
        lit_n = _norm_literal(lit, ice_t) if op != "in" else None
        lo = sv_deserialize(lower[fid], ice_t) if lower and fid in lower else None
        hi = sv_deserialize(upper[fid], ice_t) if upper and fid in upper else None
        if op == "=":
            if lo is not None and lit_n < lo:
                return False
            if hi is not None and lit_n > hi:
                return False
        elif op == "in":
            vals = [_norm_literal(v, ice_t) for v in lit]
            if lo is not None and hi is not None and not any(
                lo <= v <= hi for v in vals
            ):
                return False
        elif op == "<":
            if lo is not None and lo >= lit_n:
                return False
        elif op == "<=":
            if lo is not None and lo > lit_n:
                return False
        elif op == ">":
            if hi is not None and hi <= lit_n:
                return False
        elif op == ">=":
            if hi is not None and hi < lit_n:
                return False
    return True
