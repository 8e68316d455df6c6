"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns with typed metadata alongside, and runs decode /
feature-extraction as Arrow-batched Pandas functions (``mapInPandas``).
The container has no image/audio codecs, so the DECODE step is a
clearly-marked deterministic stub (``_fake_decode``) — but everything
Spark-side is real and tested: the binary column, the schema contract,
the batch iterator shape, and the partition-parallel execution.

The binary payloads are synthesized from ``documents.text`` (utf-8
bytes) since the driver tables have no media column; swapping in real
bytes changes nothing structurally.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_reduce_spark.io import load_table
from map_reduce_spark.registry import register


def binary_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary, media_type, n_bytes):
    the canonical multimodal-column layout."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )


@register(
    "binary_metadata",
    oracle="""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_fp
FROM documents
""",
)
def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the binary column (size + fingerprint) —
    pure JVM expressions, no decode."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
        F.md5("text").alias("payload_fp"),
    )


_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, "
    "mean_byte double"
)


def extract_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: each worker receives pandas batches, decodes each
    payload, emits a typed feature row — the real multimodal operator
    shape (vectorized transfer, per-partition parallelism, no driver
    involvement). Decode = real PNG/JPEG/GIF header parsing (pure byte
    inspection — true dimensions for real image payloads) with the
    deterministic stub as fallback for unrecognized bytes.

    The worker function is deliberately self-contained (no references
    to this module) so cloudpickle ships it by value — Python workers
    do not need map_reduce_spark on their import path.
    """

    def op(batches: Iterator) -> Iterator:
        import pandas as pd

        def parse_header(p: bytes):
            """Real container-header parse (pure byte inspection, no
            codec): PNG IHDR, JPEG SOFn, GIF logical screen. Returns
            (width, height, channels) or None for unrecognized data."""
            # PNG: 8-byte signature, then the IHDR chunk holds
            # width/height as big-endian u32 and color type at byte 25
            if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 26 and p[12:16] == b"IHDR":
                w = int.from_bytes(p[16:20], "big")
                h = int.from_bytes(p[20:24], "big")
                channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(p[25], 3)
                return w, h, channels
            # JPEG: walk the marker stream to the first SOFn segment
            # (not DHT 0xC4 / JPG 0xC8 / DAC 0xCC), which carries
            # height, width (big-endian u16) and component count
            if p[:2] == b"\xff\xd8":
                i = 2
                while i + 9 < len(p):
                    if p[i] != 0xFF:
                        i += 1
                        continue
                    marker = p[i + 1]
                    if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                        i += 2
                        continue
                    seglen = int.from_bytes(p[i + 2 : i + 4], "big")
                    if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                        h = int.from_bytes(p[i + 5 : i + 7], "big")
                        w = int.from_bytes(p[i + 7 : i + 9], "big")
                        return w, h, int(p[i + 9])
                    i += 2 + seglen
                return None
            # GIF: width/height are little-endian u16 right after the
            # GIF87a/GIF89a signature
            if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
                w = int.from_bytes(p[6:8], "little")
                h = int.from_bytes(p[8:10], "little")
                return w, h, 3
            return None

        def fake_decode(payload: bytes) -> tuple[int, int, int]:
            # STUB fallback for non-image payloads (no media codecs in
            # this container): derives deterministic fake geometry from
            # the raw bytes. A real deployment swaps this body for
            # PIL/ffmpeg, same schema.
            n = len(payload)
            width = 16 + (n % 64)
            height = 16 + (sum(payload[:32]) % 64 if n else 0)
            return int(width), int(height), 3

        def decode(payload: bytes) -> tuple[int, int, int]:
            parsed = parse_header(payload)
            return parsed if parsed is not None else fake_decode(payload)

        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "channels": [f[2] for f in feats],
                    "mean_byte": [
                        (sum(p) / len(p)) if len(p) else 0.0 for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(op, schema=_FEATURE_SCHEMA)


@register("multimodal_features", oracle=None)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode + feature extraction via mapInPandas.

    Rows-only for the driver (the decode stub is engine-side Python);
    tests assert determinism, schema, and batch behavior.
    """
    return extract_features(binary_table(spark, sf_dir))


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize operator shape: binary in → binary out, same
    partitioning, Arrow batches. STUB kernel (no codecs here): emits a
    deterministic byte-downsample of the payload; a real deployment
    swaps the kernel for PIL's resize and keeps schema + batching."""

    def op(batches):
        import pandas as pd

        def fake_resize(payload: bytes, n_out: int) -> bytes:
            if not payload:
                return b""
            step = max(1, len(payload) // n_out)
            return payload[::step][:n_out]

        n_out = width * height
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": [fake_resize(p, n_out) for p in pdf["payload"]],
                    "width": width,
                    "height": height,
                }
            )

    return df.mapInPandas(op, schema="doc_id long, payload binary, width int, height int")


def sample_frames(df: DataFrame, frame_bytes: int = 256, every_k: int = 4) -> DataFrame:
    """Video frame-sampling operator shape: one binary "video" row fans
    out to one row per sampled frame (UDTF-like mapInPandas). STUB
    framing: fixed-size byte windows stand in for decoded frames."""

    def op(batches):
        import pandas as pd

        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(payload) // frame_bytes)
                for i in range(0, n_frames, every_k):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame": frames}
            )

    return df.mapInPandas(op, schema="doc_id long, frame_idx int, frame binary")


@register("multimodal_pipeline", oracle=None)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed multimodal chain: binary table → resize → frame-sample
    → per-doc frame stats. Exercises chained mapInPandas stages with
    repartition-free pipelining (all narrow transforms)."""
    resized = resize_images(binary_table(spark, sf_dir), 32, 32)
    frames = sample_frames(resized, frame_bytes=64, every_k=2)
    return frames.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(F.octet_length("frame")).alias("total_frame_bytes"),
    )


# --- audio: RIFF/WAV container plumbing -------------------------------


def audio_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, payload binary): a canonical 44-byte PCM
    WAV container per doc (RIFF/fmt/data chunks), with the utf-8 text
    bytes standing in for samples — deterministic per doc_id, so the
    downstream parse is hash-verifiable. Real audio swaps in without
    structural change."""

    def synth(batches):
        import struct

        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                rate = 8000 + (int(doc_id) % 3) * 4000
                channels = 1 + int(doc_id) % 2
                bits = 16
                block = channels * bits // 8
                raw = text.encode("utf-8")
                data = raw[: len(raw) - (len(raw) % block)]
                hdr = (
                    b"RIFF"
                    + struct.pack("<I", 36 + len(data))
                    + b"WAVEfmt "
                    + struct.pack(
                        "<IHHIIHH",
                        16, 1, channels, rate, rate * block, block, bits,
                    )
                    + b"data"
                    + struct.pack("<I", len(data))
                )
                payloads.append(hdr + data)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(synth, "doc_id long, payload binary")


@register(
    "audio_metadata",
    oracle="""
WITH base AS (
  SELECT doc_id,
         8000 + (doc_id % 3) * 4000 AS sample_rate,
         CAST(1 + doc_id % 2 AS INT) AS channels,
         (1 + doc_id % 2) * 2 AS block,
         octet_length(encode(text)) AS len
  FROM documents
), s AS (
  SELECT doc_id, sample_rate, channels,
         CAST((len - len % block) / block AS BIGINT) AS n_samples
  FROM base
)
SELECT doc_id, sample_rate, channels, 16 AS bits, n_samples,
       CAST((n_samples * 1000 - (n_samples * 1000) % sample_rate)
            / sample_rate AS BIGINT) AS duration_ms
FROM s
""",
)
def audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse RIFF/WAV headers from the binary audio column — a REAL
    container parser (works on any PCM WAV file), batched through
    ``mapInPandas``. Because the synthesized container is deterministic
    per doc, the full synth→parse roundtrip is hash-verified by the
    DuckDB oracle, which recomputes every field from first principles —
    the multimodal analog of the portable-hash dedup witnesses.

    Scale shape: narrow batch map, no shuffle; headers are parsed from
    the first 44 bytes, payload bytes stream through untouched.
    """

    def parse(batches):
        import struct

        import pandas as pd

        def fields(p: bytes):
            if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
                return None
            channels, rate = struct.unpack("<HI", p[22:28])
            block, bits = struct.unpack("<HH", p[32:36])
            data_len = struct.unpack("<I", p[40:44])[0]
            n_samples = data_len // block
            return (rate, channels, bits, n_samples, n_samples * 1000 // rate)

        for pdf in batches:
            rows = [fields(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": [r[0] for r in rows],
                    "channels": [r[1] for r in rows],
                    "bits": [r[2] for r in rows],
                    "n_samples": [r[3] for r in rows],
                    "duration_ms": [r[4] for r in rows],
                }
            )

    return audio_table(spark, sf_dir).mapInPandas(
        parse,
        "doc_id long, sample_rate int, channels int, bits int, "
        "n_samples long, duration_ms long",
    )


def parse_wav_fields(p: bytes):
    """Driver-side twin of the ``audio_metadata`` worker closure (kept
    self-contained there per NOTES rule 6); used by tests to prove the
    parser handles REAL files from the stdlib ``wave`` writer."""
    import struct

    if len(p) < 44 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        return None
    channels, rate = struct.unpack("<HI", p[22:28])
    block, bits = struct.unpack("<HH", p[32:36])
    data_len = struct.unpack("<I", p[40:44])[0]
    n_samples = data_len // block
    return (rate, channels, bits, n_samples, n_samples * 1000 // rate)
