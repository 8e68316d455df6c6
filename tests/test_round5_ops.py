"""Round-5 additions: the baseline-JPEG codec completing the
PNG/GIF/JPEG decode triad (multimodal.py), and the tracked-cache
release hook (session.py).

The JPEG tests mirror the PNG/GIF strategy: the encoder is exercised
only as a test fixture — what ships in the decode ladder is the
DECODER, so every test drives decode() against an independent
expectation (flat-block algebra or a 4-loop reference IDCT), never
against the encoder's own intermediate state.
"""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_spark.operators.multimodal import decode_jpeg, encode_jpeg_gray

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _reference_idct(coeffs64, quant=8):
    """4-loop float64 IDCT (T.81 A.3.3) — independent of the decoder's
    einsum implementation."""
    F = np.array(coeffs64, dtype=float).reshape(8, 8) * quant
    out = np.zeros((8, 8))
    c = lambda u: (1 / np.sqrt(2)) if u == 0 else 1.0  # noqa: E731
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c(u) * c(v) * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4
    return np.clip(np.round(out) + 128, 0, 255)


def test_jpeg_flat_blocks_round_trip_exactly():
    """Flat 8x8 blocks under uniform quant 8 survive the encode→decode
    round trip bit-for-bit — the property the multimodal_features
    oracle relies on."""
    for doc_id in (0, 2, 6, 42, 257, 999):
        w, h = 8 * (2 + doc_id % 29), 8 * (2 + (doc_id * 3) % 29)
        bx = w // 8
        vals = [(doc_id * 7 + b * 13) % 256 for b in range(bx * (h // 8))]
        gw, gh, c, raster = decode_jpeg(encode_jpeg_gray(w, h, vals))
        assert (gw, gh, c) == (w, h, 1)
        r = np.frombuffer(raster, dtype=np.uint8).reshape(h, w)
        for b, v in enumerate(vals):
            blk = r[(b // bx) * 8 : (b // bx) * 8 + 8, (b % bx) * 8 : (b % bx) * 8 + 8]
            assert (blk == v).all(), (doc_id, b)


def test_jpeg_general_ac_path_matches_reference_idct():
    """Random quantized coefficient blocks (DC + up to 20 ACs) decode
    to within one grey level of a 4-loop reference IDCT — exercises the
    run-length AC decode and the einsum IDCT, not just the DC path."""
    rng = np.random.RandomState(11)
    blocks = []
    for _ in range(10):
        blk = [0] * 64
        blk[0] = int(rng.randint(-200, 201))
        for k in rng.choice(np.arange(1, 64), rng.randint(0, 21), replace=False):
            blk[int(k)] = int(rng.randint(-500, 501))
        blocks.append(blk)
    data = encode_jpeg_gray(8 * len(blocks), 8, None, coeff_blocks=blocks)
    w, h, c, raster = decode_jpeg(data)
    r = np.frombuffer(raster, dtype=np.uint8).reshape(8, w)
    for i, blk in enumerate(blocks):
        got = r[:, 8 * i : 8 * i + 8].astype(float)
        assert np.abs(_reference_idct(blk) - got).max() <= 1, i


def test_jpeg_zrl_and_high_frequency_coefficients():
    """A lone coefficient past zigzag position 32 forces ZRL (16-zero
    run) symbols through both coder sides."""
    for zpos in (17, 33, 40, 63):
        blk = [0] * 64
        blk[ZIGZAG[zpos]] = 77
        w, h, c, raster = decode_jpeg(encode_jpeg_gray(8, 8, None, coeff_blocks=[blk]))
        assert np.abs(
            _reference_idct(blk)
            - np.frombuffer(raster, dtype=np.uint8).reshape(8, 8).astype(float)
        ).max() <= 1, zpos


def test_jpeg_byte_stuffing_round_trip():
    """Entropy streams that hit 0xFF bytes must be stuffed/unstuffed
    transparently: sweep all flat grey values (every DC category sign)
    so some streams necessarily produce 0xFF entropy bytes."""
    vals = list(range(0, 256, 3))
    w = 8 * len(vals)
    _, _, _, raster = decode_jpeg(encode_jpeg_gray(w, 8, vals))
    r = np.frombuffer(raster, dtype=np.uint8).reshape(8, w)
    for b, v in enumerate(vals):
        assert (r[:, 8 * b : 8 * b + 8] == v).all(), v


def test_jpeg_decoder_refuses_nonbaseline_honestly():
    """Progressive (SOF2) and subsampled streams raise — the ladder's
    honest fallback to header-parse-only, never faked pixel stats."""
    good = encode_jpeg_gray(16, 16, [10, 20, 30, 40])
    progressive = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError):
        decode_jpeg(progressive)
    # flip the sampling byte 0x11 -> 0x22 inside SOF0
    # SOF0 body: marker(2) len(2) prec(1) h(2) w(2) ncomp(1) id(1) samp(1)
    i = good.index(b"\xff\xc0")
    subsampled = bytearray(good)
    assert subsampled[i + 11] == 0x11
    subsampled[i + 11] = 0x22
    with pytest.raises(ValueError):
        decode_jpeg(bytes(subsampled))


def test_jpeg_ladder_falls_back_to_header_parse(spark, sf_dir):
    """multimodal_parse (header-only op) still reports true geometry
    for streams the full decoder refuses."""
    from map_reduce_spark.operators.multimodal import multimodal_features

    rows = {r.doc_id: r for r in multimodal_features(spark, sf_dir).collect()}
    jpeg_rows = [r for d, r in rows.items() if d % 4 == 2]
    assert jpeg_rows, "fixture must contain jpeg rows"
    for r in jpeg_rows:
        # full decode succeeded: real pixel stats, geometry from SOF0
        assert r.mean_byte is not None
        assert r.width % 8 == 0 and r.height % 8 == 0 and r.channels == 1


def test_release_caches_idempotent_and_counts(spark):
    from map_reduce_spark.session import release_caches, stage_cache

    df = stage_cache(spark.range(10))
    assert df.count() == 10
    assert release_caches() >= 1
    assert release_caches() == 0  # second call: nothing tracked
    assert spark.sparkContext._jsc.getPersistentRDDs().isEmpty()


def test_jpeg_restart_markers_round_trip():
    """DRI + RSTn streams: the decoder must realign to each marker,
    reset DC prediction per interval, and still reproduce every block
    (interval 7 deliberately misaligns with the 10-block row)."""
    vals = [(11 * b + 40) % 256 for b in range(10 * 4)]
    data = encode_jpeg_gray(80, 32, vals, restart_interval=7)
    assert b"\xff\xdd" in data  # DRI segment present
    assert any(bytes([0xFF, 0xD0 + m]) in data for m in range(8))
    w, h, c, raster = decode_jpeg(data)
    assert (w, h, c) == (80, 32, 1)
    r = np.frombuffer(raster, dtype=np.uint8).reshape(32, 80)
    for b, v in enumerate(vals):
        blk = r[(b // 10) * 8 : (b // 10) * 8 + 8, (b % 10) * 8 : (b % 10) * 8 + 8]
        assert (blk == v).all(), b


def test_dedup_incremental_scopes_and_direction(spark, sf_dir):
    """Every flagged pair has a NEW-batch doc on the left; scope says
    whether the duplicate partner is in the batch or the stored index;
    batch pairs are oriented a < b so nothing reports twice."""
    from map_reduce_spark.operators.dedup import _INCREMENTAL_MOD, dedup_incremental

    rows = dedup_incremental(spark, sf_dir).collect()
    assert rows, "fixture corpus contains planted near-dups"
    for r in rows:
        assert r.doc_id % _INCREMENTAL_MOD == 0
        assert r.jac >= 0.5
        if r.scope == "index":
            assert r.dup_of % _INCREMENTAL_MOD != 0
        else:
            assert r.scope == "batch"
            assert r.dup_of % _INCREMENTAL_MOD == 0 and r.doc_id < r.dup_of
