"""Perceptual image hashing: exact block-mean math, luma handling,
dHash stability under near-duplicate edits, the generic 64-bit Hamming
banding join's pigeonhole recall, and the registered end-to-end query."""

from __future__ import annotations

import numpy as np
import pytest

from yodel_etl_spark.scale.phash import block_mean, dhash64, image_dhash, luma


def test_luma_weights_and_shapes():
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[0, 0] = (255, 0, 0)
    rgb[0, 1] = (0, 255, 0)
    rgb[1, 0] = (0, 0, 255)
    rgb[1, 1] = (255, 255, 255)
    g = luma(rgb)
    assert g.tolist() == [[76, 149], [29, 255]]  # floor(299/587/114 * 255/1000)
    gray = np.array([[7, 9]], dtype=np.uint8)
    assert luma(gray).tolist() == [[7, 9]]
    rgba = np.dstack([rgb, np.full((2, 2), 128, np.uint8)])
    assert np.array_equal(luma(rgba), g)  # alpha ignored


def test_block_mean_exact_vs_naive():
    rng = np.random.RandomState(2)
    g = rng.randint(0, 256, (37, 53)).astype(np.int64)
    out = block_mean(g, 8, 9)
    ys = (np.arange(9) * 37) // 8
    xs = (np.arange(10) * 53) // 9
    for r in range(8):
        for c in range(9):
            blk = g[ys[r] : ys[r + 1], xs[c] : xs[c + 1]]
            assert out[r, c] == blk.sum() // blk.size


def test_block_mean_undersized_raises():
    with pytest.raises(ValueError, match="smaller than"):
        block_mean(np.zeros((7, 20), dtype=np.int64), 8, 9)


def test_dhash_known_pattern_and_near_dup_stability():
    # constant 8x8-per-cell blocks -> block_mean recovers the cells, so
    # the hash bits are exactly the cell gradient signs
    rng = np.random.RandomState(3)
    cells = rng.randint(0, 256, (8, 9)).astype(np.uint8)
    img = np.repeat(np.repeat(cells, 8, 0), 8, 1)
    px = np.stack([img] * 3, axis=2)
    h = dhash64(px)
    expect = 0
    for r in range(8):
        for c in range(8):
            expect = (expect << 1) | int(cells[r, c + 1] > cells[r, c])
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert h == expect
    # a two-cell edit flips at most 4 gradient bits
    edited = cells.copy()
    edited[3, 4] = (int(edited[3, 4]) + 60) % 256
    edited[6, 1] = (int(edited[6, 1]) + 60) % 256
    img2 = np.repeat(np.repeat(edited, 8, 0), 8, 1)
    h2 = dhash64(np.stack([img2] * 3, axis=2))
    assert bin((h ^ h2) & ((1 << 64) - 1)).count("1") <= 4
    # determinism
    assert dhash64(px) == h


def test_image_dhash_over_bmp_blobs(spark):
    from yodel_etl_spark.scale.codecs import bmp_pack

    rng = np.random.RandomState(4)
    rows = []
    pxs = {}
    for i in range(6):
        px = rng.randint(0, 256, (16, 18, 3)).astype(np.uint8)
        pxs[i] = px
        rows.append((i, bytearray(bmp_pack(px))))
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r["doc_id"]: r for r in image_dhash(df, "content").collect()}
    assert len(out) == 6
    for i, px in pxs.items():
        assert out[i]["dhash"] == dhash64(px)  # executor == local twin
        assert (out[i]["img_h"], out[i]["img_w"]) == (16, 18)


def test_hamming_pairs_pigeonhole_recall(spark):
    """Any pair within distance < blocks MUST be found (pigeonhole is
    exact, not probabilistic): plant hashes at controlled distances."""
    from yodel_etl_spark.scale.dedup import hamming_pairs
    from yodel_etl_spark.session import release

    base = 0x0123456789ABCDEF
    rows = [
        (1, base),
        (2, base ^ 0b111),  # distance 3 in one byte
        (3, base ^ (1 << 5) ^ (1 << 20) ^ (1 << 40) ^ (1 << 60)),  # 4 spread bits
        (4, ~base & ((1 << 63) - 1)),  # far away
    ]
    df = spark.createDataFrame(
        [(i, v - (1 << 64) if v >= 1 << 63 else v) for i, v in rows],
        "doc long, sim long",
    )
    out = hamming_pairs(df, "doc", "sim", max_distance=4, blocks=8)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out.collect()}
    release(out)
    assert got[(1, 2)] == 3
    assert got[(1, 3)] == 4
    assert (1, 4) not in got and (2, 4) not in got


def test_registered_phash_query(spark):
    from yodel_etl_spark.registry import load_all

    pdf = load_all()["phash"].build(spark, "/root/testdata/sf0.001").toPandas()
    # exactly the 50 planted twins, no random-collision false positives
    assert len(pdf) == 50
    assert ((pdf["doc_b"] - pdf["doc_a"]) == 2_000_000).all()
    assert (pdf["hamming"] <= 4).all()
