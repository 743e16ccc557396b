"""Deterministic hashed text encoder: bit-reproducibility, the numpy
twin contract, unit normalization, cosine sanity on planted near-dups,
and the encoder feeding hyperplane LSH end-to-end."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.encode import encode_batch, encode_text
from yodel_etl_spark.session import release

BASE = "the quick brown fox jumps over the lazy dog near the old river bank"
NEAR = BASE + " today"  # one appended token
FAR = "completely disjoint vocabulary zebra quantum harmonic oscillator"


def test_encode_batch_deterministic_and_normalized():
    a = encode_batch([BASE, NEAR, FAR, "", "   "], dim=64, seed=7)
    b = encode_batch([BASE, NEAR, FAR, "", "   "], dim=64, seed=7)
    assert a.dtype == np.float32 and a.shape == (5, 64)
    assert (a == b).all()  # bit-identical, no RNG state anywhere
    norms = np.sqrt((a.astype(np.float64) ** 2).sum(axis=1))
    assert norms[:3] == pytest.approx([1.0, 1.0, 1.0], abs=1e-6)
    assert (a[3] == 0).all() and (a[4] == 0).all()  # empty text -> zero vec
    # a different seed must change the projection
    c = encode_batch([BASE], dim=64, seed=8)
    assert not (c == a[0]).all()


def test_encode_batch_cosine_sanity():
    a = encode_batch([BASE, NEAR, FAR], dim=64, seed=7).astype(np.float64)
    cos_near = float(a[0] @ a[1])
    cos_far = float(a[0] @ a[2])
    assert cos_near > 0.95  # one-token edit keeps BOW cosine high
    assert cos_far < 0.5  # disjoint vocabularies stay apart


def test_encode_text_matches_numpy_twin(spark):
    df = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, None)], ["doc_id", "text"]
    )
    out = encode_text(df, "text", dim=32, seed=11).orderBy("doc_id").collect()
    twin = encode_batch([BASE, NEAR, FAR, None], dim=32, seed=11)
    for row, tv in zip(out, twin):
        assert np.array_equal(np.array(row["embedding"], dtype=np.float32), tv)
    assert [r["doc_id"] for r in out] == [1, 2, 3, 4]  # schema = input + vec


def test_encoder_feeds_lsh_finds_planted_near_dups(spark):
    """End-to-end from raw text: encode -> hyperplane LSH -> exact
    verify must surface the planted near-duplicates and nothing from
    the unrelated filler (disjoint-ish vocabulary, low cosine)."""
    from yodel_etl_spark.scale.similarity import hyperplane_lsh_pairs

    rows = [(i, f"filler doc about topic{i} alpha{i} beta{i} gamma{i}") for i in range(20)]
    rows += [(100, BASE), (101, NEAR)]  # the planted near-dup pair
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    vecs = encode_text(df, "text", dim=64, seed=7)
    pairs = hyperplane_lsh_pairs(vecs, "doc_id", "embedding", threshold=0.9)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    release(pairs)
    assert (100, 101) in got
    assert all(a == 100 and b == 101 for a, b in got)


def test_registered_embed_lsh_query(spark):
    from yodel_etl_spark.registry import load_all

    pdf = load_all()["elsh"].build(spark, "/root/testdata/sf0.001").toPandas()
    assert list(pdf.columns) == ["id_a", "id_b", "cos"]
    assert len(pdf) > 0
    planted = pdf[(pdf.id_b - pdf.id_a) == 1_000_000]
    # LSH at 16x4 banding + exact verify at 0.98: most planted pairs
    # survive (some short docs drop below the cosine threshold itself)
    assert len(planted) >= 35
    assert (pdf["cos"] >= 0.98).all()
