"""Sequence packing invariants: exactly-once assignment, budget
respected, over-budget flagging, determinism, and actual packing
quality (FFD inside groups)."""

from __future__ import annotations

import random

from yodel_etl_spark.scale.packing import pack_sequences


def _pack(spark, rows, budget, groups=4):
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    return pack_sequences(df, "doc_id", "n_tokens", budget, num_groups=groups)


def test_invariants_random(spark):
    rng = random.Random(11)
    rows = [(i, rng.randrange(1, 600)) for i in range(300)]
    out = _pack(spark, rows, budget=512).collect()
    # exactly-once assignment
    assert sorted(r["doc_id"] for r in out) == [i for i, _ in rows]
    fills: dict = {}
    for r in out:
        fills.setdefault(r["bin_id"], 0)
        fills[r["bin_id"]] += r["n_tokens"]
    for r in out:
        assert r["bin_fill"] == fills[r["bin_id"]]
        if r["over_budget"]:
            assert r["n_tokens"] > 512
        else:
            assert r["bin_fill"] <= 512
    # over-budget docs are singleton bins
    over_bins = {r["bin_id"] for r in out if r["over_budget"]}
    for b in over_bins:
        assert sum(1 for r in out if r["bin_id"] == b) == 1


def test_deterministic(spark):
    rng = random.Random(5)
    rows = [(i, rng.randrange(1, 400)) for i in range(150)]
    a = {(r["doc_id"], r["bin_id"]) for r in _pack(spark, rows, 512).collect()}
    b = {(r["doc_id"], r["bin_id"]) for r in _pack(spark, rows, 512).collect()}
    assert a == b


def test_packs_tightly(spark):
    # 40 docs of 128 tokens in ONE group: FFD must produce exactly 10
    # full bins of 4 docs, not 40 singletons
    rows = [(i, 128) for i in range(40)]
    out = _pack(spark, rows, budget=512, groups=1).collect()
    bins = {r["bin_id"] for r in out}
    assert len(bins) == 10
    assert all(r["bin_fill"] == 512 for r in out)


def test_group_prefix_is_hash_bucket(spark):
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.sampling import hash_bucket

    rows = [(i, 10) for i in range(50)]
    out = _pack(spark, rows, budget=64, groups=8).collect()
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    want = {
        r["doc_id"]: r["g"]
        for r in df.select("doc_id", hash_bucket(F.col("doc_id"), 8).alias("g")).collect()
    }
    for r in out:
        assert (r["bin_id"] >> 32) == want[r["doc_id"]]
