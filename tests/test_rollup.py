"""Incremental rollup maintenance (io/rollup.py): delta upserts must
equal the full recompute, untouched partitions stay byte-identical,
min/max merge correctly, non-mergeable aggregates are refused."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.io.rollup import upsert_rollup

AGGS = {
    "cents": ("sum", "v_cents"),
    "n": ("count", None),
    "lo": ("min", "v_cents"),
    "hi": ("max", "v_cents"),
}


def _facts(spark, rows):
    return spark.createDataFrame(rows, "d string, k string, v_cents long")


def _read(spark, path):
    return {
        (r["d"], r["k"]): (r["cents"], r["n"], r["lo"], r["hi"])
        for r in spark.read.parquet(path).collect()
    }


def test_upsert_equals_full_recompute(spark, tmp_path):
    path = str(tmp_path / "rollup")
    day1 = [("d1", "a", 100), ("d1", "a", 250), ("d1", "b", 10), ("d2", "a", 7)]
    day2 = [("d2", "a", 3), ("d2", "b", 40), ("d3", "a", 5)]

    aff1 = upsert_rollup(spark, path, _facts(spark, day1), "d", ["k"], AGGS)
    assert aff1 == ["d1", "d2"]
    aff2 = upsert_rollup(spark, path, _facts(spark, day2), "d", ["k"], AGGS)
    assert aff2 == ["d2", "d3"]

    got = _read(spark, path)
    full = (
        _facts(spark, day1 + day2)
        .groupBy("d", "k")
        .agg(
            F.sum("v_cents").alias("cents"),
            F.count(F.lit(1)).alias("n"),
            F.min("v_cents").alias("lo"),
            F.max("v_cents").alias("hi"),
        )
    )
    want = {
        (r["d"], r["k"]): (r["cents"], r["n"], r["lo"], r["hi"])
        for r in full.collect()
    }
    assert got == want
    # spot-check the merge arithmetic
    assert got[("d2", "a")] == (10, 2, 3, 7)


def test_untouched_partitions_stay_byte_identical(spark, tmp_path):
    path = str(tmp_path / "rollup2")
    upsert_rollup(
        spark, path, _facts(spark, [("d1", "a", 1), ("d2", "a", 2)]),
        "d", ["k"], AGGS,
    )
    d1_dir = os.path.join(path, "d=d1")
    before = {
        f: os.path.getmtime(os.path.join(d1_dir, f))
        for f in os.listdir(d1_dir)
        if f.endswith(".parquet")
    }
    assert before
    # a delta touching ONLY d2 must not rewrite d1's files
    upsert_rollup(spark, path, _facts(spark, [("d2", "b", 9)]), "d", ["k"], AGGS)
    after = {
        f: os.path.getmtime(os.path.join(d1_dir, f))
        for f in os.listdir(d1_dir)
        if f.endswith(".parquet")
    }
    assert after == before  # dynamic overwrite left d1 alone
    assert _read(spark, path)[("d2", "b")] == (9, 1, 9, 9)


def test_non_mergeable_aggregate_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="median"):
        upsert_rollup(
            spark, str(tmp_path / "r3"), _facts(spark, [("d1", "a", 1)]),
            "d", ["k"], {"m": ("median", "v_cents")},
        )
    # the internal mergeable-state kind is not part of the user surface
    with pytest.raises(ValueError, match="_countnn"):
        upsert_rollup(
            spark, str(tmp_path / "r3b"), _facts(spark, [("d1", "a", 1)]),
            "d", ["k"], {"m": ("_countnn", "v_cents")},
        )


def test_avg_upsert_equals_full_recompute(spark, tmp_path):
    """``avg`` via the stored __sum/__cnt pair: incremental upserts must
    reproduce the full-recompute average EXACTLY (long sums merge
    associatively; the division happens once at read), including null
    source values (avg skips them — the denominator is the NON-NULL
    count, not the row count) and all-null groups (avg = null)."""
    from yodel_etl_spark.io.rollup import read_rollup

    aggs = {"m": ("avg", "v_cents"), "n": ("count", None)}
    path = str(tmp_path / "rollup_avg")
    day1 = [("d1", "a", 100), ("d1", "a", 251), ("d1", "b", None), ("d2", "a", 7)]
    day2 = [("d1", "a", 3), ("d2", "b", 40), ("d2", "a", None), ("d3", "a", 5)]
    upsert_rollup(spark, path, _facts(spark, day1), "d", ["k"], aggs)
    upsert_rollup(spark, path, _facts(spark, day2), "d", ["k"], aggs)

    got = {
        (r["d"], r["k"]): (r["m"], r["n"])
        for r in read_rollup(spark, path, aggs).collect()
    }
    want = {
        (r["d"], r["k"]): (r["m"], r["n"])
        for r in _facts(spark, day1 + day2)
        .groupBy("d", "k")
        .agg(F.avg("v_cents").alias("m"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
    assert got[("d1", "a")] == ((100 + 251 + 3) / 3, 3)  # cross-delta merge
    assert got[("d1", "b")] == (None, 1)  # all-null group: avg null, count 1
    assert got[("d2", "a")] == (7.0, 2)  # null skipped from the denominator
    # stored grain is the mergeable pair, user grain hides it
    stored = spark.read.parquet(path).columns
    assert "m__sum" in stored and "m__cnt" in stored and "m" not in stored
    assert "m" in read_rollup(spark, path, aggs).columns


def test_null_partition_values_merge_not_lost(spark, tmp_path):
    """isin() never matches NULL: a stored null-partition row must
    still merge with a delta's null-partition rows (the silent-loss
    case), and the returned affected list carries None sortably."""
    path = str(tmp_path / "rollup_null")
    upsert_rollup(
        spark, path, _facts(spark, [(None, "a", 100), ("d1", "a", 1)]),
        "d", ["k"], AGGS,
    )
    aff = upsert_rollup(
        spark, path, _facts(spark, [(None, "a", 10), ("d2", "a", 2)]),
        "d", ["k"], AGGS,
    )
    assert aff == ["d2", None]
    got = _read(spark, path)
    assert got[(None, "a")] == (110, 2, 10, 100)  # prior 100 NOT lost
    assert got[("d1", "a")] == (1, 1, 1, 1)


def test_avg_reserved_storage_name_collision_refused(spark, tmp_path):
    """The flat storage dict must refuse an output column that lands on
    an avg's derived `__sum`/`__cnt` names — last-writer-wins there
    would silently corrupt the stored state and read_rollup would then
    drop the user's column (wrong results, no error)."""
    with pytest.raises(ValueError, match="m__sum"):
        upsert_rollup(
            spark, str(tmp_path / "r4"), _facts(spark, [("d1", "a", 1)]),
            "d", ["k"],
            {"m": ("avg", "v_cents"), "m__sum": ("sum", "v_cents")},
        )
    # avg-output vs avg-output collisions are refused too
    with pytest.raises(ValueError, match="m__sum"):
        upsert_rollup(
            spark, str(tmp_path / "r4b"), _facts(spark, [("d1", "a", 1)]),
            "d", ["k"],
            {"m": ("avg", "v_cents"), "m__sum": ("avg", "v_cents")},
        )
