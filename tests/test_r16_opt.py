"""Round-16 optimization pins.

_nearest_cells(n=1): the max_by aggregate form must rank EXACTLY like
the row_number window form it replaced — including the ugly corners:
NaN sims (zero-norm vectors: 0/0), NULL sims (null vector arrays),
and exact sim ties (duplicate centroid vectors), where Spark's
ordering semantics (NaN largest, NULLs last under DESC, ties broken
by cell ASC) must hold in both physical forms."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from yodel_etl_spark.scale.similarity import _nearest_cells, cosine


def _window_nearest(frame, cents, key, vec, n):
    """The pre-r16 definition, verbatim — the parity reference."""
    scored = frame.crossJoin(F.broadcast(cents)).withColumn(
        "sim", cosine(F.col(vec), F.col("cvec"))
    )
    w = Window.partitionBy(key).orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n)
        .drop("rk", "sim", "cvec")
    )


def _fixture(spark):
    # centroids: cell 10 and cell 20 share a vector (exact-tie pair),
    # cell 30 carries a NaN component (sim against it is NaN — under
    # ANSI a ZERO-norm vector would raise DIVIDE_BY_ZERO in BOTH
    # forms, so NaN must enter through the data, as it would in a real
    # corrupted-embedding corpus), cell 5 is a distinct direction —
    # cell ids deliberately non-contiguous so the ASC tie-break is
    # visible
    nan = float("nan")
    cents = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0]),
            (20, [1.0, 0.0, 0.0]),
            (30, [nan, 1.0, 0.0]),
            (5, [0.0, 1.0, 0.0]),
        ],
        "cell long, cvec array<double>",
    )
    rows = [
        (1, [1.0, 0.0, 0.0]),      # exact tie 10 vs 20; NaN vs 30
        (2, [0.0, 1.0, 0.0]),      # real winner 5, but NaN (30) outranks
        (3, [nan, 2.0, 0.0]),      # NaN query: ALL sims NaN
        (4, [0.7, 0.7, 0.0]),      # distinct sims + a NaN
        (5, None),                 # null vector: ALL sims NULL
        (6, [-1.0, 0.0, 0.0]),     # negative sims + a NaN
    ]
    frame = spark.createDataFrame(rows, "id long, vec array<double>")
    return frame, cents


def test_nearest_cells_n1_matches_window_form(spark):
    frame, cents = _fixture(spark)
    got = _nearest_cells(frame, cents, "id", "vec", 1).collect()
    want = _window_nearest(frame, cents, "id", "vec", 1).collect()
    # repr-compare vecs: Python's nan != nan would fail an equal pair
    g = {r["id"]: (r["cell"], repr(r["vec"])) for r in got}
    w = {r["id"]: (r["cell"], repr(r["vec"])) for r in want}
    assert g == w
    assert len(got) == len(want) == 6
    # the corners mean what they claim: NaN outranks every real sim
    # (Spark orders NaN as the largest double), NaN ties and real ties
    # break toward the smaller cell, NULL sims rank last
    assert g[1][0] == 30  # NaN sim vs cell 30 outranks the exact 1.0 matches
    assert g[2][0] == 30  # NaN outranks the true direction match (cell 5)
    assert g[3][0] == 5   # all-NaN -> tie on NaN -> min cell
    assert g[5][0] == 5   # all-NULL sims -> nulls-last both forms -> min cell


def test_nearest_cells_n1_plan_has_no_window(spark):
    frame, cents = _fixture(spark)
    plan = _nearest_cells(frame, cents, "id", "vec", 1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan
    assert "max_by" in plan or "MaxBy" in plan or "HashAggregate" in plan
    # the nprobe>1 serving path keeps the window definition
    plan3 = _nearest_cells(frame, cents, "id", "vec", 3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" in plan3


def test_nearest_cells_n1_matches_window_on_random_vectors(spark):
    import random

    rnd = random.Random(16)
    cents = spark.createDataFrame(
        [
            (int(c * 50), [rnd.uniform(-1, 1) for _ in range(8)])
            for c in range(7)
        ],
        "cell long, cvec array<double>",
    )
    frame = spark.createDataFrame(
        [
            (i, [rnd.uniform(-1, 1) for _ in range(8)])
            for i in range(200)
        ],
        "id long, vec array<double>",
    )
    got = sorted(
        (r["id"], r["cell"])
        for r in _nearest_cells(frame, cents, "id", "vec", 1).collect()
    )
    want = sorted(
        (r["id"], r["cell"])
        for r in _window_nearest(frame, cents, "id", "vec", 1).collect()
    )
    assert got == want


def test_upsert_rollup_writes_one_file_per_partition(spark, tmp_path):
    """r16: the merged write clusters by the partition column, so each
    affected partition gets exactly ONE file per upsert — the merge's
    groupBy otherwise spreads a partition's rows over several reducers
    and each writes its own small file (re-fragmented on every upsert,
    since dynamic overwrite replaces partitions wholesale)."""
    import glob
    import os

    from yodel_etl_spark.io.rollup import read_rollup, upsert_rollup

    path = str(tmp_path / "roll")
    rows = [(d, f"t{k}", d * 10 + k) for d in range(6) for k in range(5)]
    df = spark.createDataFrame(rows, "d int, et string, v long")
    aggs = {"s": ("sum", "v"), "n": ("count", None)}
    upsert_rollup(spark, path, df.where("d < 4"), "d", ["et"], aggs)
    upsert_rollup(spark, path, df.where("d >= 2"), "d", ["et"], aggs)
    parts = sorted(glob.glob(path + "/d=*"))
    assert len(parts) == 6
    for p in parts:
        assert len(glob.glob(os.path.join(p, "*.parquet"))) == 1, p
    # and the merge math still holds: overlap days d=2,3 double-count
    # per the documented at-least-once contract (delta applied twice)
    got = {
        (r["d"], r["et"]): (r["s"], r["n"])
        for r in read_rollup(spark, path, aggs).collect()
    }
    assert got[(0, "t0")] == (0, 1)
    assert got[(2, "t1")] == (2 * (2 * 10 + 1), 2)


def test_delete_mixed_predicate_heterogeneous_spellings(spark, tmp_path):
    """r16: a MIXED (partition + data column) delete over heterogeneous
    partition spellings must evaluate the rewrite under the same
    TABLE-WIDE partition typing the batched count used.  With the old
    per-leaf basePath read, leaf part=1 inferred int while {'0.5','1'}
    is double table-wide, and the rewrite threw CAST_INVALID_INPUT
    mid-delete (ANSI) after the count had already ordered it."""
    from yodel_etl_spark.io.compact import delete_parquet_where

    path = str(tmp_path / "t")
    rows = [(i, v) for v in ("0.5", "1") for i in range(6)]
    spark.createDataFrame(rows, "k long, part string").write.partitionBy(
        "part"
    ).parquet(path)
    rep = delete_parquet_where(spark, path, "part >= '0.5' AND k >= 3")
    assert (rep["rows_before"], rep["n_deleted"], rep["rows_after"]) == (
        12,
        6,
        6,
    )
    got = sorted(
        (r["k"], r["part"]) for r in spark.read.parquet(path).collect()
    )
    assert got == [(i, v) for i in range(3) for v in (0.5, 1.0)]
