"""kmeans_assign / embedding_centroids: determinism, membership, means."""

from __future__ import annotations

from pyspark.sql import functions as F

from yodel_etl_spark.scale.similarity import embedding_centroids, kmeans_assign


def _emb(spark):
    rows = [
        # two tight groups around (0,0) and (10,10), ids interleaved
        (0, [0.0, 0.0]),
        (1, [10.0, 10.0]),
        (2, [0.2, 0.0]),
        (3, [10.0, 10.2]),
        (4, [0.0, 0.4]),
        (5, [9.8, 10.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_assign_nearest_seed(spark):
    out = {r.id: r.cluster_id for r in kmeans_assign(_emb(spark), "vec_id", "embedding", k=2).collect()}
    # seeds are ids 0 and 1; evens sit near (0,0), odds near (10,10)
    assert out == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0, 5: 1}


def test_assign_tie_breaks_to_smaller_seed(spark):
    rows = [(0, [0.0]), (1, [2.0]), (2, [1.0])]  # id 2 equidistant to both seeds
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.id: r.cluster_id for r in kmeans_assign(df, "vec_id", "embedding", k=2).collect()}
    assert out[2] == 0


def _qmean(vals, scale=10**7):
    """The operator's exact-integer mean: quantize each value to 1e-7,
    sum as longs, two IEEE divisions — bit-reproducible regardless of
    aggregation order."""
    return sum(round(v * scale) for v in vals) / len(vals) / scale


def test_centroids_exact_means(spark):
    out = embedding_centroids(_emb(spark), "vec_id", "embedding", k=2)
    got = {(r.cluster_id, r.pos): (r.centroid, r.n_members) for r in out.collect()}
    assert got[(0, 0)] == (_qmean([0.0, 0.2, 0.0]), 3)
    assert got[(0, 1)] == (_qmean([0.0, 0.0, 0.4]), 3)
    assert got[(1, 0)] == (_qmean([10.0, 10.0, 9.8]), 3)
    assert got[(1, 1)] == (_qmean([10.0, 10.2, 10.0]), 3)


def test_assignment_plan_is_shuffle_free(spark):
    df = _emb(spark)
    plan = kmeans_assign(df, "vec_id", "embedding", k=2)._jdf.queryExecution().executedPlan().toString()
    # the corpus side must not shuffle: only broadcast exchanges allowed
    import re

    shuffles = [
        ln for ln in plan.splitlines() if re.search(r"Exchange (?!.*broadcast)", ln, re.I)
    ]
    # the seed 1-row aggregate may shuffle its K rows; the corpus scan
    # must feed the join directly.  Assert no exchange sits between the
    # corpus scan and the BroadcastNestedLoopJoin.
    join_idx = next(i for i, ln in enumerate(plan.splitlines()) if "BroadcastNestedLoopJoin" in ln)
    corpus_side = plan.splitlines()[join_idx:]
    stream_exchanges = [
        ln
        for ln in corpus_side
        if "Exchange" in ln and "Broadcast" not in ln and "SinglePartition" not in ln
    ]
    assert not stream_exchanges, plan
