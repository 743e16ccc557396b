"""CDC MERGE / upsert apply (ops/cdc.py): golden semantics (upsert,
insert, delete, supersession, delete-then-reinsert, no-op delete,
untouched keys), schema contract, determinism under ties, plan shape
(delta-only shuffle; broadcast form leaves the snapshot exchange-free),
and the registered ``cdc`` query."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.ops.cdc import apply_changes

BASE = [
    # (k, val, tag)
    (1, 10.0, "a"),
    (2, 20.0, "b"),
    (3, 30.0, "c"),
    (4, 40.0, "d"),
]

CHANGES = [
    # (k, val, tag, seq, op)
    (2, 21.0, "b1", 1, "U"),   # update
    (2, 22.0, "b2", 2, "U"),   # supersedes the first update
    (3, 0.0, "c", 1, "D"),     # delete
    (5, 50.0, "e", 1, "U"),    # insert (key not in base)
    (4, 0.0, "d", 1, "D"),     # delete...
    (4, 41.0, "d1", 2, "U"),   # ...then re-insert (latest wins)
    (6, 0.0, "f", 1, "D"),     # delete of a key base never had → no-op
]

WANT = {
    1: (10.0, "a"),   # untouched
    2: (22.0, "b2"),  # latest upsert
    4: (41.0, "d1"),  # delete superseded by re-insert
    5: (50.0, "e"),   # inserted
}


def _frames(spark):
    base = spark.createDataFrame(BASE, ["k", "val", "tag"])
    changes = spark.createDataFrame(CHANGES, ["k", "val", "tag", "seq", "op"])
    return base, changes


@pytest.mark.parametrize("broadcast", [False, True])
def test_merge_goldens(spark, broadcast):
    base, changes = _frames(spark)
    out = apply_changes(
        base, changes, keys=("k",), order_by=("seq",), op_col="op",
        broadcast_changes=broadcast,
    )
    assert out.columns == ["k", "val", "tag"]  # snapshot schema exactly
    got = {r["k"]: (r["val"], r["tag"]) for r in out.collect()}
    assert got == WANT


def test_no_op_col_means_pure_upsert(spark):
    base, changes = _frames(spark)
    out = apply_changes(base, changes, keys=("k",), order_by=("seq",))
    got = {r["k"]: (r["val"], r["tag"]) for r in out.collect()}
    # deletes become plain upserts of their row values
    assert got[3] == (0.0, "c")
    assert got[6] == (0.0, "f")
    assert got[2] == (22.0, "b2")


def test_tie_break_determinism(spark):
    """Two changes with the same primary order need the tie-break column
    to pick a deterministic winner."""
    base = spark.createDataFrame([(1, 0.0)], ["k", "val"])
    changes = spark.createDataFrame(
        [(1, 5.0, 7, 100), (1, 6.0, 7, 200)], ["k", "val", "seq", "off"]
    )
    out = apply_changes(base, changes, keys=("k",), order_by=("seq", "off"))
    assert out.collect()[0]["val"] == 6.0


def test_idempotent_reapply(spark):
    """Re-applying the same change batch onto the merged snapshot is a
    no-op — the MERGE property that makes at-least-once ingest safe."""
    base, changes = _frames(spark)
    once = apply_changes(
        base, changes, keys=("k",), order_by=("seq",), op_col="op"
    )
    twice = apply_changes(
        once, changes, keys=("k",), order_by=("seq",), op_col="op"
    )
    got = {r["k"]: (r["val"], r["tag"]) for r in twice.collect()}
    assert got == WANT


def test_broadcast_form_leaves_snapshot_unshuffled(spark):
    """broadcast_changes=True: the snapshot side of the anti-join must
    see a BroadcastExchange, not a shuffle Exchange — the delta is the
    only thing that moves."""
    base, changes = _frames(spark)
    plan = (
        apply_changes(
            base, changes, keys=("k",), order_by=("seq",), op_col="op",
            broadcast_changes=True,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_registered_cdc_query(spark, sf_small):
    """The registered query's invariants (parity itself rides the
    oracle suite): one row per surviving user, no user whose latest
    change was a delete, pass-through users untouched."""
    from yodel_etl_spark.registry import load_all

    pdf = load_all()["cdc"].build(spark, sf_small).toPandas()
    assert pdf.columns.tolist() == ["user_id", "ts", "event_type", "value"]
    assert pdf["user_id"].is_unique
    # users whose latest post-cut change is an error must be absent
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    late = ev.where(F.col("ts") >= F.lit("2024-01-16").cast("timestamp"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    deleted = {
        r["user_id"]
        for r in late.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("event_type") == "error"))
        .collect()
    }
    assert deleted, "fixture should exercise the delete path"
    assert not (set(pdf["user_id"]) & deleted)
