"""Keyed table diff (ops/diff.py): classification goldens (incl.
null-safe transitions), the diff∘apply_changes identity, DuckDB
full-outer parity on the real events-derived snapshots, and the
one-join plan shape."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.ops.diff import table_diff

OLD = [
    (1, 10.0, "a"),
    (2, 20.0, "b"),
    (3, None, "c"),   # null -> value must read as changed
    (4, 40.0, "d"),
    (5, 50.0, None),  # value -> null must read as changed
    (6, 60.0, "f"),   # unchanged
]
NEW = [
    (1, 11.0, "a"),    # changed: val
    (3, 30.0, "c"),    # changed: val (from NULL)
    (4, 40.0, "dd"),   # changed: tag
    (5, 50.0, None),   # unchanged (NULL == NULL null-safely)
    (6, 60.0, "f"),    # unchanged
    (7, 70.0, "g"),    # added
]                       # key 2 removed


def _frames(spark):
    o = spark.createDataFrame(OLD, ["k", "val", "tag"])
    n = spark.createDataFrame(NEW, ["k", "val", "tag"])
    return o, n


def test_diff_goldens(spark):
    o, n = _frames(spark)
    got = {r["k"]: (r["status"], r["changed_cols"]) for r in table_diff(o, n, ["k"]).collect()}
    assert got == {
        1: ("changed", "val"),
        2: ("removed", ""),
        3: ("changed", "val"),
        4: ("changed", "tag"),
        7: ("added", ""),
    }


def test_diff_include_unchanged_and_multi_col_change(spark):
    o, n = _frames(spark)
    all_rows = {r["k"]: r["status"] for r in table_diff(o, n, ["k"], include_unchanged=True).collect()}
    assert all_rows[5] == "unchanged" and all_rows[6] == "unchanged"
    n2 = n.withColumn("val", F.col("val") + 1)
    got = {r["k"]: r["changed_cols"] for r in table_diff(o, n2, ["k"]).collect()}
    assert got[4] == "tag,val"  # sorted column list


def test_diff_schema_mismatch_raises(spark):
    o, n = _frames(spark)
    with pytest.raises(ValueError):
        table_diff(o, n.drop("tag"), ["k"])


def test_diff_recovers_cdc_net_effect(spark):
    """diff(apply_changes(base, log), base) must report exactly the
    log's net effect — the audit loop a CDC pipeline closes."""
    from yodel_etl_spark.ops.cdc import apply_changes

    base = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0)], ["k", "val"]
    )
    log = spark.createDataFrame(
        [(2, 22.0, 1, "U"), (3, 0.0, 1, "D"), (9, 9.0, 1, "U")],
        ["k", "val", "seq", "op"],
    )
    snap = apply_changes(base, log, keys=("k",), order_by=("seq",), op_col="op")
    got = {r["k"]: r["status"] for r in table_diff(base, snap, ["k"]).collect()}
    assert got == {2: "changed", 3: "removed", 9: "added"}


def test_diff_duckdb_parity_on_events_snapshots(spark, sf_small):
    """Independent formulation parity: the same two per-user snapshots
    the cdc query derives, diffed by a hand-written DuckDB full-outer
    query."""
    from pyspark.sql.window import Window

    from yodel_etl_spark.session import load_tables

    ev = load_tables(spark, sf_small, ("events",))["events"]
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())

    def snap_of(df):
        return (
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("user_id", "event_type", "value")
        )

    cut = F.lit("2024-01-16").cast("timestamp")
    old = snap_of(ev.where(F.col("ts") < cut))
    new = snap_of(ev)
    got = (
        table_diff(old, new, ["user_id"])
        .toPandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')"
    )
    want = con.execute("""
        WITH o AS (
          SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
            FROM events WHERE ts < TIMESTAMP '2024-01-16') WHERE rn = 1
        ), n AS (
          SELECT user_id, event_type, value FROM (
            SELECT user_id, event_type, value,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
            FROM events) WHERE rn = 1
        )
        SELECT coalesce(o.user_id, n.user_id) AS user_id,
               CASE WHEN o.user_id IS NULL THEN 'added'
                    WHEN n.user_id IS NULL THEN 'removed'
                    WHEN o.event_type IS DISTINCT FROM n.event_type
                      OR o.value IS DISTINCT FROM n.value THEN 'changed'
                    ELSE 'unchanged' END AS status,
               CASE WHEN o.user_id IS NOT NULL AND n.user_id IS NOT NULL THEN
                 array_to_string(list_sort(list_filter(
                   [CASE WHEN o.event_type IS DISTINCT FROM n.event_type THEN 'event_type' END,
                    CASE WHEN o.value IS DISTINCT FROM n.value THEN 'value' END],
                   x -> x IS NOT NULL)), ',')
               ELSE '' END AS changed_cols
        FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
    """).df()
    want = want[want["status"] != "unchanged"].sort_values("user_id").reset_index(drop=True)
    assert len(got) == len(want) > 0
    pd.testing.assert_frame_equal(
        got[["user_id", "status", "changed_cols"]].astype(str),
        want[["user_id", "status", "changed_cols"]].astype(str),
    )


def test_diff_plan_one_join_no_window(spark):
    o, n = _frames(spark)
    plan = table_diff(o, n, ["k"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert plan.count("Join") <= 1 or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
