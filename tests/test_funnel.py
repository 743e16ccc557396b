"""Funnel / ordered-sequence match (ops/funnel.py): golden semantics,
join-chain DuckDB parity on the real events table (the oracle
discipline, in-test since the op rides no registry slot — the stdout
byte budget is at its pin), and the one-shuffle plan shape."""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.ops.funnel import funnel_oracle_sql, funnel_steps

STEPS = ("view", "click", "purchase")


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


GOLDEN = [
    # user 1: clean completion
    (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
    # user 2: click BEFORE the first view cannot count; chain stops at view
    (2, _ts(1), "click"), (2, _ts(2), "view"),
    # user 3: same-timestamp click is NOT strictly after the view
    (3, _ts(1), "view"), (3, _ts(1), "click"),
    # user 4: no view at all -> absent from the report
    (4, _ts(1), "click"), (4, _ts(2), "purchase"),
    # user 5: t1 is the MIN view; the earliest qualifying click follows
    (5, _ts(5), "view"), (5, _ts(2), "view"), (5, _ts(4), "click"),
    # user 6: purchase before click breaks the order; later click re-arms
    (6, _ts(1), "view"), (6, _ts(2), "purchase"), (6, _ts(3), "click"),
    (6, _ts(4), "purchase"),
]


@pytest.fixture(scope="module")
def golden_out(spark):
    df = spark.createDataFrame(GOLDEN, ["u", "ts", "tp"])
    rows = funnel_steps(df, "u", "ts", "tp", STEPS).collect()
    return {r["key"]: (r["t1"], r["t2"], r["t3"], r["stage"]) for r in rows}


def test_golden_semantics(golden_out):
    assert golden_out[1] == (_ts(1), _ts(2), _ts(3), 3)
    assert golden_out[2] == (_ts(2), None, None, 1)
    assert golden_out[3] == (_ts(1), None, None, 1)
    assert 4 not in golden_out
    assert golden_out[5] == (_ts(2), _ts(4), None, 2)
    assert golden_out[6] == (_ts(1), _ts(3), _ts(4), 3)


def test_golden_matches_join_chain_oracle(spark, golden_out):
    con = duckdb.connect()
    con.register(
        "ev", pd.DataFrame(GOLDEN, columns=["u", "ts", "tp"])
    )
    sql = funnel_oracle_sql("ev", "u", "ts", "tp", STEPS)
    odf = con.execute(sql).df()
    want = {
        int(r["key"]): (
            None if pd.isna(r["t1"]) else r["t1"].to_pydatetime(),
            None if pd.isna(r["t2"]) else r["t2"].to_pydatetime(),
            None if pd.isna(r["t3"]) else r["t3"].to_pydatetime(),
            int(r["stage"]),
        )
        for _, r in odf.iterrows()
    }
    assert want == golden_out


def test_parity_on_real_events(spark, sf_small):
    """Full-table parity against the independent k-pass join-chain
    formulation at sf0.01-or-sf0.001 — every user, every timestamp."""
    ev = spark.read.parquet(f"{sf_small}/events.parquet")
    from yodel_etl_spark.session import load_tables

    ev = load_tables(spark, sf_small, ("events",))["events"]
    got = (
        funnel_steps(ev, "user_id", "ts", "event_type", STEPS)
        .toPandas()
        .sort_values("key")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')"
    )
    want = (
        con.execute(funnel_oracle_sql("events", "user_id", "ts", "event_type", STEPS))
        .df()
        .sort_values("key")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ("key", "stage"):
        assert got[c].tolist() == want[c].tolist(), c
    for c in ("t1", "t2", "t3"):
        a = pd.to_datetime(got[c])
        b = pd.to_datetime(want[c])
        assert a.isna().equals(b.isna()), c
        assert (a.dropna() == b.dropna()).all(), c
    # over a full month of synthetic events every user completes the
    # chain (the GOLDEN fixture covers the discriminating cases); the
    # value of this test is the full-table timestamp parity above
    assert set(got["stage"]) <= {1, 2, 3}


def test_rejects_empty_steps(spark):
    with pytest.raises(ValueError):
        funnel_steps(spark.range(1), "id", "id", "id", ())


def test_plan_one_shuffle_no_window_no_python(spark):
    df = spark.createDataFrame(GOLDEN, ["u", "ts", "tp"])
    plan = (
        funnel_steps(df, "u", "ts", "tp", STEPS)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan
    assert "Python" not in plan  # the walk is a codegen HOF, not a UDF
