"""Edit-distance similarity join: DuckDB brute-force parity on real
testdata, a seeded random-mutation brute force that exercises the
prefix-filter theorem on the hard cases (short strings, empty string,
unicode, k up to 3), and plan shape."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest

from yodel_etl_spark.scale.stringsim import edit_pairs
from yodel_etl_spark.session import release


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein (Wagner-Fischer), for the brute force."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _spark_pairs(spark, df, k, q):
    out = edit_pairs(df, "v", k=k, q=q)
    got = sorted(
        (r["name_a"], r["name_b"], r["dist"], r["cnt_a"], r["cnt_b"])
        for r in out.collect()
    )
    release(out)
    return got


def _brute_pairs(values: list[str], k: int):
    from collections import Counter

    cnt = Counter(values)
    names = sorted(cnt)
    want = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            d = _lev(a, b)
            if d <= k:
                want.append((a, b, d, cnt[a], cnt[b]))
    return sorted(want)


def test_edit_pairs_matches_duckdb_on_part_names(spark, sf_oracle):
    """Exactness on real data: sf0.01 part.p_name (2,000 rows, heavy
    value repetition) vs DuckDB's levenshtein brute force at value
    grain."""
    df = spark.read.parquet(f"{sf_oracle}/part.parquet").select(
        pd_col := "p_name"
    ).withColumnRenamed(pd_col, "v")
    got = _spark_pairs(spark, df, k=1, q=2)
    want = sorted(
        duckdb.sql(
            f"""
            WITH v AS (SELECT p_name AS name, count(*) AS cnt
                       FROM read_parquet('{sf_oracle}/part.parquet')
                       GROUP BY p_name)
            SELECT a.name, b.name, levenshtein(a.name, b.name),
                   a.cnt, b.cnt
            FROM v a JOIN v b ON a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 1
            """
        ).fetchall()
    )
    want = [(a, b, int(d), int(ca), int(cb)) for a, b, d, ca, cb in want]
    assert got == want
    assert len(got) > 0  # the fixture genuinely contains near-dup names


@pytest.mark.parametrize("k,q", [(1, 2), (2, 2), (3, 2), (2, 3)])
def test_edit_pairs_random_mutations_exact(spark, k, q):
    """Prefix-filter exactness on adversarial synthetic values: seeded
    base words plus planted mutations (substitute/insert/delete), short
    strings, the empty string, and non-ASCII — results must equal the
    brute force for every (k, q)."""
    rng = random.Random(20260815 + 10 * k + q)
    alphabet = "abcdeé中 "
    base = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 9))) for _ in range(40)]
    values = list(base)
    for s in base:
        if rng.random() < 0.7 and s:
            i = rng.randrange(len(s))
            op = rng.choice(["sub", "ins", "del"])
            if op == "sub":
                values.append(s[:i] + rng.choice(alphabet) + s[i + 1 :])
            elif op == "ins":
                values.append(s[:i] + rng.choice(alphabet) + s[i:])
            else:
                values.append(s[:i] + s[i + 1 :])
    values += ["", "a", "ab"]  # the padding edge cases
    df = spark.createDataFrame(pd.DataFrame({"v": values}))
    assert _spark_pairs(spark, df, k, q) == _brute_pairs(values, k)


def test_edit_pairs_validation_and_plan(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": ["aa", "ab"]}))
    with pytest.raises(ValueError):
        edit_pairs(df, "v", k=0)
    with pytest.raises(ValueError):
        edit_pairs(df, "v", q=1)
    out = edit_pairs(df, "v", k=1, q=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # the gram-df order join
    release(out)


def test_entity_resolution_end_to_end(spark):
    """The ER chain the operator exists for: messy name variants →
    edit_pairs edge list → connected components → one canonical entity
    per variant cluster.  Chained variants (A~B~C where ed(A,C) > k)
    must still resolve to ONE entity through transitivity."""
    from yodel_etl_spark.scale.cluster import attach_components, connected_components

    rows = [
        # cluster 1: chain at k=1 (acme corp ~ acme corp. ~ acme corp.x)
        (1, "acme corp"),
        (2, "acme corp."),
        (3, "acme corp.x"),
        # cluster 2
        (4, "globex"),
        (5, "globexx"),
        # singleton
        (6, "initech"),
    ]
    df = spark.createDataFrame(rows, "id long, v string")
    pairs = edit_pairs(df, "v", k=1, q=2)
    # value-grain edges → id-grain entity map via the component of the NAME
    comp = connected_components(pairs, src="name_a", dst="name_b")
    resolved = attach_components(df, comp, "v", "entity")
    got = {r["id"]: r["entity"] for r in resolved.collect()}
    release(pairs)
    assert got[1] == got[2] == got[3]  # transitive closure
    assert got[4] == got[5]
    assert got[6] == "initech"  # singleton keeps its own name
    assert len({got[1], got[4], got[6]}) == 3
