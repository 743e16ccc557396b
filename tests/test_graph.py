"""PageRank: numpy power-iteration twin parity (same round count, same
arithmetic) on a hand-built graph with dangling nodes, weighted
duplicate edges and a hub; mass conservation; budgeted-mode semantics;
non-convergence raise."""

from __future__ import annotations

import numpy as np
import pytest

from yodel_etl_spark.scale.graph import pagerank


def _numpy_pagerank(edges, damping=0.85, n_rounds=15):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for u, _ in edges:
        deg[ix[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_rounds):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[ix[v]] += r[ix[u]] / deg[ix[u]]
        dm = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dm / n)
    return dict(zip(nodes, r))


EDGES = [
    # hub "a" linked by everyone; "e" dangling; duplicate edge b→a
    ("b", "a"),
    ("b", "a"),
    ("c", "a"),
    ("d", "a"),
    ("a", "b"),
    ("c", "d"),
    ("d", "e"),
]


def test_pagerank_matches_numpy_twin_fixed_rounds(spark):
    """Budgeted mode (tol=None, exactly k rounds) against the numpy
    twin truncated at the same k — identical update arithmetic, so
    agreement is to float-reduction noise, not algorithm tolerance."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, tol=None, max_iter=15).collect()
    }
    want = _numpy_pagerank(EDGES, n_rounds=15)
    assert set(got) == set(want)
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=1e-12), node
    # mass conserved every round; the hub out-ranks everything
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["a"] == max(got.values())


def test_pagerank_converged_mode(spark):
    """tol-mode stops early once the L1 delta contracts below tol and
    the result is round-count-insensitive from there (d^k geometry:
    1e-3 needs ~40 rounds at d=0.85)."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, tol=1e-3, max_iter=60).collect()
    }
    want = _numpy_pagerank(EDGES, n_rounds=500)  # effectively converged
    for node in want:
        assert got[node] == pytest.approx(want[node], abs=5e-3), node


def test_pagerank_nonconvergence_raises(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(RuntimeError, match="converge"):
        pagerank(df, tol=1e-15, max_iter=2)


def test_pagerank_warm_start_saves_rounds(spark):
    """The scheduled-refresh story: warm-starting from converged ranks
    reaches tolerance in a round budget that cold start provably cannot
    (Δ₀ is the graph drift, not the distance from uniform), and a stale
    entry and a missing node in the prior are normalized away.  The
    drift-refresh equivalence (two full convergences) lives in the
    opt-in stress suite."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    converged = pagerank(df, tol=1e-10, max_iter=200)

    # cold start cannot reach 1e-8 in 3 rounds on this graph...
    with pytest.raises(RuntimeError, match="converge"):
        pagerank(df, tol=1e-8, max_iter=3)
    # ...warm start does (the state is already at the fixed point)
    warm = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, tol=1e-8, max_iter=3, init_ranks=converged
        ).collect()
    }
    want = {r["node"]: r["rank"] for r in converged.collect()}
    assert warm.keys() == want.keys()
    assert all(abs(warm[k] - want[k]) < 1e-7 for k in want)
    assert abs(sum(warm.values()) - 1.0) < 1e-9

    # prior with a STALE node and a MISSING node still works: stale is
    # ignored, missing seeds at 1/n, vector renormalized.  (No round
    # saving claimed here — dropping a node's whole rank is a LARGE
    # delta, and L1 contracts only by d per round; the saving claim
    # above uses the exact fixed point where the budget math is clean.)
    messy_prior = converged.where("node <> 'e'").unionByName(
        spark.createDataFrame([("zombie.example", 0.4)], "node string, rank double")
    )
    warm2 = {
        r["node"]: r["rank"]
        for r in pagerank(
            df, tol=1e-6, max_iter=200, init_ranks=messy_prior
        ).collect()
    }
    assert "zombie.example" not in warm2
    assert warm2.keys() == want.keys()
    assert all(abs(warm2[k] - want[k]) < 1e-5 for k in want)
