"""Link-graph centrality for crawl curation: PageRank by power
iteration over a (src, dst) edge list.

Why it is a training-data-pipeline operator: web-scale corpus curation
ranks DOMAINS before it ranks documents — a link-graph centrality score
over the host graph is the standard quality prior (Common Crawl
publishes exactly this as its host-level ranking; the curation recipe
"keep pages from well-linked hosts" needs it as an input column).  The
host graph is millions of nodes where the page graph is billions, so
the iterative join runs at the small grain — but the shape below holds
at either.

Scale shape (per iteration, the classic formulation):
  * contributions: ranks ⋈ out-degree (narrow, same key) then ⋈ edges
    on ``src`` — the one data-sized shuffle, keyed by ``dst`` for the
    sum; out-degrees are computed ONCE before the loop;
  * dangling mass (nodes with no out-links) and the teleport term are
    a ONE-ROW aggregate broadcast into the update — no node ever
    enumerates "all nodes";
  * every round ``localCheckpoint``s the new rank vector (lazy — the
    convergence probe is the action that materializes it, the
    ``cluster.connected_components`` pattern), so lineage stays one
    round deep instead of compounding joins;
  * convergence = L1 delta below ``tol`` (one tiny agg over the
    node-grain join of old vs new ranks, piggybacked on the same probe).

Ranks sum to 1 at every iteration (teleport + dangling redistribution
conserve mass); floating sums make the result deterministic only to
shuffle-order ULPs, so this is a pytest-verified (numpy power-iteration
twin) operator, not an oracle-hash query — the same contract as k-means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.session import register_persisted


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    tol: float | None = 1e-6,
    max_iter: int = 120,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """``(node, rank)`` for every node appearing in ``edges``; ranks
    sum to 1.  Duplicate edges are weighted (a host linking twice
    contributes twice — collapse upstream with ``distinct()`` for the
    unweighted form); self-loops count like any edge.  Raises if the
    L1 delta has not reached ``tol`` within ``max_iter`` rounds.

    ``tol=None`` runs EXACTLY ``max_iter`` rounds with no convergence
    requirement — the budgeted form a scheduled pipeline uses; L1
    contracts by the damping factor per round, so the error after k
    rounds is bounded by d^k · Δ₀ a priori.  Note the geometry: d=0.85
    needs ~90 rounds for 1e-6, so ``tol``-mode callers size
    ``max_iter`` from ``ln(tol)/ln(d)``, not optimism.

    ``init_ranks`` — a prior ``(node, rank)`` table — WARM-STARTS the
    iteration: the per-day refresh hands in yesterday's converged ranks
    and pays only for the drift the day's new edges introduced (Δ₀ is
    the graph delta, not the distance from uniform — tests pin the
    round-count saving).  Nodes absent from ``init_ranks`` (new hosts)
    start at ``1/n``; stale entries for nodes no longer in the graph
    are ignored; the vector is re-normalized to sum 1 so yesterday's
    ranks over a slightly different node set remain a valid start."""
    # persist the narrow (u, v) list: every round's contrib join (plus
    # nodes and outdeg) re-reads it, and the caller's edge PRODUCER can
    # be an arbitrarily deep plan (the crawl chain measured 8 full
    # upstream re-evaluations — 20 s — without this; with it the
    # producer runs once and rounds join the materialized pairs)
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .persist()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()  # also materializes the persist
    outdeg = e.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    # node-grain state the loop re-joins every round: (node, deg, rank);
    # deg is NULL for dangling nodes
    base = nodes.join(outdeg, "node", "left")
    if init_ranks is None:
        state = base.withColumn("rank", F.lit(1.0 / n))
    else:
        prior = init_ranks.select(
            F.col("node"), F.col("rank").alias("_warm")
        )
        seeded = base.join(prior, "node", "left").withColumn(
            "_warm", F.coalesce(F.col("_warm"), F.lit(1.0 / n))
        )
        total = seeded.agg(F.sum("_warm").alias("t"))
        state = (
            seeded.crossJoin(F.broadcast(total))  # 1-row bound → broadcast
            .select(
                "node", "deg", (F.col("_warm") / F.col("t")).alias("rank")
            )
        )
    # round 1 reads the initial state three times (contrib join,
    # dangling agg, state join): the probing path pins it in the
    # CacheManager (unpersisted per round below); the budgeted path
    # uses the same lazy-checkpoint form as its round states so
    # nothing outlives the loop unreleased
    state = state.localCheckpoint(eager=False) if tol is None else state.persist()
    d = float(damping)
    for _ in range(max_iter):
        contrib = (
            state.where(F.col("deg").isNotNull())
            .join(e, state["node"] == e["u"])
            .select(F.col("v").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = state.agg(
            F.coalesce(
                F.sum(F.when(F.col("deg").isNull(), F.col("rank"))), F.lit(0.0)
            ).alias("dm")
        )
        rank_next = (
            F.lit((1.0 - d) / n)
            + F.lit(d)
            * (F.coalesce(F.col("contrib"), F.lit(0.0)) + F.col("dm") / n)
        ).alias("rank")
        core = state.join(contrib, "node", "left").crossJoin(
            F.broadcast(dangling)  # 1-row bound → broadcast
        )
        if tol is None:
            # BUDGETED mode runs exactly max_iter rounds — no
            # convergence probe, so the per-round delta aggregation
            # and its driver collect are pure overhead: each round
            # chains off the previous round's (lazy) localCheckpoint
            # and the caller's first action materializes the chain.
            # Rank arithmetic is identical to the probing path.  The
            # checkpoint still truncates lineage to one round (without
            # it every round reads state three times — contrib join,
            # dangling agg, state join — and the plan would grow 3^k),
            # and its MEMORY_AND_DISK storage makes each round's state
            # compute once even with three consumers.  Round states
            # are freed by the context cleaner as the loop drops their
            # references (max_iter node-grain frames transiently).
            state = core.select("node", "deg", rank_next).localCheckpoint(
                eager=False
            )
            continue
        new_state = core.select(
            "node", "deg", rank_next, F.col("rank").alias("_prev")
        ).localCheckpoint(eager=False)
        # the ONE action per round: materializes the checkpoint and
        # reads the convergence delta off the same frame
        delta = new_state.agg(F.sum(F.abs(F.col("rank") - F.col("_prev")))).collect()[
            0
        ][0]
        state.unpersist()
        state = new_state.drop("_prev").persist()
        if delta < tol:
            break
    else:
        if tol is not None:
            nodes.unpersist()
            state.unpersist()
            e.unpersist()
            raise RuntimeError(
                f"pagerank did not converge to L1 {tol} in {max_iter} rounds"
            )
    out = state.select("node", "rank")
    nodes.unpersist()
    # the cached edge list and final state belong to the CALLER's
    # lifetime now (the daily-refresh path calls pagerank repeatedly in
    # one session — unregistered, each call would leak its edge cache)
    return register_persisted(out, e, state)
