"""Near-duplicate clustering: distributed connected components over
candidate pairs, plus canonical-document selection.

The reference's dedup surface stops at pair generation; a training-data
pipeline needs the next stage — group mutually-similar documents into
clusters (the transitive closure of the pair relation) and keep ONE
canonical representative per cluster.  This module is that stage,
engine-native:

* ``connected_components`` — alternating large-star / small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14): each round is two narrow groupBy-min + join passes over the
  edge list, and the edge set provably converges to component stars in
  O(log² n) rounds (O(log n) in practice).  Plain min-label propagation
  needs O(diameter) rounds — a 10k-long chain of near-dup docs (the
  classic template-spam shape) would take 10k shuffles; star contraction
  takes ~15.  Every round ``localCheckpoint``s the narrow edge list so
  the lineage (and the plan Catalyst must optimize) stays O(1) deep
  instead of O(rounds).

* ``attach_components`` / ``dedup_keep_canonical`` — join the component
  map back to the corpus.  Only ids shuffle, never documents; singleton
  docs never enter the component map at all (they are the left-anti
  survivors), so the join side scales with |dup pairs|, not |corpus|.

Works on any orderable id type (long, string, …) — the algorithm needs
only a total order on node ids.  Component id = min node id in the
component, so output is deterministic for the driver's value-hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dedup_edges(e: DataFrame) -> DataFrame:
    """Drop self-loops + duplicate edges (the star steps can emit both)."""
    return e.where(F.col("u") != F.col("v")).distinct()


def _sym(e: DataFrame) -> DataFrame:
    """Both orientations of every edge as ONE generator node.

    ``union(e, e.swapped)`` embeds the child plan TWICE; across an
    iterative algorithm that doubles the tree Catalyst must re-analyze
    per round, and driver-side plan work is a real cost at interactive
    scale (measured ~0.6 s/round on this loop's plans).  The explode
    form keeps a single child and emits the same two rows per edge."""
    pair = F.array(
        F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
        F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
    )
    return e.select(F.explode(pair).alias("e")).select("e.u", "e.v")


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every LARGER neighbor to u's min
    neighborhood label m(u) = min(Γ(u) ∪ {u}).

    Window form: ``min(v) over (partition by u)`` attaches the group
    minimum to every edge in ONE exchange — the groupBy+self-join form
    shuffles the symmetric edge list twice for the same result.  Output
    may contain duplicate edges but never self-loops (m ≤ u < v), and
    duplicates are harmless to the next min pass, so the per-round
    distinct runs once, after small-star (see connected_components)."""
    m = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    return (
        _sym(e)
        .withColumn("m", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _is_star_set(e: DataFrame) -> bool:
    """Exact structural convergence test: a deduped edge set is a valid
    min-rooted component map ⟺ it is a disjoint union of stars with
    minimum-id centers, i.e.

      (1) every edge points downward (``v < u`` — the center is the
          minimum),
      (2) every source has exactly ONE distinct target (a leaf pointing
          at two roots would leave two components unmerged), and
      (3) no node is both a source and a target (no chains).

    Checking the CURRENT edge set replaces the run-until-unchanged
    probe, which needed one extra full contraction round (two star
    passes + a set difference) purely to confirm the fixpoint.  All
    three conditions fold into ONE probe job: a union tags each edge's
    endpoints with source/target roles, a per-node aggregate collects
    (distinct targets, was-source, was-target, any-upward-edge), and a
    global aggregate reduces the violations to one row."""
    vt = e.schema["v"].dataType.simpleString()
    role_pair = F.array(
        F.struct(
            F.col("u").alias("node"),
            F.lit(1).alias("src"),
            F.lit(0).alias("tgt"),
            F.col("v").alias("tgt_node"),
            (F.col("v") > F.col("u")).cast("int").alias("up"),
        ),
        F.struct(
            F.col("v").alias("node"),
            F.lit(0).alias("src"),
            F.lit(1).alias("tgt"),
            F.lit(None).cast(vt).alias("tgt_node"),
            F.lit(0).alias("up"),
        ),
    )
    # single-generator form of the two-role union (see _sym for why)
    roles = e.select(F.explode(role_pair).alias("r")).select("r.*")
    per_node = roles.groupBy("node").agg(
        F.count_distinct("tgt_node").alias("k"),  # distinct targets as a source
        F.max("src").alias("is_src"),
        F.max("tgt").alias("is_tgt"),
        F.max("up").alias("up"),
    )
    row = per_node.agg(
        F.max(
            (
                (F.col("k") > 1)  # source with two roots
                | ((F.col("is_src") == 1) & (F.col("is_tgt") == 1))  # chain node
                | (F.col("up") == 1)  # upward edge (root not the minimum)
            ).cast("int")
        ).alias("bad")
    ).first()
    # bad is NULL on an empty edge set — the empty set IS a disjoint
    # union of stars, and folding that case here lets the caller skip a
    # dedicated isEmpty() pre-flight job.
    return row["bad"] is None or row["bad"] == 0


def _small_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every SMALLER-or-equal neighbor (and u
    itself) to m(u) = min(Γ≤(u) ∪ {u}).

    Same window rewrite as :func:`_large_star` — one exchange instead of
    groupBy + self-join.  Each down-edge (u, v) emits its moved form
    (v, m) and its kept form (u, m) through one generator (no
    plan-doubling union); ``distinct`` is deferred to the caller's
    single per-round pass."""
    down = _sym(e).where(F.col("v") < F.col("u"))  # edges pointing to smaller ids
    withm = down.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    both = F.array(
        F.struct(F.col("v").alias("u"), F.col("m").alias("v")),  # moved
        F.struct(F.col("u").alias("u"), F.col("m").alias("v")),  # kept
    )
    return withm.select(F.explode(both).alias("e")).select("e.u", "e.v")


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Component map ``(node, component)`` for every node that appears in
    ``pairs``; component = min node id reachable through the pair graph.

    Alternating large-star/small-star contraction.  Convergence is
    detected structurally (:func:`_is_star_set` — exact, ONE probe job
    over the narrow checkpointed edge list).  The loop contracts
    BEFORE its first check: candidate-pair graphs (LSH band output)
    are essentially never star-shaped on arrival, and a contraction of
    an already-converged star set is the identity, so the reorder
    saves one probe on the common path at zero correctness cost.
    ``max_iter`` is a hard cap far above the
    O(log² n) bound (2^25 nodes per component before it binds); hitting
    it raises rather than returning a half-contracted map.

    Nodes NOT in any pair (singletons) are intentionally absent — the
    map scales with the duplicate-pair graph, not the corpus.  Use
    ``attach_components`` to default them to their own id.
    """
    # No checkpoint on the input edge list: only round 1 ever reads it
    # (round 2+ and the final star read round checkpoints), so a
    # checkpoint here would buy nothing and cost an extra physical-
    # planning pass + shuffle-file write.
    edges = _dedup_edges(
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
            F.col(src).isNotNull() & F.col(dst).isNotNull()
        )
    )

    for _ in range(max_iter):
        # One ACTION per round: every localCheckpoint is LAZY, so the
        # round's convergence probe is the job that materializes the
        # input checkpoint and the round's edge set in one go (the r4
        # shape ran an eager checkpoint job + a probe job + an isEmpty
        # pre-flight; on the common converges-in-one-round candidate
        # graph that was 3 scheduler round-trips where 1 suffices —
        # _is_star_set treats the empty set as converged, which is what
        # subsumes the isEmpty job).  One distinct per round, after both
        # star passes — the stars emit no self-loops and duplicate edges
        # are transparent to their min aggregations, so the intermediate
        # _dedup_edges bought nothing but an extra exchange.
        edges = _dedup_edges(_small_star(_large_star(edges))).localCheckpoint(
            eager=False
        )
        if _is_star_set(edges):
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "raise max_iter (component span > 2^max_iter nodes is required "
            "to hit this)"
        )

    # Fixpoint edges form stars: every non-root points at its component
    # root (the min id).  Roots map to themselves.
    members = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node")).distinct()
    return members.unionByName(
        roots.select("node", F.col("node").alias("component"))
    )


def extend_components(
    prev: DataFrame,
    new_pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Fold a batch of NEW near-dup pairs into an existing ``(node,
    component)`` map without recomputing from the full pair history —
    the cluster-maintenance leg of the incremental dedup loop (the
    persisted MinHash/Hamming indexes admit documents batch by batch;
    their probes emit exactly the cross-batch pairs this consumes).

    The previous map's non-root rows ARE already-contracted star edges
    ``(node → component)``; union them with the new pairs and re-run
    the star contraction.  Transitive closure is associative, so the
    result equals ``connected_components`` over every pair ever seen
    (parity pinned in tests) — but the work tracks the DELTA: a star
    set is a contraction fixpoint, so rounds scale with the reach of
    the new edges (how many old components they chain together), not
    with history size, and the shuffled edge list is |map| + |batch|
    rows of two ids, not the full pair history.  At 100 TB the pair
    history is unboundedly larger than the component map (every batch
    contributes pairs; the map has one row per clustered doc), which is
    the same persist-the-contraction argument as the index family's
    never-re-tokenize rule.

    Roots and singletons in ``prev`` survive untouched batches: true
    singletons (component == node, no members) produce no star edge and
    are re-attached after the contraction."""
    prev_edges = prev.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(src), F.col("component").alias(dst)
    )
    merged = connected_components(
        prev_edges.unionByName(new_pairs.select(src, dst)), src, dst, max_iter
    )
    alone = prev.select("node").join(merged.select("node"), "node", "left_anti")
    return merged.unionByName(
        alone.select("node", F.col("node").alias("component"))
    )


def _map_fs(spark, path: str):
    """Hadoop FileSystem handle for the map root (the same client the
    index existence checks use — local FS in tests, HDFS/S3 at scale)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), p, jvm


def latest_component_version(spark, path: str) -> int:
    """Highest COMPLETE snapshot version under ``path`` (``map_vN``
    directories carrying Spark's ``_SUCCESS`` marker; incomplete
    write-crash leftovers are invisible), 0 when none exists."""
    fs, p, jvm = _map_fs(spark, path)
    if not fs.exists(p):
        return 0
    best = 0
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("map_v") and name[5:].isdigit():
            if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
                best = max(best, int(name[5:]))
    return best


def read_component_map(spark, path: str) -> DataFrame | None:
    """Latest complete ``(node, component)`` snapshot, or None before
    the first fold."""
    v = latest_component_version(spark, path)
    if v == 0:
        return None
    return spark.read.parquet(f"{path}/map_v{v}")


def update_component_map(
    spark,
    path: str,
    new_pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    writer_token: str | None = None,
) -> int:
    """Fold ``new_pairs`` into the persisted component map at ``path``
    and return the new snapshot version — the durable form of
    :func:`extend_components`, maintained batch-by-batch by the ingest
    gates alongside their corpus/index writes.

    Crash contract (versioned snapshots, never overwrite-in-place): the
    new map lands as ``map_v{N+1}`` and readers key on the ``_SUCCESS``
    marker, so a crash mid-write leaves ``map_vN`` the visible truth
    and the at-least-once replay simply re-folds the same pairs
    (transitive closure is idempotent over repeated edges — the replay
    converges to the identical map, possibly under a higher version
    number).  Older complete snapshots are pruned only AFTER the new
    one is fully written.  Scale shape: the map has one row per
    CLUSTERED doc — unboundedly smaller than the pair history — and the
    fold's shuffle carries |map| + |batch| id pairs (see
    :func:`extend_components`).

    SINGLE WRITER PER PATH — the contract every gate sharing a
    ``components_path`` must honor (one stream per map; fan multiple
    streams into one logical map by unioning their pair sources into
    one gate, not by pointing two gates at one path).  Two concurrent
    folds would both read version v and both target ``map_v{v+1}``
    with mode=overwrite, clobbering each other file-by-file — the
    losing batch is already committed upstream and never replayed, so
    its edges would vanish from the visible map silently.  Detection
    is layered, pre-write: (a) an exclusive CLAIM marker
    (``.claim_v{v+1}``, ``fs.create(overwrite=False)`` — atomic
    create-exclusive on HDFS; check-then-create on local FS / object
    stores) makes the second claimer raise instead of clobbering;
    (b) a post-claim READ-BACK verifies the claim still carries OUR
    token — two same-instant check-then-create "successes" leave the
    last writer's token in the file, so the loser detects itself
    (tokenless writers are indistinguishable this way: both claims are
    empty — the gates always pass tokens; and a racer whose
    check-create gap straddles our ENTIRE create→read-back sequence
    evades the pre-write check — that preemption-length sliver is
    caught post-write by re-reading the claim after the snapshot
    lands: changed hands ⇒ raise and replay); (c) a completed-target
    probe (``map_v{v+1}/_SUCCESS`` exists while we hold the claim)
    catches the stale-read interleaving where the prior writer already
    finished v+1 AND released its claim before we read ``latest`` —
    the fold releases its claim and refuses rather than overwrite the
    finished snapshot's edges.  The cross-version half is re-checked
    post-write from the listing before pruning (a complete snapshot
    NEWER than the one this fold wrote means a racer folded from a map
    missing our edges — raise instead of pruning).  Single-writer
    cost: one create, one read-back, two existence probes and one
    delete namenode op per fold, no extra Spark job.

    Claim lifecycle: the claim is deleted after the snapshot's
    ``_SUCCESS`` lands, and claims whose target version is already
    complete are provably dead (their writer finished) — the prune
    removes them, so a crash between snapshot completion and claim
    delete self-heals on the next fold.  The one ambiguous state is a
    claim whose target is INCOMPLETE: a live concurrent writer and a
    crashed fold's leftover are indistinguishable without leases.

    ``writer_token`` resolves that ambiguity for the common case — the
    gate's own crashed-batch replay.  The token names the LOGICAL
    write (the gates pass ``{corpus_path}#{batch_id}``; Structured
    Streaming replays a failed batch under the SAME batch id from the
    checkpoint) and is stored as the claim's content.  On collision,
    a claim carrying OUR token is our own crashed attempt — take it
    over and proceed, restoring the fully-automatic at-least-once
    replay.  Any other content (a different gate's token, a different
    batch, or empty — the claim-created-but-not-yet-written crash
    sliver) raises: two concurrent writers necessarily carry different
    tokens, so detection is not weakened.  Without a token the
    collision always raises with the manual recovery in the message
    (confirm no live writer, delete the printed claim file, re-run;
    the re-fold converges to the identical map)."""
    v = latest_component_version(spark, path)
    prev = None if v == 0 else spark.read.parquet(f"{path}/map_v{v}")
    if prev is None:
        new_map = connected_components(new_pairs, src, dst, max_iter)
    else:
        new_map = extend_components(prev, new_pairs, src, dst, max_iter)
    fs, p, jvm = _map_fs(spark, path)
    claim = jvm.org.apache.hadoop.fs.Path(f"{path}/.claim_v{v + 1}")

    def take_claim() -> None:
        # atomic create-exclusive: the ONLY writer whose create
        # succeeds owns map_v{v+1} (parents auto-created on first
        # fold); the token lands in the same single FS op stream
        out = fs.create(claim, False)
        try:
            if writer_token is not None:
                out.write(bytearray(writer_token.encode("utf-8")))
        finally:
            out.close()

    def read_claim() -> str | None:
        try:
            stream = fs.open(claim)
        except Exception:
            return None  # vanished between probe and open
        try:
            return bytes(stream.readAllBytes()).decode("utf-8", "replace")
        finally:
            stream.close()

    def collision_error() -> RuntimeError:
        done = fs.exists(
            jvm.org.apache.hadoop.fs.Path(f"{path}/map_v{v + 1}/_SUCCESS")
        )
        state = (
            "its snapshot is already COMPLETE (this fold read a "
            "stale version and must re-fold)"
            if done
            else "its snapshot is incomplete (a live concurrent "
            "writer, or a crashed fold's leftover — confirm no "
            "writer is live, delete the claim file, and re-run; "
            "the re-fold converges to the identical map)"
        )
        return RuntimeError(
            f"concurrent component-map writers detected at {path!r}: "
            f"map_v{v + 1} is claimed by another fold and {state}; "
            "the map path has a single-writer contract (see "
            "update_component_map)"
        )

    reclaimed = False
    while True:
        try:
            take_claim()
            break
        except Exception as exc:
            if not fs.exists(claim):
                raise exc
            held = read_claim() if writer_token is not None else None
            if held is not None and held == writer_token and not reclaimed:
                # our own crashed attempt's leftover (same logical write
                # — Structured Streaming replays a failed batch under
                # the same batch id): take over and let the re-fold
                # converge.  The delete-then-recreate is NOT atomic, so
                # loop back through this same collision handling — a
                # racer claiming in the gap lands in the documented
                # error below instead of a raw create failure; the
                # one-takeover bound also catches a twin process
                # replaying the same batch id (same token), which is
                # itself a second writer
                reclaimed = True
                fs.delete(claim, False)
                continue
            raise collision_error() from None
    # post-claim guards, one FS read + one existence probe per fold:
    # (1) read-back — create-exclusive is check-then-create on local FS
    # and object stores, so two same-instant creates can BOTH report
    # success; the claim file's content is the last writer's token, and
    # a mismatch means we lost that race (do NOT delete the claim: it
    # is the winner's).  Only token-carrying writers are
    # distinguishable this way — two tokenless writers both write empty
    # claims (the gates always pass tokens).
    if writer_token is not None and read_claim() != writer_token:
        raise collision_error() from None
    # (2) completed-target probe — the stale-read interleaving: a prior
    # writer completed map_v{v+1} AND pruned its claim before we read
    # `latest`, so our create succeeded legitimately but our fold is
    # based on a stale version and would clobber its edges.  Release
    # OUR claim (ownership just verified) and refuse before writing.
    if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{path}/map_v{v + 1}/_SUCCESS")):
        fs.delete(claim, False)
        raise RuntimeError(
            f"stale component-map fold at {path!r}: map_v{v + 1} is "
            "already complete — this fold read latest=v before that "
            "snapshot landed and would overwrite its edges; re-run to "
            "fold from the current map (the re-fold converges)"
        )
    new_map.write.mode("overwrite").parquet(f"{path}/map_v{v + 1}")
    # post-write ownership re-check (one FS read): a racer whose
    # check-then-create straddled our whole create→read-back sequence
    # (a preemption-length sliver) passes the pre-write read-back on
    # its own token and overwrites our snapshot mid-fold — if the
    # claim no longer carries OUR token after the write, a takeover
    # happened during the fold: raise so the batch replays and
    # re-folds instead of silently losing edges
    if writer_token is not None and read_claim() != writer_token:
        raise RuntimeError(
            f"concurrent component-map writers detected at {path!r}: "
            f"the claim on map_v{v + 1} changed hands DURING this "
            "fold's snapshot write — a racing writer overwrote the "
            "snapshot; re-run to re-fold (the map path has a "
            "single-writer contract, see update_component_map)"
        )
    # retention window of ONE: keep v alongside the new v+1 so a lazy
    # reader that resolved v before this fold never loses its files
    # mid-scan (read_component_map returns an unevaluated plan); only
    # strictly older snapshots prune.  ONE listing drives the race
    # check, the snapshot prune AND the dead-claim prune — only dirs/
    # files that actually exist are deleted (a blind range(1, v)
    # delete is O(v²) no-op namenode/object-store RPCs over a
    # long-lived stream).
    latest = 0
    versions: list[int] = []
    claims: list[int] = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("map_v") and name[5:].isdigit():
            i = int(name[5:])
            versions.append(i)
            if fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")):
                latest = max(latest, i)
        elif name.startswith(".claim_v") and name[8:].isdigit():
            claims.append(int(name[8:]))
    if latest > v + 1:
        raise RuntimeError(
            f"concurrent component-map writers detected at {path!r}: this "
            f"fold wrote map_v{v + 1} but map_v{latest} is already "
            "complete — a racing writer folded from a snapshot missing "
            "this batch's edges; the map path has a single-writer "
            "contract (see update_component_map)"
        )
    for i in versions:
        if i < v:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/map_v{i}"), True)
    for i in claims:
        # a claim whose target version is ≤ the complete latest is
        # provably dead (its writer finished or was superseded) —
        # including THIS fold's own claim, released here after its
        # snapshot's _SUCCESS landed
        if i <= latest:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/.claim_v{i}"), False)
    return v + 1


def attach_components(
    df: DataFrame,
    components: DataFrame,
    id_col: str,
    component_col: str = "component",
) -> DataFrame:
    """``df`` + a ``component`` column; rows absent from the component
    map (singletons) get their own id.  Broadcast-or-shuffle is left to
    AQE: the component map is usually a small fraction of the corpus."""
    comp = components.select(
        F.col("node").alias(id_col), F.col("component").alias(component_col)
    )
    return df.join(comp, id_col, "left").withColumn(
        component_col, F.coalesce(F.col(component_col), F.col(id_col))
    )


def dedup_keep_canonical(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Corpus with every non-canonical near-duplicate removed: one doc
    per component (the min id) plus every singleton, via a single
    left-anti join on the non-root member ids — only ids shuffle, and
    the anti side is |members| - |clusters| rows, not |corpus|."""
    comp = connected_components(pairs, src, dst, max_iter)
    drop = comp.where(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, id_col, "left_anti")
