"""Connected-components clustering: union-find parity, convergence on
pathological graph shapes, canonical selection."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.cluster import (
    attach_components,
    connected_components,
    dedup_keep_canonical,
)


def union_find(edges: list[tuple], nodes: set | None = None) -> dict:
    """Driver-side oracle: component = min reachable node id."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for n in (a, b):
            parent.setdefault(n, n)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for n in nodes or ():
        parent.setdefault(n, n)
    return {n: find(n) for n in parent}


def _cc_dict(spark, edges, **kw):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = connected_components(df, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


def test_two_triangles_and_bridge(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10)]
    assert _cc_dict(spark, edges) == union_find(edges)


def test_random_graphs_match_union_find(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(80 + 40 * trial)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        assert _cc_dict(spark, edges) == union_find(edges), f"trial {trial}"


def test_chain_converges_in_log_rounds(spark):
    # A 200-node path has diameter 199: min-label propagation would need
    # ~199 rounds; star contraction must finish within the log² bound —
    # max_iter=12 would already fail a linear-round algorithm.
    edges = [(i, i + 1) for i in range(199)]
    got = _cc_dict(spark, edges, max_iter=12)
    assert got == {i: 0 for i in range(200)}


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "doc_a string, doc_b string"
    )
    out = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


def test_empty_and_self_loops(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty).count() == 0
    loops = spark.createDataFrame([(1, 1), (2, 2)], "doc_a long, doc_b long")
    assert connected_components(loops).count() == 0


def test_attach_components_defaults_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    comp = connected_components(
        spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    )
    got = {
        r["doc_id"]: r["component"]
        for r in attach_components(docs, comp, "doc_id").collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5}


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(8)], "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 5), (5, 7), (2, 3)], "doc_a long, doc_b long")
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs, "doc_id").collect()
    )
    # clusters {1,5,7}->keep 1, {2,3}->keep 2; singletons 0,4,6 kept
    assert kept == [0, 1, 2, 4, 6]


def test_registered_query_matches_union_find_on_real_pairs(spark, sf_small):
    """ccomp == union-find over the (oracle-checked elsewhere)
    MinHash-LSH pair list at test SF."""
    from yodel_etl_spark.registry import load_all
    from yodel_etl_spark.scale.dedup import minhash_lsh_pairs
    from yodel_etl_spark.session import load_tables

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    ]
    if not pairs:
        pytest.skip("no planted near-dups at this SF")
    uf = union_find(pairs)
    want: dict = {}
    for node, comp in uf.items():
        want.setdefault(comp, []).append(node)
    expected = {
        (comp, len(ns), ",".join(sorted(str(n) for n in ns)))
        for comp, ns in want.items()
    }
    got = {
        (r["component"], r["cluster_size"], r["members"])
        for r in load_all()["ccomp"].build(spark, sf_small).collect()
    }
    assert got == expected


def test_extend_components_equals_full_recompute_random(spark):
    """Incremental maintenance parity: folding a second batch of pairs
    into a previous component map must equal one recompute over the
    union of all pairs (transitive-closure associativity), across
    random two-batch splits including cross-batch chains and merges of
    previously-distinct components."""
    from yodel_etl_spark.scale.cluster import extend_components

    rng = random.Random(77)
    for trial in range(6):
        n = rng.randint(6, 28)
        all_edges = [
            (rng.randint(0, n), rng.randint(0, n))
            for _ in range(rng.randint(4, 40))
        ]
        cut = rng.randint(0, len(all_edges))
        b1, b2 = all_edges[:cut], all_edges[cut:]
        prev = connected_components(
            spark.createDataFrame(b1 or [(0, 0)], "doc_a long, doc_b long")
        )
        out = extend_components(
            prev, spark.createDataFrame(b2 or [(0, 0)], "doc_a long, doc_b long")
        )
        got = {r["node"]: r["component"] for r in out.collect()}
        # nodes appearing ONLY in self-loops never enter the map — the
        # documented connected_components contract (singletons absent)
        real = [e for e in all_edges if e[0] != e[1]]
        want = union_find(real) if real else {}
        assert got == want, f"trial {trial}"


def test_extend_components_merges_two_old_components_and_keeps_singletons(spark):
    from yodel_etl_spark.scale.cluster import extend_components

    b1 = [(1, 2), (2, 3), (10, 11)]  # comps {1,2,3}, {10,11}
    prev = connected_components(spark.createDataFrame(b1, "doc_a long, doc_b long"))
    # prev maps in the wild carry explicit singleton rows (an earlier
    # extend's re-attach, or attach_components' defaults) — plant one
    prev = prev.unionByName(spark.createDataFrame([(20, 20)], "node long, component long"))
    # new batch bridges the two components; 20 is untouched
    out = extend_components(
        prev, spark.createDataFrame([(3, 11)], "doc_a long, doc_b long")
    )
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 20: 20}


def test_extend_components_converges_fast_on_star_history(spark):
    """The delta-cost claim: a previous map is a contraction fixpoint,
    so extending with a SMALL batch must converge within a couple of
    rounds even when history is a long chain that originally took
    O(log n) rounds — max_iter=3 would fail a from-scratch recompute of
    the chain but passes the incremental fold."""
    from yodel_etl_spark.scale.cluster import extend_components

    chain = [(i, i + 1) for i in range(64)]  # needs ~log2(65) ≈ 6+ rounds
    with pytest.raises(RuntimeError):
        connected_components(
            spark.createDataFrame(chain, "doc_a long, doc_b long"), max_iter=2
        )
    prev = connected_components(
        spark.createDataFrame(chain, "doc_a long, doc_b long")
    )
    out = extend_components(
        prev,
        spark.createDataFrame([(100, 101), (101, 0)], "doc_a long, doc_b long"),
        max_iter=3,
    )
    got = {r["node"]: r["component"] for r in out.collect()}
    assert all(v == 0 for v in got.values())
    assert set(got) == set(range(65)) | {100, 101}


def test_component_map_versioned_roundtrip(spark, tmp_path):
    """update_component_map standalone (outside the ingest gates):
    first fold == connected_components, later folds extend, old
    complete snapshots are pruned after the new one lands, and
    read/latest agree on the newest _SUCCESS-complete version."""
    import os

    from yodel_etl_spark.scale.cluster import (
        connected_components,
        latest_component_version,
        read_component_map,
        update_component_map,
    )

    path = str(tmp_path / "cmap")
    assert latest_component_version(spark, path) == 0
    assert read_component_map(spark, path) is None

    p1 = spark.createDataFrame([(1, 2), (3, 4)], "doc_a long, doc_b long")
    assert update_component_map(spark, path, p1) == 1
    got = {
        r["node"]: r["component"]
        for r in read_component_map(spark, path).collect()
    }
    want = {
        r["node"]: r["component"] for r in connected_components(p1).collect()
    }
    assert got == want == {1: 1, 2: 1, 3: 3, 4: 3}

    p2 = spark.createDataFrame([(2, 3), (7, 8)], "doc_a long, doc_b long")
    assert update_component_map(spark, path, p2) == 2
    got = {
        r["node"]: r["component"]
        for r in read_component_map(spark, path).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7}
    # retention window of ONE: v1 survives the v2 fold (a lazy reader
    # that resolved v1 must not lose its files mid-scan), and only
    # strictly older snapshots prune on the next fold
    vers = sorted(d for d in os.listdir(path) if d.startswith("map_v"))
    assert vers == ["map_v1", "map_v2"]
    p3 = spark.createDataFrame([(8, 9)], "doc_a long, doc_b long")
    assert update_component_map(spark, path, p3) == 3
    vers = sorted(d for d in os.listdir(path) if d.startswith("map_v"))
    assert vers == ["map_v2", "map_v3"]


def test_component_map_detects_cross_version_writer_race(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 (single-writer contract): when a racing writer lands
    a COMPLETE snapshot newer than the one this fold wrote (it folded
    from a map that misses this batch's edges), the fold must raise
    instead of silently pruning — surfacing the two-gates-one-path
    misconfiguration.  (The same-version half, undetectable when this
    test was written, is detected since r13 by the exclusive claim
    marker — see test_component_map_detects_same_version_writer_race;
    this race still exercises the cross-version listing check because
    the racer's map_v3 lands AFTER our claim on v2 succeeded.)"""
    import pytest

    from yodel_etl_spark.scale import cluster as C

    path = str(tmp_path / "cmap")
    p1 = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    assert C.update_component_map(spark, path, p1) == 1

    real_extend = C.extend_components

    def racing_extend(prev, new_pairs, *a, **k):
        # the racing writer completes map_v3 while our fold computes
        out = real_extend(prev, new_pairs, *a, **k)
        spark.createDataFrame(
            [(9, 9)], "node long, component long"
        ).write.mode("overwrite").parquet(f"{path}/map_v3")
        return out

    monkeypatch.setattr(C, "extend_components", racing_extend)
    p2 = spark.createDataFrame([(3, 4)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="single-writer"):
        C.update_component_map(spark, path, p2)
    # nothing pruned on the refusal path: both complete snapshots and
    # the replayable truth (map_v3, the racer's) are intact
    import os

    vers = sorted(d for d in os.listdir(path) if d.startswith("map_v"))
    assert vers == ["map_v1", "map_v2", "map_v3"]


def test_component_map_prune_skips_missing_versions(spark, tmp_path):
    """The prune walks the LISTING, not range(1, v): with a hole in the
    version sequence (v1 pruned long ago), a later fold deletes only
    the snapshot dirs that exist — the O(v²) blind-delete RPC pattern
    is gone and behavior is unchanged."""
    import os

    from yodel_etl_spark.scale import cluster as C

    path = str(tmp_path / "cmap")
    for a, b in ((1, 2), (3, 4), (5, 6), (7, 8)):
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(a, b)], "doc_a long, doc_b long"),
        )
    vers = sorted(d for d in os.listdir(path) if d.startswith("map_v"))
    assert vers == ["map_v3", "map_v4"]  # retention window of ONE
    got = {
        r["node"]: r["component"]
        for r in C.read_component_map(spark, path).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5, 7: 7, 8: 7}


def test_component_map_detects_same_version_writer_race(spark, tmp_path):
    """r13 (VERDICT next-round #2): the same-version half of the
    writer race is now DETECTED — before writing map_v{v+1} each fold
    atomically creates an exclusive .claim_v{v+1} marker, and the
    second claimer raises instead of clobbering the first writer's
    snapshot file-by-file (the formerly silent edge-loss mode)."""
    import os

    import pytest

    from yodel_etl_spark.scale import cluster as C

    path = str(tmp_path / "cmap")
    p1 = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    assert C.update_component_map(spark, path, p1) == 1

    # writer A has claimed v2 and is mid-snapshot-write (no _SUCCESS)
    open(os.path.join(path, ".claim_v2"), "w").close()
    p2 = spark.createDataFrame([(3, 4)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="single-writer"):
        C.update_component_map(spark, path, p2)
    # the refusal is side-effect-free: A's claim intact, map untouched
    assert os.path.exists(os.path.join(path, ".claim_v2"))
    got = {
        r["node"]: r["component"]
        for r in C.read_component_map(spark, path).collect()
    }
    assert got == {1: 1, 2: 1}


def test_component_map_claim_lifecycle_and_dead_claim_prune(
    spark, tmp_path
):
    """Claim lifecycle: a successful fold leaves NO claim behind (its
    own marker is released once _SUCCESS lands), and a crash-leftover
    claim whose target snapshot is already complete is provably dead —
    the next fold prunes it and proceeds (self-healing), while a
    leftover claiming the next version still raises with the recovery
    guidance in the message."""
    import os

    import pytest

    from yodel_etl_spark.scale import cluster as C

    path = str(tmp_path / "cmap")
    C.update_component_map(
        spark, path, spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    )
    # no claims survive a clean fold
    assert not [f for f in os.listdir(path) if f.startswith(".claim_v")]

    # dead leftover: claims v1 (already complete) — pruned, fold lands
    open(os.path.join(path, ".claim_v1"), "w").close()
    assert (
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(3, 4)], "doc_a long, doc_b long"),
        )
        == 2
    )
    assert not [f for f in os.listdir(path) if f.startswith(".claim_v")]

    # ambiguous leftover: claims v3 (incomplete target) — detected,
    # and the error tells the operator how to recover
    open(os.path.join(path, ".claim_v3"), "w").close()
    with pytest.raises(RuntimeError, match="delete the claim file"):
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(5, 6)], "doc_a long, doc_b long"),
        )
    os.remove(os.path.join(path, ".claim_v3"))  # the documented recovery
    assert (
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(5, 6)], "doc_a long, doc_b long"),
        )
        == 3
    )
    got = {
        r["node"]: r["component"]
        for r in C.read_component_map(spark, path).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5}


def test_component_map_writer_token_reclaims_own_crash_leftover(
    spark, tmp_path
):
    """r13 claim refinement: a claim carrying OUR writer token is our
    own crashed attempt's leftover (Structured Streaming replays a
    failed batch under the same batch id), so the replay takes it over
    and converges automatically — while a claim with a DIFFERENT token
    (another gate, another batch) or an EMPTY one (the created-but-
    unwritten crash sliver) still raises.  This restores the
    fully-automatic at-least-once replay the tokenless claim traded
    away, without weakening race detection."""
    import os

    import pytest

    from yodel_etl_spark.scale import cluster as C

    path = str(tmp_path / "cmap")
    tok = "/data/corpus#7"
    C.update_component_map(
        spark,
        path,
        spark.createDataFrame([(1, 2)], "doc_a long, doc_b long"),
        writer_token=tok,
    )

    # crashed attempt of batch 8 left its claim; the replay (same
    # token) reclaims and folds
    with open(os.path.join(path, ".claim_v2"), "w") as fh:
        fh.write("/data/corpus#8")
    assert (
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(3, 4)], "doc_a long, doc_b long"),
            writer_token="/data/corpus#8",
        )
        == 2
    )
    assert not [f for f in os.listdir(path) if f.startswith(".claim_v")]

    # a DIFFERENT token is a concurrent writer — detected
    with open(os.path.join(path, ".claim_v3"), "w") as fh:
        fh.write("/other/corpus#8")
    with pytest.raises(RuntimeError, match="single-writer"):
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(5, 6)], "doc_a long, doc_b long"),
            writer_token="/data/corpus#9",
        )
    os.remove(os.path.join(path, ".claim_v3"))

    # an EMPTY claim (create-then-crash sliver) is ambiguous — raises
    # even with a token
    open(os.path.join(path, ".claim_v3"), "w").close()
    with pytest.raises(RuntimeError, match="single-writer"):
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(5, 6)], "doc_a long, doc_b long"),
            writer_token="/data/corpus#9",
        )
    os.remove(os.path.join(path, ".claim_v3"))

    # tokenless caller against a token-bearing claim: still detected
    with open(os.path.join(path, ".claim_v3"), "w") as fh:
        fh.write("/data/corpus#9")
    with pytest.raises(RuntimeError, match="single-writer"):
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(5, 6)], "doc_a long, doc_b long"),
        )
    os.remove(os.path.join(path, ".claim_v3"))

    assert (
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(5, 6)], "doc_a long, doc_b long"),
            writer_token="/data/corpus#9",
        )
        == 3
    )
    got = {
        r["node"]: r["component"]
        for r in C.read_component_map(spark, path).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5}


def test_component_map_readback_detects_same_instant_double_create(
    spark, tmp_path, monkeypatch
):
    """r14 claim hardening (VERDICT r13 #4): create-exclusive is
    check-then-create on local FS / object stores, so two creates
    landing in the same instant can BOTH report success — the claim
    file then carries the LAST writer's token.  The post-claim
    read-back makes the loser detect itself BEFORE the snapshot write:
    simulated by a wrapped FS whose create() lets the racer's content
    land last.  The loser must raise the documented error, write no
    snapshot, and leave the winner's claim untouched."""
    import os

    import pytest

    from yodel_etl_spark.scale import cluster as C

    path = str(tmp_path / "cmap")
    claim_local = os.path.join(path, ".claim_v1")
    real_map_fs = C._map_fs

    def forged(spark_, p_):
        fs, p, jvm = real_map_fs(spark_, p_)

        class OutWrap:
            def __init__(self, out, pth):
                self._out, self._pth = out, pth

            def write(self, b):
                self._out.write(b)

            def close(self):
                self._out.close()
                # the same-instant racer's create+write lands LAST
                # (through the same Hadoop API a real racer would use —
                # plain-Python writes would leave a stale CRC sidecar):
                # the claim's content is now the racer's token
                racer = fs.create(self._pth, True)
                try:
                    racer.write(bytearray(b"other-corpus#99"))
                finally:
                    racer.close()

        class FSWrap:
            def __getattr__(self, name):
                return getattr(fs, name)

            def create(self, pth, overwrite):
                return OutWrap(fs.create(pth, overwrite), pth)

        return FSWrap(), p, jvm

    monkeypatch.setattr(C, "_map_fs", forged)
    with pytest.raises(RuntimeError, match="concurrent component-map"):
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(1, 2)], "doc_a long, doc_b long"),
            writer_token="mine#1",
        )
    monkeypatch.undo()
    # loser raised pre-write: no snapshot, and the WINNER's claim is
    # exactly as the winner left it (the loser must not delete it)
    assert not os.path.isdir(os.path.join(path, "map_v1"))
    assert open(claim_local).read() == "other-corpus#99"


def test_component_map_refuses_stale_read_after_claim_release(
    spark, tmp_path, monkeypatch
):
    """r14 (ADVICE r13 #1): the stale-read interleaving — writer A
    completes map_v{v+1} AND releases its claim while writer B (which
    read latest=v before A finished) is still folding; B's create then
    succeeds legitimately.  The completed-target probe must make B
    release its claim and refuse BEFORE overwriting A's finished
    snapshot.  Simulated by pinning latest_component_version to the
    stale value while a complete map_v1 exists."""
    import os

    import pytest

    from yodel_etl_spark.scale import cluster as C

    path = str(tmp_path / "cmap")
    C.update_component_map(
        spark,
        path,
        spark.createDataFrame([(1, 2)], "doc_a long, doc_b long"),
        writer_token="corpus#1",
    )
    want = sorted(
        spark.read.parquet(os.path.join(path, "map_v1")).collect()
    )

    monkeypatch.setattr(C, "latest_component_version", lambda s, p: 0)
    with pytest.raises(RuntimeError, match="already complete"):
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(3, 4)], "doc_a long, doc_b long"),
            writer_token="corpus#2",
        )
    monkeypatch.undo()
    # refusal is side-effect-free: A's snapshot byte-equal, B's claim
    # released (no leftover blocks the healthy retry)
    assert sorted(spark.read.parquet(os.path.join(path, "map_v1")).collect()) == want
    assert not [f for f in os.listdir(path) if f.startswith(".claim_v")]
    # and the healthy retry (reading the TRUE latest) folds fine
    assert (
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(3, 4)], "doc_a long, doc_b long"),
            writer_token="corpus#2",
        )
        == 2
    )


def test_component_map_lost_takeover_race_raises_documented_error(
    spark, tmp_path, monkeypatch
):
    """r14 (ADVICE r13 #4): the token takeover is delete-then-recreate,
    not atomic — a different-token writer claiming in the gap must
    surface as the documented single-writer RuntimeError (with the
    new holder's state inspected), never a raw Py4J create failure.
    Simulated by a wrapped FS whose delete() lets a racer recreate the
    claim immediately."""
    import os

    import pytest

    from yodel_etl_spark.scale import cluster as C

    path = str(tmp_path / "cmap")
    C.update_component_map(
        spark,
        path,
        spark.createDataFrame([(1, 2)], "doc_a long, doc_b long"),
        writer_token="corpus#1",
    )
    claim_local = os.path.join(path, ".claim_v2")
    with open(claim_local, "w") as fh:
        fh.write("corpus#2")  # our own crashed attempt's leftover
    real_map_fs = C._map_fs

    def racy(spark_, p_):
        fs, p, jvm = real_map_fs(spark_, p_)

        class FSWrap:
            def __getattr__(self, name):
                return getattr(fs, name)

            def delete(self, pth, recursive):
                ok = fs.delete(pth, recursive)
                if pth.getName() == ".claim_v2":
                    with open(claim_local, "w") as fh:
                        fh.write("другой#7")  # racer wins the gap
                return ok

        return FSWrap(), p, jvm

    monkeypatch.setattr(C, "_map_fs", racy)
    with pytest.raises(RuntimeError, match="concurrent component-map"):
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(3, 4)], "doc_a long, doc_b long"),
            writer_token="corpus#2",  # matches the leftover -> takeover
        )
    monkeypatch.undo()
    assert not os.path.isdir(os.path.join(path, "map_v2"))
    assert open(claim_local, encoding="utf-8").read() == "другой#7"


def test_component_map_detects_mid_fold_claim_takeover(
    spark, tmp_path, monkeypatch
):
    """r14 post-write ownership re-check: a racer whose check-then-
    create gap straddles our ENTIRE create→read-back sequence evades
    the pre-write read-back (it writes its token only after ours
    passed) and overwrites the snapshot mid-fold.  After the snapshot
    write the fold re-reads the claim: changed hands ⇒ raise so the
    batch replays and re-folds, never silently losing edges.
    Simulated by a wrapped FS whose open() serves OUR token on the
    pre-write read and the racer's on the post-write one."""
    import os

    import pytest

    from yodel_etl_spark.scale import cluster as C

    path = str(tmp_path / "cmap")
    C.update_component_map(
        spark,
        path,
        spark.createDataFrame([(1, 2)], "doc_a long, doc_b long"),
        writer_token="corpus#1",
    )
    real_map_fs = C._map_fs
    opens = {"n": 0}

    class FakeStream:
        def __init__(self, payload: bytes):
            self._payload = payload

        def readAllBytes(self):
            return self._payload

        def close(self):
            pass

    def racy(spark_, p_):
        fs, p, jvm = real_map_fs(spark_, p_)

        class FSWrap:
            def __getattr__(self, name):
                return getattr(fs, name)

            def open(self, pth):
                if pth.getName() != ".claim_v2":
                    return fs.open(pth)
                opens["n"] += 1
                if opens["n"] == 1:  # pre-write read-back: ours
                    return FakeStream(b"corpus#2")
                # post-write re-check: the racer's write landed mid-fold
                return FakeStream(b"intruder#9")

        return FSWrap(), p, jvm

    monkeypatch.setattr(C, "_map_fs", racy)
    with pytest.raises(RuntimeError, match="DURING this"):
        C.update_component_map(
            spark,
            path,
            spark.createDataFrame([(3, 4)], "doc_a long, doc_b long"),
            writer_token="corpus#2",
        )
    monkeypatch.undo()
    assert opens["n"] == 2  # both guards actually ran
    # prune never ran: the racer's claim file is untouched on disk
    assert os.path.exists(os.path.join(path, ".claim_v2"))
