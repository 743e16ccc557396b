"""LSH candidate generation: precision 1 (every emitted pair passes the
exact threshold) and recall measured against the brute-force truth."""

from __future__ import annotations

from yodel_etl_spark.registry import load_all
from yodel_etl_spark.scale.similarity import cosine_pairs
from yodel_etl_spark.session import load_tables, spread


def test_hyperplane_lsh_precision_and_recall(spark, sf_small):
    emb = spread(load_tables(spark, sf_small, ("embeddings",))["embeddings"])
    exact = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in cosine_pairs(emb, "vec_id", "embedding", 0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in load_all()["sim_lsh"].build(spark, sf_small).collect()
    }
    # precision 1: every LSH pair is a true pair with the same score
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]
    # recall: banding curve keeps a meaningful fraction at this threshold
    if exact:
        assert len(lsh) / len(exact) >= 0.3


def test_embedding_near_dup_lsh_exact_equivalence(spark, sf_small):
    """The registered near-dup query's LSH path must return EXACTLY the
    brute-force pair set at theta=0.9 on the planted-twin corpus: the
    banding parameters (12 bands x 16 bits) put per-pair miss below
    1e-9 at the twins' cos ~0.9998, and precision is exact by verify.
    This is the recall-1 guarantee the driver's oracle row rests on."""
    from yodel_etl_spark.queries.scale_dedup import _with_planted_twins
    from yodel_etl_spark.scale.similarity import hyperplane_lsh_pairs

    emb = spread(load_tables(spark, sf_small, ("embeddings",))["embeddings"])
    corpus = _with_planted_twins(emb)
    brute = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in cosine_pairs(corpus, "vec_id", "embedding", 0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine_r"]
        for r in hyperplane_lsh_pairs(
            corpus, "vec_id", "embedding", threshold=0.9,
            n_planes=192, blocks=12, vectorized_sketch=True,
        ).collect()
    }
    assert lsh == brute
    # the harness planted one twin per 10th vector — result is non-vacuous
    n_twins = corpus.where("vec_id >= 1000000").count()
    assert len(lsh) == n_twins > 0


def test_semantic_dedup_precision_and_recall(spark, sf_small):
    """SemDeDup verdicts vs the clustering-free brute-force truth:
    precision 1 (every dropped id really has a >= theta partner with a
    smaller id) and the only misses are cross-cluster pairs — the
    documented SemDeDup trade-off, bounded here on the planted corpus."""
    from yodel_etl_spark.queries.scale_dedup import _with_planted_twins
    from yodel_etl_spark.scale.similarity import kmeans_assign, semantic_dedup

    emb = spread(load_tables(spark, sf_small, ("embeddings",))["embeddings"])
    corpus = _with_planted_twins(emb)
    brute = cosine_pairs(corpus, "vec_id", "embedding", 0.9).collect()
    true_dups = {r["id_b"] for r in brute}  # larger id of every pair
    verdict = {r["id"]: r for r in semantic_dedup(corpus, "vec_id", "embedding").collect()}
    dropped = {i for i, r in verdict.items() if not r["kept"]}
    # precision 1: a dropped id is always a genuine near-dup
    assert dropped <= true_dups
    # misses are exactly the pairs whose members landed in different
    # clusters (assignment is deterministic, so recompute and check)
    cl = {r["id"]: r["cluster_id"] for r in
          kmeans_assign(corpus, "vec_id", "embedding", 8).collect()}
    same_cluster = {r["id_b"] for r in brute if cl[r["id_a"]] == cl[r["id_b"]]}
    assert dropped == same_cluster
    # and the clustering actually catches the bulk of the planted twins
    if true_dups:
        assert len(dropped) / len(true_dups) >= 0.8


def test_semantic_dedup_releases_cache(spark, sf_small):
    """The persisted assignment table is registered on the result so
    release() frees it — no cache leak across operator calls."""
    from yodel_etl_spark.queries.scale_dedup import _with_planted_twins
    from yodel_etl_spark.scale.similarity import semantic_dedup
    from yodel_etl_spark.session import release

    emb = spread(load_tables(spark, sf_small, ("embeddings",))["embeddings"])
    out = semantic_dedup(_with_planted_twins(emb), "vec_id", "embedding")
    out.count()
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert before > 0
    release(out)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() < before


def test_ivf_index_roundtrip_reproduces_inline_search(spark, sf_small, tmp_path):
    """Build-once/query-many: an index written to parquet and reloaded
    must reproduce the single-job ivf_topk results row for row (doubles
    are bit-exact through parquet; the ranking is deterministic)."""
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.similarity import (
        ivf_index_read,
        ivf_index_write,
        ivf_search,
        ivf_topk,
    )
    from yodel_etl_spark.session import load_tables

    emb = load_tables(spark, sf_small, ("embeddings",))["embeddings"].select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    inline = ivf_topk(
        emb, "vec_id", "embedding", F.col("id") < 10, topk=5, centroid_every=50, nprobe=3
    )
    expected = {tuple(r) for r in inline.collect()}

    path = str(tmp_path / "ivf_index")
    ivf_index_write(emb, "vec_id", "embedding", path, centroid_every=50)
    assign, cents = ivf_index_read(spark, path)
    queries = assign.where(F.col("id") < 10).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qv")
    )
    served = ivf_search(assign, cents, queries, topk=5, nprobe=3)
    assert {tuple(r) for r in served.collect()} == expected
    assert expected  # non-vacuous


def test_topk_update_equals_full_recompute(spark, sf_small):
    """Incremental maintenance is exact: base top-k merged with a
    scored delta must equal brute-force top-k over the full corpus,
    ranks and all (appends only displace, never resurrect)."""
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.similarity import brute_force_topk, topk_update
    from yodel_etl_spark.session import load_tables

    emb = load_tables(spark, sf_small, ("embeddings",))["embeddings"].select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)
    queries = base.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    qpred = (F.col("id") < 8) & (F.col("id") % 5 != 0)  # queries live in base
    prev = brute_force_topk(base, "vec_id", "embedding", qpred, topk=5)
    inc = topk_update(prev, queries, delta, "vec_id", "embedding", topk=5)
    full = brute_force_topk(emb, "vec_id", "embedding", qpred, topk=5)
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in full.collect()}
    assert inc.count() > 0
    # and the delta genuinely displaced something (non-vacuous merge)
    assert {tuple(r) for r in prev.collect()} != {tuple(r) for r in full.collect()}


def test_lsh_near_threshold_recall_32x8_bands(spark):
    """The band-parameter knob executed, not prose: pairs planted AT
    cos = 0.9 (the hard case — the banding curve's cliff).  With the
    default-ish 12 x 16-bit bands a cos-0.9 pair survives only
    ~1 - (1 - p^16)^12 = 0.65 (p = 1 - acos(.9)/pi = 0.8564); with
    32 x 8-bit bands the same pair survives with prob
    1 - (1 - p^8)^32 = 0.99998.  Cost: shorter bands admit more random
    candidate pairs into the exact verify — that's the documented
    recall/candidate-volume trade, and the exact verify keeps precision
    at 1 either way."""
    import math

    import numpy as np

    from yodel_etl_spark.scale.similarity import hyperplane_lsh_pairs
    from yodel_etl_spark.session import release

    rng = np.random.RandomState(7)
    dim, n_pairs = 32, 120
    rows = []
    for i in range(n_pairs):
        u = rng.standard_normal(dim)
        u /= np.linalg.norm(u)
        w = rng.standard_normal(dim)
        w -= (w @ u) * u
        w /= np.linalg.norm(w)
        v = 0.9 * u + math.sqrt(1 - 0.9**2) * w  # exactly cos 0.9 to u
        rows.append((2 * i, [float(x) for x in u]))
        rows.append((2 * i + 1, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "id long, vec array<double>")

    def recall(n_planes: int, blocks: int) -> float:
        pairs = hyperplane_lsh_pairs(
            df, "id", "vec", threshold=0.89,
            n_planes=n_planes, blocks=blocks, vectorized_sketch=True,
        )
        got = {
            (r["id_a"], r["id_b"])
            for r in pairs.collect()
            if r["id_b"] == r["id_a"] + 1 and r["id_a"] % 2 == 0
        }
        release(pairs)
        return len(got) / n_pairs

    assert recall(256, 32) >= 0.99
    # contrast: the 16-bit banding misses a large fraction of the same
    # pairs — the honest number decontam_q.py documents
    assert recall(192, 12) <= 0.9


def test_extend_ivf_index_and_probe(spark, sf_small, tmp_path):
    """Delta-only IVF maintenance: extend assigns ONLY the new batch to
    the frozen centroids, planted twins probe back to their base
    vectors (recall 1 at near-dup cosine), fresh orthogonal-ish
    vectors probe to nothing, and a centroid-less build refuses
    instead of persisting an unreachable index."""
    import pytest
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.similarity import (
        extend_ivf_index,
        ivf_index_read,
        ivf_index_write,
        probe_ivf_index,
    )
    from yodel_etl_spark.session import load_tables

    emb = load_tables(spark, sf_small, ("embeddings",))["embeddings"].select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    path = str(tmp_path / "ivf")
    ivf_index_write(emb, "vec_id", "embedding", path, centroid_every=50)
    n_before = ivf_index_read(spark, path)[0].count()

    # twins: every 10th vector, 0.98/0.02 rotate-blend (cos ≈ 0.9998)
    twins = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> 0.98 * x + "
            "0.02 * embedding[(i + 1) % size(embedding)])"
        ).alias("embedding"),
    )
    extend_ivf_index(twins, path, "vec_id", "embedding")
    assign, _ = ivf_index_read(spark, path)
    n_twins = twins.count()
    assert assign.count() == n_before + n_twins  # delta-only append

    hits = probe_ivf_index(
        spark, path, twins, "vec_id", "embedding", threshold=0.9, nprobe=3
    )
    by_inc = {
        r["id_inc"]: r for r in hits.where("id_inc != id_idx").collect()
    }
    # every twin finds its base vector (id 1_000_000 + b -> b)
    for tid in [r["vec_id"] for r in twins.select("vec_id").collect()]:
        assert tid in by_inc, f"twin {tid} missed its base"
        assert by_inc[tid]["id_idx"] == tid - 1_000_000
        assert by_inc[tid]["cosine_r"] >= 0.999

    with pytest.raises(ValueError, match="no centroid"):
        ivf_index_write(
            emb.where(F.col("vec_id").isin(1, 3, 7)),
            "vec_id",
            "embedding",
            str(tmp_path / "ivf_bad"),
            centroid_every=50,
        )


def test_probe_ivf_index_thresholds_raw_cosine_not_rounded(spark, tmp_path):
    """The probe must compare the RAW cosine against the threshold —
    rounding first would gate vectors within 5e-7 BELOW threshold,
    and in the ingest gate that is a dropped non-duplicate (silent
    loss, the family's forbidden failure mode)."""
    import math

    from yodel_etl_spark.scale.similarity import ivf_index_write, probe_ivf_index

    c = 0.8999996  # rounds to 0.9 at 6 digits, but is BELOW 0.9
    stored = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "ivf")
    ivf_index_write(stored, "vec_id", "embedding", path, centroid_every=1)
    probe = spark.createDataFrame(
        [
            (100, [c, math.sqrt(1 - c * c)]),  # cos vs id 0 = 0.8999996
            (101, [1.0, 0.0]),                 # cos vs id 0 = 1.0
        ],
        "vec_id long, embedding array<double>",
    )
    hits = probe_ivf_index(
        spark, path, probe, "vec_id", "embedding", threshold=0.9, nprobe=2
    )
    got = {(r["id_inc"], r["id_idx"]) for r in hits.collect()}
    assert (101, 0) in got
    assert (100, 0) not in got, "rounded-boundary vector must NOT gate"


def test_ivf_staleness_trigger_and_rebuild(spark, sf_small, tmp_path):
    """The automated rebuild trigger (r12): a fresh build reads fatness
    1.0; extends under the bound pass; the extend that would cross
    ``max_fatness`` raises StaleIVFIndexError BEFORE writing anything
    (posting table byte-identical after the refusal); rebuild_ivf_index
    from the corpus resets fatness to 1.0 with the current density,
    after which the refused batch admits — and planted twins still
    probe back to their bases (recall survives the rebuild)."""
    import pytest
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.similarity import (
        StaleIVFIndexError,
        extend_ivf_index,
        ivf_index_read,
        ivf_index_stats,
        ivf_index_write,
        probe_ivf_index,
        rebuild_ivf_index,
    )
    from yodel_etl_spark.session import load_tables

    emb = load_tables(spark, sf_small, ("embeddings",))["embeddings"].select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    base = emb.where(F.col("vec_id") < 100)
    path = str(tmp_path / "ivf")
    corpus_path = str(tmp_path / "corpus")
    ivf_index_write(base, "vec_id", "embedding", path, centroid_every=50)
    base.write.mode("append").parquet(corpus_path)

    s0 = ivf_index_stats(spark, path)
    assert s0["fatness"] == pytest.approx(1.0)
    assert s0["n_vectors"] == base.count()

    def shifted(lo, hi, offset):
        return emb.where(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).select((F.col("vec_id") + offset).alias("vec_id"), "embedding")

    # batch 1: 100 rows onto 100 → projected fatness 2.0, bound 2.5 ok
    b1 = shifted(100, 200, 0)
    extend_ivf_index(b1, path, "vec_id", "embedding", max_fatness=2.5)
    b1.write.mode("append").parquet(corpus_path)
    assert ivf_index_stats(spark, path)["fatness"] == pytest.approx(2.0)

    # batch 2 would project 3.0 > 2.5 → deterministic pre-write refusal
    b2 = shifted(200, 300, 0)
    n_before = ivf_index_read(spark, path)[0].count()
    with pytest.raises(StaleIVFIndexError, match="rebuild_ivf_index"):
        extend_ivf_index(b2, path, "vec_id", "embedding", max_fatness=2.5)
    assert ivf_index_read(spark, path)[0].count() == n_before  # no write

    # operator move: rebuild from the corpus (the source of truth),
    # fatness back to 1.0 at the CURRENT density, refused batch admits
    corpus = spark.read.parquet(corpus_path)
    rebuild_ivf_index(spark, path, corpus, "vec_id", "embedding")
    s1 = ivf_index_stats(spark, path)
    assert s1["fatness"] == pytest.approx(1.0)
    assert s1["n_vectors"] == corpus.count()
    extend_ivf_index(b2, path, "vec_id", "embedding", max_fatness=2.5)

    # recall survives the rebuild: rotate-blend twins of stored vectors
    twins = (
        spark.read.parquet(corpus_path)
        .where(F.col("vec_id") % 10 == 0)
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> 0.98 * x + "
                "0.02 * embedding[(i + 1) % size(embedding)])"
            ).alias("embedding"),
        )
    )
    hits = probe_ivf_index(
        spark, path, twins, "vec_id", "embedding", threshold=0.9, nprobe=3
    )
    found = {r["id_inc"] for r in hits.collect() if r["id_idx"] == r["id_inc"] - 1_000_000}
    want = {r["vec_id"] for r in twins.select("vec_id").collect()}
    assert found == want, f"twins missed after rebuild: {want - found}"


def test_ivf_rebuild_centroids_delete_first_and_params_guard(
    spark, tmp_path
):
    """Crash-discipline corners: (a) rebuild_ivf_index with no explicit
    centroid_every reads it from params.json; (b) a pre-params index
    (params.json removed, simulating a pre-r12 build) refuses max_fatness
    enforcement and refuses a parameterless rebuild with the honest
    errors, while plain extends still work; (c) ivf_index_stats on a
    pre-params index reports built_mean/fatness None."""
    import os

    import pytest

    from yodel_etl_spark.scale.similarity import (
        extend_ivf_index,
        ivf_index_read,
        ivf_index_stats,
        ivf_index_write,
        rebuild_ivf_index,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i % 7 + 1), float(i % 3 + 1)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    ivf_index_write(vecs, "vec_id", "embedding", path, centroid_every=10)

    # (a) centroid_every comes from params.json (10, not the default
    # 50 — a 50 rebuild over ids 0..39 would pick fewer centroids)
    rebuild_ivf_index(spark, path, vecs, "vec_id", "embedding")
    from yodel_etl_spark.scale.similarity import _read_ivf_params
    assert _read_ivf_params(spark, path)["centroid_every"] == 10
    assert ivf_index_stats(spark, path)["fatness"] == pytest.approx(1.0)

    # (b)+(c) pre-params index
    os.remove(f"{path}/params.json")
    s = ivf_index_stats(spark, path)
    assert s["built_mean"] is None and s["fatness"] is None
    delta = spark.createDataFrame(
        [(100, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="no params"):
        extend_ivf_index(delta, path, "vec_id", "embedding", max_fatness=2.0)
    with pytest.raises(ValueError, match="params"):
        rebuild_ivf_index(spark, path, vecs, "vec_id", "embedding")
    n0 = ivf_index_read(spark, path)[0].count()
    extend_ivf_index(delta, path, "vec_id", "embedding")  # unguarded ok
    assert ivf_index_read(spark, path)[0].count() == n0 + 1
    # explicit centroid_every rebuilds a pre-params index (and records
    # params going forward — the upgrade path)
    rebuild_ivf_index(spark, path, vecs, "vec_id", "embedding", centroid_every=10)
    assert ivf_index_stats(spark, path)["fatness"] == pytest.approx(1.0)


def test_ivf_rebuild_crash_window_reads_as_no_index(spark, tmp_path, monkeypatch):
    """The build/rebuild commit discipline (owned by ivf_index_write):
    the old centroids marker is deleted BEFORE any write, so a crash
    anywhere mid-build over an existing index leaves a state that
    reads as 'no index' (_index_exists false) — never old centroids
    paired with new assignments (the silent-miss geometry).  The
    corpus is external, so the re-run rebuild recovers fully."""
    import pytest

    from yodel_etl_spark.scale import similarity as S
    from yodel_etl_spark.scale.dedup import _index_exists

    vecs = spark.createDataFrame(
        [(i, [float(i % 5 + 1), float(i % 3 + 1)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    S.ivf_index_write(vecs, "vec_id", "embedding", path, centroid_every=10)
    assert _index_exists(spark, path, marker="centroids")

    real_params = S._write_ivf_params

    def boom(*a, **k):
        raise RuntimeError("crash mid-build, after marker delete")

    monkeypatch.setattr(S, "_write_ivf_params", boom)
    with pytest.raises(RuntimeError, match="crash mid-build"):
        S.rebuild_ivf_index(spark, path, vecs, "vec_id", "embedding")
    # the marker is gone: readers and gates see NO index, not a
    # stale-geometry one
    assert not _index_exists(spark, path, marker="centroids")

    monkeypatch.setattr(S, "_write_ivf_params", real_params)
    S.rebuild_ivf_index(
        spark, path, vecs, "vec_id", "embedding", centroid_every=10
    )
    assert _index_exists(spark, path, marker="centroids")
    assert S.ivf_index_stats(spark, path)["fatness"] == pytest.approx(1.0)
    assert S.ivf_index_read(spark, path)[0].count() == 30


def test_ivf_params_publish_window_rolls_forward(spark, tmp_path):
    """r13 fix, r14 refinement, for the params publish window
    (similarity.py _write_ivf_params): delete(dst)+rename(tmp,dst) is
    two FS ops, and a crash between them leaves a valid index whose
    fully-staged params.json.tmp sits next to a missing params.json.
    The reader serves the staged tmp — max_fatness enforcement
    recovers WITHOUT a rebuild — but READ-ONLY (r14, ADVICE r13): a
    reader-side rename racing a LIVE writer inside that same
    delete→rename instant would promote the tmp the writer is about to
    delete, making the writer's own rename fail silently and leaving
    NO params.json after a successful build.  The window instead heals
    at the next successful publish.  A mid-stage (unparseable) tmp is
    ignored rather than promoted."""
    import os

    import pytest

    from yodel_etl_spark.scale import similarity as S

    vecs = spark.createDataFrame(
        [(i, [float(i % 7 + 1), float(i % 3 + 1)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    S.ivf_index_write(vecs, "vec_id", "embedding", path, centroid_every=10)
    want = S._read_ivf_params(spark, path)

    # simulate the crash window: staged tmp present, dst deleted
    os.rename(f"{path}/params.json", f"{path}/params.json.tmp")
    got = S._read_ivf_params(spark, path)
    assert got == want  # recovered from the staged tmp
    # the reader did NOT mutate the publish window (read-only serve:
    # exactly one mutator — the writer — may touch tmp/dst)
    assert not os.path.exists(f"{path}/params.json")
    assert os.path.exists(f"{path}/params.json.tmp")
    # the guard that previously refused until a manual rebuild works
    # across the window
    s = S.ivf_index_stats(spark, path)
    assert s["built_mean"] == pytest.approx(10.0)  # 40 rows / 4 cells
    delta = spark.createDataFrame(
        [(100, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    S.extend_ivf_index(delta, path, "vec_id", "embedding", max_fatness=10.0)
    # the next successful publish HEALS the window (tmp promoted, gone)
    S._write_ivf_params(spark, path, want)
    assert os.path.exists(f"{path}/params.json")
    assert not os.path.exists(f"{path}/params.json.tmp")
    assert S._read_ivf_params(spark, path) == want
    # a mid-stage crash artifact (truncated tmp) is NOT promoted: dst
    # (if present) stays the truth, and with no dst the index honestly
    # reads pre-params
    os.remove(f"{path}/params.json")
    with open(f"{path}/params.json.tmp", "w") as fh:
        fh.write('{"centroid_every": 10, "n_vec')  # truncated write
    assert S._read_ivf_params(spark, path) is None
    assert S.ivf_index_stats(spark, path)["built_mean"] is None


def test_extend_ivf_index_batch_count_skips_count_job(spark, tmp_path):
    """r13: extend_ivf_index(max_fatness=, batch_count=) uses the
    caller-supplied batch size instead of running its own count() job
    (the ingest gate already knows |novel|; on the per-job-constant-
    dominated ingest path the avoided job is the point).  Pinned by
    making DataFrame.count raise: the guarded extend must complete
    without it, and the refusal math must honor the supplied number."""
    import pytest
    from pyspark.sql import DataFrame

    from yodel_etl_spark.scale import similarity as S

    vecs = spark.createDataFrame(
        [(i, [float(i % 7 + 1), float(i % 3 + 1)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    S.ivf_index_write(vecs, "vec_id", "embedding", path, centroid_every=10)
    delta = spark.createDataFrame(
        [(100, [1.0, 1.0]), (101, [2.0, 1.0])],
        "vec_id long, embedding array<double>",
    )

    real_count = DataFrame.count
    try:
        def no_count(self):
            raise AssertionError("guarded extend ran a count() job")

        DataFrame.count = no_count
        S.extend_ivf_index(
            delta, path, "vec_id", "embedding",
            max_fatness=10.0, batch_count=2,
        )
        # refusal math honors the supplied count: projecting a huge
        # batch over the same tiny index must refuse, count-free
        with pytest.raises(S.StaleIVFIndexError, match="rebuild"):
            S.extend_ivf_index(
                delta, path, "vec_id", "embedding",
                max_fatness=2.0, batch_count=10_000,
            )
    finally:
        DataFrame.count = real_count
    # the admit actually landed (40 build + 2 delta posting rows)
    assert S.ivf_index_read(spark, path)[0].count() == 42


def test_ivf_rebuild_infeasible_corpus_refuses_before_teardown(
    spark, tmp_path
):
    """ADVICE r12: rebuild_ivf_index pre-checks centroid feasibility
    BEFORE delegating to ivf_index_write — a corpus with no id ≡ 0
    (mod centroid_every) gets a clean ValueError with the OLD index
    fully intact (previously ivf_index_write's delete-first ordering
    destroyed the index before its own refusal fired)."""
    import pytest

    from yodel_etl_spark.scale import similarity as S
    from yodel_etl_spark.scale.dedup import _index_exists

    vecs = spark.createDataFrame(
        [(i, [float(i % 7 + 1), float(i % 3 + 1)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "ivf")
    S.ivf_index_write(vecs, "vec_id", "embedding", path, centroid_every=10)
    before = {r["id"] for r in S.ivf_index_read(spark, path)[0].collect()}

    odd = spark.createDataFrame(
        [(2 * i + 1, [1.0, float(i + 1)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="BEFORE touching"):
        S.rebuild_ivf_index(
            spark, path, odd, "vec_id", "embedding", centroid_every=10
        )
    # the old index survived the refusal: marker present, postings
    # byte-identical, probes still serve
    assert _index_exists(spark, path, marker="centroids")
    after = {r["id"] for r in S.ivf_index_read(spark, path)[0].collect()}
    assert after == before
    assert S.ivf_index_stats(spark, path)["fatness"] == pytest.approx(1.0)
