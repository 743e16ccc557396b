"""Opt-in scale validation (set SPARK_GRAFT_STRESS=1): replicate the
sf0.1 documents table 20× (100k docs, perturbed text + distinct ids)
and assert the curation pipeline scales sublinearly in wall time per
row — the local evidence for the 100 TB posture claims.

Skipped by default: it's a timing test on ~60 s of extra work and a
shared host; run it on a quiet machine.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_STRESS") != "1",
    reason="set SPARK_GRAFT_STRESS=1 to run scale-stress timings",
)


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _replicated_docs(spark, tmp_path, n_reps: int = 20):
    """(small, large) documents frames: large = small replicated
    ``n_reps``× with distinct ids and per-rep perturbed text, written to
    parquet so the timed runs read a real file split, not an in-memory
    crossJoin lineage."""
    from yodel_etl_spark.session import load_tables, spread

    docs = load_tables(spark, "/root/testdata/sf0.1", ("documents",))["documents"]
    reps = spark.range(n_reps).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
    )
    src = str(tmp_path / "big_docs")
    big.write.mode("overwrite").parquet(src)
    return spread(docs.select("doc_id", "text")), spread(spark.read.parquet(src))


def test_curate_scales_sublinearly(spark, tmp_path):
    from yodel_etl_spark.pipelines.curate import curate
    from yodel_etl_spark.session import load_tables, spread

    docs = load_tables(spark, "/root/testdata/sf0.1", ("documents",))["documents"]
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias(
                "text"
            ),
        )
    )
    src = str(tmp_path / "big_docs")
    big.write.mode("overwrite").parquet(src)

    small = spread(docs.select("doc_id", "text"))
    large = spread(spark.read.parquet(src))

    def timed(frame) -> float:
        c = curate(frame)
        _force(c)  # warm
        t0 = time.perf_counter()
        _force(c)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    # 20x rows must cost far less than 20x wall (narrow signal pass +
    # digest-only shuffles); observed ~2.2x on local[32]
    assert t_large < t_small * 8, (t_small, t_large)


def test_span_scrub_scales_sublinearly(spark, tmp_path):
    """20× rows (with shared spans planted by the replication itself —
    the ' repN' suffix keeps tails distinct while every interior span
    duplicates 20-way) must cost far less than 20× wall: the scrub's
    only data-sized shuffle is the digest count."""
    from yodel_etl_spark.scale.dedup import span_scrub
    from yodel_etl_spark.session import load_tables, release, spread

    docs = load_tables(spark, "/root/testdata/sf0.1", ("documents",))["documents"]
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
    )
    src = str(tmp_path / "big_docs_span")
    big.write.mode("overwrite").parquet(src)

    small = spread(docs.select("doc_id", "text"))
    large = spread(spark.read.parquet(src))

    def timed(frame) -> float:
        c = span_scrub(frame, "doc_id", "text", w=3)
        _force(c)  # warm
        t0 = time.perf_counter()
        _force(c)
        release(c)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_profile_scales_sublinearly(spark, tmp_path):
    """20× rows through the ANALYZE-style profiler: the unpivot is a
    narrow scan-stage projection and both aggregations are map-side
    combinable, so wall must scale far below row count."""
    from yodel_etl_spark.scale.profile import profile_table

    small, large = _replicated_docs(spark, tmp_path)

    def timed(frame) -> float:
        p = profile_table(frame, ["doc_id", "text"])
        _force(p)  # warm
        t0 = time.perf_counter()
        _force(p)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_learn_bpe_distributed_scales_sublinearly(spark, tmp_path):
    """The DISTRIBUTED merge loop (local_vocab_threshold=0 forces it off
    the collect path) at 100k docs: corpus-sized work is the one
    (word, count) reduction; the per-round pair aggregation runs on the
    distinct-word table, whose size grows far slower than the corpus
    (the ' repN' suffixes add ~n_reps words)."""
    from yodel_etl_spark.scale.bpe import learn_bpe

    small, large = _replicated_docs(spark, tmp_path)

    def timed(frame) -> float:
        t0 = time.perf_counter()
        merges = learn_bpe(frame, "text", n_merges=8, local_vocab_threshold=0)
        assert len(merges) == 8
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)
    # replication preserves word statistics up to the tiny repN tail, so
    # the learned merge sequences must agree — the scale run is the SAME
    # algorithm, not a cheaper approximation
    assert learn_bpe(small, "text", n_merges=8, local_vocab_threshold=0) == learn_bpe(
        small, "text", n_merges=8
    )


def _twin_planted_embeddings(spark, tmp_path, n_reps: int):
    """``n_reps``× the sf0.1 embeddings with a CONTROLLED pair
    structure: replica reps (0,1), (2,3), … share a large hash-derived
    offset (keyed by (base, rep//2, coord)) plus a tiny per-rep jitter,
    so each even/odd rep pair is a planted twin (cos ≈ 0.9998) while
    every other combination — same base across groups, different bases
    anywhere — decorrelates (cos ≈ 0.01).  True-pair volume is thus
    EXACTLY rows/2, linear in replication.

    (The first cut of this test added ``rep × const_direction``: past a
    few reps every vector collapsed onto that one direction, all sign
    sketches agreed, and one band key carried ~50k vectors — a
    quadratic single-partition self-join that ran for 18 minutes.
    Hash-keyed offsets are the fix: no shared direction, no collapse.)"""
    # NB: the base id must be a DIFFERENTLY-NAMED column than the output
    # alias — lateral column alias resolution makes a same-select
    # `F.col("vec_id")` refer to the new (base + rep·10⁶) alias, which
    # would give every replica a unique offset key and zero twins
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet").select(
        F.col("vec_id").alias("base"), "embedding"
    )
    reps = spark.range(n_reps).select(F.col("id").alias("rep"))
    unit = lambda h: (F.pmod(h, F.lit(2001)) - 1000).cast("double") / 1000.0
    big = (
        emb.crossJoin(reps)
        .withColumn("grp", (F.col("rep") / 2).cast("long"))
        .select(
            (F.col("base") + F.col("rep") * 1_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                + 2.0 * unit(F.xxhash64(F.col("base"), F.col("grp"), i))
                + 0.01 * unit(F.xxhash64(F.col("base"), F.col("rep"), i, F.lit(7))),
            ).alias("embedding"),
        )
    )
    src = str(tmp_path / f"emb_{n_reps}x")
    big.write.mode("overwrite").parquet(src)
    return spark.read.parquet(src)


def test_hyperplane_lsh_scales_linearly(spark, tmp_path):
    """100k vectors (50× embeddings, planted-twin replication) through
    banded cosine LSH + exact verify, vs a 10-rep (20k) run of the same
    construction: 5× the rows and 5× the true pairs must cost ~5× the
    wall, NOT ~25× — the operator is one-pass LINEAR (numpy-matmul
    sketch, narrow (id, block, key) band join, candidate volume
    tracking the planted-pair count), and linearity is exactly what
    the first cut of this test proved absent (see
    _twin_planted_embeddings: a shared-direction replication collapsed
    every vector onto one band key and went quadratic in a single
    partition).  Warm steady-state ratio measures ≈ 5.2 on local[32];
    the bound rejects any superlinear candidate blowup while allowing
    honest linear cost."""
    from yodel_etl_spark.scale.similarity import hyperplane_lsh_pairs
    from yodel_etl_spark.session import release, spread

    small = spread(_twin_planted_embeddings(spark, tmp_path, 10))
    large = spread(_twin_planted_embeddings(spark, tmp_path, 50))

    def timed(frame):
        p = hyperplane_lsh_pairs(
            frame, "vec_id", "embedding", threshold=0.9, n_planes=126, blocks=6,
            vectorized_sketch=True,
        )
        _force(p)  # warm
        # min-of-2: the 4x bound below is tight enough that one GC
        # pause / co-tenant burst in a single sample flips it when the
        # whole stress suite runs in sequence
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            _force(p)
            ts.append(time.perf_counter() - t0)
        n_pairs = p.count()
        release(p)
        return min(ts), n_pairs

    t_small, n_small = timed(small)
    t_large, n_large = timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    # every planted twin found (banding miss prob ~1e-6 per pair), and
    # false-positive survivors are impossible (exact verify)
    n_rows_small, n_rows_large = 2000 * 10, 2000 * 50
    assert n_small == n_rows_small // 2, n_small
    assert n_large == n_rows_large // 2, n_large
    # 5x rows: linear → ~5x wall; quadratic candidates → ~25x.  Bound
    # at 2x the row ratio: far below any blowup, room for host noise.
    assert t_large < t_small * 10, (t_small, t_large)


def test_quality_clf_scales_sublinearly(spark, tmp_path):
    """20× rows through 4 GD rounds: per-round cost at this SF is
    dominated by fixed job/plan overhead and the gradient shuffle is
    bounded at 513 rows regardless of corpus size, so wall must scale
    far below row count."""
    from yodel_etl_spark.scale.classifier import train_quality_lr
    from yodel_etl_spark.session import release

    small, large = _replicated_docs(spark, tmp_path)
    label = F.size(F.split(F.col("text"), r"\s+")) >= 40  # pure column

    def timed(frame) -> float:
        t0 = time.perf_counter()
        _, scored = train_quality_lr(frame, label, rounds=4, lr=4.0)
        _force(scored)
        release(scored)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_dsir_scales_sublinearly(spark, tmp_path):
    """20× rows through DSIR selection: the only corpus-sized shuffle
    is the 256-row gram count and scoring is a narrow broadcast pass,
    so wall must scale far below row count."""
    from yodel_etl_spark.scale.dsir import dsir_select
    from yodel_etl_spark.session import release

    small, large = _replicated_docs(spark, tmp_path)

    def timed(frame) -> float:
        t0 = time.perf_counter()
        s = dsir_select(frame, top_n=50)
        _force(s)
        release(s)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_bm25_scales_sublinearly(spark, tmp_path):
    """20× rows through BM25 top-k: per-term tf is scan-stage work,
    stats are a one-row aggregate, top-k is a per-partition heap."""
    from yodel_etl_spark.scale.search import bm25_topk
    from yodel_etl_spark.session import release

    small, large = _replicated_docs(spark, tmp_path)

    def timed(frame) -> float:
        t0 = time.perf_counter()
        s = bm25_topk(frame, ["spark", "vector", "customer"], top_n=20)
        _force(s)
        release(s)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_audio_features_scale_linearly(spark, tmp_path):
    """100k planted WAV blobs (20× the sf0.1 doc count) through
    pack→decode→features: the whole chain is per-partition mapInPandas
    (no shuffle), so wall must track rows ~1:1, never worse."""
    import numpy as np
    import pandas as pd

    from yodel_etl_spark.scale.audio import audio_features, wav_pack
    from yodel_etl_spark.session import ship_package, spread

    ship_package(spark)

    def planted(n_rows: int, path: str):
        ids = spark.range(n_rows).select(F.col("id").alias("doc_id"))

        def plant(it):
            for pdf in it:
                out = pdf.copy()
                out["content"] = [
                    wav_pack(
                        ((int(d) * 31 + np.arange(100 + int(d) % 50) * 17) % 65536)
                        - 32768
                    )
                    for d in pdf["doc_id"]
                ]
                yield out

        spread(ids).mapInPandas(plant, "doc_id long, content binary").write.mode(
            "overwrite"
        ).parquet(path)
        return spark.read.parquet(path)

    small = planted(5_000, str(tmp_path / "wav_small"))
    large = planted(100_000, str(tmp_path / "wav_large"))

    def timed(frame) -> float:
        f = audio_features(frame, "content").drop("content")
        _force(f)  # warm
        t0 = time.perf_counter()
        _force(f)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    # 20x rows: linear → ~20x worst case, but fixed overhead dominates
    # the small run on local[32]; require comfortably under linear
    assert t_large < t_small * 12, (t_small, t_large)


def test_quality_clf_minibatch_beats_full_batch_at_scale(spark, tmp_path):
    """The mini-batch swap's whole point: at 20× rows, 8 rounds over
    8 md5 slices should cost materially less wall than 8 full-batch
    rounds (each slice round scans ~1/8 of the cached corpus), while
    still descending.  Pin mini-batch wall below full-batch wall on the
    same large frame."""
    from yodel_etl_spark.scale.classifier import train_quality_lr
    from yodel_etl_spark.session import release

    _, large = _replicated_docs(spark, tmp_path)
    label = F.size(F.split(F.col("text"), r"\s+")) >= 40

    def timed(n_slices: int) -> float:
        t0 = time.perf_counter()
        _, scored = train_quality_lr(
            large, label, rounds=8, lr=4.0, n_slices=n_slices
        )
        _force(scored)
        release(scored)
        return time.perf_counter() - t0

    t_full, t_mini = timed(1), timed(8)
    print(f"STRESS full {t_full:.2f}s vs mini {t_mini:.2f}s ({t_full / t_mini:.2f}x)")
    # generous bound for host noise; steady-state measures well below
    assert t_mini < t_full, (t_full, t_mini)


def test_encode_lsh_scales_sublinearly(spark, tmp_path):
    """20× rows through the hashed encoder: the kernel is one linear
    Arrow pass with per-batch vectorization, so wall grows far slower
    than rows while fixed plan/JIT overhead amortizes."""
    from yodel_etl_spark.scale.encode import encode_text

    small, large = _replicated_docs(spark, tmp_path)

    def timed(frame) -> float:
        enc = encode_text(frame, "text", dim=64).drop("text")
        _force(enc)  # warm
        t0 = time.perf_counter()
        _force(enc)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS encode {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_warc_reader_scales_sublinearly(spark, tmp_path):
    """20× records across 4× as many archive files: file-grain
    mapInPandas parallelism must hold — wall far below 20×."""
    import yodel_etl_spark.queries.web_q as web_q
    from yodel_etl_spark.io.warc import read_warc, write_warc
    from yodel_etl_spark.scale.textstats import html_extract

    def archive(base, n_pages, n_files):
        os.makedirs(base, exist_ok=True)
        per = n_pages // n_files
        for f in range(n_files):
            recs = [
                {
                    "url": f"https://example.org/crawl/{i}",
                    "ts": "2024-01-01T00:00:00Z",
                    "payload": web_q._fixture_page(i).encode(),
                    "mime": "text/html",
                }
                for i in range(f * per, (f + 1) * per)
            ]
            write_warc(recs, os.path.join(base, f"part-{f}.warc.gz"))

    small_dir = str(tmp_path / "warc_small")
    large_dir = str(tmp_path / "warc_large")
    archive(small_dir, 512, 4)
    archive(large_dir, 512 * 20, 64)

    def timed(path) -> float:
        df = read_warc(spark, path + "/*.warc.gz").select(
            "url", html_extract(F.col("payload").cast("string")).alias("body")
        )
        _force(df)  # warm
        t0 = time.perf_counter()
        _force(df)
        return time.perf_counter() - t0

    t_small, t_large = timed(small_dir), timed(large_dir)
    print(f"STRESS warc {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_phash_scales_sublinearly(spark):
    """20× images through plant→decode→dHash→banding join: decode work
    is row-linear but file-grain parallel; the join shuffles only
    8-byte sketches, so wall grows far slower than rows."""
    from yodel_etl_spark.queries.scale_multimodal import phash as phash_query
    from yodel_etl_spark.registry import load_all

    build = load_all()["phash"].build

    def timed(sf_dir) -> float:
        df = build(spark, sf_dir)
        _force(df)  # warm
        t0 = time.perf_counter()
        _force(df)
        return time.perf_counter() - t0

    # sf0.01 (500 docs) vs sf0.1 (5,000 docs): 10x rows
    t_small, t_large = timed("/root/testdata/sf0.01"), timed("/root/testdata/sf0.1")
    print(f"STRESS phash {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 5, (t_small, t_large)


def test_edit_pairs_scales_subquadratically(spark, tmp_path):
    """Ed-Join's claim is escaping the O(n²) cross join: 20× the
    distinct-value set (sf0.1 part names × 20 suffixed reps — the reps
    also form dense distance-1 clusters, so the TRUE pair count grows
    superlinearly) must cost far less than the 400× a brute-force
    quadratic would pay.  Bound set from measured quiet-window runs
    with ~2× headroom."""
    import time

    from yodel_etl_spark.scale.stringsim import edit_pairs
    from yodel_etl_spark.session import load_tables, release, spread

    part = load_tables(spark, "/root/testdata/sf0.1", ("part",))["part"]
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = part.crossJoin(reps).select(
        F.concat(F.col("p_name"), F.lit(" v"), F.col("rep").cast("string")).alias("v")
    )
    src = str(tmp_path / "big_names")
    big.write.mode("overwrite").parquet(src)
    small = spread(part.select(F.col("p_name").alias("v")))
    large = spread(spark.read.parquet(src))

    def timed(frame) -> float:
        warm = edit_pairs(frame, "v", k=1, q=2)
        _force(warm)
        release(warm)
        out = edit_pairs(frame, "v", k=1, q=2)
        t0 = time.perf_counter()
        _force(out)
        dt = time.perf_counter() - t0
        release(out)
        return dt

    t_small = timed(small)
    t_large = timed(large)
    ratio = t_large / t_small
    print(f"edit_pairs stress: small={t_small:.2f}s large={t_large:.2f}s ratio={ratio:.2f}")
    assert ratio < 12.0, f"20x values cost {ratio:.1f}x - candidate filter not holding"


def test_link_edges_scales_sublinearly(spark, tmp_path):
    """20× pages (each with the same 9-anchor envelope) must cost far
    less than 20× wall: extraction/resolution are scan-stage codegen
    over spread partitions and the only shuffle carries host pairs —
    host cardinality does not grow with the corpus."""
    from yodel_etl_spark.scale.links import link_edges
    from yodel_etl_spark.session import load_tables, spread

    docs = load_tables(spark, "/root/testdata/sf0.1", ("documents",))["documents"]

    def pages_of(frame):
        did = F.col("doc_id").cast("string")
        src = F.concat(
            F.lit("https://src"), (F.col("doc_id") % 5).cast("string"),
            F.lit(".example.org/a/b/page"), did, F.lit(".html"),
        )
        html = F.concat(
            F.lit('<a href="http://WWW.H'), (F.col("doc_id") % 7).cast("string"),
            F.lit(".Example.com:80/p/"), did,
            F.lit('?utm_source=x&b=2&a=1#f">t</a>'),
            F.lit("<A HREF='//cdn.example.net/lib//x.js'>u</A>"),
            F.lit('<a href="/local/'), (F.col("doc_id") % 3).cast("string"),
            F.lit('">v</a>'),
            F.lit('<a href="../up/./d'), did, F.lit('">w</a>'),
            F.lit('<a href="mailto:x@y.z">m</a><a href="#top">f</a>'),
            F.lit("<a href='javascript:void(0)'>j</a>"),
        )
        return frame.select(src.alias("url"), html.alias("html"))

    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id")
    )
    src_path = str(tmp_path / "big_docs_links")
    big.write.mode("overwrite").parquet(src_path)

    small = spread(docs.select("doc_id"))
    large = spread(spark.read.parquet(src_path))

    def timed(frame) -> float:
        e = link_edges(pages_of(frame), "url", "html")
        _force(e)  # warm
        t0 = time.perf_counter()
        _force(e)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_cdc_apply_cost_tracks_delta_not_snapshot(spark, tmp_path):
    """The MERGE promise at scale: with broadcast_changes, applying a
    FIXED-size delta onto a 20× snapshot must cost well under 20× the
    1× baseline — the snapshot is probed (scan + broadcast anti-join),
    never shuffled, and the window runs on the delta alone."""
    from yodel_etl_spark.ops.cdc import apply_changes
    from yodel_etl_spark.session import spread

    base_small = spark.range(100_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    base_big = spark.range(2_000_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("val")
    )
    for frame, name in ((base_small, "snap_small"), (base_big, "snap_big")):
        frame.write.mode("overwrite").parquet(str(tmp_path / name))
    delta = spark.range(10_000).select(
        (F.col("id") * 7).alias("k"),
        F.col("id").alias("val"),
        F.col("id").alias("seq"),
        F.when(F.col("id") % 10 == 0, "D").otherwise("U").alias("op"),
    )

    def timed(path) -> float:
        snap = spread(spark.read.parquet(str(tmp_path / path)))
        out = apply_changes(
            snap, delta, keys=("k",), order_by=("seq",), op_col="op",
            broadcast_changes=True,
        )
        _force(out)  # warm
        t0 = time.perf_counter()
        _force(out)
        return time.perf_counter() - t0

    t_small, t_large = timed("snap_small"), timed("snap_big")
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_funnel_scales_sublinearly(spark, tmp_path):
    """20× events (fresh user ids per replica — the key space grows,
    per-key arrays stay bounded) must cost far less than 20× wall: the
    op is one shuffle of (key, ts, type) plus a codegen array walk."""
    from yodel_etl_spark.ops.funnel import funnel_steps
    from yodel_etl_spark.session import load_tables, spread

    ev = load_tables(spark, "/root/testdata/sf0.1", ("events",))["events"]
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = ev.crossJoin(reps).select(
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "ts",
        "event_type",
    )
    src = str(tmp_path / "big_events_funnel")
    big.write.mode("overwrite").parquet(src)
    small = spread(ev.select("user_id", "ts", "event_type"))
    large = spread(spark.read.parquet(src))

    steps = ("view", "click", "purchase")

    def timed(frame) -> float:
        f = funnel_steps(frame, "user_id", "ts", "event_type", steps)
        _force(f)  # warm
        t0 = time.perf_counter()
        _force(f)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 8, (t_small, t_large)


def test_pagerank_warm_refresh_equals_fresh_convergence(spark):
    """Graph drift: a new edge lands; a warm-started refresh off
    yesterday's converged ranks equals a fresh full convergence (two
    ~100-round power iterations — opt-in, the heavy half of the
    warm-start pin in tests/test_graph.py)."""
    from yodel_etl_spark.scale.graph import pagerank

    EDGES = [
        ("b", "a"), ("b", "a"), ("c", "a"), ("d", "a"),
        ("a", "b"), ("c", "d"), ("d", "e"),
    ]
    df = spark.createDataFrame(EDGES, "src string, dst string")
    converged = pagerank(df, tol=1e-8, max_iter=200)
    drifted = spark.createDataFrame(
        EDGES + [("e", "c")], "src string, dst string"
    )
    fresh = {
        r["node"]: r["rank"]
        for r in pagerank(drifted, tol=1e-8, max_iter=200).collect()
    }
    refreshed = {
        r["node"]: r["rank"]
        for r in pagerank(
            drifted, tol=1e-8, max_iter=200, init_ranks=converged
        ).collect()
    }
    assert all(abs(refreshed[k] - fresh[k]) < 1e-6 for k in fresh)


def test_duplicated_spans_scales_subquadratically(spark, tmp_path):
    """20× rows where the replication itself makes EVERY interior
    position a 20-way duplicate — the operator's worst case (the
    rare-duplicates assumption fully broken: the run window sees every
    position).  Even there the plan is one digest count + one semi join
    + one window over (id, pos) pairs — wall must grow far below the
    400× an all-pairs formulation would."""
    from yodel_etl_spark.scale.dedup import duplicated_spans
    from yodel_etl_spark.session import load_tables, release, spread

    docs = load_tables(spark, "/root/testdata/sf0.1", ("documents",))["documents"]
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
    )
    src = str(tmp_path / "big_docs_xspan")
    big.write.mode("overwrite").parquet(src)

    small = spread(docs.select("doc_id", "text"))
    large = spread(spark.read.parquet(src))

    def timed(frame) -> float:
        c = duplicated_spans(frame, "doc_id", "text", k=8)
        _force(c)  # warm
        t0 = time.perf_counter()
        _force(c)
        release(c)
        return time.perf_counter() - t0

    t_small, t_large = timed(small), timed(large)
    print(f"STRESS {t_small:.2f}s -> {t_large:.2f}s ({t_large / t_small:.1f}x)")
    assert t_large < t_small * 10, (t_small, t_large)


def test_minhash_probe_cost_tracks_delta_not_corpus(spark, tmp_path):
    """The index promise: checking a FIXED small batch against a 20×
    corpus via the persisted index must be far cheaper than the one-shot
    batch dedup that re-shingles the whole union — probe work is the
    delta's shingling + a bucket equi-join against stored postings."""
    from yodel_etl_spark.scale.dedup import (
        minhash_lsh_pairs,
        probe_minhash_index,
        write_minhash_index,
    )
    from yodel_etl_spark.session import load_tables, release, spread

    docs = load_tables(spark, "/root/testdata/sf0.1", ("documents",))["documents"]
    reps = spark.range(20).select(F.col("id").alias("rep"))
    big = docs.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
    )
    src = str(tmp_path / "big_docs_mh")
    big.write.mode("overwrite").parquet(src)
    large = spread(spark.read.parquet(src))

    idx = str(tmp_path / "mh_big_idx")
    write_minhash_index(large, idx)  # one-time corpus cost, not timed

    batch = spread(
        docs.limit(250).select(
            (F.col("doc_id") + 50_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" probe")).alias("text"),
        )
    )

    t0 = time.perf_counter()
    hits = probe_minhash_index(spark, idx, batch, threshold=0.5)
    _force(hits)
    t_probe = time.perf_counter() - t0
    release(hits)

    union = large.unionByName(batch)
    t0 = time.perf_counter()
    full = minhash_lsh_pairs(union, "doc_id", "text", threshold=0.5)
    _force(full)
    t_full = time.perf_counter() - t0
    release(full)

    print(f"STRESS probe {t_probe:.2f}s vs recompute {t_full:.2f}s "
          f"({t_full / t_probe:.1f}x saved)")
    assert t_probe * 2 < t_full, (t_probe, t_full)


def test_hamming_probe_cost_tracks_delta_not_corpus(spark, tmp_path):
    """Same promise as the MinHash probe, at sketch grain: probing a
    fixed batch of 64-bit sketches against a 20x corpus via the
    persisted index must beat the one-shot hamming_pairs on the union
    (which re-bands and self-joins everything)."""
    from pyspark.sql import functions as FF

    from yodel_etl_spark.scale.dedup import (
        hamming_pairs,
        probe_hamming_index,
        write_hamming_index,
    )
    from yodel_etl_spark.session import release, spread

    # blocks=4 (16-bit band keys): at 1M RANDOM sketches the default
    # 8-bit keys put ~n/256 docs in every bucket and the self-join's
    # candidate volume goes quadratic — block width must grow with
    # corpus size (width >= log2(n) keeps buckets O(1)); the price is
    # the recall bound dropping to distance < 4, which max_distance=3
    # still satisfies
    big = spread(
        spark.range(1_000_000).select(
            FF.col("id").alias("doc"),
            FF.xxhash64(FF.col("id")).alias("sim"),
        )
    ).localCheckpoint(eager=True)
    idx = str(tmp_path / "hm_big_idx")
    write_hamming_index(big, idx, blocks=4)  # one-time corpus cost, not timed

    batch = spread(
        spark.range(2_000).select(
            (FF.col("id") + 10_000_000).alias("doc"),
            # half the batch: near-dups of corpus sketches (flip 2 bits)
            FF.when(
                FF.col("id") % 2 == 0,
                FF.xxhash64(FF.col("id")).bitwiseXOR(FF.lit(0b101)),
            )
            .otherwise(FF.xxhash64(FF.col("id") + 77_000_000))
            .alias("sim"),
        )
    ).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    hits = probe_hamming_index(spark, idx, batch, max_distance=3)
    _force(hits)
    t_probe = time.perf_counter() - t0

    union = big.unionByName(batch)
    t0 = time.perf_counter()
    full = hamming_pairs(union, "doc", "sim", max_distance=3, blocks=4)
    _force(full)
    t_full = time.perf_counter() - t0
    release(full)

    print(f"STRESS probe {t_probe:.2f}s vs recompute {t_full:.2f}s "
          f"({t_full / t_probe:.1f}x saved)")
    assert t_probe * 2 < t_full, (t_probe, t_full)


def test_extend_components_cost_tracks_delta_not_history(spark):
    """The incremental-clustering promise: folding a SMALL batch of new
    pairs into an existing component map must beat recomputing
    connected components from the full pair history — the map is an
    already-contracted fixpoint, so the fold pays a couple of rounds
    over |map| + |batch| edges while the recompute pays the full
    contraction of every pair ever seen.  Result equality is asserted
    via an order-insensitive checksum."""
    from pyspark.sql import functions as FF

    from yodel_etl_spark.scale.cluster import connected_components, extend_components
    from yodel_etl_spark.session import spread

    # 256k nodes in chains of 32 (8k components): chain shape forces the
    # full recompute through ~log2(32) contraction rounds
    n, chain = 256_000, 32
    history = spread(
        spark.range(n).where((FF.col("id") % chain) != chain - 1).select(
            FF.col("id").alias("doc_a"), (FF.col("id") + 1).alias("doc_b")
        )
    ).localCheckpoint(eager=True)
    prev = connected_components(history).localCheckpoint(eager=True)  # not timed

    # delta: 1k pairs bridging adjacent chains
    delta = spread(
        spark.range(1_000).select(
            (FF.col("id") * 2 * chain).alias("doc_a"),
            ((FF.col("id") * 2 + 1) * chain).alias("doc_b"),
        )
    ).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    inc = extend_components(prev, delta)
    _force(inc)
    t_inc = time.perf_counter() - t0

    t0 = time.perf_counter()
    full = connected_components(history.unionByName(delta))
    _force(full)
    t_full = time.perf_counter() - t0

    def checksum(df):
        # bit_xor: order-insensitive and overflow-free (ANSI mode makes
        # sum() of 64-bit hashes raise on long overflow)
        return df.agg(
            FF.expr("bit_xor(xxhash64(node, component))").alias("c"),
            FF.count(FF.lit(1)).alias("n"),
        ).collect()[0]

    ci, cf = checksum(inc), checksum(full)
    assert (ci["c"], ci["n"]) == (cf["c"], cf["n"])
    print(f"STRESS extend {t_inc:.2f}s vs recompute {t_full:.2f}s "
          f"({t_full / t_inc:.1f}x saved)")
    assert t_inc * 1.5 < t_full, (t_inc, t_full)


def test_ivf_probe_cost_tracks_batch_not_corpus(spark, tmp_path):
    """The persisted-IVF promise: probing a FIXED incoming batch
    against a 10x corpus costs nowhere near 10x — the probe reads the
    broadcast centroid table plus only the nprobe cells' postings, so
    wall tracks batch x cell-width, not corpus size.  The local
    evidence for the embedding gate's at-scale posture (the same
    claim shape as the CDC delta test)."""
    from yodel_etl_spark.scale.similarity import ivf_index_write, probe_ivf_index
    from yodel_etl_spark.session import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.1", ("embeddings",))[
        "embeddings"
    ].select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    reps = spark.range(10).select(F.col("id").alias("rep"))
    big = emb.crossJoin(reps).select(
        (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> x + 0.001 * cast(rep as double) "
            "* embedding[(i + 3) % size(embedding)])"
        ).alias("embedding"),
    )
    small_p = str(tmp_path / "emb_small")
    big_p = str(tmp_path / "emb_big")
    emb.write.parquet(small_p)
    big.write.parquet(big_p)
    small = spark.read.parquet(small_p)
    large = spark.read.parquet(big_p)

    idx_s = str(tmp_path / "ivf_s")
    idx_b = str(tmp_path / "ivf_b")
    # 40 centroids: nprobe/C must be SMALL for the IVF claim to mean
    # anything (with a handful of centroids nprobe covers most of the
    # corpus and the probe degenerates to a scan)
    ivf_index_write(small, "vec_id", "embedding", idx_s, centroid_every=50)
    # the big index is built the way the GATE actually grows one: the
    # same first-snapshot build, then the 9 replica batches arrive via
    # delta-only extends against the FROZEN centroids — same centroid
    # count as the small index, cells ~10x fatter (building the big
    # corpus from scratch would re-select 10x centroids and dodge the
    # staleness regime under test)
    ivf_index_write(small, "vec_id", "embedding", idx_b, centroid_every=50)
    from yodel_etl_spark.scale.similarity import extend_ivf_index

    extend_ivf_index(
        large.where(F.col("vec_id") >= 1_000_000), idx_b, "vec_id", "embedding"
    )
    n_cents = spark.read.parquet(f"{idx_b}/centroids").count()
    assert n_cents == spark.read.parquet(f"{idx_s}/centroids").count()

    batch = small.where(F.col("vec_id") % 40 == 0).select(
        (F.col("vec_id") + 77_000_000).alias("vec_id"), "embedding"
    )
    batch = batch.localCheckpoint(eager=True)

    def probe_wall(idx):
        t = time.perf_counter()
        _force(probe_ivf_index(spark, idx, batch, "vec_id", "embedding", 0.9, 3))
        return time.perf_counter() - t

    probe_wall(idx_s)  # warm-up
    t_small = min(probe_wall(idx_s) for _ in range(3))
    t_large = min(probe_wall(idx_b) for _ in range(3))
    ratio = t_large / t_small
    print(f"ivf probe: small {t_small:.2f}s large {t_large:.2f}s ratio {ratio:.2f}")
    # 10x corpus with a FROZEN centroid set fattens cells ~10x, so the
    # candidate verify grows — but far below the 10x a corpus-shuffling
    # plan would pay: the centroid broadcast, the batch side, and the
    # per-job constants are all fixed
    assert ratio < 5.0, (t_small, t_large)


def test_relayout_noop_cost_is_count_grain(spark, tmp_path):
    """relayout_parquet's honest scale split (r15): deciding an
    already-collapsed partitioned corpus needs ONE count job — a small
    fraction of what the real re-layout pays (key shuffle + clustered
    partitioned write) — so scheduling it as a routine maintenance pass
    is cheap until the day it actually has cross-partition duplicates
    to collapse."""
    from yodel_etl_spark.io.compact import relayout_parquet

    path = str(tmp_path / "rl")
    spark.range(2_000_000).selectExpr(
        "id AS k", "id % 8 AS part", "id * 3 AS v"
    ).repartition(8).write.partitionBy("part").parquet(path)
    # re-bucket half the keys into a new leaf (mutable-metadata shape)
    spark.read.parquet(path).where("k % 2 = 0").withColumn(
        "part", F.lit(99)
    ).write.mode("append").partitionBy("part").parquet(path)

    spark.read.parquet(path).count()  # JVM/codegen warm-up off the clock
    t0 = time.time()
    rep = relayout_parquet(spark, path, ["k"])
    t_rewrite = time.time() - t0
    assert rep["rewritten"] and rep["n_dup_rows"] == 1_000_000
    assert rep["rows_after"] == 2_000_000

    # the idempotent re-run on the (same-sized) collapsed corpus is the
    # no-op leg — timed ADJACENT to the rewrite so an ambient co-tenant
    # burst hits both arms alike (the interleaved-A/B principle);
    # min-of-2 shields the cheap arm from a single scheduling hiccup
    t_noop = float("inf")
    for _ in range(2):
        t1 = time.time()
        rep2 = relayout_parquet(spark, path, ["k"])
        t_noop = min(t_noop, time.time() - t1)
        assert not rep2["rewritten"] and rep2["n_dup_rows"] == 0
    assert spark.read.parquet(path).count() == 2_000_000
    assert t_noop < t_rewrite * 0.5, (
        f"no-op relayout should be count-grain: {t_noop:.2f}s vs "
        f"rewrite {t_rewrite:.2f}s"
    )


def test_relayout_scoped_cost_tracks_dup_fraction(spark, tmp_path):
    """The r15 scoped re-layout promise at scale: on a corpus where a
    tiny fraction of files hold cross-leaf duplicates, auto scope
    rewrites only those files, so the pass costs the detect scan plus
    a delta-sized write — well under the full rewrite the same corpus
    pays under scope='full'.  Both arms run ADJACENTLY on twin corpora
    of identical content so an ambient burst hits them alike."""
    from yodel_etl_spark.io.compact import relayout_parquet

    def build(path: str) -> None:
        # range-clustered write so each file holds a contiguous key
        # span — the shape any ingest that clusters on the key
        # produces, and what keeps the dup sliver's copies in a
        # handful of files instead of sprayed round-robin everywhere;
        # 8 range tasks x 16 leaves = 128 data-sized files, so the
        # timing compares rewrite work, not per-task launch overhead
        # the fat incompressible-ish payload makes the REWRITE the
        # dominant cost (as at real scale), while the detect scans
        # stay key-column-pruned and cheap
        spark.range(2_000_000).selectExpr(
            "id AS k", "id % 16 AS part", "id * 3 AS v",
            "sha2(cast(id as string), 256) AS pad"
        ).repartitionByRange(8, "k").write.partitionBy("part").parquet(
            path
        )
        # ONE re-bucketed sliver: 1000 keys move to a new leaf
        spark.read.parquet(path).where("k < 1000").withColumn(
            "part", F.lit(99)
        ).coalesce(1).write.mode("append").partitionBy("part").parquet(
            path
        )

    pa, pb = str(tmp_path / "full"), str(tmp_path / "scoped")
    build(pa)
    build(pb)
    spark.read.parquet(pa).count()  # warm-up off the clock

    t0 = time.time()
    rf = relayout_parquet(spark, pa, ["k"], scope="full")
    t_full = time.time() - t0
    t1 = time.time()
    rs = relayout_parquet(spark, pb, ["k"])  # auto → file grain
    t_scoped = time.time() - t1

    assert rf["rewritten"] and rs["rewritten"] and rs["scoped"]
    assert rf["rows_after"] == rs["rows_after"] == 2_000_000
    assert rf["n_dup_rows"] == rs["n_dup_rows"] == 1_000
    assert rf["n_files_rewritten"] == rf["n_files_before"]
    # the sliver file plus the handful of hot-key-range files
    assert rs["n_files_rewritten"] < rs["n_files_before"] * 0.25
    assert spark.read.parquet(pb).count() == 2_000_000
    print(
        f"STRESS relayout full {t_full:.2f}s vs scoped {t_scoped:.2f}s "
        f"({rs['n_files_rewritten']}/{rs['n_files_before']} files)"
    )
    # scoped pays the key-pruned count plus the semi-join detect where
    # full pays the count plus the whole rewrite — with data-sized
    # files the rewrite dominates and the gap tracks the dup fraction
    # (the structural claim is the n_files_rewritten assertion above;
    # measured 0.54x on a ~1.3x-contended window, 0.65 leaves margin)
    assert t_scoped < t_full * 0.65, (t_scoped, t_full)
