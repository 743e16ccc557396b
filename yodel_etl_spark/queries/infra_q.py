"""Lakehouse-maintenance benchmark queries: the operators a 100 TB
corpus pays for EVERY DAY — small-file compaction, training-shard
export with verified read-back, incremental rollup upkeep, and the
index-gated streaming ingest loop — registered so their cost is a
recorded per-round bench number instead of a pytest-only proof (the
``zorder`` precedent: at scale the write/maintenance path is a query
cost like any read).

All rows-only by design: each query's measured artifact is a side
effect (files rewritten, shards written, a table upserted, an index
extended); correctness is pinned at file/byte level in
tests/test_compact.py, tests/test_shards.py, tests/test_rollup.py and
tests/test_streaming.py, and the returned aggregates are exact integer
reductions so the rows-only stability check keeps deterministic
values.  A SQL oracle would only re-state the batch twins that are
already oracle-backed (ev_daily, dedup_minhash_lsh).
"""

from __future__ import annotations

import atexit
import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.queries._util import cents
from yodel_etl_spark.queries.layout_q import _scratch_root
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables, spread

_CLEANUP_REGISTERED: set[str] = set()


def _work_dir(name: str, sf_dir: str) -> str:
    """Fresh pid-keyed scratch dir (tmpfs-preferred, atexit-removed —
    the layout_q conventions) wiped at every call: bench re-runs each
    query several times and these queries require an absent/empty
    target to stay deterministic run-over-run."""
    path = os.path.join(
        _scratch_root(),
        f"yodel_{name}_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    shutil.rmtree(path, ignore_errors=True)
    if path not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


def _clone_tree(src: str, dst: str) -> None:
    """Hardlink-clone a pristine fixture tree into ``dst`` — the
    maintenance benches' analogue of the ingest trio's per-process
    source fixture (fixture construction is SETUP, not the operator
    under measurement).  Parquet files are immutable and every
    maintenance op rewrites by staging NEW files and unlinking old
    ones, never writing in place, so hardlinked bytes can never leak a
    mutation back into the pristine copy; the clone costs one dirent
    per file instead of re-running the fixture's Spark writes inside
    every timed sample."""
    for root, _dirs, fns in os.walk(src):
        rel = os.path.relpath(root, src)
        out = dst if rel == "." else os.path.join(dst, rel)
        os.makedirs(out, exist_ok=True)
        for fn in fns:
            os.link(os.path.join(root, fn), os.path.join(out, fn))


def _pristine_src(name: str, sf_dir: str, build) -> str:
    """Per-process pristine fixture tree for a maintenance bench,
    built ONCE by ``build(src)`` and reused across bench samples (the
    ``_ingest_src`` conventions: pid-keyed tmpfs path, atexit-removed;
    the completion marker is a SIBLING file written after the build so
    a crashed half-built tree is rebuilt, never trusted).  The key
    includes a hash of the FULL ``sf_dir`` path, not just its basename:
    two data dirs sharing a basename in one process must not hit the
    same marker-validated cache and serve the wrong corpus."""
    sf_key = (
        os.path.basename(sf_dir.rstrip("/"))
        + "_"
        + hashlib.md5(sf_dir.rstrip("/").encode("utf-8")).hexdigest()[:8]
    )
    src = os.path.join(
        _scratch_root(),
        f"yodel_{name}_src_{sf_key}_{os.getpid()}",
    )
    marker = src + ".ok"
    if os.path.isfile(marker):
        return src
    shutil.rmtree(src, ignore_errors=True)
    if src not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(src)
        atexit.register(shutil.rmtree, src, ignore_errors=True)
        atexit.register(_remove_quiet, marker)
    build(src)
    with open(marker, "w") as fh:
        fh.write("ok")
    return src


def _remove_quiet(path: str) -> None:
    try:
        os.remove(path)
    except OSError:
        pass


def _wipe_stage_sibling(stage_root: str) -> None:
    """The _work_dir discipline for a maintenance op's OUTSIDE-the-root
    staging sibling (compact/vacuum): wiped per call so a crashed prior
    iteration's committed stage can never install stale files into the
    fresh fixture, and atexit-registered so a mid-run crash does not
    strand it in tmpfs."""
    shutil.rmtree(stage_root, ignore_errors=True)
    if stage_root not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(stage_root)
        atexit.register(shutil.rmtree, stage_root, ignore_errors=True)


@register(
    "compact",
    oracle=None,  # the measured artifact is the FILE set (count
    # before/after, crash-safe swap) — pinned at file level in
    # tests/test_compact.py; the returned counts are exact
    doc="Small-file compaction end-to-end (io/compact.py): events is "
    "landed as two micro-batch-style appends into an event_type-"
    "partitioned table (~8 small files per leaf per append — the "
    "steady-state fragmentation signature), then compact_parquet "
    "rewrites each leaf to its target-size file count through the "
    "crash-safe two-phase swap.  Returns one row per leaf with file "
    "counts before/after and the post-compaction row count, verified "
    "against the input grain — exact values, deterministic.  The cost "
    "recorded here (read-back + coalesced rewrite) is the nightly "
    "maintenance bill a micro-batch lakehouse pays per partition.",
    tags=("io", "maintenance", "bench"),
    bench=True,
)
def compact_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.io.compact import compact_parquet

    def _build(src: str) -> None:
        ev = spread(load_tables(spark, sf_dir, ("events",))["events"]).select(
            "event_id", "user_id", "event_type", "value"
        )
        # two appends of disjoint halves, 8 writer tasks each: every
        # leaf collects up to 16 small files — the fragmentation
        # compaction exists for
        for half in (0, 1):
            (
                ev.where(F.pmod("event_id", F.lit(2)) == half)
                .repartition(8, "event_id")
                .write.mode("append")
                .partitionBy("event_type")
                .parquet(src)
            )

    # fixture built once per process, hardlink-cloned per sample (r15:
    # the _ingest_src setup-not-operator convention — timed samples
    # record the COMPACTION's cost, not the fixture's Spark writes)
    src = _pristine_src("compact", sf_dir, _build)
    path = _work_dir("compact", sf_dir)
    from yodel_etl_spark.io.compact import compact_stage_root

    _wipe_stage_sibling(compact_stage_root(path))  # same hazard as vac
    _clone_tree(src, path)
    # 4 leaves rewrite concurrently — the nightly-window lever at scale
    # (thread-pool job submission; leaves are independent units)
    reports = compact_parquet(spark, path, max_concurrency=4)
    n_rows = {
        r["event_type"]: r["n"]
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = [
        (
            os.path.basename(r["dir"]).split("=", 1)[1],
            r["n_files_before"],
            r["n_files_after"],
            r["rewritten"],
            n_rows.get(os.path.basename(r["dir"]).split("=", 1)[1], 0),
        )
        for r in reports
    ]
    return spark.createDataFrame(
        sorted(rows),
        "event_type string, n_files_before int, n_files_after int, "
        "rewritten boolean, n_rows long",
    )


@register(
    "shards",
    oracle=None,  # the artifact is the shard FILES + manifest (sha256
    # digests, byte sizes); determinism and integrity-failure behavior
    # are pinned in tests/test_shards.py
    doc="Training-shard export + verified read-back (io/shards.py): "
    "documents written as 8 deterministic epoch-shuffled JSONL shards "
    "(xxhash64(seed, keys) permutation — same seed ⇒ bit-identical "
    "files) with a sha256 manifest, then read back through the "
    "integrity gate (re-digest every shard + row-count check — what a "
    "training job runs before burning GPU-hours).  Returns the "
    "manifest at shard grain plus the verified round-trip count; "
    "every value is deterministic down to the digest.",
    tags=("io", "export", "bench"),
    bench=True,
)
def shards_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.io.shards import read_training_shards, write_training_shards

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"]).select(
        "doc_id", "lang", "text"
    )
    path = _work_dir("shards", sf_dir)
    manifest = write_training_shards(
        docs, path, n_shards=8, key_cols=["doc_id"], fmt="jsonl", shuffle_seed=7
    )
    n_back = read_training_shards(spark, path, verify=True).count()
    rows = [
        (s["shard"], s["rows"], s["bytes"], s["sha256"][:16], n_back)
        for s in manifest["shards"]
    ]
    return spark.createDataFrame(
        sorted(rows),
        "shard int, rows long, bytes long, sha16 string, roundtrip_rows long",
    )


@register(
    "rollup",
    oracle=None,  # upsert ≡ recompute is the interesting surface and is
    # verified INSIDE the query (matches column) + tests/test_rollup.py;
    # the recompute itself is already oracle-backed (ev_daily)
    doc="Incremental rollup upkeep (io/rollup.py): events split into a "
    "history batch and a trailing-week delta, folded into a (day, "
    "event_type) rollup via two upsert_rollup calls — delta-grain "
    "aggregation, partition-pruned merge, dynamic-overwrite write — "
    "storing sum/count plus an AVG via the mergeable __sum/__cnt "
    "rewrite.  The result is read back through read_rollup and every "
    "row is compared exactly against the one-shot recompute "
    "(matches_recompute) — the maintenance-vs-recompute equivalence "
    "that justifies paying delta cost instead of history cost at "
    "100 TB.  Exact integer cents everywhere.",
    tags=("io", "maintenance", "bench"),
    bench=True,
)
def rollup_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.io.rollup import read_rollup, upsert_rollup

    ev = spread(load_tables(spark, sf_dir, ("events",))["events"]).select(
        F.to_date("ts").alias("d"),
        "event_type",
        cents("value").alias("value_c"),
    )
    ev = ev.persist()
    aggs = {
        "value_cents": ("sum", "value_c"),
        "n": ("count", None),
        "v_avg": ("avg", "value_c"),
    }
    path = _work_dir("rollup", sf_dir)
    # 1-row control-plane read: the delta boundary (trailing 7 days)
    dmax = ev.agg(F.max("d").alias("m")).collect()[0]["m"]
    cut = F.lit(dmax) - F.expr("INTERVAL 7 DAYS")
    upsert_rollup(spark, path, ev.where(F.col("d") < cut), "d", ["event_type"], aggs)
    upsert_rollup(spark, path, ev.where(F.col("d") >= cut), "d", ["event_type"], aggs)
    got = read_rollup(spark, path, aggs)
    want = ev.groupBy("d", "event_type").agg(
        F.sum("value_c").alias("w_cents"),
        F.count(F.lit(1)).alias("w_n"),
        (F.sum("value_c") / F.count("value_c")).alias("w_avg"),
    )
    ev.unpersist()
    return (
        got.join(want, ["d", "event_type"], "full_outer")
        .select(
            F.col("d").cast("string").alias("d"),
            "event_type",
            "n",
            "value_cents",
            F.round("v_avg", 4).alias("v_avg"),
            (
                F.col("n").eqNullSafe(F.col("w_n"))
                & F.col("value_cents").eqNullSafe(F.col("w_cents"))
                & F.col("v_avg").eqNullSafe(F.col("w_avg"))
            ).alias("matches_recompute"),
        )
    )


def _ingest_src(spark: SparkSession, sf_dir: str) -> str:
    """The ingest stream's two-file source, built ONCE per process and
    reused across bench samples: the fixture construction (two parquet
    writes of documents) is setup, not the operator under measurement —
    timed samples should record the GATE's cost.  Batch 1 = even
    doc_ids; batch 2 = odd doc_ids plus jittered copies of every 10th
    even doc (suffix-perturbed, new ids) so the cross-batch probe has
    planted work.  File mtimes are pinned 10 s apart: FileStreamSource
    orders by mtime and both appends can land in the same clock tick."""
    src = os.path.join(
        _scratch_root(),
        f"yodel_ingest_src_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if os.path.isdir(src) and any(p.startswith("part-") for p in os.listdir(src)):
        return src
    if src not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(src)
        atexit.register(shutil.rmtree, src, ignore_errors=True)
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    b1 = docs.where(F.pmod("doc_id", F.lit(2)) == 0)
    jitter = b1.where(F.pmod("doc_id", F.lit(10)) == 0).select(
        (F.col("doc_id") + F.lit(10**9)).alias("doc_id"),
        F.concat("text", F.lit(" jitterx")).alias("text"),
    )
    b2 = docs.where(F.pmod("doc_id", F.lit(2)) == 1).unionByName(jitter)
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    parts = sorted(
        (p for p in os.listdir(src) if p.startswith("part-")),
        key=lambda p: os.path.getmtime(os.path.join(src, p)),
    )
    now = os.path.getmtime(os.path.join(src, parts[-1]))
    os.utime(os.path.join(src, parts[0]), (now - 10, now - 10))
    return src


@register(
    "ingest",
    oracle=None,  # runs the REAL streaming machinery (FileStreamSource,
    # foreachBatch, persisted index extend) — the replay precedent; the
    # gating semantics are pinned in tests/test_streaming.py incl. the
    # crash-window ordering tests
    doc="Index-gated streaming ingest micro-bench (scale/dedup.py "
    "near_dedup_ingest): documents replayed as a TWO-micro-batch file "
    "stream (maxFilesPerTrigger=1) through the MinHash-gated landing "
    "loop — in-batch LSH collapse, probe of the persisted index "
    "accumulated by earlier batches, survivor append + delta-only "
    "index extend.  Batch 2 carries jittered copies of batch-1 "
    "documents; exactly one member of each jitter pair lands "
    "regardless of batch order, so the summary (n_input, n_landed, "
    "n_gated) is deterministic.  The two-file source is a per-process "
    "fixture built once and reused across samples (construction is "
    "setup, not the operator) — timed samples record the GATE's cost "
    "(sign-once tables, in-batch collapse, probe, snapshot, 3 writes "
    "× 2 micro-batches): at 100 TB this loop IS the front door of "
    "the corpus.",
    tags=("streaming", "dedup", "bench"),
    bench=True,
)
def ingest_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.dedup import near_dedup_ingest

    src = _ingest_src(spark, sf_dir)
    root = _work_dir("ingest", sf_dir)
    index, corpus, ckpt = (os.path.join(root, d) for d in ("idx", "corp", "ckpt"))
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    n_input = spark.read.parquet(src).count()  # one job over both files
    land = near_dedup_ingest(index, corpus, threshold=0.8)
    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("ingest replay did not drain in 600s")
    n_landed = spark.read.parquet(corpus).select("doc_id").distinct().count()
    return spark.createDataFrame(
        [(n_input, n_landed, n_input - n_landed)],
        "n_input long, n_landed long, n_gated long",
    )


def _singest_src(spark: SparkSession, sf_dir: str) -> str:
    """Two-file SKETCH-stream fixture for the Hamming ingest gate,
    built once per process (the _ingest_src conventions: construction
    is setup, not the operator; mtimes pinned 10 s apart so
    FileStreamSource's mtime order is deterministic).  Sketches are
    xxhash64(text) — a deterministic stand-in for the dHash/audio-
    fingerprint kernels, whose cost the multimodal families already
    bench; the GATE should be measured alone.  Batch 1 = even doc_ids;
    batch 2 = odd doc_ids plus 2-bit-flipped twins of every 10th
    batch-1 sketch under fresh ids, so the cross-batch probe has
    guaranteed hits inside max_distance=3 (random 64-bit sketches sit
    ~32 bits apart — planted twins are the only pairs in range)."""
    src = os.path.join(
        _scratch_root(),
        f"yodel_singest_src_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if os.path.isdir(src) and any(p.startswith("part-") for p in os.listdir(src)):
        return src
    if src not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(src)
        atexit.register(shutil.rmtree, src, ignore_errors=True)
    docs = load_tables(spark, sf_dir, ("documents",))["documents"].select(
        F.col("doc_id").alias("doc"), F.xxhash64("text").alias("sim")
    )
    b1 = docs.where(F.pmod("doc", F.lit(2)) == 0)
    twins = b1.where(F.pmod("doc", F.lit(10)) == 0).select(
        (F.col("doc") + F.lit(10**9)).alias("doc"),
        F.col("sim").bitwiseXOR(F.lit(0b101)).alias("sim"),
    )
    b2 = docs.where(F.pmod("doc", F.lit(2)) == 1).unionByName(twins)
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    parts = sorted(
        (p for p in os.listdir(src) if p.startswith("part-")),
        key=lambda p: os.path.getmtime(os.path.join(src, p)),
    )
    now = os.path.getmtime(os.path.join(src, parts[-1]))
    os.utime(os.path.join(src, parts[0]), (now - 10, now - 10))
    return src


@register(
    "singest",
    oracle=None,  # real streaming machinery (FileStreamSource,
    # foreachBatch, persisted Hamming index extend); gating semantics +
    # crash-window ordering + cache-release-on-retry pinned in
    # tests/test_streaming.py (sketch_dedup_ingest suite)
    doc="Hamming-index-gated streaming ingest micro-bench (scale/"
    "dedup.py sketch_dedup_ingest) — the image-dHash/audio-fingerprint "
    "twin of `ingest`, so the multimodal corpus front door gets the "
    "same cross-round cost trail as text: two micro-batches of 64-bit "
    "sketches through in-batch pigeonhole-banded collapse, persisted-"
    "index probe, survivor append + delta-only extend_hamming_index.  "
    "Batch 2 plants 2-bit-flipped twins of batch-1 sketches; exactly "
    "one member of each pair lands regardless of batch order, so "
    "(n_input, n_landed, n_gated) is deterministic.  Cheaper than "
    "`ingest` by construction — the sketch gate shuffles 16 bytes/row "
    "where the text gate signs shingles — which is exactly the "
    "comparison the two benches exist to record.",
    tags=("streaming", "dedup", "multimodal", "bench"),
    bench=True,
)
def sketch_ingest_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.dedup import sketch_dedup_ingest

    src = _singest_src(spark, sf_dir)
    root = _work_dir("singest", sf_dir)
    index, corpus, ckpt = (os.path.join(root, d) for d in ("idx", "corp", "ckpt"))
    n_input = spark.read.parquet(src).count()
    land = sketch_dedup_ingest(index, corpus, max_distance=3)
    q = (
        spark.readStream.schema("doc long, sim long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("singest replay did not drain in 600s")
    n_landed = spark.read.parquet(corpus).select("doc").distinct().count()
    return spark.createDataFrame(
        [(n_input, n_landed, n_input - n_landed)],
        "n_input long, n_landed long, n_gated long",
    )


def _eingest_src(spark: SparkSession, sf_dir: str) -> str:
    """Two-file EMBEDDING-stream fixture for the ANN ingest gate (the
    _ingest_src/_singest_src conventions: per-process, construction is
    setup, mtimes pinned 10 s apart).  Batch 1 = even vec_ids; batch 2
    = odd vec_ids plus 0.98/0.02 rotate-blend twins of every 10th
    batch-1 vector under fresh ids (cos ≈ 0.9998 — the re-encoded-
    duplicate case), so the cross-batch IVF probe has guaranteed hits
    at threshold 0.9."""
    src = os.path.join(
        _scratch_root(),
        f"yodel_eingest_src_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if os.path.isdir(src) and any(p.startswith("part-") for p in os.listdir(src)):
        return src
    if src not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(src)
        atexit.register(shutil.rmtree, src, ignore_errors=True)
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    b1 = emb.where(F.pmod("vec_id", F.lit(2)) == 0)
    twins = b1.where(F.pmod("vec_id", F.lit(10)) == 0).select(
        (F.col("vec_id") + F.lit(10**9)).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> 0.98 * x + "
            "0.02 * embedding[(i + 1) % size(embedding)])"
        ).alias("embedding"),
    )
    b2 = emb.where(F.pmod("vec_id", F.lit(2)) == 1).unionByName(twins)
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    parts = sorted(
        (p for p in os.listdir(src) if p.startswith("part-")),
        key=lambda p: os.path.getmtime(os.path.join(src, p)),
    )
    now = os.path.getmtime(os.path.join(src, parts[-1]))
    os.utime(os.path.join(src, parts[0]), (now - 10, now - 10))
    return src


@register(
    "eingest",
    oracle=None,  # real streaming machinery through the ANN gate;
    # gating semantics, crash windows (both branches), cache release
    # and the component-map leg pinned in tests/test_streaming.py,
    # extend/probe primitives in tests/test_scale_similarity.py
    doc="IVF-index-gated embedding ingest micro-bench (scale/dedup.py "
    "embedding_dedup_ingest) — the ANN member of the front-door trio "
    "(`ingest` text, `singest` sketches), so every corpus modality "
    "carries a cross-round ingest cost trail: two micro-batches of "
    "embeddings through in-batch hyperplane-LSH + exact-cosine "
    "collapse, persisted-IVF probe (approximate by design — recall "
    "follows nprobe; a miss degrades to a redundant corpus row, never "
    "loss), survivor append + delta-only extend_ivf_index against the "
    "frozen first-batch centroids.  Batch 2 plants rotate-blend twins "
    "of batch-1 vectors; exactly one member of each pair lands "
    "regardless of batch order — (n_input, n_landed, n_gated) is "
    "deterministic.",
    tags=("streaming", "dedup", "similarity", "bench"),
    bench=True,
)
def embedding_ingest_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.dedup import embedding_dedup_ingest

    src = _eingest_src(spark, sf_dir)
    root = _work_dir("eingest", sf_dir)
    index, corpus, ckpt = (os.path.join(root, d) for d in ("idx", "corp", "ckpt"))
    n_input = spark.read.parquet(src).count()
    land = embedding_dedup_ingest(index, corpus, threshold=0.9, nprobe=3)
    q = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(600):
        q.stop()
        raise TimeoutError("eingest replay did not drain in 600s")
    n_landed = spark.read.parquet(corpus).select("vec_id").distinct().count()
    return spark.createDataFrame(
        [(n_input, n_landed, n_input - n_landed)],
        "n_input long, n_landed long, n_gated long",
    )


@register(
    "vac",
    oracle=None,  # the measured artifact is the corpus FILE/ROW set
    # through the two-phase swap — crash windows, key preservation and
    # gate integration pinned at file level in tests/test_compact.py;
    # the returned counts are exact and deterministic
    doc="Corpus vacuum end-to-end (io/compact.py vacuum_parquet) — the "
    "closing move of the ingest-gate at-least-once contract: a gate "
    "crash between corpus append and index extend replays into a "
    "duplicate corpus append (never loss), and this op collapses those "
    "duplicates.  Fixture replicates the exact artifact: one "
    "embeddings batch appended TWICE (the replay) plus a second batch "
    "once; vacuum keeps one row per vec_id through the same staged "
    "two-phase swap as compaction (commit = atomically-renamed "
    "manifest, install-then-retire — a crash can only add duplicates, "
    "never lose a key).  Returns (rows_before, rows_after, n_dup_rows, "
    "files_before, files_after, verified) with verified re-counted "
    "from the vacuumed corpus.  Rows-only: maintenance cost trail, "
    "like `compact` and `rollup`.",
    tags=("io", "maintenance", "dedup", "bench"),
    bench=True,
)
def vacuum_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.io.compact import vacuum_parquet

    def _build(src: str) -> None:
        emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].select(
            "vec_id", "embedding"
        )
        b1 = emb.where(F.col("vec_id") % 3 != 0)
        b2 = emb.where(F.col("vec_id") % 3 == 0)
        b1.write.mode("append").parquet(src)
        b1.write.mode("append").parquet(src)  # the at-least-once replay
        b2.write.mode("append").parquet(src)

    from yodel_etl_spark.io.compact import vacuum_stage_root

    # fixture built once per process, hardlink-cloned per sample (r15:
    # the _ingest_src setup-not-operator convention — timed samples
    # record the VACUUM's cost, not the fixture's three Spark appends)
    src = _pristine_src("vac", sf_dir, _build)
    path = _work_dir("vac", sf_dir)
    # the vacuum's swap stage lives OUTSIDE the table root (compaction
    # convention), so the work dir's wipe/atexit does not cover it:
    # wipe it per call (a crashed prior iteration's COMMITTED stage
    # would otherwise install last run's files into the fresh corpus —
    # the _work_dir determinism rule) and register it for exit cleanup
    _wipe_stage_sibling(vacuum_stage_root(path))
    _clone_tree(src, path)
    rep = vacuum_parquet(spark, path, ["vec_id"])
    # verify with a PLAIN row count: distinct() would equal rows_after
    # even if the vacuum no-opped (it cannot see a failed collapse) —
    # the plain count matches rows_after only when the duplicates were
    # actually removed from the files
    verified = spark.read.parquet(path).count()
    return spark.createDataFrame(
        [
            (
                rep["rows_before"],
                rep["rows_after"],
                rep["n_dup_rows"],
                rep["n_files_before"],
                rep["n_files_after"],
                verified,
            )
        ],
        "rows_before long, rows_after long, n_dup_rows long, "
        "files_before long, files_after long, verified long",
    )


@register(
    "delw",
    oracle=None,  # the measured artifact is the partitioned corpus FILE/
    # ROW set through per-leaf vacuum + two predicate deletes — crash
    # windows, NULL-survival, zero-match byte-identity, replay-copy
    # removal and the TTL manifest-only partition drop are pinned at
    # file level in tests/test_compact.py; the returned counts are
    # exact integer reductions, deterministic run-over-run
    doc="Partitioned-corpus maintenance end-to-end (io/compact.py "
    "vacuum_parquet per_leaf=True + delete_parquet_where) — the "
    "retention/compliance leg of the table-maintenance family, giving "
    "both round-13 operators a recorded per-round cost trail: events "
    "lands as an event_type-partitioned corpus with one batch appended "
    "TWICE (the ingest-gate at-least-once replay artifact), per-leaf "
    "vacuum collapses the duplicates leaf-independently (4 leaves "
    "concurrently — the maintenance-window lever), then TWO deletes "
    "run the headline shapes: a PARTITION-column predicate "
    "(event_type = 'error' — the TTL/poisoned-partition purge, whole-"
    "leaf manifest-only retire: zero write amplification) and a DATA-"
    "column predicate (event_id % 10 = 7 — the opt-out/takedown "
    "removal, per-leaf survivor rewrite; untouched leaves stay byte-"
    "identical).  An r15 third leg re-buckets 1-in-9 survivors under a "
    "new event_type (mutable-metadata cross-partition duplicates, the "
    "shape per-leaf vacuum refuses) and relayout_parquet collapses "
    "them globally.  Returns one row of exact counts with `verified` "
    "re-counted PLAIN from the final corpus (a no-opped delete, "
    "vacuum, or re-layout cannot hide — the vacuum_bench convention).  "
    "Rows-only: maintenance cost trail, like `compact`/`vac`/`rollup`.",
    tags=("io", "maintenance", "bench"),
    bench=True,
)
def delete_where_bench(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.io.compact import (
        delete_parquet_where,
        delete_stage_root,
        relayout_parquet,
        relayout_stage_root,
        vacuum_parquet,
        vacuum_stage_root,
    )

    def _build(src: str) -> None:
        ev = spread(load_tables(spark, sf_dir, ("events",))["events"]).select(
            "event_id", "user_id", "event_type", "value"
        )
        # 4 writer tasks per append (coalesce — no shuffle): a replayed
        # micro-batch is a handful of files per leaf, not one per
        # shuffle partition; 3 appends × 4 tasks × 5 leaves ≈ 60 files
        b1 = ev.where(F.pmod("event_id", F.lit(3)) != 0).coalesce(4)
        b2 = ev.where(F.pmod("event_id", F.lit(3)) == 0).coalesce(4)
        b1.write.mode("append").partitionBy("event_type").parquet(src)
        b2.write.mode("append").partitionBy("event_type").parquet(src)
        b2.write.mode("append").partitionBy("event_type").parquet(src)  # replay

    # fixture built once per process, hardlink-cloned per sample (r15:
    # the _ingest_src setup-not-operator convention — timed samples
    # record the maintenance chain's cost, not the fixture's three
    # partitioned Spark appends; the mid-chain re-bucket append stays
    # timed because it reads the post-delete corpus)
    src = _pristine_src("delw", sf_dir, _build)
    path = _work_dir("delw", sf_dir)
    # both ops stage OUTSIDE the table root (compaction convention): the
    # work dir's wipe/atexit does not cover the siblings — wipe per call
    # (a crashed prior iteration's committed stage would otherwise
    # install stale files into the fresh corpus) and register for exit
    _wipe_stage_sibling(vacuum_stage_root(path))
    _wipe_stage_sibling(delete_stage_root(path))
    _wipe_stage_sibling(relayout_stage_root(path))
    _clone_tree(src, path)
    vrep = vacuum_parquet(
        spark, path, ["event_id"], per_leaf=True, max_concurrency=4
    )
    ttl = delete_parquet_where(
        spark, path, "event_type = 'error'", max_concurrency=4
    )
    rowdel = delete_parquet_where(
        spark,
        path,
        F.pmod(F.col("event_id"), F.lit(10)) == F.lit(7),
        max_concurrency=4,
    )
    # third leg (r15): mutable-metadata re-bucketing — 1-in-9 of the
    # survivors re-lands under a NEW event_type value (the cross-
    # partition duplicate shape per-leaf vacuum refuses), then the
    # re-layout collapses them globally: one key shuffle + one
    # clustered partitioned write through the staged tree swap
    moved = spark.read.parquet(path).where(
        F.pmod(F.col("event_id"), F.lit(9)) == F.lit(1)
    )
    moved.withColumn("event_type", F.lit("rebucketed")).coalesce(
        4
    ).write.mode("append").partitionBy("event_type").parquet(path)
    rrep = relayout_parquet(spark, path, ["event_id"], max_concurrency=4)
    # PLAIN re-count: matches relayout's rows_after only if the replay
    # duplicates really collapsed, both deletes really removed their
    # rows from files, AND the re-layout really folded the re-bucketed
    # copies — no stage of the chain can silently no-op
    verified = spark.read.parquet(path).count()
    return spark.createDataFrame(
        [
            (
                vrep["rows_before"],
                vrep["n_dup_rows"],
                ttl["n_deleted"],
                sum(1 for r in ttl["leaves"] if r["n_files_after"] == 0),
                rowdel["n_deleted"],
                rowdel["rows_after"],
                rowdel["n_files_after"],
                rrep["n_dup_rows"],
                rrep["rows_after"],
                verified,
            )
        ],
        "rows_before long, dup_rows long, ttl_deleted long, "
        "ttl_leaves_dropped long, row_deleted long, rows_after long, "
        "files_after long, relayout_dups long, relayout_rows long, "
        "verified long",
    )
