"""Similarity search over embedding columns (``array<float>``).

Correctness path: blocked brute-force cosine — exact, oracle-checkable.
Scale paths:
  * IVF — coarse quantization: assign vectors to the nearest of C
    centroids (one broadcast pass), search only ``nprobe`` closest
    cells per query → candidate set ≈ n·nprobe/C instead of n².
  * Random-hyperplane LSH (cosine sketch): sign bits against H
    deterministic hyperplanes → Hamming-banded candidate join, same
    shape as SimHash banding.

All dot products fold in index order with double accumulation
(``F.aggregate``), so scores are bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from yodel_etl_spark.session import register_persisted


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (index order, double acc)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Embedding near-dup: all pairs with cosine ≥ threshold.

    Brute force (broadcast self-join) — exact; at 100 TB swap the
    candidate generator for :func:`hyperplane_lsh_pairs` and keep this
    verify step.  Norms are computed once per side before the join."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).withColumn(
        "nrm", norm(F.col("vec"))
    )
    a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
    )
    return pairs.where(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine_r")
    )


def brute_force_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: Column,
    topk: int = 5,
) -> DataFrame:
    """Exact top-k neighbors for the rows matching ``query_ids``.

    Queries are broadcast (the small side); rank orders by
    (rounded score DESC, neighbor id) so ties are deterministic."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).withColumn(
        "nrm", norm(F.col("vec"))
    )
    q = v.where(query_ids).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("id") != F.col("query_id"))
        .withColumn("cosine", dot(F.col("vec"), F.col("qv")) / (F.col("nrm") * F.col("qn")))
        .withColumn("cosine_r", F.round("cosine", 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_r").desc(), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", F.col("id").alias("neighbor_id"), "rank", "cosine_r")
    )


def is_centroid_id(col: Column, centroid_every: int) -> Column:
    """THE centroid-selection predicate — every ``centroid_every``-th
    vector by id.  Single definition shared by the index build and the
    embedding gate's pre-append feasibility check: if these two ever
    diverged, the gate would refuse buildable batches (or worse, append
    a never-buildable batch to the corpus first)."""
    return col % centroid_every == 0


def _nearest_cells(
    frame: DataFrame, cents: DataFrame, key: str, vec: str, n: int
) -> DataFrame:
    """``frame`` + its ``n`` nearest centroid cells by cosine:
    broadcast the (small) centroid table, deterministic tie-break on
    cell id.  The single definition of 'nearest cell' shared by index
    build, delta extend, serving, and probe — the nprobe/assignment
    geometry must be identical everywhere or extends and probes
    disagree about where a vector lives.

    Ranking is ORDERING-semantics over ``(sim DESC, cell ASC)`` in both
    physical forms below: NaN ranks above every real sim (Spark sorts
    and aggregates NaN as the largest double), NULL sims rank last, and
    sim ties break toward the smaller cell.

    ``n == 1`` (index build / delta extend / assignment — the hot
    write-side paths) uses ``max_by`` over ``struct(sim, ~cell)``
    instead of a ``row_number`` window: ``max_by`` ranks by the same
    interpreted ordering a sort uses (NaN largest, NULLs smallest — a
    NULL-sim struct loses to any real-sim struct exactly like
    DESC-NULLS-LAST; parity pinned in tests/test_r16_opt.py).  Plan
    effect (plans/r16): the window form ran Sort + WindowGroupLimit on
    BOTH sides of its exchange plus the Window rank itself and the
    rank filter; the aggregate form is one partial/final ``max_by``
    pair.  Shuffled volume is comparable on Spark ≥ 3.5 (the window's
    map-side WindowGroupLimit already pre-limits each key's
    ``n_cells`` candidates to one row before the exchange — every
    key's candidates are co-located, the broadcast crossJoin
    replicates in place); on engines without that rewrite the window
    form exchanges the full ``n_cells×`` candidate multiplication
    while partial aggregation always collapses map-side.  ``~cell``
    (bitwise NOT) reverses long order with no MIN_VALUE overflow,
    turning max into the cell-ASC tie-break."""
    scored = frame.crossJoin(F.broadcast(cents)).withColumn(
        "sim", cosine(F.col(vec), F.col("cvec"))
    )
    if n == 1:
        out_cols = [c for c in frame.columns] + ["cell"]
        carry = F.struct(
            *[F.col(c) for c in frame.columns if c != key], F.col("cell")
        )
        best = scored.groupBy(key).agg(
            F.max_by(
                carry, F.struct(F.col("sim"), F.bitwise_not(F.col("cell")))
            ).alias("_best")
        )
        return best.select(
            *[
                F.col(c) if c == key else F.col(f"_best.{c}")
                for c in out_cols
            ]
        )
    w = Window.partitionBy(key).orderBy(F.col("sim").desc(), F.col("cell"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= n)
        .drop("rk", "sim", "cvec")
    )


def assign_ivf_cells(
    df: DataFrame, id_col: str, vec_col: str, centroid_every: int = 50
) -> tuple[DataFrame, DataFrame]:
    """Deterministic training-free IVF: every ``centroid_every``-th
    vector (by id) is a centroid; each vector joins its nearest
    centroid by cosine.  Returns (assignments, centroids)."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    cents = v.where(is_centroid_id(F.col("id"), centroid_every)).select(
        F.col("id").alias("cell"), F.col("vec").alias("cvec")
    )
    assign = _nearest_cells(v, cents, "id", "vec", 1).select("id", "vec", "cell")
    return assign, cents


def ivf_search(
    assign: DataFrame,
    cents: DataFrame,
    queries: DataFrame,
    topk: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """Serve approximate top-k from a PRE-BUILT IVF index — the
    build-once/query-many split a real deployment runs (the index is a
    pair of plain DataFrames, so it persists as parquet and reloads in
    any later session; see :func:`ivf_index_write`/:func:`ivf_index_read`).

    ``assign`` is the (id, vec, cell) posting table, ``cents`` the
    (cell, cvec) centroid table, ``queries`` an external (query_id, qv)
    batch — query vectors need not be index members; index members are
    excluded from their own result list."""
    qcells = _nearest_cells(queries, cents, "query_id", "qv", nprobe).select(
        "query_id", "qv", "cell"
    )
    cand = qcells.join(assign, "cell").where(F.col("id") != F.col("query_id"))
    scored = cand.withColumn("cosine", cosine(F.col("vec"), F.col("qv"))).withColumn(
        "cosine_r", F.round("cosine", 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_r").desc(), F.col("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", F.col("id").alias("neighbor_id"), "rank", "cosine_r")
    )


def _ivf_fs(spark, path: str):
    """Hadoop FileSystem handle (local FS in tests, HDFS/S3 at scale —
    the cluster._map_fs convention)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()), jvm


def _write_ivf_params(spark, path: str, params: dict) -> None:
    """1-row build metadata as DRIVER-SIDE JSON (tmp + atomic rename)
    through the Hadoop FS client — a Spark job for three integers is
    pure per-job constant (the dominant cost of the ingest
    micro-benches; see BASELINE's eingest phase decomposition).

    Publish window: ``delete(dst)`` + ``rename(tmp, dst)`` is two FS
    ops (HDFS/S3A rename refuses an existing destination, so the
    delete cannot be folded away).  A crash between them leaves the
    FULLY-STAGED tmp next to a missing dst; :func:`_read_ivf_params`
    rolls that forward — the window can delay the publish, never lose
    or corrupt it."""
    import json

    fs, jvm = _ivf_fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}/params.json.tmp")
    dst = jvm.org.apache.hadoop.fs.Path(f"{path}/params.json")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(json.dumps(params).encode("utf-8")))
    finally:
        out.close()
    fs.delete(dst, False)
    if not fs.rename(tmp, dst):
        # rename is the publish point — a silent false would leave NO
        # params.json after a successful build (the max_fatness guard
        # would then refuse until a manual rebuild); surface it.  The
        # staged tmp is complete, so readers roll forward read-only in
        # the meantime (see _read_ivf_params)
        raise OSError(
            f"params publish rename failed: {path}/params.json.tmp -> "
            "params.json (staged params are complete; readers serve the "
            "tmp until the next successful publish)"
        )


def _fs_read_json(fs, p) -> dict | None:
    """Parsed JSON at Hadoop path ``p``, or None when absent/partial
    (a tmp file whose staging write crashed mid-stream)."""
    import json

    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    try:
        return json.loads(data.decode("utf-8"))
    except ValueError:
        return None


def _read_ivf_params(spark, path: str) -> dict | None:
    """Params dict, or None for a pre-params index.

    Roll-forward for the publish window in :func:`_write_ivf_params`,
    READ-ONLY: when ``params.json`` is missing but a COMPLETE
    ``params.json.tmp`` exists (the writer staged the full content,
    then crashed between its delete and rename — or is live inside
    that same delete→rename instant), the tmp's content IS the params
    and is served as-is, so ``max_fatness`` enforcement keeps working
    across the crash instead of refusing until a manual rebuild.  The
    reader deliberately does NOT complete the rename: a reader-side
    rename racing a LIVE writer (reader promotes tmp while the writer
    is between its own tmp create and delete(dst)) would make the
    writer delete the just-promoted file and its rename fail — the
    publish window must have exactly one mutator.  The window heals at
    the next successful publish, which overwrites the tmp and renames.
    A tmp that fails to parse is a mid-stage crash artifact (dst, if
    any, is still the truth) and is ignored."""
    fs, jvm = _ivf_fs(spark, path)
    dst = jvm.org.apache.hadoop.fs.Path(f"{path}/params.json")
    got = _fs_read_json(fs, dst)
    if got is not None:
        return got
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}/params.json.tmp")
    return _fs_read_json(fs, tmp)


class StaleIVFIndexError(RuntimeError):
    """An extend would push the index past the caller's cell-fatness
    bound: the frozen centroid set no longer matches the corpus density
    and probe candidate counts have drifted past budget.  Rebuild with
    :func:`rebuild_ivf_index` (from the corpus, not the index) and
    retry — raised BEFORE any write, so nothing needs undoing."""


def ivf_index_write(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    centroid_every: int = 50,
) -> None:
    """Materialize the IVF index to ``path`` (parquet ``assignments``
    and ``centroids`` plus a driver-side ``params.json``).  At 100 TB
    this is the build phase that runs once per corpus snapshot; doubles
    stay bit-exact through parquet, so a reloaded index reproduces
    search results row for row.  ``params.json`` (centroid_every plus
    the build-time vector/cell counts) is the denominator the
    staleness probe (:func:`ivf_index_stats`) and the ``max_fatness``
    extend guard compare against."""
    assign, cents = assign_ivf_cells(df, id_col, vec_col, centroid_every)
    spark = df.sparkSession
    # old centroids marker FIRST, new centroids LAST: existence checks
    # key on centroids, so from the delete to the final write the path
    # reads as 'no index' — a crash mid-build (or the no-centroid
    # refusal below) can therefore never leave a STALE centroid table
    # paired with a fresh/empty posting table, which would look like a
    # valid index whose probes silently miss every stored vector (the
    # family's forbidden mode; re-building over an existing snapshot
    # is the documented once-per-corpus-snapshot usage).  Both
    # build-time counts come from ONE aggregate over the just-written
    # (small) posting table — every centroid is itself a corpus row,
    # so the centroid count is a predicate sum, not a second scan of
    # the corpus (job count is the dominant cost of the ingest
    # micro-benches; see BASELINE's eingest phase decomposition).
    fs, jvm = _ivf_fs(spark, path)
    fs.delete(jvm.org.apache.hadoop.fs.Path(f"{path}/centroids"), True)
    assign.write.mode("overwrite").parquet(f"{path}/assignments")
    row = (
        spark.read.parquet(f"{path}/assignments")
        .agg(
            F.count(F.lit(1)).alias("nv"),
            F.sum(
                is_centroid_id(F.col("id"), centroid_every).cast("long")
            ).alias("nc"),
        )
        .first()
    )
    if not row["nc"]:
        # a corpus with no id ≡ 0 (mod centroid_every) selects zero
        # centroids, which would silently persist an EMPTY posting
        # table (every stored vector unreachable, every later probe a
        # miss) — refuse instead of degrading; the orphaned assignments
        # carry no centroids marker, so nothing reads as an index
        raise ValueError(
            f"no centroid selected: no id divisible by {centroid_every} "
            "in the corpus; lower centroid_every or remap ids"
        )
    _write_ivf_params(
        spark,
        path,
        {
            "centroid_every": int(centroid_every),
            "n_vectors": int(row["nv"]),
            "n_cells": int(row["nc"]),
        },
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_index_read(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Reload an index written by :func:`ivf_index_write`."""
    return (
        spark.read.parquet(f"{path}/assignments"),
        spark.read.parquet(f"{path}/centroids"),
    )


def ivf_params_mtime(spark, path: str) -> int | None:
    """Modification time (epoch ms) of the index's published params —
    ``params.json``, or the staged ``params.json.tmp`` while the
    publish window is open — or None for a pre-params index.  ONE
    ``getFileStatus`` FS op, no Spark job: the change-detection probe
    a long-lived guard needs to notice that :func:`rebuild_ivf_index`
    republished params (new denominators) while its stream was live."""
    fs, jvm = _ivf_fs(spark, path)
    for name in ("params.json", "params.json.tmp"):
        p = jvm.org.apache.hadoop.fs.Path(f"{path}/{name}")
        try:
            return int(fs.getFileStatus(p).getModificationTime())
        except Exception:
            continue
    return None


def ivf_index_stats(spark, path: str) -> dict:
    """Cell-fatness probe for a persisted IVF index — the staleness
    gauge the frozen-centroid trade requires (see
    :func:`extend_ivf_index`).  One map-side-combined cell-grain
    aggregate over the posting table plus the 1-row ``params`` read:

    - ``n_vectors`` / ``n_cells``: current posting rows and built cells
    - ``mean_cell`` / ``max_cell``: current rows per built cell (mean
      over ALL built cells, empties included — same denominator as the
      build) and the fattest single cell (drift concentration)
    - ``built_mean``: rows per cell at build time (from ``params``;
      None for a pre-params index, which cannot gauge staleness until
      its first :func:`rebuild_ivf_index`)
    - ``fatness``: ``mean_cell / built_mean`` — 1.0 right after a
      build/rebuild, grows with every extend; the probe's candidate
      count per query scales with it."""
    assign = spark.read.parquet(f"{path}/assignments")
    row = (
        assign.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.sum("n").alias("n_vectors"),
            F.max("n").alias("max_cell"),
        )
        .first()
    )
    n_vectors = int(row["n_vectors"] or 0)
    p = _read_ivf_params(spark, path)
    if p is not None:
        n_cells = int(p["n_cells"])
        built_mean = p["n_vectors"] / p["n_cells"]
    else:  # pre-params index (built before round 12)
        n_cells = spark.read.parquet(f"{path}/centroids").count()
        built_mean = None
    mean_cell = n_vectors / n_cells if n_cells else 0.0
    return {
        "n_vectors": n_vectors,
        "n_cells": n_cells,
        "mean_cell": mean_cell,
        "max_cell": int(row["max_cell"] or 0),
        "built_mean": built_mean,
        "fatness": (mean_cell / built_mean) if built_mean else None,
    }


def extend_ivf_index(
    df: DataFrame,
    path: str,
    id_col: str,
    vec_col: str,
    max_fatness: float | None = None,
    batch_count: int | None = None,
) -> None:
    """Append a batch of vectors to an existing IVF index — delta-only
    maintenance, the embedding twin of ``extend_minhash_index``: only
    the NEW vectors score against the (broadcast) stored centroid
    table and append to ``assignments``; the accumulated corpus is
    never re-assigned.  Caller contract: ids are globally unique
    across increments (re-appending an id duplicates its posting row).

    The centroid set is FROZEN at build time on purpose — extends stay
    O(|batch|·C) and bit-deterministic, and every stored vector keeps
    a valid cell.  The cost is staleness: as the corpus outgrows the
    original centroid density, cells fatten and probe candidate counts
    drift up.  ``max_fatness`` automates the rebuild trigger (exactly
    compaction's role for small files): when set, the PROJECTED
    post-extend mean cell load vs the build-time mean
    (:func:`ivf_index_stats`) is checked BEFORE any write, and a breach
    raises :class:`StaleIVFIndexError` — run :func:`rebuild_ivf_index`
    from the corpus, then retry the extend.  The refusal is
    deterministic and side-effect-free, so a replayed caller never
    half-admits a batch.  ``batch_count`` lets a caller that already
    knows |batch| (the ingest gate counts its novelty set anyway)
    skip the guard's ``count()`` job — on the per-job-constant-
    dominated ingest path one avoided control-plane job is the whole
    point (see BASELINE's eingest phase decomposition); ignored when
    ``max_fatness`` is unset."""
    spark = df.sparkSession
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    if max_fatness is not None:
        stats = ivf_index_stats(spark, path)
        if stats["built_mean"] is None:
            raise ValueError(
                "cannot enforce max_fatness: index at "
                f"{path!r} has no params.json (pre-round-12 build); "
                "rebuild once with rebuild_ivf_index to record the "
                "build-time mean"
            )
        n_batch = v.count() if batch_count is None else int(batch_count)
        projected = (stats["n_vectors"] + n_batch) / stats["n_cells"]
        fatness = projected / stats["built_mean"]
        if fatness > max_fatness:
            raise StaleIVFIndexError(
                f"extend would push mean cell fatness to {fatness:.2f}× "
                f"the build-time mean (bound {max_fatness}×): the frozen "
                f"centroid set is stale — rebuild_ivf_index({path!r}) "
                "from the corpus, then retry"
            )
    cents = spark.read.parquet(f"{path}/centroids")
    assign = _nearest_cells(v, cents, "id", "vec", 1).select("id", "vec", "cell")
    assign.write.mode("append").parquet(f"{path}/assignments")


def rebuild_ivf_index(
    spark,
    path: str,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroid_every: int | None = None,
) -> None:
    """Rebuild a stale IVF index in place from the CORPUS (the source
    of truth the ingest gate appends before every extend) — fresh
    centroid set at the current density, fatness back to 1.0.

    Crash discipline lives in :func:`ivf_index_write` (the SINGLE
    owner of the marker ordering): it deletes the old ``centroids``
    table before touching anything, so from that instant the index
    reads as absent (``_index_exists`` keys on it) rather than ever
    pairing old centroids with new assignments — a geometry mismatch
    would make probes silently miss stored vectors, the family's
    forbidden mode.  A crash anywhere mid-rebuild therefore leaves 'no
    index'; nothing is lost (the corpus is external) and the re-run
    rebuilds from it.  ``centroid_every`` defaults to the value
    recorded in ``params`` at the previous build.

    Centroid feasibility is pre-checked HERE, before any destructive
    step: ``ivf_index_write``'s own no-centroid refusal fires only
    after its delete-first marker ordering has already torn down the
    old index, which is the right trade mid-build (a crash must read
    as 'no index') but the wrong one for a refusal this deterministic
    — a corpus with no ``id ≡ 0 (mod centroid_every)`` would turn a
    clean ValueError into 'old index destroyed, nothing built'.  One
    ``limit(1)`` probe on the corpus (rebuilds are rare; this path is
    off the job-count-sensitive ingest benches) keeps the refusal
    side-effect-free while the success path retains the single-owner
    delete-first ordering inside :func:`ivf_index_write`."""
    if centroid_every is None:
        p = _read_ivf_params(spark, path)
        if p is None:
            raise ValueError(
                f"index at {path!r} has no params.json; pass "
                "centroid_every explicitly"
            )
        centroid_every = int(p["centroid_every"])
    feasible = (
        corpus.where(is_centroid_id(F.col(id_col), centroid_every))
        .limit(1)
        .count()
    )
    if not feasible:
        raise ValueError(
            f"no centroid selected: no id divisible by {centroid_every} "
            "in the corpus; lower centroid_every or remap ids "
            "(refused BEFORE touching the existing index)"
        )
    ivf_index_write(corpus, id_col, vec_col, path, centroid_every)


def vacuum_ivf_index(spark, path: str) -> dict:
    """Replay-duplicate collapse for a persisted IVF index — the
    index-side twin of the corpus vacuum: a replayed
    ``extend_ivf_index`` appends its batch's posting rows again
    (candidates duplicate; decisions stay correct), and this collapses
    ``assignments`` to one row per id through the two-phase swap.
    Copies are byte-identical (cell assignment is deterministic
    against the frozen centroids), so any keeper is exact.  Unlike
    ``rebuild_ivf_index`` this never touches centroids or geometry —
    run it between rebuilds; note it also shrinks ``ivf_index_stats``
    fatness to the true (deduplicated) load."""
    from yodel_etl_spark.io.compact import vacuum_parquet

    return {"assignments": vacuum_parquet(spark, f"{path}/assignments", ["id"])}


def probe_ivf_index(
    spark,
    path: str,
    incoming: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    nprobe: int = 3,
) -> DataFrame:
    """Near-duplicate hits of ``incoming`` against a persisted IVF
    index: ``(id_inc, id_idx, cosine_r)`` for every stored vector with
    cosine ≥ ``threshold`` inside the ``nprobe`` nearest cells of each
    incoming vector.  Probing does not modify the index; call
    :func:`extend_ivf_index` afterwards to admit the batch.

    Honesty note (the IVF trade): recall follows the nprobe/centroid
    geometry — a duplicate stored in a cell none of the query's
    ``nprobe`` probes cover is missed.  Near-dup thresholds (≥ 0.9)
    live where query and duplicate rank the same cells first, so
    planted-twin recall is ~1 in practice (measured in tests), but the
    gate built on this is APPROXIMATE by design — unlike the exact
    MinHash-Jaccard verify, which has no geometric miss mode."""
    assign, cents = ivf_index_read(spark, path)
    q = incoming.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    qcells = _nearest_cells(q, cents, "query_id", "qv", nprobe).select(
        "query_id", "qv", "cell"
    )
    cand = qcells.join(assign, "cell")
    # threshold on the RAW cosine — the same comparison the in-batch
    # verify (hyperplane_lsh_pairs) and the MinHash/Hamming probes
    # make; thresholding the rounded value would gate boundary vectors
    # within 5e-7 BELOW threshold, and for the ingest gate that is a
    # dropped non-duplicate (silent loss, the family's forbidden mode)
    scored = cand.withColumn("cosine", cosine(F.col("vec"), F.col("qv")))
    return scored.where(F.col("cosine") >= threshold).select(
        F.col("query_id").alias("id_inc"),
        F.col("id").alias("id_idx"),
        F.round("cosine", 6).alias("cosine_r"),
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: Column,
    topk: int = 5,
    centroid_every: int = 50,
    nprobe: int = 3,
) -> DataFrame:
    """Approximate top-k: probe only the ``nprobe`` nearest IVF cells
    per query.  Candidate count ≈ n·nprobe/C — the 100 TB path.  Same
    deterministic ranking as brute force; recall measured in tests.
    Single-job convenience over :func:`ivf_search` (index built inline;
    queries drawn from the corpus by the ``query_ids`` predicate)."""
    assign, cents = assign_ivf_cells(df, id_col, vec_col, centroid_every)
    q = assign.where(query_ids).select(
        F.col("id").alias("query_id"), F.col("vec").alias("qv")
    )
    return ivf_search(assign, cents, q, topk=topk, nprobe=nprobe)


def hyperplane_sketch(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int, blocks: int
) -> DataFrame:
    """Sign-bit sketch against ``n_planes`` deterministic pseudo-random
    hyperplanes (component signs derived from ``xxhash64(plane, dim)``
    → ±1), folded into per-block band keys.

    Kernel shape: ``posexplode`` the vector → codegen'd ``xxhash64``
    sign per (plane, dim) → ``groupBy(id)`` partial aggregation.  This
    stays inside whole-stage codegen with map-side combine, vs. a
    per-row ``n_planes × dim`` expression tree that Catalyst spends
    seconds folding and then evaluates interpreted.  Returns
    ``(id, k0..k{blocks-1})`` — one band key per block."""
    width = n_planes // blocks
    comp = df.select(
        F.col(id_col).alias("id"), F.posexplode(F.col(vec_col)).alias("d", "x")
    )
    # projection onto plane p: sum over dims of ±x, sign from hash(p, d)
    projs = [
        F.sum(
            F.when(
                F.xxhash64(F.lit(p), F.col("d")) % 2 == 0,
                F.col("x").cast("double"),
            ).otherwise(-F.col("x").cast("double"))
        ).alias(f"p{p}")
        for p in range(n_planes)
    ]
    proj = comp.groupBy("id").agg(*projs)
    keys = []
    for b in range(blocks):
        bits = F.lit(0)
        for j in range(width):
            bits = bits + (F.col(f"p{b * width + j}") > 0).cast("long") * (1 << j)
        keys.append(bits.alias(f"k{b}"))
    return proj.select("id", *keys)


def hyperplane_sketch_banded_np(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int,
    blocks: int,
    seed: int = 0x5EED,
) -> DataFrame:
    """Band keys ``(id, block, key)`` via ONE Arrow-batched numpy matmul
    per batch — the wide-sketch path.

    The codegen sketch (:func:`hyperplane_sketch`) is the right shape up
    to ~tens of planes, but at 128+ planes Catalyst spends 10+ s
    *planning* the 192-aggregate expression tree and the generated code
    blows past the whole-stage-codegen budget into interpreted mode.  A
    sign matrix ``S`` (dim × n_planes, seeded RandomState — numpy
    guarantees a stable stream, so every partition regenerates the
    identical matrix) turns the whole sketch into ``(V @ S) > 0`` plus a
    bit-pack: vectorized, linear, and embarrassingly parallel — the
    100 TB shape for wide cosine sketches.  Emits ``blocks`` narrow rows
    per vector, pre-exploded for the band self-join."""
    width = n_planes // blocks

    def gen(batches):
        import numpy as np
        import pandas as pd

        S = None
        for pdf in batches:
            if not len(pdf):
                continue
            V = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            if S is None:
                rs = np.random.RandomState(seed)
                S = np.sign(rs.standard_normal((V.shape[1], n_planes)))
                S[S == 0] = 1.0
                weights = 1 << np.arange(width, dtype=np.int64)
            bits = (V @ S) > 0
            keys = np.empty((len(pdf), blocks), dtype=np.int64)
            for b in range(blocks):
                keys[:, b] = bits[:, b * width : (b + 1) * width] @ weights
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), blocks),
                    "block": np.tile(np.arange(blocks, dtype=np.int32), len(pdf)),
                    "key": keys.reshape(-1),
                }
            )

    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    return v.mapInPandas(gen, schema="id long, block int, key long")


def hyperplane_lsh_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_planes: int = 16,
    blocks: int = 4,
    vectorized_sketch: bool = False,
) -> DataFrame:
    """Cosine-LSH candidate generation + exact verify.  Exact cosine
    verify keeps precision at 1; recall follows the banding curve.

    Scale shape: only ``(id, block, key)`` rows flow through the band
    self-join, and the final ``distinct`` runs on thresholded pairs,
    not candidates (r15; see the inline note) — the naive form
    deduplicated rows carrying two full embeddings.  At bench scale
    the vector-attach joins broadcast (AQE: ``v`` is small), so the
    only exchange carries verified pairs; at corpus scale ``v``
    exceeds the broadcast cap and the attach degrades to a shuffle
    join of the NON-deduplicated candidate ids — there the
    pre-verify-distinct trade should be re-measured per corpus (band
    multiplicity × narrow-id shuffle vs one candidate-set exchange;
    the MinHash family deliberately keeps the opposite choice).

    ``vectorized_sketch=True`` swaps the codegen projection sums for
    the numpy-matmul sketch (:func:`hyperplane_sketch_banded_np`) —
    required past ~tens of planes, where Catalyst's expression-tree
    cost dwarfs the data."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).withColumn(
        "nrm", norm(F.col("vec"))
    )
    # persisted: the band self-join's broadcast side is planned as a
    # separate pipeline (no exchange reuse), which would re-run the
    # sketch; narrow (id, block, key) rows only
    if vectorized_sketch:
        banded = hyperplane_sketch_banded_np(
            df, id_col, vec_col, n_planes, blocks
        ).persist()
        sk = banded
    else:
        sk = hyperplane_sketch(df, id_col, vec_col, n_planes, blocks).persist()
        banded = sk.select(
            "id",
            F.posexplode(F.array(*[F.col(f"k{b}") for b in range(blocks)])).alias(
                "block", "key"
            ),
        )
    # candidates are NOT pre-deduplicated (r15): a pair colliding in k
    # of the band blocks is verified k times (k ≤ blocks) and the
    # duplicates collapse in the FINAL distinct below, which runs on
    # the thresholded output — pairs, not candidates.  The old
    # pre-verify distinct exchanged the whole candidate set (at bench
    # scale the only shuffle in the operator: the band self-join and
    # both vector-attach joins broadcast there); post-verify, the only
    # exchange carries verified pairs, a strict subset.  The
    # verified pair set is identical either way — cosine is a pure
    # function of the pair — measured 2.57 → 1.15 s on elsh's
    # dense-cluster corpus (3.5M candidates → 550 pairs).
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["block", "key"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
    )
    a = v.select(F.col("id").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na"))
    b = v.select(F.col("id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb"))
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cosine", dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
    )
    out = verified.where(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine_r")
    ).distinct()
    # cache lifetime is the caller's: session.release(out) frees the sketch
    return register_persisted(out, sk)


def kmeans_assign(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8
) -> DataFrame:
    """Assign every vector to its nearest of ``k`` deterministic seed
    centroids (the ``k`` smallest-id vectors): one Lloyd assignment
    step, fully deterministic so the result is engine-exact.

    Scale shape: the seeds are folded into ONE broadcast row holding a
    ``k``-element array (a 1-row ``collect_list`` aggregate — never a
    driver collect), so assignment is a narrow crossJoin-broadcast map:
    zero shuffle, zero row multiplication.  The per-seed squared-L2
    argmin uses ``array_min`` over ``struct(d2, seed_id)`` — each
    distance evaluated once (the lang_id lesson: a CASE fold would
    duplicate the distance expressions exponentially), ties broken
    toward the smaller seed id.  Returns ``(id, vec, cluster_id)``.
    """
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    seeds = (
        v.orderBy("id")
        .limit(k)
        .select(F.col("id").alias("seed_id"), F.col("vec").alias("seed_vec"))
    )
    seed_arr = seeds.agg(
        F.sort_array(F.collect_list(F.struct("seed_id", "seed_vec"))).alias("__seeds")
    )
    with_seeds = v.crossJoin(F.broadcast(seed_arr))
    d2 = lambda s: F.aggregate(  # noqa: E731 — index-order fold, bit-identical across engines
        F.zip_with(
            F.col("vec"),
            s["seed_vec"],
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )
    best = F.array_min(
        F.transform(F.col("__seeds"), lambda s: F.struct(d2(s).alias("d2"), s["seed_id"].alias("seed_id")))
    )
    return with_seeds.select("id", "vec", best["seed_id"].alias("cluster_id"))


def embedding_centroids(
    df: DataFrame, id_col: str, vec_col: str, k: int = 8, scale: int = 10**7
) -> DataFrame:
    """Per-cluster element-wise mean after one deterministic Lloyd
    assignment step — the centroid-update half of k-means, and the
    training step IVF-style ANN indexes need at scale.

    Returns ``(cluster_id, pos, centroid, n_members)`` — exploded
    (cluster, dimension) grain, ``k × dim`` rows.

    Determinism: element sums go through the exact-integer pattern
    (``sum(cast(round(x·10^7) as long))``, associative, so shuffle
    order cannot perturb the result); the mean is two IEEE double ops
    on exact operands.  Scale shape: assignment is shuffle-free
    (see :func:`kmeans_assign`); the update shuffles ``(cluster, pos,
    scaled-long)`` rows with map-side partial aggregation, so each
    executor emits at most ``k × dim`` partials regardless of corpus
    size."""
    assigned = kmeans_assign(df, id_col, vec_col, k)
    comp = assigned.select(
        "cluster_id", F.posexplode("vec").alias("pos", "x")
    )
    return (
        comp.groupBy("cluster_id", "pos")
        .agg(
            (
                F.sum(F.round(F.col("x").cast("double") * scale).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(float(scale))
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    k: int = 8,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023 —
    public paper): cluster embeddings, then compare pairs ONLY within
    a cluster and greedily drop the larger-id member of every pair with
    cosine ≥ ``threshold``.

    Returns a per-vector verdict ``(id, cluster_id, kept)``.

    Scale shape: this is the practical answer to "near-dup detection
    needs all-pairs cosine" — clustering first makes the pair space
    Σ|cluster|² instead of n², and the cluster count is the knob that
    bounds it (SemDeDup runs k ≈ 100k on web-scale corpora so clusters
    stay ~thousands).  Assignment is the shuffle-free broadcast-seed
    argmin of :func:`kmeans_assign`; the pair join shuffles each
    vector ONCE keyed by cluster_id (assignment output persisted so
    the self-join's two sides reuse it rather than recompute); a
    pathologically hot cluster is the skew case — mitigate with larger
    k or an in-cluster LSH band key, exactly like the salted-join
    rewrite in scale/skew.py.  Greedy min-id retention (not transitive
    closure): every pair drops its larger id, so chains keep only
    their smallest member — deterministic, oracle-expressible, and the
    semantics SemDeDup's per-cluster pruning uses.
    """
    assigned = kmeans_assign(df, id_col, vec_col, k)
    v = assigned.select(
        "id", "cluster_id", "vec", norm(F.col("vec")).alias("nrm")
    ).persist()
    x = v.select(
        F.col("id").alias("_xa"),
        F.col("cluster_id").alias("cluster_id"),
        F.col("vec").alias("_va"),
        F.col("nrm").alias("_na"),
    )
    y = v.select(
        F.col("id").alias("_xb"),
        F.col("cluster_id").alias("cluster_id"),
        F.col("vec").alias("_vb"),
        F.col("nrm").alias("_nb"),
    )
    dup_ids = (
        x.join(y, "cluster_id")
        .where(F.col("_xa") < F.col("_xb"))
        .where(dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")) >= threshold)
        .select(F.col("_xb").alias("id"))
        .distinct()
    )
    verdict = (
        v.select("id", "cluster_id")
        .join(dup_ids.withColumn("_dup", F.lit(True)), "id", "left")
        .select("id", "cluster_id", F.coalesce(~F.col("_dup"), F.lit(True)).alias("kept"))
    )
    from yodel_etl_spark.session import register_persisted

    return register_persisted(verdict, v)


# ---------------------------------------------------- product quantization
def _sub(vec: Column, j: Column | int, dsub: Column) -> Column:
    """Subvector ``j`` (0-based) of ``vec``: elements [j·dsub+1, (j+1)·dsub]."""
    return F.slice(vec, (F.lit(j) * dsub + 1).cast("int"), dsub.cast("int"))


def _d2(a: Column, b: Column) -> Column:
    """Squared L2 between two equal-length arrays — index-order fold,
    bit-identical across runs (same pattern as kmeans_assign)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, t: acc + t,
    )


def pq_codebook(df: DataFrame, id_col: str, vec_col: str, m: int = 4, kc: int = 16) -> DataFrame:
    """Train product-quantization codebooks (Jégou et al. 2011, public
    paper): split each vector into ``m`` subspaces and learn ``kc``
    centroids per subspace with one deterministic Lloyd step (seed
    subvectors = the ``kc`` smallest-id vectors, exact-integer means —
    same determinism recipe as :func:`embedding_centroids`).

    Returns ONE row ``(codebook: array<array<array<double>>>, m, kc)``
    — an m × kc × (dim/m) nest small enough to broadcast (m·kc·dsub
    doubles; 4·16·16 = 4 KiB at dim 64), built entirely with
    map-side-combined aggregates: the update shuffles (subspace, code,
    pos, scaled-long) partials capped at m·kc·dsub rows per executor,
    never vectors.  A code cell that loses every member to a duplicate
    seed keeps its seed subvector (left-join coalesce), so the
    codebook is always dense."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    dsub = (F.size("vec") / m).cast("int")
    seeds = v.orderBy("id").limit(kc).select(
        F.col("id").alias("seed_ord"), F.col("vec").alias("seed_vec")
    )
    # per-subspace seed subvectors, re-keyed 0..kc-1 by seed id order
    seed_sub = (
        seeds.withColumn(
            "c",
            F.row_number().over(Window.orderBy("seed_ord")) - 1,
        )
        .select(
            "c",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda j: F.struct(
                        j.alias("j"),
                        _sub(F.col("seed_vec"), j, (F.size("seed_vec") / m).cast("int")).alias(
                            "svec"
                        ),
                    ),
                )
            ).alias("e"),
        )
        .select(F.col("e.j").alias("j"), "c", F.col("e.svec").alias("svec"))
    )
    seed_arr = seed_sub.groupBy("j").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("c", "svec"))), lambda s: s["svec"]
        ).alias("book0")
    )
    books0 = seed_arr.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("j", "book0"))), lambda s: s["book0"]
        ).alias("codebook0")
    )
    # one Lloyd step: assign every subvector to its nearest seed code
    sub_rows = (
        v.crossJoin(F.broadcast(books0))
        .select(
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda j: F.struct(
                        j.alias("j"), _sub(F.col("vec"), j, dsub).alias("svec")
                    ),
                )
            ).alias("e"),
            "codebook0",
        )
        .select(
            F.col("e.j").alias("j"),
            F.col("e.svec").alias("svec"),
            F.element_at("codebook0", F.col("e.j") + 1).alias("book0"),
        )
        .withColumn(
            "c",
            F.array_min(
                F.transform(
                    F.col("book0"),
                    lambda cv, i: F.struct(_d2(F.col("svec"), cv).alias("d2"), (i).alias("c")),
                )
            )["c"],
        )
    )
    scale = 10**7
    upd = (
        sub_rows.select("j", "c", F.posexplode("svec").alias("pos", "x"))
        .groupBy("j", "c", "pos")
        .agg(
            (
                F.sum(F.round(F.col("x").cast("double") * scale).cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(float(scale))
            ).alias("val")
        )
    )
    cent = upd.groupBy("j", "c").agg(
        F.transform(F.sort_array(F.collect_list(F.struct("pos", "val"))), lambda s: s["val"]).alias(
            "cvec"
        )
    )
    dense = (
        seed_sub.join(cent, ["j", "c"], "left")
        .select("j", "c", F.coalesce("cvec", F.col("svec")).alias("cvec"))
    )
    books = dense.groupBy("j").agg(
        F.transform(F.sort_array(F.collect_list(F.struct("c", "cvec"))), lambda s: s["cvec"]).alias(
            "book"
        )
    )
    return books.agg(
        F.transform(F.sort_array(F.collect_list(F.struct("j", "book"))), lambda s: s["book"]).alias(
            "codebook"
        ),
        F.lit(m).alias("m"),
        F.lit(kc).alias("kc"),
    )


def pq_encode(df: DataFrame, id_col: str, vec_col: str, codebook: DataFrame, m: int) -> DataFrame:
    """Encode every vector as ``m`` small codes (argmin code per
    subspace against the broadcast codebook).  Narrow map — zero
    shuffle; at 100 TB this is the point of PQ: the corpus index
    stores m bytes per vector instead of dim floats (dim·4/m ×
    compression), and encode runs once, streamed."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    dsub = (F.size("vec") / m).cast("int")
    return (
        v.crossJoin(F.broadcast(codebook.select("codebook")))
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.array_min(
                    F.transform(
                        F.element_at("codebook", j + 1),
                        lambda cv, i: F.struct(
                            _d2(_sub(F.col("vec"), j, dsub), cv).alias("d2"), i.alias("c")
                        ),
                    )
                )["c"],
            ).alias("codes"),
        )
    )


def pq_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_ids: Column,
    topk: int = 5,
    m: int = 4,
    kc: int = 16,
    rerank: int = 10,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) with
    exact re-ranking: each query precomputes an m × kc lookup table of
    subspace distances to every code centroid, every encoded corpus
    vector scores as m table lookups — O(m) per (query, candidate)
    instead of O(dim), on an index 1/(dim·4/m) the size of the raw
    vectors — and the ADC shortlist (``rerank``·topk candidates per
    query) is re-scored with exact L2 on the raw vectors before the
    final cut.  This is the standard production PQ pipeline (shortlist
    from the compressed index, rerank the few survivors): the exact
    pass touches only rerank·topk·|queries| vectors, so the 100 TB
    cost stays the O(m)-per-candidate scan.  Queries (and their 4 KiB
    LUTs) broadcast; the corpus side is a narrow scan of (id, codes);
    ranking is deterministic by (rounded distance asc, id).  Recall vs
    exact L2 is measured in tests — raw-ADC recall on an isotropic
    corpus is inherently modest (distances concentrate; real embedding
    corpora cluster), which is exactly why the rerank stage exists.
    Set ``rerank=1`` for pure-ADC behavior."""
    # the 1-row codebook broadcasts into BOTH the corpus encode and the
    # query LUT build — persist it or its multi-stage training pipeline
    # (scan + Lloyd step) runs once per broadcast
    cb = pq_codebook(df, id_col, vec_col, m=m, kc=kc).persist()
    enc = pq_encode(df, id_col, vec_col, cb, m=m)
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    dsub = (F.size("vec") / m).cast("int")
    qlut = (
        v.where(query_ids)
        .crossJoin(F.broadcast(cb.select("codebook")))
        .select(
            F.col("id").alias("query_id"),
            F.transform(
                F.col("codebook"),
                lambda book, j: F.transform(book, lambda cv: _d2(_sub(F.col("vec"), j, dsub), cv)),
            ).alias("lut"),
        )
    )
    scored = (
        enc.crossJoin(F.broadcast(qlut))
        .where(F.col("id") != F.col("query_id"))
        .withColumn(
            "adc",
            F.aggregate(
                F.zip_with(
                    F.col("lut"), F.col("codes"), lambda l, c: F.element_at(l, c + 1)
                ),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ),
        )
        .withColumn("adc_r", F.round("adc", 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_r").asc(), F.col("id"))
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk * rerank)
        .select("query_id", "id")
    )
    # exact re-rank: raw vectors join back for the shortlist only
    # (rerank·topk rows per query), queries re-broadcast with vectors
    qv = v.where(query_ids).select(F.col("id").alias("query_id"), F.col("vec").alias("qv"))
    exact = (
        shortlist.join(v, "id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("d2_r", F.round(_d2(F.col("vec"), F.col("qv")), 6))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("d2_r").asc(), F.col("id"))
    out = (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= topk)
        .select("query_id", F.col("id").alias("neighbor_id"), "rank", "d2_r")
    )
    return register_persisted(out, cb)


def topk_update(
    prev: DataFrame,
    queries: DataFrame,
    delta: DataFrame,
    id_col: str,
    vec_col: str,
    topk: int = 5,
) -> DataFrame:
    """Incremental exact top-k maintenance under corpus growth (the
    interactive-session pattern of the EDBT 2020 incremental top-k
    similarity work): when ΔC arrives, score ONLY ΔC against the query
    batch and merge with the previous per-query top-k — exact, because
    appends can only displace old neighbors, never resurrect ones that
    already ranked below k.  Per ingest the work is |ΔC|·|Q| instead of
    |C|·|Q|; the merge re-ranks k·|Q| + |ΔC|·|Q| narrow rows.

    ``prev`` is a prior (query_id, neighbor_id, rank, cosine_r) result
    (e.g. from :func:`brute_force_topk`); ``queries`` is (query_id, qv);
    ``delta`` the new corpus rows.  Result schema matches
    :func:`brute_force_topk`, and equals a full recompute row for row
    (same deterministic tie order)."""
    q = queries.select("query_id", "qv").withColumn("qn", norm(F.col("qv")))
    d = delta.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).withColumn(
        "nrm", norm(F.col("vec"))
    )
    scored_delta = (
        d.crossJoin(F.broadcast(q))
        .where(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.round(
                dot(F.col("vec"), F.col("qv")) / (F.col("nrm") * F.col("qn")), 6
            ).alias("cosine_r"),
        )
    )
    merged = prev.select("query_id", "neighbor_id", "cosine_r").unionByName(scored_delta)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_r").desc(), F.col("neighbor_id"))
    return (
        merged.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "rank", "cosine_r")
    )
