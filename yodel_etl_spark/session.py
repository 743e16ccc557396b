"""SparkSession construction + canonical table loading.

Single place where engine-wide configuration lives so that tests, the
driver entrypoint and bench all run with identical semantics.

Scale posture (100 TB / 1000 executors):
  * AQE on — runtime coalescing, skew-join splitting, dynamic broadcast.
  * Arrow on — every pandas-interop boundary is vectorized.
  * Session timezone pinned UTC — timestamp semantics identical across
    engines (parquet naive timestamps ⇄ DuckDB oracle).
  * ``shuffle.partitions`` defaults to a small value for local test scale
    but is an explicit knob; on a real cluster set ≈ 2-3× total cores —
    AQE coalesces down, so erring high is safe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: canonical test tables (TESTDATA.md)
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "yodel_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession with engine-wide confs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # -- determinism / oracle parity -------------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet stores TIMESTAMP(NANOS) which Spark's
        # parquet reader rejects; read as long and convert in load_tables
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # InferFiltersFromGenerate copies the exploded-array expression
        # into a size()>0 filter that predicate pushdown then inlines
        # below exchanges — for our computed shingle/posting arrays that
        # re-evaluates an expensive expression 2× extra per row in the
        # narrowest stage (measured 10×+ slowdown).  Explode's own
        # empty/null skip already gives the semantics.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # -- adaptive execution: runtime re-plan at any scale ----------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # -- shuffle sizing -------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # -- arrow for every pandas boundary --------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- broadcast: dims up to 64 MB go broadcast ------------------
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # -- external-inference concurrency cap (llm/infer.py) ---------
        .config("spark.yodel.llm.maxConcurrency", "8")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a too-coarsely-partitioned input before a
    compute-heavy kernel (minhash/simhash/cosine/decode).

    The local testdata is one parquet file with ONE row group per table,
    so the scan yields a single task no matter how many cores exist —
    file-split parallelism physically cannot help.  On a real cluster
    the scan arrives pre-split and this exchange is skipped (the
    partition count already meets the target).  The shuffle moves the
    raw rows once; for kernel-bound operators that cost is repaid
    ``cores``-fold."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def ship_package(spark: SparkSession) -> None:
    """Make ``yodel_etl_spark`` importable on executor Python workers.

    Operators built on ``mapInPandas``/pandas UDFs close over functions
    from this package; cloudpickle serializes those by *reference*, so
    the worker must be able to import the module.  The driver's vanilla
    session has no such guarantee — zip the package once per process and
    ``addPyFile`` it (the same mechanism used to deploy to a real
    cluster: ship a wheel/zip with the job).
    """
    sc = spark.sparkContext
    if getattr(sc, "_yodel_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "yodel_etl_spark_pkg.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    sc._yodel_pkg_shipped = True


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load the canonical parquet tables from a scale-factor directory.

    Plain ``spark.read.parquet`` — column pruning and predicate pushdown
    reach the scan automatically once downstream ops are declarative.

    ``events.ts`` is physically TIMESTAMP(NANOS); with
    ``nanosAsLong`` it surfaces as nanoseconds-since-epoch LongType and
    is converted here to a proper TimestampType (values are µs-grained,
    so the conversion is lossless).
    """
    from pyspark.sql import functions as F

    # The driver hands us ITS SparkSession (no engine confs), so pin the
    # semantics-critical confs at runtime — both are plain SQLConfs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    ship_package(spark)

    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        for field in df.schema.fields:
            if field.name == "ts" and field.dataType.typeName() in ("long", "bigint"):
                # integer div: epoch-ns values exceed double's 2^53 mantissa
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif field.name == "ts" and field.dataType.typeName() == "timestamp_ntz":
                # testdata generated as naive timestamp[us] surfaces as
                # TIMESTAMP_NTZ (inferTimestampNTZ); normalize to
                # TIMESTAMP — the session is pinned UTC so the cast maps
                # wall time to the identical instant, and streaming
                # watermarks require the instant-typed column
                df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        out[name] = df
    return out


def register_persisted(result: DataFrame, *handles: DataFrame) -> DataFrame:
    """Attach persisted intermediates to ``result`` so callers can
    :func:`release` them after their final action.

    Library operators persist() narrow intermediates (signature tables,
    posting lists, REST page batches) because the returned plan reads
    them more than once — but the library can never unpersist them
    itself: the caller decides when the last action over the returned
    frame has run.  Registering the handles on the result makes the
    cache lifetime the CALLER's, closing the long-lived-session leak
    (repeated operator calls otherwise accumulate cached RDDs until
    eviction pressure).  Handles propagate: registering a frame that
    itself carries handles adopts them."""
    collected = list(getattr(result, "_yodel_persisted", ()))
    for h in handles:
        collected.extend(getattr(h, "_yodel_persisted", ()))
        collected.append(h)
    result._yodel_persisted = tuple(collected)
    return result


def release(df: DataFrame) -> None:
    """Unpersist every cached intermediate attached to ``df`` (and
    ``df`` itself, if persisted).  Idempotent; call after the final
    action over an operator's result."""
    for h in getattr(df, "_yodel_persisted", ()):
        h.unpersist()
    df._yodel_persisted = ()
    level = df.storageLevel
    if level.useMemory or level.useDisk:
        df.unpersist()


def guarded_filter(df: DataFrame, cond) -> DataFrame:
    """Filter WITHOUT letting PushDownPredicate substitute ``cond``
    through staged projections below it.

    Pushing a filter on computed columns inlines their defining
    expressions into the predicate — un-staging exactly the values the
    projection hygiene bound once (pipelines/curate.py measured the
    pathology at 20.6 s → 0.5 s on its signal pass; scale/links.py hits
    the same with its resolve/canonicalize chain).  A nondeterministic
    PREDICATE alone does not block the push (PushPredicateThroughNonJoin
    only requires the project list to be deterministic), so the fence
    lives in the projection: project a nondeterministic column and
    reference it inside one OR predicate — the reference keeps
    ColumnPruning from deleting the field, the nondeterministic project
    list blocks the rule, and the single OR keeps
    splitConjunctivePredicates from peeling the deterministic half off.
    ``__fence < 0`` is always false (monotonically_increasing_id is
    non-negative), so the condition is semantically ``cond``; cost is
    one long compare per row."""
    from pyspark.sql import functions as F

    fenced = df.withColumn("__fence", F.monotonically_increasing_id())
    return fenced.where((F.col("__fence") < F.lit(0)) | cond).drop("__fence")
