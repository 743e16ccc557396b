"""Write-path layout benchmark query: z-ordered write + multi-predicate
pruned read-back (io/layout.py's write_zordered), registered so layout
cost is a recorded bench number across rounds — the write path IS a
query cost at 100 TB (scan cost is set at write time), so it belongs in
the same per-round record as the reads.

Rows-only by design: the measured artifact is the files' physical
layout (tests/test_layout.py pins footer-level pruning); the returned
aggregate is an exact count/sum over the pruned read-back, so the
rows-only stability check still has deterministic values.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables, spread


def _scratch_root() -> str:
    """Scratch root for the benchmark's side-effect write.

    Prefer tmpfs (``/dev/shm``): a disk-backed ``/tmp`` leaves dirty
    pages that the kernel flushes ASYNCHRONOUSLY after the write
    returns, taxing whatever query the bench times next — the r6 bench
    record drifted ~1.18x uniformly after this query was added, and a
    page-cache flushback from its per-pass parquet writes is the prime
    suspect.  On tmpfs the write cost is all in-memory and lands
    entirely inside this query's own timing.  Fall back to the system
    tmpdir plus an ``os.sync()`` after the write so the flush cost
    stays attributed to this query either way."""
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return shm
    return tempfile.gettempdir()


_CLEANUP_REGISTERED: set[str] = set()


def _zorder_path(sf_dir: str) -> str:
    """Per-process unique write target (pid-keyed, cleaned at exit).

    A path keyed only by the sf-dir basename races across concurrent
    processes (bench + driver-sim, or two users on a shared host): one
    process's ``mode=overwrite`` can delete files between another's
    write and read-back.  The pid key makes the target per-process;
    atexit removal keeps repeated runs from accumulating in tmpfs."""
    path = os.path.join(
        _scratch_root(),
        f"yodel_zorder_{os.path.basename(sf_dir.rstrip('/'))}_{os.getpid()}",
    )
    if path not in _CLEANUP_REGISTERED:
        _CLEANUP_REGISTERED.add(path)
        atexit.register(shutil.rmtree, path, ignore_errors=True)
    return path


@register(
    "zorder",
    oracle=None,  # side-effecting write + layout-dependent file set;
    # correctness of the layout is pinned at parquet-footer level in
    # tests/test_layout.py, value determinism by the exact-count return
    doc="Z-ordered write of events on (user_id, value) — quantile-"
    "normalized Morton interleave (one approx-percentile pass + one "
    "range exchange, no global window) — followed by a two-predicate "
    "pruned read-back aggregated to exact counts.  Benchmarks the "
    "'land it queryable' write path: at 100 TB the scan cost of every "
    "later query is set HERE, and the multi-dimension min/max "
    "tightness is what a linear sort cannot give.  Rows-only: the "
    "write is a side effect; footer-level pruning (files skipped vs "
    "linear sort, no degenerate dimension) is pinned in "
    "tests/test_layout.py.",
    tags=("layout", "io", "scale"),
    bench=True,
)
def write_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.io.layout import write_zordered

    ev = spread(load_tables(spark, sf_dir, ("events",))["events"]).select(
        "event_id", "user_id", "event_type", "value"
    )
    path = _zorder_path(sf_dir)
    write_zordered(ev, path, zorder_by=("user_id", "value"), buckets=64, n_files=8)
    if not path.startswith("/dev/shm"):
        # disk-backed fallback: force the flush NOW so the page-cache
        # writeback cost lands inside this query's timing, not the next's
        os.sync()
    back = spark.read.parquet(path)
    # two RANGE predicates — the shape parquet min/max stats prune on,
    # and the multi-dimension case where z-order beats a linear sort
    pruned = back.where(
        F.col("user_id").between(100, 400) & F.col("value").between(100.0, 300.0)
    )
    return pruned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("value_cents"),
    )
