"""Small-files compaction — the table-maintenance job every streaming
or incremental-ingest pipeline schedules: micro-batches (foreachBatch
appends, per-trigger sinks, CDC merges) leave partitions holding
hundreds of KB-sized parquet files, and scan cost then goes to task
scheduling and footer reads instead of data.  Compaction rewrites each
fragmented leaf directory into ~target-sized files and leaves healthy
directories untouched.

Scale shape: the unit of work is ONE LEAF DIRECTORY — each rewrite
reads only that directory's files and ``coalesce``s them (coalesce, not
repartition: merging small files needs no shuffle and no row movement
across the partition-key boundary, which directory grain already
guarantees).  Healthy directories are skipped by a listing-only check,
so a mostly-healthy 100 TB table costs a file listing plus the
fragmented tail.  The swap is staged: new files land in a staging tree
OUTSIDE the table root (a dir named ``x=y`` inside the root would be
parsed as a phantom partition column by discovery — ``_`` prefixes
shield files, not directories) and replace the originals only after
the rewrite succeeds, so a crash mid-compaction leaves the ORIGINAL
table byte-identical and fully readable (re-run to finish — the
operation is idempotent).

Listing uses the local filesystem API (the test/driver environment);
on HDFS/S3 the same walk runs through the Hadoop FileSystem client —
the decision logic (fragmentation test, output-file count, staged
swap) is identical and is what the tests pin.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession

#: files smaller than this fraction of target are "fragments"
_FRAG_FRACTION = 0.5


def _leaf_dirs(root: str) -> list[str]:
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            out.append(dirpath)
    return sorted(out)


def _parquet_files(d: str) -> list[tuple[str, int]]:
    return sorted(
        (os.path.join(d, f), os.path.getsize(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    min_files: int = 2,
) -> list[dict]:
    """Compact fragmented leaf directories under ``path``; returns one
    report dict per leaf (``dir, n_files_before, n_files_after, bytes,
    rewritten``).  A leaf rewrites when it holds ≥ ``min_files`` parquet
    files whose MEAN size is under half of ``target_bytes`` — the
    steady-state signature of micro-batch appends; directories already
    at healthy file sizes are left byte-identical (idempotence: a
    second run is a listing-only no-op).

    Row contents are preserved exactly (the tests pin count and value
    equality); file-internal row order is not part of the contract —
    re-run ``write_clustered``/``write_zordered`` when ordering is the
    point, compaction when file COUNT is."""
    reports: list[dict] = []
    for leaf in _leaf_dirs(path):
        files = _parquet_files(leaf)
        total = sum(sz for _, sz in files)
        frag = (
            len(files) >= min_files
            and total / len(files) < target_bytes * _FRAG_FRACTION
        )
        report = {
            "dir": leaf,
            "n_files_before": len(files),
            "bytes": total,
            "rewritten": bool(frag),
        }
        if not frag:
            report["n_files_after"] = len(files)
            reports.append(report)
            continue
        n_out = max(1, math.ceil(total / target_bytes))
        # staging lives OUTSIDE the table root (a sibling tree keyed by
        # the leaf's relative path): a dir named `x=y` inside the root
        # would be parsed as a phantom partition column by discovery —
        # underscore prefixes shield files, not directories — and any
        # extra dir breaks same-level partition inference; a crash
        # therefore leaves the table byte-identical and readable
        rel = os.path.relpath(leaf, path)
        rel = "_root" if rel == "." else rel.replace(os.sep, "__")
        stage = os.path.join(
            os.path.dirname(path.rstrip("/")) or ".",
            "_compact_stage_" + os.path.basename(path.rstrip("/")),
            rel,
        )
        shutil.rmtree(stage, ignore_errors=True)  # stale crash leftovers
        (
            spark.read.parquet(*[p for p, _ in files])
            .coalesce(n_out)
            .write.mode("overwrite")
            .parquet(stage)
        )
        # staged swap: originals removed only after the rewrite succeeded
        for p, _ in files:
            os.remove(p)
        for f in os.listdir(stage):
            if f.endswith(".parquet"):
                shutil.move(os.path.join(stage, f), os.path.join(leaf, f))
        shutil.rmtree(stage, ignore_errors=True)
        report["n_files_after"] = len(_parquet_files(leaf))
        reports.append(report)
    return reports
