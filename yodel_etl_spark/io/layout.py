"""Write-path data layout: partition + sort clustering for scan-time
pruning.

At 100 TB the dominant query cost is the scan, and the scan cost is set
at WRITE time: directory partitioning gives partition pruning (whole
directories skipped by the planner), in-file sort order gives row-group
skipping (parquet min/max statistics exclude pages the filter can't
match).  This module is the canonical "land it queryable" writer:

* one shuffle to co-locate rows of each output partition (otherwise
  every task writes a file into every partition directory — the
  classic small-files explosion: tasks × partitions files),
* ``sortWithinPartitions`` so each file's row groups are
  range-disjoint on the sort keys (min/max stats become selective),
* optional ``maxRecordsPerFile`` to bound file size without another
  shuffle.

Reader-side effects are asserted in ``tests/test_layout.py`` against
the physical plan: a partition-key filter shows up as
``PartitionFilters`` with a reduced partition count, and a sort-key
filter reaches the scan as ``PushedFilters``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = (),
    sort_by: tuple[str, ...] = (),
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` partition-pruned and row-group-skippable.

    ``partition_by`` columns become directory keys (low cardinality —
    dates, sources); ``sort_by`` orders rows inside each file so parquet
    min/max statistics prune row groups on those columns.  The single
    repartition on the partition keys is the only shuffle; sorting is
    per-task (no global sort / range exchange).
    """
    out = df
    if partition_by:
        out = out.repartition(*partition_by)
    if sort_by:
        out = out.sortWithinPartitions(*(list(partition_by) + list(sort_by)))
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.save(path)


def zorder_value(cols, bits: int = 16):
    """Bit-interleaved Morton (z-order) value over ``cols`` — each a
    Column already normalized to an integer in ``[0, 2**bits)``.  Pure
    column algebra (shift/mask/or), so it rides whole-stage codegen.

    Interleave layout: output bit ``k*j + i`` takes bit ``j`` of column
    ``i`` (k = len(cols)) — adjacent z-values are adjacent in every
    dimension, which is the property that makes per-file min/max
    bounding boxes tight in ALL sorted dimensions at once (a linear
    sort is tight only in its leading column)."""
    from pyspark.sql import functions as F

    k = len(cols)
    if k * bits > 63:
        # shiftleft past bit 63 silently drops the high coordinate bits
        # and the files' bounding boxes quietly stop being tight — the
        # exact property this function exists to provide; fail loud
        raise ValueError(
            f"{k} columns x {bits} bits = {k * bits} z-bits > 63; "
            "reduce bits (write_zordered derives them from `buckets`)"
        )
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        x = c.cast("long")
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(x, j).bitwiseAND(F.lit(1)), k * j + i)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: tuple[str, ...],
    buckets: int = 256,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` z-ordered on ``zorder_by`` (numeric columns):
    QUANTILE-normalize each key to a ``buckets``-ary integer coordinate
    (approx-percentile cutpoints — one tiny aggregate broadcast back;
    rank space, NOT min-max, because a skewed column linearized by
    min-max crams most rows into a few low coordinates and the z-curve
    degenerates — measured: min-max z-order on the exponential-ish
    events.value was WORSE than a linear sort), interleave the bits,
    range-partition + sort by the z-value, drop the helpers.

    The point at 100 TB: a linear sort makes parquet min/max stats
    selective on ONE column; z-order makes every file a tight
    hyper-rectangle in ALL ``zorder_by`` dimensions (in quantile space
    — the space query selectivity lives in), so multi-predicate scans
    skip files/row-groups on any combination of the keys.  Cost: one
    approx-quantile pass + one range exchange — the same shape as any
    global sort, no global window anywhere.
    """
    import math

    from pyspark.sql import functions as F

    bits = max(1, int(math.ceil(math.log2(buckets))))
    qs = [i / buckets for i in range(1, buckets)]
    stats = df.agg(
        *[
            F.percentile_approx(
                c, F.array(*[F.lit(q) for q in qs]), F.lit(10_000)
            ).alias(f"_cut_{c}")
            for c in zorder_by
        ]
    )
    with_stats = df.crossJoin(F.broadcast(stats))

    def _coord(c: str):
        # helper (not a default-arg lambda): a two-parameter lambda is
        # pyspark's (element, index) filter form and would bind the
        # index to the captured name
        return F.size(
            F.filter(
                F.col(f"_cut_{c}"), lambda cut: F.col(c).cast("double") >= cut
            )
        ).cast("long")

    coords = [_coord(c) for c in zorder_by]
    out = (
        with_stats.withColumn("_z", zorder_value(coords, bits))
        .drop(*[f"_cut_{c}" for c in zorder_by])
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode(mode).parquet(path)
