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
