"""CDC MERGE / upsert apply: fold a change log into a keyed snapshot.

The companion to :mod:`yodel_etl_spark.ops.scd` — SCD2 keeps the full
history; this operator produces the CURRENT state (SCD type 1), the
``MERGE INTO`` every lakehouse ingest runs: latest change per key wins,
upserts replace or insert, deletes remove the row.  The reference's
pipelines stop at last-value-wins over a stream (SURVEY §2.4 A5); this
is the batch/table form with delete semantics.

Scale shape: the per-key "latest change" window shuffles ONLY the
change log — delta-sized, typically orders of magnitude smaller than
the snapshot.  The snapshot is touched exactly once, by the anti-join
that drops superseded/deleted keys; with ``broadcast_changes=True``
(right for the usual delta ≪ snapshot case) that join is a broadcast
hash join and the snapshot NEVER shuffles — the plan is one delta
window + one broadcast probe over a narrow key set.  With a snapshot
bucketed on the key (io/bucketed.py) the default shuffle form is also
exchange-free on the snapshot side.  Either way no operator ever holds
more than the delta in state, which is what lets the same code apply a
billion-row day onto a trillion-row table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    op_col: str | None = None,
    delete_op: str = "D",
    broadcast_changes: bool = False,
) -> DataFrame:
    """Snapshot after applying ``changes`` to ``base`` (SCD1 MERGE).

    ``base``: one row per key (the current snapshot).  ``changes``: the
    change log; ``order_by`` must totally order changes within a key
    (add a tie-break column — sequence/file offset — when the primary
    order has duplicates; engine-exact output requires it).  ``op_col``
    names an operation column whose value ``delete_op`` marks a delete;
    any other value (or ``op_col=None``) is an upsert.  The output
    schema is exactly the snapshot schema (the MERGE contract): the op
    column and any extra change-log columns (sequence numbers, file
    offsets — often needed in ``order_by``) are dropped; every snapshot
    column must be present in the change log.

    Semantics: for every key in the change log only the LATEST change
    matters (intermediate upserts/deletes are superseded — a delete
    followed by an upsert re-inserts the row, matching ``MERGE`` run
    per-batch with last-writer-wins).  Keys absent from the change log
    pass through untouched.
    """
    keys = list(keys)
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by]
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    changed_keys = latest.select(*keys)
    if broadcast_changes:
        changed_keys = F.broadcast(changed_keys)
    survivors = base.join(changed_keys, on=keys, how="left_anti")
    if op_col is not None:
        upserts = latest.where(F.col(op_col) != F.lit(delete_op))
    else:
        upserts = latest
    return survivors.unionByName(upserts.select(*base.columns))
