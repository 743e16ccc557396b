"""Sequence packing: assign documents to fixed-token-budget bins for
pretraining batch construction.

Bin packing is inherently sequential, so the distributed form is
group-local: hash documents into ``num_groups`` independent groups
(narrow projection), then run first-fit-decreasing INSIDE each group via
``applyInPandas`` (one Arrow batch per group, no Python row loop across
the corpus).  Each group packs its own documents into bins; global bin
ids are ``group * 2^32 + local_bin``.

Scale contract:

* Parallelism and peak memory are governed by ``num_groups`` — a group
  holds ``|corpus| / num_groups`` narrow (id, n_tokens) rows, NOT the
  documents themselves; token counts travel, text does not.
* Packing quality loss vs a global packer is bounded: at most one
  under-filled bin per group (FFD's tail bin), so wasted capacity ≤
  ``num_groups * budget`` tokens — negligible when ``|corpus| ≫
  num_groups``.
* Determinism: the group hash is md5-based (append-stable), and FFD
  sorts by (n_tokens desc, id) — reruns produce identical bins.

Documents longer than the budget get a singleton bin flagged
``over_budget`` (callers chunk or drop them; silently truncating here
would corrupt the token accounting).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.scale.sampling import hash_bucket

_OUT_SCHEMA = (
    "doc_id long, n_tokens long, bin_id long, bin_fill long, over_budget boolean"
)


def _pack_group(budget: int):
    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        group = int(key[0])
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        bins: list[int] = []  # remaining capacity per local bin
        assign: list[int] = []
        over: list[bool] = []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > budget:
                bins.append(-1)  # singleton, no residual capacity
                assign.append(len(bins) - 1)
                over.append(True)
                continue
            # first-fit over open bins (FFD: lengths arrive descending)
            for i, rem in enumerate(bins):
                if rem >= n:
                    bins[i] = rem - n
                    assign.append(i)
                    break
            else:
                bins.append(budget - n)
                assign.append(len(bins) - 1)
            over.append(False)
        out = pdf.assign(
            bin_id=[(group << 32) | b for b in assign],
            over_budget=over,
        )
        fill = out.groupby("bin_id")["n_tokens"].transform("sum")
        return out.assign(bin_fill=fill)[
            ["doc_id", "n_tokens", "bin_id", "bin_fill", "over_budget"]
        ]

    return pack


def pack_sequences(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    num_groups: int = 64,
) -> DataFrame:
    """``(doc_id, n_tokens, bin_id, bin_fill, over_budget)`` — every doc
    assigned to exactly one bin with ``bin_fill ≤ budget`` (unless
    ``over_budget``).  One shuffle on the md5 group key; the Python side
    sees only (id, n_tokens) pairs, Arrow-batched one group at a time.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    narrow = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        hash_bucket(F.col(id_col), num_groups).cast("long").alias("grp"),
    )
    return narrow.groupBy("grp").applyInPandas(_pack_group(budget), _OUT_SCHEMA)
