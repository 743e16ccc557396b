"""Distributed quality-classifier training: logistic regression over
hashed unigram features — the fastText-style linear filter that modern
pretraining pipelines train to score corpus quality (cf. the public
CCNet/DCLM recipes: a cheap linear model over bag-of-words features,
trained on a labeled slice, then applied to the whole corpus).

The engine trains ON the cluster with full-batch gradient descent:

  * features: token→bucket via the portable md5 ``hash_bucket`` (the
    hashing trick; no vocabulary build, no feature shuffle);
  * the weight vector (``n_buckets`` + bias) is CONTROL-PLANE data —
    broadcast into each round's scoring scan as a literal array, like
    the BPE merge table and the k-means seed row;
  * each round is ONE corpus scan: the per-doc margin is a narrow
    ``aggregate`` over the token array, the residual reduces through
    an exploded (bucket, resid) aggregation that map-side-combines
    onto ``n_buckets`` rows — the only shuffle, vocabulary-sized;
  * the driver folds the ``n_buckets``-row gradient into the weight
    update (bounded collect, the kmeans/BPE convention).

Bit-reproducible by construction: per-doc residuals quantize to INTEGER
micro-units (``round(1e6·(σ(z)−y))``) before aggregation, so gradient
sums are order-insensitive exact integers — shuffle order can never
perturb training, and two runs produce identical weights.  (The 1e-6
quantization is far below the gradient noise floor; a pytest pins exact
parity against a literal numpy twin of the same quantized recipe.)

At 100 TB: full-batch rounds are T corpus scans; the implemented swap
is ``n_slices > 1`` — mini-batch rounds over the deterministic md5
hash-split (round t trains on slice ``t % n_slices``): the identical
plan shape per round, but each round's scan and gradient carry only a
corpus-fraction (Catalyst pushes the slice equality into the cached
scan, so a round reads ~1/n_slices of the cached partitions' rows).
Still bit-reproducible: the slice assignment is a pure function of the
id, so two runs see identical batches in identical order.
Registered rows-only (iterative, not single-statement SQL); invariants
(loss decrease, accuracy over base rate, determinism, numpy parity —
for BOTH batch modes) are pinned in tests/test_classifier.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.scale.sampling import hash_bucket
from yodel_etl_spark.scale.textstats import tokens
from yodel_etl_spark.session import register_persisted

SCALE = 1_000_000.0


def _margin(n_buckets: int) -> Column:
    """z = bias + (Σ_tokens w[bucket]) / len — MEAN-pooled hashed
    features (the fastText convention; raw counts make the margin
    scale with document length and full-batch GD oscillates).

    Reads PRE-BUCKETED token ids (``tb``, computed once when the base
    caches — md5-hashing every token again in every round doubled the
    per-round cost) against the weight vector in the ``warr`` column
    (buckets first, bias last) — since r15 a single true array literal
    (``F.lit(np.ndarray)``; ``F.lit(list)`` would expand to a 513-node
    ``array(lit, …)`` tree re-analyzed every round — see ``with_w``),
    which keeps the plan one node AND drops the per-round
    broadcast-exchange job the old one-row crossJoin paid."""
    s = F.aggregate(
        "tb",
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(F.col("warr"), b + 1),
    )
    return (
        F.element_at(F.col("warr"), n_buckets + 1)
        + s / F.greatest(F.size("tb"), F.lit(1))
    )


def _sigmoid(z: Column) -> Column:
    # clamp before exp: a runaway margin must saturate, not overflow
    zc = F.greatest(F.least(z, F.lit(30.0)), F.lit(-30.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-zc))


def train_quality_lr(
    docs: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 512,
    rounds: int = 8,
    lr: float = 1.0,
    n_slices: int = 1,
) -> tuple[list[float], DataFrame]:
    """Train the hashed-feature logistic model to predict boolean
    ``label``; returns ``(weights, scored)`` where ``weights`` is the
    final ``n_buckets + 1`` vector (bias last) and ``scored`` the
    per-doc frame ``(doc_id, y, score_micro, pred)`` under it
    (``score_micro = round(1e6·σ(z))`` as BIGINT — exact integer grain,
    so downstream comparisons are order-insensitive).

    ``n_slices=1`` is full-batch GD (T corpus scans).  ``n_slices > 1``
    is the mini-batch scale form: round ``t`` trains on the md5
    hash-split slice ``hash_bucket(doc_id, n_slices) == t % n_slices``
    — each round's gradient step normalizes by THAT slice's row count,
    so the step magnitude matches full-batch on a uniformly shuffled
    corpus.  Deterministic: the slice is a pure id function."""
    if n_slices < 1:
        raise ValueError(f"n_slices={n_slices} (expected >= 1)")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        label.cast("int").alias("y"),
        # slice id materialized at cache time, like the bucket ids —
        # the per-round filter is then a pushable integer equality
        hash_bucket(F.col(id_col), n_slices).alias("sl"),
        # bucket ids, not tokens: md5 runs ONCE per token at cache
        # time instead of once per token per round
        F.transform(
            tokens(F.lower(F.col(text_col))),
            lambda tok: hash_bucket(tok, n_buckets),
        ).alias("tb"),
    ).persist()  # re-scanned every round: cache the bucketed corpus once
    n = base.count()  # also materializes the cache
    if n == 0:
        raise ValueError("empty corpus")
    if n_slices > 1:
        # one bounded collect up front: per-slice row counts for the
        # per-round step normalization (n_slices rows)
        slice_n = {
            r["sl"]: r["c"]
            for r in base.groupBy("sl").agg(F.count(F.lit(1)).alias("c")).collect()
        }
    else:
        slice_n = {0: n}

    def with_w(weights: list[float], batch: DataFrame) -> DataFrame:
        # ONE array literal (r15): lit(ndarray) hits PySpark's ndarray
        # branch and creates a single JVM array Literal — unlike
        # lit(list), which expands to array(lit, lit, ...), a 513-node
        # tree re-analyzed every round — and, unlike the old one-row
        # crossJoin(broadcast), no broadcast-exchange job per GD round
        # (the per-round job constants were the measured cost at bench
        # scale; at real scale this also removes a per-round driver
        # barrier)
        import numpy as np

        return batch.withColumn(
            "warr", F.lit(np.asarray(weights, dtype=np.float64))
        )

    w = [0.0] * (n_buckets + 1)
    for t in range(rounds):
        if n_slices > 1:
            sl = t % n_slices
            if not slice_n.get(sl):
                continue  # empty slice (tiny corpus): nothing to learn from
            batch, n_round = base.where(F.col("sl") == sl), slice_n[sl]
        else:
            batch, n_round = base, n
        sig = _sigmoid(_margin(n_buckets))
        resid = with_w(w, batch).select(
            "tb",
            F.round(F.lit(SCALE) * (sig - F.col("y").cast("double")))
            .cast("long")
            .alias("r"),
        ).withColumn(
            # mean pooling differentiates to r/len per token instance;
            # re-quantize so the aggregated gradient stays exact-integer
            "rl",
            F.round(F.col("r") / F.greatest(F.size("tb"), F.lit(1))).cast("long"),
        )
        # ONE job per round: explode per-token (bucket, r/len) structs
        # PLUS a per-doc sentinel (-1, r) row, so the bias gradient
        # (Σ_docs r) rides the same n_buckets-row aggregation as the
        # feature gradients (Σ_token-instances r/len per bucket)
        grad = (
            resid.select(
                F.explode(
                    F.concat(
                        F.transform(
                            "tb",
                            lambda b: F.struct(
                                b.alias("bucket"),
                                F.col("rl").alias("v"),
                            ),
                        ),
                        F.array(
                            F.struct(
                                F.lit(-1).alias("bucket"),
                                F.col("r").alias("v"),
                            )
                        ),
                    )
                ).alias("g")
            )
            .groupBy("g.bucket")
            .agg(F.sum("g.v").alias("gsum"))
            .collect()
        )
        step = lr / (n_round * SCALE)
        for row in grad:
            idx = n_buckets if row["bucket"] == -1 else row["bucket"]
            w[idx] -= step * row["gsum"]
    sig = _sigmoid(_margin(n_buckets))
    scored = with_w(w, base).select(
        "doc_id",
        "y",
        F.round(F.lit(SCALE) * sig).cast("long").alias("score_micro"),
        (sig >= 0.5).cast("int").alias("pred"),
    )
    return w, register_persisted(scored, base)
