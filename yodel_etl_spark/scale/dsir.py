"""DSIR-style data selection: importance resampling toward a target
distribution over hashed n-gram features (Xie et al. 2023, "Data
Selection for Language Models via Importance Resampling" — public
paper).  The pretraining-curation move: given a small exemplar set of
the data you WANT (the target), score every raw-corpus document by how
much more likely its hashed-unigram bag is under the target's
bag-of-words model than under the raw corpus's, and keep the top
scorers.  The paper resamples with Gumbel noise; this engine implements
the deterministic top-k variant the paper also evaluates, so runs are
reproducible and oracle-checkable.

Scale shape (nothing document-sized ever shuffles twice):
  * the ONLY corpus-sized shuffle is the (bucket, is_target) gram
    count — map-side-combined onto ``n_buckets`` rows (a few hundred);
  * the per-bucket log-likelihood-ratio weights reduce to ONE row (a
    ``n_buckets``-length array) broadcast back onto the scoring scan;
  * per-doc scoring is a narrow ``aggregate`` over the token array in
    the scan stage — no explode, no per-gram join at scoring time;
  * the top-k is TakeOrderedAndProject.

Determinism (registry rules): bucket counts and totals are exact
integers; each bucket weight is an integer micro-nat
(``round(ln(p̂_b/q̂_b)·10⁶)`` as BIGINT — the lm.py convention), so the
per-doc sum is order-insensitive integer arithmetic and the oracle
hash-matches exactly.  Target membership is a pure md5-bucket function
of the id (the sampling-family convention) — no label column, no join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.scale.sampling import hash_bucket
from yodel_etl_spark.scale.textstats import tokens
from yodel_etl_spark.session import register_persisted

#: micro-nat fixed-point scale (matches scale/lm.py)
SCALE = 1_000_000.0


def dsir_select(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_pct: int = 5,
    n_buckets: int = 256,
    top_n: int = 50,
    tokenizer: str = "ws",
) -> DataFrame:
    """Top-``top_n`` raw documents by hashed-unigram importance weight
    toward the target slice, as ``(doc_id, score_micro)`` ordered
    score-desc then id-asc.

    Target = rows whose ``hash_bucket(id) >= 100 - target_pct`` (the
    engine's standard append-stable md5 split); the raw pool is
    everything else — only raw docs are scored and returned.  Weights
    are add-one-smoothed log ratios of per-bucket unigram frequencies:
    ``w_b = round(1e6 · (ln((p_b+1)/(Np+B)) − ln((q_b+1)/(Nq+B))))``
    with B = ``n_buckets``; a doc's score is the exact integer sum of
    its tokens' bucket weights.

    ``tokenizer="cjk"`` switches to the CJK-safe unigram splitter
    (:func:`yodel_etl_spark.scale.textstats.tokens`) so no-space-script
    corpora contribute per-character unigram buckets instead of one
    giant token per document.
    """
    if not 0 < target_pct < 100:
        raise ValueError(f"target_pct must be in (0, 100), got {target_pct}")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        (hash_bucket(F.col(id_col), 100) >= 100 - target_pct).alias("is_tgt"),
        tokens(F.lower(F.col(text_col)), mode=tokenizer).alias("tk"),
    ).persist()  # feeds the count pass and the scoring pass

    grams = base.select("is_tgt", F.explode("tk").alias("g")).select(
        "is_tgt", hash_bucket(F.col("g"), n_buckets).alias("bucket")
    )
    counts = grams.groupBy("bucket").agg(
        F.sum(F.col("is_tgt").cast("long")).alias("cnt_p"),
        F.sum((~F.col("is_tgt")).cast("long")).alias("cnt_q"),
    )
    # silent buckets still need their smoothed weight: left-join the
    # full bucket range (a ``n_buckets``-row control-plane frame).
    # PERSISTED: both the totals aggregate and the weight projection
    # read it — without the pin each branch re-runs the corpus-sized
    # gram count (two scans + two explodes for one 256-row table)
    full = (
        docs.sparkSession.range(n_buckets)
        .select(F.col("id").cast("int").alias("bucket"))
        .join(counts, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cnt_p", F.lit(0)).alias("cnt_p"),
            F.coalesce("cnt_q", F.lit(0)).alias("cnt_q"),
        )
        .persist()
    )
    totals = full.agg(
        F.sum("cnt_p").alias("np"), F.sum("cnt_q").alias("nq")
    )
    b = float(n_buckets)
    w = (
        full.crossJoin(F.broadcast(totals))
        .withColumn(
            "wi",
            F.round(
                F.lit(SCALE)
                * (
                    F.log(
                        (F.col("cnt_p").cast("double") + 1.0)
                        / (F.col("np").cast("double") + F.lit(b))
                    )
                    - F.log(
                        (F.col("cnt_q").cast("double") + 1.0)
                        / (F.col("nq").cast("double") + F.lit(b))
                    )
                )
            ).cast("long"),
        )
        .select("bucket", "wi")
    )
    # fold the weight table to ONE row holding the bucket-indexed array
    # (array_sort on (bucket, wi) structs orders by bucket), broadcast
    # it onto the scoring scan — scoring shuffles nothing
    warr = w.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("bucket", "wi"))),
            lambda s: s["wi"],
        ).alias("warr")
    )
    scored = (
        base.where(~F.col("is_tgt"))
        .crossJoin(F.broadcast(warr))
        .select(
            "doc_id",
            F.aggregate(
                "tk",
                F.lit(0).cast("long"),
                lambda acc, t: acc
                + F.element_at(F.col("warr"), hash_bucket(t, n_buckets) + 1),
            ).alias("score_micro"),
        )
    )
    out = scored.orderBy(F.col("score_micro").desc(), F.col("doc_id")).limit(top_n)
    return register_persisted(out, base, full)
