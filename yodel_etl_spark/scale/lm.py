"""Corpus-trained language-model scoring for quality bucketing — the
CCNet move (Wenzek et al. 2020, public paper): score every document
under a language model and split the corpus into head/middle/tail
perplexity buckets, so downstream consumers can train on the head or
re-weight the tail.  CCNet uses a pretrained KenLM; this engine trains
the LM *on the corpus itself* in the same job (an add-one-smoothed word
bigram model), which keeps the operator self-contained, deterministic,
and oracle-checkable.

Scale shape:
  * LM training is two shuffles over fixed-width gram keys (bigram
    counts, then unigram totals derived FROM the bigram table — the
    second shuffle never revisits the corpus);
  * doc scoring joins exploded (doc, w1, w2) grams against the LM —
    broadcast at test scale, and the identical plan degrades to a
    shuffle hash join on (w1, w2) when the vocabulary outgrows
    broadcast range;
  * per-doc log-prob sums are EXACT INTEGER micro-nats
    (``round(ln(p)·10⁶)`` as BIGINT), so the aggregation is
    order-insensitive — float summation order across partitions can
    never flip a hash comparison against the oracle;
  * the head/middle/tail cut has TWO forms (``method=``): the exact
    ``"rank"`` form ranks doc-grain rows (corpus cardinality, not token
    cardinality) with one global window — oracle-exact, but a
    single-task funnel past ~10⁹ docs — and the scale-safe
    ``"threshold"`` form computes two approx-quantile score cutpoints
    in ONE aggregate (partial-merge, no sort anywhere), broadcasts
    them, and buckets by comparison.  The trade is the exact N·pct
    boundary: threshold buckets agree with rank buckets except inside
    the tie band AT a cutpoint (every doc tied at the head cut is
    ``head``; rank splits such ties by id) plus percentile_approx's
    rank error (≤ corpus_size/accuracy rows around each cut).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yodel_etl_spark.scale.textstats import tokens
from yodel_etl_spark.session import register_persisted


def doc_bigrams(
    docs: DataFrame, id_col: str, text_col: str, tokenizer: str = "ws"
) -> DataFrame:
    """Exploded (id, w1, w2) adjacent word pairs of the lowercased
    tokens (``tokenizer="cjk"`` = the CJK-safe unigram splitter, so a
    no-space-script doc yields character bigrams instead of zero
    grams); docs with fewer than two tokens yield no rows."""
    staged = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col)), mode=tokenizer).alias("_tk")
    ).where(F.size("_tk") >= 2)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("_tk") - 1),
        lambda i: F.struct(
            F.element_at(F.col("_tk"), i).alias("w1"),
            F.element_at(F.col("_tk"), i + 1).alias("w2"),
        ),
    )
    return staged.select(id_col, F.explode(grams).alias("g")).select(
        id_col, F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2")
    )


def bigram_lm(grams: DataFrame) -> DataFrame:
    """Add-one-smoothed bigram model from exploded grams:
    ``nats = round(ln((c12+1)/(c1+V)) · 10⁶)`` per (w1, w2), with V the
    w1-vocabulary size.  Unigram totals and V both derive from the
    bigram count table — one corpus-sized shuffle total."""
    big = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    big = big.persist()
    uni = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    lm = (
        big.join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c12") + F.lit(1.0))
                    / (F.col("c1") + F.col("v")).cast("double")
                )
                * F.lit(1000000.0)
            )
            .cast("long")
            .alias("nats"),
        )
    )
    return register_persisted(lm, big)


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_pct: int = 30,
    tail_pct: int = 30,
    method: str = "rank",
    accuracy: int = 10_000,
    tokenizer: str = "ws",
) -> DataFrame:
    """Per-document LM score + CCNet head/middle/tail bucket.

    ``score`` is the average log-probability in nats (higher = lower
    perplexity = more in-distribution); the top ``head_pct`` % of docs
    by score are ``head``, the bottom ``tail_pct`` % are ``tail``.

    ``method="rank"`` (exact): one global window ranks the doc-grain
    frame, ties break on id — deterministic and oracle-checkable, but
    the rank is a single task at extreme corpus sizes.

    ``method="threshold"`` (scale-safe): ``percentile_approx(score,
    [tail_pct/100, 1-head_pct/100], accuracy)`` in ONE aggregate, the
    two cutpoints broadcast back, bucket by comparison — no window, no
    global sort.  Tie-band semantics: ``score >= head_cut`` is head
    (checked first), else ``score <= tail_cut`` is tail — so ALL docs
    tied at a cutpoint land on the inclusive side, where rank mode
    splits the tie by id; away from the cutpoints (beyond the approx
    rank error, ≤ n/accuracy rows per cut) both forms agree, which
    tests/test_quality.py pins."""
    if method not in ("rank", "threshold"):
        raise ValueError(f"method={method!r} (expected 'rank' or 'threshold')")
    grams = doc_bigrams(docs, id_col, text_col, tokenizer=tokenizer)
    grams = grams.persist()
    lm = bigram_lm(grams)
    scored = (
        grams.join(F.broadcast(lm), ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("nats").alias("_s"),
        )
        .select(
            id_col,
            "n_grams",
            F.round(
                F.col("_s").cast("double") / F.lit(1000000.0) / F.col("n_grams"), 6
            ).alias("score"),
        )
    )
    # doc-grain and narrow, but read twice (the count/cutpoint aggregate
    # and the bucketing pass) — without the persist the LM join and
    # score agg run once per consumer
    scored = scored.persist()
    if method == "threshold":
        cuts = scored.agg(
            F.percentile_approx(
                "score",
                F.array(
                    F.lit(tail_pct / 100.0), F.lit(1.0 - head_pct / 100.0)
                ),
                F.lit(accuracy),
            ).alias("_cuts")
        )
        out = scored.crossJoin(F.broadcast(cuts)).select(
            id_col,
            "n_grams",
            "score",
            F.when(F.col("score") >= F.element_at("_cuts", 2), "head")
            .when(F.col("score") <= F.element_at("_cuts", 1), "tail")
            .otherwise("middle")
            .alias("bucket"),
        )
        return register_persisted(out, grams, lm, scored)
    n_total = scored.agg(F.count(F.lit(1)).alias("n"))
    rn = F.row_number().over(Window.orderBy(F.desc("score"), F.col(id_col)))
    ranked = scored.crossJoin(F.broadcast(n_total)).withColumn("_rn", rn)
    head_n = F.floor(F.col("n") * head_pct / 100)
    tail_n = F.floor(F.col("n") * tail_pct / 100)
    out = ranked.select(
        id_col,
        "n_grams",
        "score",
        F.when(F.col("_rn") <= head_n, "head")
        .when(F.col("_rn") > F.col("n") - tail_n, "tail")
        .otherwise("middle")
        .alias("bucket"),
    )
    return register_persisted(out, grams, lm, scored)
