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


#: Kneser-Ney absolute discount (the standard fixed value; Chen &
#: Goodman 1999 estimate ~n1/(n1+2·n2) ≈ 0.7-0.8 on natural text)
KN_DISCOUNT = 0.75


def doc_trigrams(
    docs: DataFrame, id_col: str, text_col: str, tokenizer: str = "ws"
) -> DataFrame:
    """Exploded (id, w1, w2, w3) adjacent word triples of the lowercased
    tokens; docs with fewer than three tokens yield no rows."""
    staged = docs.select(
        F.col(id_col), tokens(F.lower(F.col(text_col)), mode=tokenizer).alias("_tk")
    ).where(F.size("_tk") >= 3)
    grams = F.transform(
        F.sequence(F.lit(1), F.size("_tk") - 2),
        lambda i: F.struct(
            F.element_at(F.col("_tk"), i).alias("w1"),
            F.element_at(F.col("_tk"), i + 1).alias("w2"),
            F.element_at(F.col("_tk"), i + 2).alias("w3"),
        ),
    )
    return staged.select(id_col, F.explode(grams).alias("g")).select(
        id_col,
        F.col("g.w1").alias("w1"),
        F.col("g.w2").alias("w2"),
        F.col("g.w3").alias("w3"),
    )


def kn_trigram_lm(grams: DataFrame) -> DataFrame:
    """Interpolated Kneser-Ney trigram model from exploded grams —
    ``(w1, w2, w3, nats)`` with the same integer micro-nat convention as
    :func:`bigram_lm`.  Absolute discounting with continuation counts
    (the KN signature — lower orders count CONTEXTS a word completes,
    not tokens):

      P(w3|w1,w2) = (c123 − D)/c12 + D·N1+(w1w2·)/c12 · Pc(w3|w2)
      Pc(w3|w2)   = (N1+(·w2w3) − D)/N1+(·w2·)
                    + D·N1+(w2·)/N1+(·w2·) · Pc(w3)
      Pc(w3)      = N1+(·w3) / N1+(··)

    The LM is corpus-trained and scores the SAME corpus, so every
    scored trigram is seen (c123 ≥ 1) and the back-off terms act as
    smoothing weights, never as an unseen-event fallback — the same
    self-contained convention as the bigram model.

    Scale shape: the corpus-sized shuffle is the ONE trigram count;
    every other table (contexts, continuation counts, the two
    vocabulary rollups) derives from it at gram-table size, joined back
    on fixed-width gram keys."""
    d = F.lit(KN_DISCOUNT)
    t3 = grams.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("c123"))
    t3 = t3.persist()
    # (w1,w2) context: token total + distinct-continuation count
    ctx = t3.groupBy("w1", "w2").agg(
        F.sum("c123").alias("c12"), F.count(F.lit(1)).alias("n1p_12")
    )
    # middle order rides distinct (w2,w3) pairs: rows of t3 grouped by
    # (w2,w3) count distinct w1 (t3 is unique on the triple)
    mid = t3.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("n1p_d23"))
    mid = mid.persist()
    mid2 = mid.groupBy("w2").agg(
        F.sum("n1p_d23").alias("n1p_d2d"), F.count(F.lit(1)).alias("n1p_2d")
    )
    uni = mid.groupBy("w3").agg(F.count(F.lit(1)).alias("n1p_d3"))
    tot = mid.agg(F.count(F.lit(1)).alias("n_pairs"))
    p_uni = F.col("n1p_d3") / F.col("n_pairs")
    p_mid = (F.col("n1p_d23") - d) / F.col("n1p_d2d") + d * F.col("n1p_2d") / F.col(
        "n1p_d2d"
    ) * p_uni
    p = (F.col("c123") - d) / F.col("c12") + d * F.col("n1p_12") / F.col("c12") * p_mid
    lm = (
        t3.join(ctx, ["w1", "w2"])
        .join(mid, ["w2", "w3"])
        .join(mid2, "w2")
        .join(uni, "w3")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "w3",
            F.round(F.log(p) * F.lit(1000000.0)).cast("long").alias("nats"),
        )
    )
    return register_persisted(lm, t3, mid)


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    head_pct: int = 30,
    tail_pct: int = 30,
    method: str = "rank",
    accuracy: int = 10_000,
    tokenizer: str = "ws",
    order: int = 2,
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
    tests/test_quality.py pins.

    ``order=3`` swaps the add-one bigram LM for the interpolated
    Kneser-Ney trigram (:func:`kn_trigram_lm`) — a materially better
    in-distribution signal on any corpus with multiword structure; the
    default stays 2, so existing oracle rows are byte-identical."""
    if method not in ("rank", "threshold"):
        raise ValueError(f"method={method!r} (expected 'rank' or 'threshold')")
    if order not in (2, 3):
        raise ValueError(f"order={order!r} (expected 2 or 3)")
    if order == 3:
        grams = doc_trigrams(docs, id_col, text_col, tokenizer=tokenizer)
        grams = grams.persist()
        lm = kn_trigram_lm(grams)
        keys = ["w1", "w2", "w3"]
    else:
        grams = doc_bigrams(docs, id_col, text_col, tokenizer=tokenizer)
        grams = grams.persist()
        lm = bigram_lm(grams)
        keys = ["w1", "w2"]
    # broadcast hint only for the bigram LM (vocabulary² bounded); the
    # trigram table scales with DISTINCT TRIGRAMS — near token-count-
    # sized on natural text — so forcing a broadcast would collect it
    # to the driver at exactly the scale the operator targets.  Unhinted,
    # AQE broadcasts when it fits and sort-merges on the gram keys when
    # it does not.
    lm_side = F.broadcast(lm) if order == 2 else lm
    scored = (
        grams.join(lm_side, keys)
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
