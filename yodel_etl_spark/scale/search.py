"""Distributed keyword retrieval: BM25 scoring + top-k.

The curation move this enables at 100 TB: targeted retrieval over the
corpus — "find the documents most about X" — for eval-set forensics,
topic-probe audits, or seeding a quality classifier, without building a
serving index first.

Plan shape (the whole point): for a *bounded* query-term set the classic
inverted-index shuffle is unnecessary.  Per-term term frequency is a
narrow ``size(filter(tokens, t = term))`` projection evaluated in the
scan stage — no explode, no postings table, no (doc, term) shuffle.
Corpus statistics (N, Σdl, per-term document frequency) reduce to ONE
one-row aggregate that broadcasts back onto the scored scan, and the
top-k is a ``TakeOrderedAndProject`` (per-partition heap + driver merge
of k·P rows), never a global sort.  Total cost: one corpus scan + a
one-row broadcast — the same shape at 500 rows and at 100 TB.

Determinism (registry rules): tf/dl/df/N are exact integers; the score
is per-row double arithmetic over those integers in a fixed term order,
so both engines produce bit-identical doubles (same caveat as TF-IDF's
``ln``: libm vs java.lang.Math can differ in the last ulp, which the
6 dp output rounding absorbs; ordering is safe because distinct
(tf-vector, dl) inputs differ by far more than an ulp and identical
inputs tie-break on doc id).

Reference parity note: the reference engine has no retrieval operator —
this is an extension in the spirit of its text-processing surface
(cited baseline: Robertson & Zaragoza 2009, the BM25 'plus-one' idf
variant Lucene ships as default).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.scale.textstats import tokens
from yodel_etl_spark.session import register_persisted


def _idf(n_docs: Column, df_t: Column) -> Column:
    """Lucene-default BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)).

    Always positive (unlike the raw Robertson idf, which goes negative
    for df > N/2 — our synthetic corpus has such terms)."""
    return F.log(
        1.0
        + (n_docs.cast("double") - df_t.cast("double") + 0.5)
        / (df_t.cast("double") + 0.5)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    tokenizer: str = "ws",
    unigram_scores: dict[str, int] | None = None,
) -> DataFrame:
    """Top-``top_n`` documents by BM25 against ``query_terms``
    (lowercase tokens; ``tokenizer="cjk"`` switches to the CJK-safe
    unigram splitter so no-space scripts retrieve per-character instead
    of collapsing each document to one giant token; ``tokenizer=
    "unigram"`` retrieves over a LEARNED subword segmentation — pass
    the trained piece table from ``scale.unigram.learn_unigram`` as
    ``unigram_scores`` and query with pieces; dl/tf/df then count
    subword pieces, computed by one Arrow ``mapInPandas`` encode pass
    in place of the codegen splitter — the rest of the plan is
    identical), as ``(doc_id, dl, tf_<term>..., score)`` ordered
    score-desc then id-asc.

    The narrow per-doc projection (id, dl, one tf column per term) is
    persisted because it feeds both the stats aggregate and the scored
    output; without it each branch re-tokenizes the corpus.  Callers
    release via ``session.release``.
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        # duplicate terms would create ambiguous tf columns (and
        # double-count the term's contribution); reject loudly
        raise ValueError(f"duplicate query terms: {query_terms}")

    def _tf(tk: Column, term: str) -> Column:
        # helper (not a default-arg lambda): a two-parameter lambda
        # would be treated as pyspark's (element, index) filter form
        return F.size(F.filter(tk, lambda t: t == F.lit(term)))

    # internal columns are POSITIONAL (tf_0, df_0, …): a term containing
    # '.' or backticks would break the F.col re-reads of a tf_{term}
    # name (dot parses as struct-field access); the pretty tf_{term}
    # names appear only as final output aliases, never re-read
    if tokenizer == "unigram":
        if not unigram_scores:
            raise ValueError("tokenizer='unigram' requires unigram_scores")
        from yodel_etl_spark.scale.unigram import unigram_tokenize

        encoded = unigram_tokenize(docs, id_col, text_col, unigram_scores)
        tk = F.col("tokens")
        proj = encoded.select(
            F.col(id_col).alias("doc_id"),
            F.col("n_tokens").cast("int").alias("dl"),
            *[_tf(tk, term).alias(f"tf_{i}") for i, term in enumerate(query_terms)],
        ).persist()
    else:
        tk = tokens(F.lower(F.col(text_col)), mode=tokenizer)
        proj = docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(tk).alias("dl"),
            *[_tf(tk, term).alias(f"tf_{i}") for i, term in enumerate(query_terms)],
        ).persist()

    stats = proj.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("bigint")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )

    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl)
    # left-associated sum in fixed term order (no 0.0 seed), so a
    # hand-written SQL oracle `t0 + t1 + ...` evaluates in the same
    # fp order and reproduces the double bit-for-bit
    score: Column | None = None
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        term_score = (
            _idf(F.col("n_docs"), F.col(f"df_{i}")) * (tf * F.lit(k1 + 1.0))
        ) / (tf + norm)
        score = term_score if score is None else score + term_score

    out = (
        proj.join(F.broadcast(stats))  # one-row stats: broadcast, no shuffle
        .withColumn("score", F.round(score, 6))
        .select(
            "doc_id",
            "dl",
            *[
                F.col(f"tf_{i}").alias(f"tf_{term}")
                for i, term in enumerate(query_terms)
            ],
            "score",
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(top_n)
    )
    return register_persisted(out, proj)
