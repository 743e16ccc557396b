"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation set (the standard contamination scrub a
training-data pipeline runs before pretraining — e.g. the 13-gram
overlap rule described in the GPT-3 and PaLM papers).

Posture at 100 TB: eval sets are small (10^3..10^6 docs, at most 10^7
distinct n-grams) while the corpus is the 100 TB side.  So: build the
DISTINCT eval n-gram key set once and broadcast it, then stream the
corpus through tokenize → n-gram → explode → broadcast-hash join →
per-doc count.  The corpus-side explode is pipelined inside its scan
stage (generated rows flow straight into the broadcast join, never
materialized or shuffled); only matching (doc, gram) hits — rare by
construction — reach the aggregation exchange.  If the eval set ever
outgrows broadcast range the identical plan degrades to a shuffle hash
join on the gram key; nothing else changes.

Gram keys are md5 of the space-joined token window: portable
(bit-identical in Spark / DuckDB / Python, so membership is
oracle-checkable) and fixed-width, so shuffle/broadcast size is
independent of n.  Production swap at extreme scale: xxhash64 for
8-byte keys — same plan, engine-local hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_keys(tk: Column, n: int) -> Column:
    """Distinct md5 keys of the ``n``-token windows of an (already
    materialized) token-array column.  Docs shorter than ``n`` tokens
    yield an empty array.

    ``tk`` must be a plain staged column (alias from a previous
    projection), not an inline tokenizer call: the window transform
    references it once per position, and HOF lambdas inline their
    argument expression per element.  Tokenizer-agnostic by design:
    stage ``tokens(..., mode="cjk")`` for no-space-script corpora and
    the windows become character n-grams — the standard CJK decontam
    fallback — with no change here."""
    n_windows = F.size(tk) - (n - 1)
    idx = F.sequence(F.lit(1), n_windows)
    grams = F.transform(idx, lambda i: F.md5(F.array_join(F.slice(tk, i, n), " ")))
    # guard BEFORE sequence evaluates: sequence(1, k) with k < 1 walks
    # DESCENDING in Spark instead of yielding []
    return F.when(n_windows >= 1, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def eval_gram_set(eval_docs: DataFrame, grams_col: str = "grams") -> DataFrame:
    """The distinct n-gram keys of the eval side — the small table the
    contamination join broadcasts."""
    return eval_docs.select(F.explode(grams_col).alias("gram")).distinct()


def contaminated_docs(
    corpus: DataFrame,
    eval_grams: DataFrame,
    id_col: str = "doc_id",
    grams_col: str = "grams",
) -> DataFrame:
    """Per-document overlap counts against the (broadcast) eval n-gram
    set: returns ``(id, n_grams, n_overlap)`` for documents with at
    least one shared n-gram.  ``n_grams`` (the doc's distinct-gram
    count) rides along so callers can derive an overlap fraction.

    The inner broadcast join doubles as the filter — clean documents
    (the overwhelming majority) die inside the corpus scan stage and
    never shuffle."""
    ex = corpus.select(
        F.col(id_col),
        F.size(grams_col).cast("long").alias("n_grams"),
        F.explode(grams_col).alias("gram"),
    )
    hits = ex.join(F.broadcast(eval_grams), "gram")
    return hits.groupBy(id_col, "n_grams").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
