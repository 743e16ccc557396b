"""Corpus curation: the end-to-end scrub a pretraining-data pipeline
runs before shipping a corpus, composed from the engine's curation
operators —

  1. signals  — quality score, repetition fractions, language ID
                (one narrow codegen pass; scale/textstats.py)
  2. filter   — keep docs inside the quality band, under the
                repetition caps, in the allowed language set
  3. dedup    — one canonical doc per normalized-text fingerprint
                (min doc id wins; digest-only shuffle — the (fp, id)
                pairs shuffle, never the text, then a semi join pulls
                the surviving rows; scale/textstats.fingerprint)
  4. decontam — drop docs sharing n-grams with an eval set
                (broadcast gram-set membership join;
                scale/decontam.py)

Every stage is exact and deterministic, so the whole composition is
SQL-expressible and oracle-checkable.

Scale shape at 100 TB: stages 1-2 are narrow (pipeline into the scan),
stage 3 shuffles 16-byte digests + ids only, stage 4 broadcasts the
(small) eval gram set — clean docs flow scan→output without ever
shuffling document text.  The audit frame (``drop_reason``) is the same
pass with the filter turned into a label, so "why did my corpus
shrink?" costs one extra narrow projection, not a second pipeline.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.scale.decontam import eval_gram_set, ngram_keys
from yodel_etl_spark.session import guarded_filter
from yodel_etl_spark.scale.textstats import (
    fingerprint,
    lang_id,
    quality_score,
    repetition_frac,
    tokens,
    word_ngrams,
)


@dataclass(frozen=True)
class CurateConfig:
    fix_encoding: bool = False  # repair UTF-8-as-Latin-1 mojibake
    # before any signal is computed (textstats.fix_mojibake — codegen,
    # provably-safe decode guard).  Default False: the registered
    # pipeline_curate oracle predates the knob and the synthetic corpus
    # has no mojibake; a web corpus wants True right after extraction.
    min_quality: float = 0.5
    max_rep_2gram: float = 0.2
    max_rep_3gram: float = 0.18
    allowed_langs: tuple[str, ...] = ("en", "de", "fr", "es")
    decontam_n: int = 5


def with_signals(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stage 1: attach quality / repetition / lang-pred / fingerprint
    columns.  Tokens and gram arrays are staged in their own
    projections (expression-hygiene rule: every signal references its
    array more than once)."""
    staged = docs.select(
        "*",
        tokens(F.col(text_col)).alias("__tk"),
        tokens(F.lower(F.col(text_col))).alias("__tkl"),
    )
    grams = staged.select(
        "*",
        word_ngrams(F.col("__tk"), 2).alias("__g2"),
        word_ngrams(F.col("__tk"), 3).alias("__g3"),
    )
    return grams.select(
        *docs.columns,
        "__tkl",
        quality_score(F.col(text_col), F.col("__tk")).alias("quality"),
        repetition_frac(F.col("__g2")).alias("rep_2gram_frac"),
        repetition_frac(F.col("__g3")).alias("rep_3gram_frac"),
        lang_id(F.col("__tkl")).alias("lang_pred"),
        fingerprint(F.col("__tkl")).alias("fp"),
    )


def _keep_condition(cfg: CurateConfig) -> Column:
    return (
        (F.col("quality") >= cfg.min_quality)
        & (F.col("rep_2gram_frac") <= cfg.max_rep_2gram)
        & (F.col("rep_3gram_frac") <= cfg.max_rep_3gram)
        & F.col("lang_pred").isin(*cfg.allowed_langs)
    )


def _guarded_filter(df: DataFrame, cond: Column) -> DataFrame:
    """Filter without letting PushDownPredicate substitute ``cond``
    through the staged signal projections — promoted to the shared
    :func:`yodel_etl_spark.session.guarded_filter` (scale/links.py hits
    the same pathology); this alias keeps the pipeline's local name.
    The 20.6 s -> 0.5 s measurement on the sf0.1 signal pass lives in
    the shared helper's docstring now."""
    return guarded_filter(df, cond)


def curate(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: CurateConfig = CurateConfig(),
) -> DataFrame:
    """The curated corpus: signal columns attached, filters applied,
    one canonical doc per fingerprint, eval-contaminated docs removed.

    ``eval_docs`` (same schema) is the decontamination reference; None
    skips stage 4.  Returns the surviving rows of ``docs`` plus the
    signal columns (callers re-select to shed them)."""
    from pyspark.sql.window import Window

    if cfg.fix_encoding:
        from yodel_etl_spark.scale.textstats import fix_mojibake

        docs = docs.withColumn(text_col, fix_mojibake(F.col(text_col)))
    sig = _guarded_filter(with_signals(docs, id_col, text_col), _keep_condition(cfg))

    # canonical doc per fingerprint: min id wins.  One window pass over
    # the filtered rows (single shuffle on fp) — a groupBy+semi-join
    # form would shuffle the full rows for the join anyway AND evaluate
    # the signal subtree twice.
    w = Window.partitionBy("fp").orderBy(id_col)
    kept = (
        sig.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    if eval_docs is not None:
        ev_staged = eval_docs.select(
            tokens(F.lower(F.col(text_col))).alias("__tkl")
        )
        ev_grams = ev_staged.select(
            ngram_keys(F.col("__tkl"), cfg.decontam_n).alias("grams")
        )
        ev_set = eval_gram_set(ev_grams)
        # gram the PRE-window frame: dirty ids form a superset of the
        # contaminated kept ids (non-canonical dups may appear, but the
        # anti join only removes ids present in kept, so the result is
        # identical) — and this branch skips the fp window shuffle, so
        # per run the window runs once, not twice
        doc_grams = sig.select(
            F.col(id_col), ngram_keys(F.col("__tkl"), cfg.decontam_n).alias("grams")
        )
        # semi join, not inner: the probe short-circuits at the first
        # matching build row and the gram column never materializes
        # past the join — only contaminated ids reach the distinct
        dirty = (
            doc_grams.select(F.col(id_col), F.explode("grams").alias("gram"))
            .join(F.broadcast(ev_set), "gram", "left_semi")
            .select(id_col)
            .distinct()
        )
        kept = kept.join(dirty, id_col, "left_anti")

    return kept.drop("__tkl")


def audit(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg: CurateConfig = CurateConfig(),
) -> DataFrame:
    """Per-doc drop verdicts for stages 1-2 (the narrow filters):
    ``(id, quality, rep fractions, lang_pred, drop_reason)`` with
    drop_reason NULL for survivors.  First matching reason wins, in
    filter order — the debugging view of :func:`curate`."""
    sig = with_signals(docs, id_col, text_col)
    reason = (
        F.when(F.col("quality") < cfg.min_quality, "low_quality")
        .when(F.col("rep_2gram_frac") > cfg.max_rep_2gram, "repetitive_2gram")
        .when(F.col("rep_3gram_frac") > cfg.max_rep_3gram, "repetitive_3gram")
        .when(~F.col("lang_pred").isin(*cfg.allowed_langs), "lang_filtered")
    )
    return sig.select(
        id_col,
        "quality",
        "rep_2gram_frac",
        "rep_3gram_frac",
        "lang_pred",
        reason.alias("drop_reason"),
    )
