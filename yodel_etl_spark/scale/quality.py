"""Rule-based corpus quality filtering (Gopher-style heuristics).

Implements the published document-level quality rules from the Gopher
corpus pipeline (Rae et al. 2021, "Scaling Language Models", App. A —
public paper) as one narrow column-expression pass: word-count band,
mean-word-length band, symbol-to-word ratio, bullet/ellipsis line
fractions, alpha-word fraction, and a stop-word floor.  Complements
``textstats.quality_score`` (a scalar score) with the industry-standard
boolean rule-set verdict a pretraining pipeline gates on.

Everything is built-in ``pyspark.sql.functions`` — zero Python in the
hot path, so at 100 TB this is a single WholeStageCodegen pass over the
corpus scan with column pruning down to (id, text), no shuffle at all.

Expression hygiene (README design rules): the token / line arrays are
materialized in their own projection before the counters reference
them — HOF lambdas inline their argument expression per element, and a
multiply-referenced alias is not collapsed by CollapseProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.scale.textstats import tokens

#: Gopher's stop-word anchor list (the rule asks for >= 2 distinct hits)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

#: word-count band [min, max] — Gopher excludes docs outside 50..100k words
WORD_COUNT_BAND = (50, 100_000)

#: mean word length band (characters)
MEAN_WORD_LEN_BAND = (3.0, 10.0)

#: max fraction of "#"/"..." symbols per word
MAX_SYMBOL_WORD_RATIO = 0.1

#: max fraction of lines starting with a bullet
MAX_BULLET_LINE_FRAC = 0.9

#: max fraction of lines ending with an ellipsis
MAX_ELLIPSIS_LINE_FRAC = 0.3

#: min fraction of words containing at least one alphabetic character
MIN_ALPHA_WORD_FRAC = 0.8


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokenizer: str = "ws",
) -> DataFrame:
    """Per-document Gopher quality-rule verdicts.

    Returns one row per input row: the raw counters the rules read, one
    boolean per rule, and the conjunction ``pass_gopher``.  Division is
    per-row double arithmetic over exact integer counters, so results
    are bit-identical across engines (registry determinism rules).
    ``tokenizer="cjk"`` runs the word-grain rules over CJK-safe unigram
    tokens (word-count/word-length bands then measure characters — the
    meaningful grain for no-space scripts, where the default would see
    ONE giant word per document and fail every band).
    """
    txt = F.col(text_col)
    # projection 1: materialize the arrays the counters reference
    arrs = df.select(
        F.col(id_col),
        txt.alias("_t"),
        tokens(txt, mode=tokenizer).alias("_tk"),
        F.split(txt, "\n").alias("_ln"),
    )
    # projection 2: exact integer counters off the materialized arrays
    cnt = arrs.select(
        id_col,
        F.size("_tk").cast("long").alias("n_words"),
        F.aggregate("_tk", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).alias(
            "n_word_chars"
        ),
        F.size(F.filter("_tk", lambda t: t.rlike("[A-Za-z]"))).cast("long").alias(
            "n_alpha_words"
        ),
        (
            (F.length("_t") - F.length(F.replace("_t", F.lit("#"), F.lit(""))))
            + (F.length("_t") - F.length(F.replace("_t", F.lit("..."), F.lit("")))) / F.lit(3)
        )
        .cast("long")
        .alias("n_symbols"),
        F.size("_ln").cast("long").alias("n_lines"),
        F.size(F.filter("_ln", lambda l: F.trim(l).rlike("^[-*•]"))).cast("long").alias(
            "n_bullet_lines"
        ),
        F.size(F.filter("_ln", lambda l: l.endswith("..."))).cast("long").alias(
            "n_ellipsis_lines"
        ),
        F.size(
            F.array_intersect(
                F.transform("_tk", F.lower),
                F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
            )
        )
        .cast("long")
        .alias("n_stop_hits"),
    )
    nw = F.col("n_words").cast("double")
    mean_len = F.when(F.col("n_words") > 0, F.col("n_word_chars") / nw).otherwise(0.0)
    lo, hi = WORD_COUNT_BAND
    mlo, mhi = MEAN_WORD_LEN_BAND
    rules = cnt.select(
        id_col,
        "n_words",
        F.round(mean_len, 6).alias("mean_word_len"),
        "n_stop_hits",
        F.col("n_words").between(lo, hi).alias("ok_word_count"),
        ((mean_len >= mlo) & (mean_len <= mhi)).alias("ok_mean_word_len"),
        F.when(F.col("n_words") > 0, F.col("n_symbols") / nw <= MAX_SYMBOL_WORD_RATIO)
        .otherwise(False)
        .alias("ok_symbol_ratio"),
        (F.col("n_bullet_lines") / F.col("n_lines") < MAX_BULLET_LINE_FRAC).alias(
            "ok_bullet_lines"
        ),
        (F.col("n_ellipsis_lines") / F.col("n_lines") < MAX_ELLIPSIS_LINE_FRAC).alias(
            "ok_ellipsis_lines"
        ),
        F.when(F.col("n_words") > 0, F.col("n_alpha_words") / nw >= MIN_ALPHA_WORD_FRAC)
        .otherwise(False)
        .alias("ok_alpha_words"),
        (F.col("n_stop_hits") >= 2).alias("ok_stopwords"),
    )
    return rules.withColumn(
        "pass_gopher",
        F.col("ok_word_count")
        & F.col("ok_mean_word_len")
        & F.col("ok_symbol_ratio")
        & F.col("ok_bullet_lines")
        & F.col("ok_ellipsis_lines")
        & F.col("ok_alpha_words")
        & F.col("ok_stopwords"),
    )
