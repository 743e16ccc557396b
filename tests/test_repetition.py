"""Repetition-signal semantics (Gopher/MassiveText-style filters)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.textstats import repetition_frac, tokens, word_ngrams

pytestmark = pytest.mark.usefixtures("spark")


def _fracs(spark, text, n=2):
    df = spark.createDataFrame([(text,)], "text string")
    staged = df.select(tokens(F.col("text")).alias("tk"))
    grams = staged.select(word_ngrams(F.col("tk"), n).alias("g"))
    return grams.select(repetition_frac(F.col("g")).alias("f")).collect()[0]["f"]


def test_no_repetition_is_zero(spark):
    assert _fracs(spark, "all words here are unique today") == 0.0


def test_pure_loop_is_highly_repetitive(spark):
    # "spam ham spam ham spam ham" -> 5 bigram windows, 2 distinct
    assert _fracs(spark, "spam ham spam ham spam ham") == pytest.approx(3 / 5)


def test_short_doc_yields_zero_not_null(spark):
    assert _fracs(spark, "single") == 0.0
    assert _fracs(spark, "") == 0.0


def test_trigram_windows_counted_independently(spark):
    # 4 tokens -> two 3-gram windows, both distinct
    assert _fracs(spark, "a b c d", n=3) == 0.0
    # "a b a b a b": windows [a b a, b a b, a b a, b a b] -> 2 distinct of 4
    assert _fracs(spark, "a b a b a b", n=3) == pytest.approx(2 / 4)


def test_normalize_text_unicode_fixtures(spark):
    """NFC + lower + whitespace collapse on genuinely non-ASCII input
    (the sf testdata is ASCII, so the Unicode path is pinned here)."""
    from yodel_etl_spark.scale.textstats import normalize_text

    rows = [
        (1, "école   PRIVÉE"),     # combining accents -> NFC
        (2, "  Straße\tzum\nSee "),       # sharp s, tabs/newlines
        (3, None),
        (4, "ÉCOLE"),                     # precomposed upper
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: r.text_norm for r in normalize_text(df).collect()}
    assert got[1] == "école privée"  # composed, lowered, collapsed
    assert got[2] == "straße zum see"
    assert got[3] is None
    assert got[4] == "école"
