"""Decontamination operator: planted-overlap semantics + plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.decontam import contaminated_docs, eval_gram_set, ngram_keys
from yodel_etl_spark.scale.textstats import tokens

pytestmark = pytest.mark.usefixtures("spark")


def _grams(spark, rows, n=3):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    staged = df.select("doc_id", tokens(F.lower(F.col("text"))).alias("tkl"))
    return staged.select("doc_id", ngram_keys(F.col("tkl"), n).alias("grams"))


def test_planted_overlap_counts(spark):
    corpus = _grams(
        spark,
        [
            # shares the 3-gram "the quick fox" (and only that window)
            ("t1", "see the quick fox run"),
            # shares two distinct eval 3-grams
            ("t2", "the quick fox jumps high today"),
            # clean
            ("t3", "completely different words entirely"),
            # too short for any 3-gram
            ("t4", "hi there"),
        ],
    )
    eval_g = eval_gram_set(_grams(spark, [("e1", "the quick fox jumps")]))
    out = {
        r["doc_id"]: (r["n_grams"], r["n_overlap"])
        for r in contaminated_docs(corpus, eval_g).collect()
    }
    # e1 grams: "the quick fox", "quick fox jumps"
    assert out == {"t1": (3, 1), "t2": (4, 2)}  # t3/t4 filtered out


def test_repeated_gram_counts_once(spark):
    # the shared window appears twice in the doc; distinct grams per doc
    # mean it contributes ONE overlap
    corpus = _grams(spark, [("d", "a b c x a b c")])
    eval_g = eval_gram_set(_grams(spark, [("e", "a b c")]))
    [row] = contaminated_docs(corpus, eval_g).collect()
    assert row["n_overlap"] == 1


def test_short_docs_yield_empty_gram_arrays(spark):
    g = _grams(spark, [("s", "one two")], n=5).collect()[0]["grams"]
    assert g == []


def test_ngram_keys_are_md5_of_space_joined_window(spark):
    import hashlib

    [row] = _grams(spark, [("d", "Alpha beta gamma")], n=3).collect()
    expect = hashlib.md5(b"alpha beta gamma").hexdigest()
    assert row["grams"] == [expect]


def test_broadcast_join_in_plan(spark):
    corpus = _grams(spark, [("a", "x y z w")])
    eval_g = eval_gram_set(_grams(spark, [("e", "x y z")]))
    plan = contaminated_docs(corpus, eval_g)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
