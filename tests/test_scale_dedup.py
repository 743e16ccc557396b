"""Dedup-family invariants (scale/dedup.py) beyond the driver oracles:
the prefix-filter order must not change results (PPJoin theorem holds
under any total order)."""

from __future__ import annotations

from yodel_etl_spark.scale.dedup import jaccard_pairs
from yodel_etl_spark.session import load_tables


def _pairs(df):
    return {
        (r["doc_a"], r["doc_b"], r["n_common"], round(r["jaccard"], 12))
        for r in df.collect()
    }


def test_jaccard_prefix_order_df_equals_lex(spark, sf_small):
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    by_df = _pairs(jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5, prefix_order="df"))
    by_lex = _pairs(jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5, prefix_order="lex"))
    assert by_df == by_lex
    assert by_df  # non-vacuous: sf0.001 documents contain near-dups


def test_jaccard_df_cap_only_drops(spark, sf_small):
    """df-capped (approximate) output is a subset of the exact output."""
    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    exact = _pairs(jaccard_pairs(docs, "doc_id", "text", threshold=0.5))
    capped = _pairs(jaccard_pairs(docs, "doc_id", "text", threshold=0.5, df_cap=20))
    assert capped <= exact


def test_release_frees_operator_caches(spark, sf_small):
    """Operators persist() intermediates; session.release(result) must
    free them all after the caller's final action (the long-lived
    session leak: repeated calls otherwise accumulate cached RDDs)."""
    from yodel_etl_spark.session import release

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    cm = spark._jsparkSession.sharedState().cacheManager()
    cm.clearCache()
    pairs = jaccard_pairs(docs.limit(80), "doc_id", "text")
    pairs.count()
    assert not cm.isEmpty()
    release(pairs)
    assert cm.isEmpty()
    release(pairs)  # idempotent
