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


def test_span_scrub_golden(spark):
    """Hand-computed fixture: a 3-token span shared by two docs survives
    only in the min-id keeper; within-doc repeats are untouched; clean
    docs come back byte-identical; row count is preserved."""
    from yodel_etl_spark.scale.dedup import span_scrub
    from yodel_etl_spark.session import release

    rows = [
        (1, "a b c x y z"),          # keeper of "a b c"
        (2, "a b c q r s"),          # loses "a b c"
        (3, "q r s q r s"),          # within-doc repeat only -> kept whole
        (4, "lone words here"),      # clean
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = span_scrub(docs, "doc_id", "text", w=3)
    got = {r["doc_id"]: (r["n_segs"], r["n_dropped"], r["text_clean"]) for r in out.collect()}
    release(out)
    # doc 2's "q r s" span also occurs in doc 3 (twice); keeper is doc 2
    assert got[1] == (2, 0, "a b c x y z")
    assert got[2] == (2, 1, "q r s")
    assert got[3] == (2, 2, "")
    assert got[4] == (1, 0, "lone words here")
    assert set(got) == {1, 2, 3, 4}
