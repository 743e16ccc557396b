"""Gopher-rule quality gate: per-rule edge semantics on planted docs
(the synthetic corpus never trips the symbol/bullet/ellipsis rules, so
the registered-query parity alone would pin only their no-op path)."""

from __future__ import annotations

from yodel_etl_spark.scale.quality import gopher_rules

GOOD = (
    "the cat and the dog went to the house of friends that have been "
    "away with them for days " * 3
)  # 54 words, all alpha, >= 2 stopword hits, mean len in band

DOCS = [
    (1, GOOD),
    (2, "short doc the and"),  # fails word count (4 words)
    (3, GOOD.replace("cat", "c#t#ت#")),  # symbols planted on a passing doc
    (4, "- one\n- two\n- three\nplain"),  # 3/4 bullet lines < 0.9 -> ok
    (5, "- one\n- two\n- three"),  # 3/3 bullet lines -> fail
    (6, "first line...\nsecond...\nthird line"),  # 2/3 ellipsis -> fail
    (7, "the of " + "123 456 789 " * 20),  # alpha-word frac 2/62 -> fail
    (8, "the and " + "aaaaaaaaaaaaaaaaaaaaaaaa " * 60),  # mean len > 10 -> fail
    (9, ""),  # empty: every count 0, word rules fail closed
]


def _rows(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = gopher_rules(df, "doc_id", "text")
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_rule_edges(spark):
    r = _rows(spark)
    assert r[1]["pass_gopher"] is True
    assert r[2]["ok_word_count"] is False and r[2]["pass_gopher"] is False
    # planted '#' symbols push the symbol/word ratio over 0.1
    assert r[3]["ok_symbol_ratio"] is False and r[1]["ok_symbol_ratio"] is True
    assert r[4]["ok_bullet_lines"] is True
    assert r[5]["ok_bullet_lines"] is False
    assert r[6]["ok_ellipsis_lines"] is False
    assert r[7]["ok_alpha_words"] is False
    assert r[8]["ok_mean_word_len"] is False
    # empty doc: ratio rules fail closed instead of dividing by zero
    e = r[9]
    assert e["n_words"] == 0 and e["mean_word_len"] == 0.0
    assert not e["ok_symbol_ratio"] and not e["ok_alpha_words"]
    assert e["pass_gopher"] is False


def test_stopword_floor(spark):
    r = _rows(spark)
    assert r[1]["n_stop_hits"] >= 2 and r[1]["ok_stopwords"] is True
    # doc 7 has exactly 'the' and 'of' -> 2 distinct hits, still ok
    assert r[7]["n_stop_hits"] == 2 and r[7]["ok_stopwords"] is True


def test_single_narrow_pass(spark):
    """The gate is one codegen pass: no Exchange anywhere in the plan."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        gopher_rules(df, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
