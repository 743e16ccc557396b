"""Curation pipeline: planted-doc semantics for every stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.pipelines.curate import CurateConfig, audit, curate

pytestmark = pytest.mark.usefixtures("spark")

# a doc that sails through every filter: 10+ tokens, stopwords,
# alphabetic, non-repetitive, english markers
GOOD = "the quick brown fox and a lazy dog walk over the green hill today"
GOOD2 = "a calm river flows through the wide valley and the old stone bridge"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_good_doc_survives(spark):
    out = curate(_df(spark, [(1, GOOD)])).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_low_quality_dropped(spark):
    # too short for the length band and no stopwords
    out = curate(_df(spark, [(1, GOOD), (2, "!!! ??? ###")])).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_repetitive_dropped(spark):
    spammy = "the spam and ham " * 20  # rep_2gram_frac near 1
    out = curate(_df(spark, [(1, GOOD), (2, spammy)])).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_disallowed_lang_dropped(spark):
    zh = "de shi le zai de shi zai le wo men zhe ge na ge hao bu"
    cfg = CurateConfig(allowed_langs=("en",))
    out = curate(_df(spark, [(1, GOOD), (2, zh)]), cfg=cfg).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_fingerprint_dedup_keeps_min_id(spark):
    # same normalized token stream (case/extra-space differences) -> one
    # canonical doc, lowest id
    out = curate(
        _df(spark, [(7, GOOD), (3, GOOD.upper()), (5, "  " + GOOD + "  ")])
    ).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_decontaminated_against_eval(spark):
    # doc 2 shares a 5-gram with the eval doc; doc 1 is clean
    contaminated = "now " + GOOD2 + " appears verbatim here sadly"
    ev = _df(spark, [(100, GOOD2)])
    out = curate(_df(spark, [(1, GOOD), (2, contaminated)]), eval_docs=ev).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_audit_reasons(spark):
    spammy = "the spam and ham " * 20
    rows = audit(_df(spark, [(1, GOOD), (2, "!!! ???"), (3, spammy)])).collect()
    by_id = {r["doc_id"]: r["drop_reason"] for r in rows}
    assert by_id[1] is None
    assert by_id[2] == "low_quality"
    assert by_id[3] == "repetitive_2gram"


def test_no_cartesian_and_semi_anti_shape(spark):
    ev = _df(spark, [(100, GOOD2)])
    df = curate(_df(spark, [(1, GOOD)]), eval_docs=ev)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_guarded_filter_blocks_signal_inlining(spark, sf_small):
    """Regression pin for the pushdown fence: PushPredicateThroughNonJoin
    only requires a deterministic PROJECT LIST, so a nondeterministic
    predicate alone pushes through and re-inlines the staged signal
    expressions (86 tokenizer copies below the exchange before the
    fence-column fix).  The fixed plan evaluates the tokenizer exactly
    twice (text + lowered text) and keeps the filter above the signal
    projections, referencing plain columns."""
    from yodel_etl_spark.pipelines.curate import (
        CurateConfig,
        _guarded_filter,
        _keep_condition,
        with_signals,
    )
    from yodel_etl_spark.session import load_tables

    docs = load_tables(spark, sf_small, ("documents",))["documents"].select(
        "doc_id", "text"
    )
    plan = (
        _guarded_filter(with_signals(docs), _keep_condition(CurateConfig()))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("split(") == 2, plan.count("split(")
    filter_lines = [ln for ln in plan.splitlines() if "Filter" in ln and "__fence" in ln]
    assert filter_lines and all("split(" not in ln for ln in filter_lines)


def test_lang_id_plan_is_linear(spark):
    """Regression pin for the argmax shape: the CASE-WHEN fold embedded
    the running best twice per step (O(2^langs) copies, ~60 array
    scans/row at 5 languages); array_max over (hits, rank) structs
    references each per-language counter exactly once."""
    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.textstats import LANG_MARKERS, lang_id, tokens

    df = spark.createDataFrame([("the quick fox",)], ["text"])
    staged = df.select(tokens(F.lower(F.col("text"))).alias("tkl"))
    plan = (
        staged.select(lang_id(F.col("tkl")).alias("lang"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one filter(...) per language plus the tokenizer's empty-drop,
    # none duplicated
    assert plan.count("filter(") <= len(LANG_MARKERS) + 1, plan.count("filter(")
