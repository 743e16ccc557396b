"""Bloom-prefilter incremental dedup: exactness vs the plain anti-join,
no-false-negative guarantee, and the prefilter actually pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from yodel_etl_spark.scale.dedup import (
    bloom_build,
    bloom_might_contain,
    bloom_novel,
    dedup_against,
)


def _corpus_incoming(spark):
    corpus = spark.createDataFrame(
        [(i, f"doc number {i} body") for i in range(200)], "doc_id long, text string"
    )
    # 30 dupes of corpus texts + 70 novel, interleaved ids
    rows = [(1000 + i, f"doc number {i * 3} body") for i in range(30)]
    rows += [(2000 + i, f"fresh text {i} never seen") for i in range(70)]
    incoming = spark.createDataFrame(rows, "doc_id long, text string")
    return corpus, incoming


def test_bloom_novel_equals_exact_anti_join(spark):
    corpus, incoming = _corpus_incoming(spark)
    got = {r["doc_id"] for r in bloom_novel(corpus, incoming, "doc_id", "text").collect()}
    want = {r["doc_id"] for r in dedup_against(corpus, incoming, "doc_id", "text").collect()}
    assert got == want
    assert len(want) == 70


def test_no_false_negatives_even_tiny_filter(spark):
    """A deliberately undersized filter (high FP rate) must still give
    the exact answer — FPs only cost verify work, never correctness."""
    corpus, incoming = _corpus_incoming(spark)
    got = {
        r["doc_id"]
        for r in bloom_novel(corpus, incoming, "doc_id", "text", m_bits=256, k=2).collect()
    }
    want = {r["doc_id"] for r in dedup_against(corpus, incoming, "doc_id", "text").collect()}
    assert got == want


def test_membership_verdicts(spark):
    corpus, incoming = _corpus_incoming(spark)
    seen = corpus.select(F.md5("text").alias("digest")).distinct()
    bloom = bloom_build(seen, "digest")
    inc = incoming.withColumn("digest", F.md5("text"))
    tagged = bloom_might_contain(inc, "digest", bloom, m_bits=1 << 17, k=5)
    verdict = {r["doc_id"]: r["maybe_seen"] for r in tagged.collect()}
    # every true dupe MUST be flagged (no false negatives)
    assert all(verdict[1000 + i] for i in range(30))
    # at 2^17 bits / 200 keys, expect essentially zero false positives:
    # the definitely-novel path prunes nearly everything novel
    fp = sum(verdict[2000 + i] for i in range(70))
    assert fp == 0


def test_empty_corpus_all_novel(spark):
    corpus = spark.createDataFrame([], "doc_id long, text string")
    incoming = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    got = {r["doc_id"] for r in bloom_novel(corpus, incoming, "doc_id", "text").collect()}
    assert got == {1, 2}


def test_probe_side_adds_no_shuffle(spark):
    """The might-contain tag is broadcast + row-local expressions: the
    only Exchanges in the full bloom_novel plan belong to the build
    aggregation and the candidate verify join — the definitely-novel
    path must not shuffle incoming rows.  Pin the probe plan alone."""
    corpus, incoming = _corpus_incoming(spark)
    seen = corpus.select(F.md5("text").alias("digest")).distinct()
    bloom = bloom_build(seen, "digest")
    inc = incoming.withColumn("digest", F.md5("text"))
    tagged = bloom_might_contain(inc, "digest", bloom, m_bits=1 << 17, k=5)
    plan = tagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # incoming rows reach the probe without an exchange: every shuffle
    # in the plan belongs to the build side (corpus digest distinct,
    # word bit_or, 1-row densify) — none partitions on incoming ids
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln and "Broadcast" not in ln]
    allowed = ("hashpartitioning(word", "hashpartitioning(digest", "SinglePartition")
    assert all(any(a in ln for a in allowed) for ln in exchanges), exchanges
    assert not any("doc_id" in ln for ln in exchanges), exchanges
