"""Unigram-LM tokenizer (scale/unigram.py): Viterbi semantics, hard-EM
training invariants, local==distributed path parity, roundtrip/coverage
guarantees, and the BM25/token-stats integration knob."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.unigram import (
    UNK_MICRO_NATS,
    encode_word_unigram,
    learn_unigram,
    unigram_tokenize,
    viterbi_segment,
)

CORPUS = [
    "the spark engine shuffles the data",
    "the spark engine joins the tables",
    "sharded data pipelines shuffle sharded data",
    "the engine reads sharded tables",
    "spark pipelines read and shuffle data",
]


def _docs(spark, texts=None):
    texts = texts or CORPUS
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts * 4)], "doc_id long, text string"
    )


def test_viterbi_golden_and_tie_break():
    scores = {"a": -100, "b": -100, "ab": -250, "abc": -150, "c": -100}
    # "abc" as one piece (-150) beats a+b+c (-300) and ab+c (-350)
    assert viterbi_segment("abc", scores, 3) == (["abc"], -150)
    # tie: "ab" (-250) vs "a"+"b" (-200) -> split wins outright
    assert viterbi_segment("ab", scores, 3)[0] == ["a", "b"]
    # exact tie prefers the SHORTER final piece (ascending-length DP
    # with strict improvement): craft p+q == pq
    tie = {"p": -50, "q": -50, "pq": -100}
    assert viterbi_segment("pq", tie, 2)[0] == ["p", "q"]
    # unknown characters fall back to floor-scored char pieces
    pieces, total = viterbi_segment("axc", {"a": -10, "c": -10}, 3)
    assert pieces == ["a", "x", "c"] and total == -20 + UNK_MICRO_NATS


def test_training_deterministic_and_covers_corpus(spark):
    docs = _docs(spark)
    t1 = learn_unigram(docs, "text", vocab_size=48, n_rounds=3)
    t2 = learn_unigram(docs, "text", vocab_size=48, n_rounds=3)
    assert t1 == t2  # pure function of the corpus
    assert all(isinstance(v, int) for v in t1.values())  # micro-nats
    # every corpus word re-assembles exactly from its pieces
    words = {w for t in CORPUS for w in t.split()}
    for w in words:
        assert "".join(encode_word_unigram(w, t1)) == w
    # frequent multi-char structure is learned (not pure char splitting)
    assert any(len(p) > 1 for p in t1), t1
    freq_word_pieces = encode_word_unigram("the", t1)
    assert len(freq_word_pieces) < 3  # "the" is the most frequent word


def test_local_and_distributed_paths_agree(spark):
    docs = _docs(spark)
    local = learn_unigram(docs, "text", vocab_size=40, n_rounds=2)
    dist = learn_unigram(
        docs, "text", vocab_size=40, n_rounds=2, local_vocab_threshold=0
    )
    assert local == dist


def test_unigram_tokenize_frame(spark):
    docs = _docs(spark)
    table = learn_unigram(docs, "text", vocab_size=48, n_rounds=3)
    out = unigram_tokenize(docs, "doc_id", "text", table)
    rows = out.collect()
    assert len(rows) == docs.count()
    by_id = {r["doc_id"]: r for r in rows}
    # pieces re-assemble the lowercased whitespace words in order
    for i, t in enumerate(CORPUS):
        got = "".join(by_id[i]["tokens"])
        assert got == t.replace(" ", "")
        assert by_id[i]["n_tokens"] == len(by_id[i]["tokens"])
    # learned segmentation compresses vs character grain
    chars = sum(len(t.replace(" ", "")) for t in CORPUS)
    toks = sum(by_id[i]["n_tokens"] for i in range(len(CORPUS)))
    assert toks < chars


def test_token_stats_consume_learned_tokens(spark):
    """token_stats' counters accept the learned tokens column in place
    of the codegen splitter output — the integration contract."""
    from yodel_etl_spark.scale.textstats import token_stats

    docs = _docs(spark)
    table = learn_unigram(docs, "text", vocab_size=48, n_rounds=2)
    enc = unigram_tokenize(docs, "doc_id", "text", table).join(
        docs, "doc_id"
    )
    stats = token_stats(F.col("text"), F.col("tokens"))
    row = enc.select(
        stats["n_tokens"].alias("n_tokens"),
        stats["n_uniq_tokens"].alias("n_uniq"),
    ).agg(F.sum("n_tokens").alias("s"), F.max("n_uniq").alias("m")).collect()[0]
    assert row["s"] > 0 and row["m"] > 0


def test_bm25_unigram_knob(spark):
    from yodel_etl_spark.scale.search import bm25_topk
    from yodel_etl_spark.session import release

    texts = CORPUS + ["completely unrelated zebra yoga umbrella"] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    table = learn_unigram(docs, "text", vocab_size=64, n_rounds=3)
    # query with a trained piece of "shuffle"/"sharded" family
    probe = encode_word_unigram("shuffle", table)
    out = bm25_topk(
        docs, [probe[0]], top_n=4, tokenizer="unigram", unigram_scores=table
    )
    got = [r["doc_id"] for r in out.collect()]
    release(out)
    assert got  # retrieval ran over pieces
    # top hits are shuffle-family docs, never the zebra docs
    zebra = {i for i, t in enumerate(texts) if "zebra" in t}
    assert not (set(got[:2]) & zebra)
    with pytest.raises(ValueError, match="unigram_scores"):
        bm25_topk(docs, ["x"], tokenizer="unigram")


def test_tokenizer_artifact_roundtrip(spark, tmp_path):
    """Train → save → load in a 'later job' → identical encodings; BPE
    merge lists roundtrip in order (order IS semantics there)."""
    from yodel_etl_spark.scale.bpe import bpe_tokenize, learn_bpe
    from yodel_etl_spark.scale.unigram import (
        load_bpe,
        load_tokenizer,
        save_bpe,
        save_tokenizer,
    )

    docs = _docs(spark)
    path = str(tmp_path / "tok")

    table = learn_unigram(docs, "text", vocab_size=48, n_rounds=2)
    save_tokenizer(spark, table, path)
    assert load_tokenizer(spark, path) == table
    enc_a = {r["doc_id"]: r["tokens"] for r in unigram_tokenize(docs, "doc_id", "text", table).collect()}
    enc_b = {r["doc_id"]: r["tokens"] for r in unigram_tokenize(docs, "doc_id", "text", load_tokenizer(spark, path)).collect()}
    assert enc_a == enc_b

    merges = learn_bpe(docs, "text", n_merges=8)
    save_bpe(spark, merges, path)
    assert load_bpe(spark, path) == merges
    tok_a = {r["doc_id"]: r["tokens"] for r in bpe_tokenize(docs, "doc_id", "text", merges).collect()}
    tok_b = {r["doc_id"]: r["tokens"] for r in bpe_tokenize(docs, "doc_id", "text", load_bpe(spark, path)).collect()}
    assert tok_a == tok_b
