"""BPE training parity: the iterative Spark trainer must reproduce a
literal single-process BPE (Sennrich et al. 2016) on the same corpus —
merge list, order, and encodings."""

from __future__ import annotations

from collections import Counter

from yodel_etl_spark.scale.bpe import bpe_tokenize, encode_word, learn_bpe


def _model_learn(texts: list[str], k: int, min_count: int = 2):
    wf = Counter(w for t in texts for w in t.lower().split())
    words = {w: list(w) for w in wf}
    merges = []
    for _ in range(k):
        pc: Counter = Counter()
        for w, sym in words.items():
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += wf[w]
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if cnt < min_count:
            break
        merges.append((a, b))
        words = {w: encode_word_with(sym, a, b) for w, sym in words.items()}
    return merges


def encode_word_with(sym, a, b):
    out, i = [], 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def test_learn_bpe_matches_reference_trainer(spark):
    rows = [
        (0, "low low low lower lower newest newest newest newest widest widest"),
        (1, "newest widest low newest"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe(docs, "text", n_merges=10)
    assert merges == _model_learn([r[1] for r in rows], 10)
    assert len(merges) == 10  # corpus supports a full run


def test_learn_bpe_on_documents_matches_model(spark, sf_small):
    from yodel_etl_spark.session import load_tables

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    texts = [r["text"] for r in docs.select("text").collect()]
    merges = learn_bpe(docs, "text", n_merges=12)
    assert merges == _model_learn(texts, 12)
    assert merges  # non-vacuous


def test_bpe_tokenize_roundtrip_and_counts(spark):
    rows = [(0, "low lower"), (1, ""), (2, "newest")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe(docs, "text", n_merges=6, min_count=1)
    got = {r["doc_id"]: r for r in bpe_tokenize(docs, "doc_id", "text", merges).collect()}
    # token concatenation reconstructs the lowercased words
    for did, text in rows:
        assert "".join(got[did]["tokens"]) == text.lower().replace(" ", "")
        assert got[did]["n_tokens"] == len(got[did]["tokens"])
    # and per-word encodings match the pure encoder
    assert got[0]["tokens"] == encode_word("low", merges) + encode_word("lower", merges)


def test_distributed_and_local_paths_agree(spark, sf_small):
    """Forcing the distributed loop (threshold 0) must reproduce the
    local fast path exactly — same merge list, same order."""
    from yodel_etl_spark.session import load_tables

    docs = load_tables(spark, sf_small, ("documents",))["documents"]
    local = learn_bpe(docs, "text", n_merges=10)
    dist = learn_bpe(docs, "text", n_merges=10, local_vocab_threshold=0)
    assert local == dist


def test_bpe_encode_query_deterministic_and_bounded(spark, sf_small):
    """Registered train→apply query: two independent builds produce
    identical digests (the merge table and encode are pure functions of
    the corpus), and per-doc token counts are bounded below by the
    whitespace word count (each word yields ≥1 token)."""
    from pyspark.sql import functions as F

    from yodel_etl_spark.registry import load_all
    from yodel_etl_spark.scale.textstats import tokens

    build = load_all()["bpee"].build
    a = {r["doc_id"]: r for r in build(spark, sf_small).collect()}
    b = {r["doc_id"]: r for r in build(spark, sf_small).collect()}
    assert a == b
    docs = spark.read.parquet(f"{sf_small}/documents.parquet").select(
        "doc_id", F.size(tokens(F.lower(F.col("text")))).alias("nw")
    )
    for r in docs.collect():
        assert a[r["doc_id"]]["n_tokens"] >= r["nw"]


def test_train_and_encode_agree_on_unicode_whitespace(spark):
    """ADVICE r4: word boundaries must match between the JVM train-side
    split (\\s+ = ASCII whitespace only) and the Python encoder.  U+00A0
    (NBSP) and U+2028 (line separator) are whitespace to Python
    str.split() but NOT to the JVM regex — both sides must keep them
    inside the word."""
    from yodel_etl_spark.scale.bpe import split_words, word_freq_table

    text = "low low lower lowest\tlow"
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    jvm_words = sorted(
        r["word"] for r in word_freq_table(docs, "text").collect()
    )
    assert jvm_words == sorted(split_words(text))
    assert "low low" in jvm_words  # NBSP stays inside the word
    # and the registered encoder tokenizes through the same splitter:
    merges = [("l", "o"), ("lo", "w")]
    out = bpe_tokenize(docs, "doc_id", "text", merges).collect()[0]
    expect = [
        t for w in split_words(text) for t in encode_word(w, merges)
    ]
    assert list(out["tokens"]) == expect


def test_bpe_cjk_learns_character_pair_merges(spark):
    """tokenizer='cjk': BPE trains over unigram CJK 'words', so merges
    are frequent character pairs — the standard CJK-BPE recipe.  Under
    the whitespace default the same corpus is one giant word per doc
    and nothing useful merges."""
    from yodel_etl_spark.scale.bpe import bpe_tokenize, learn_bpe, split_words

    rows = [(i, "深度学习模型 深度学习 模型训练") for i in range(8)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    merges = learn_bpe(docs, "text", n_merges=4, min_count=2, tokenizer="cjk")
    assert merges, "expected at least one merge"
    # every merge joins single CJK codepoints or their concatenations
    for a, b in merges:
        assert all("一" <= ch <= "鿿" for ch in a + b), (a, b)
    enc = bpe_tokenize(docs, "doc_id", "text", merges, tokenizer="cjk")
    row = enc.orderBy("doc_id").limit(1).collect()[0]
    n_chars = sum(len(w) for w in split_words(rows[0][1], "cjk"))
    assert 0 < row["n_tokens"] < n_chars  # merges compressed the char stream
    assert "".join(row["tokens"]) == "".join(split_words(rows[0][1], "cjk"))
