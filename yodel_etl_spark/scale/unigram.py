"""Unigram-LM subword tokenizer training (Kudo 2018, "Subword
Regularization" — the SentencePiece unigram model; public paper): the
second of the two standard learned-tokenizer families, complementing
BPE (``scale/bpe.py``).  Where BPE grows pieces bottom-up by greedy
pair merging, the unigram model starts from an over-complete piece
inventory and PRUNES it under a piece-unigram language model fitted by
EM — here the deterministic hard-EM (Viterbi) variant, so the trained
vocabulary is a pure function of the corpus (the BPE determinism
convention; soft EM's float accumulations would not hash-reproduce
across partitionings).

Scale shape (the ``learn_bpe`` two-phase split):
  * the corpus reduces ONCE to the (word, count) table — the only
    corpus-sized pass (shared ``word_freq_table``);
  * candidate seeding explodes substrings of the DISTINCT-WORD table
    (codegen ``transform``/``substring``, one groupBy over piece keys)
    and takes the top candidates as ``TakeOrderedAndProject`` — never a
    global sort;
  * each EM round Viterbi-segments the word table under the current
    piece scores — an Arrow-batched ``mapInPandas`` kernel over (word,
    count) rows — and reduces piece counts in one vocabulary-bounded
    groupBy; the re-score/prune step is a driver fold over ≤ seed-size
    rows (the BPE argmax / classifier-gradient control-plane
    convention);
  * when the distinct vocabulary fits ``local_vocab_threshold`` the
    whole loop runs in-process on the collected table using the SAME
    kernels — both paths pinned equal in tests.

Determinism: piece scores are integer micro-nats; Viterbi ties break
toward the shortest final piece (strict-improvement DP in ascending
piece-length order); prune ties break on (count desc, piece asc).
Single-character pieces are never pruned, so every string segments
(unknown characters at encode time fall back to a floor-scored
character piece).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.scale.bpe import split_words, word_freq_table

#: score assigned to a character absent from the vocabulary at encode
#: time (UNK-as-char fallback) — far below any trained piece
UNK_MICRO_NATS = -30_000_000


def viterbi_segment(
    word: str, scores: dict[str, int], max_piece_len: int
) -> tuple[list[str], int]:
    """Best segmentation of ``word`` under integer micro-nat piece
    ``scores`` (unknown single characters get :data:`UNK_MICRO_NATS`).
    Returns ``(pieces, total_micro_nats)``.  Deterministic: the DP
    scans candidate piece lengths ascending with strict improvement, so
    a tie keeps the shorter final piece."""
    n = len(word)
    neg = None
    best: list[int | None] = [neg] * (n + 1)
    best[0] = 0
    back = [0] * (n + 1)
    for j in range(1, n + 1):
        bj = None
        bi = 0
        for length in range(1, min(max_piece_len, j) + 1):
            i = j - length
            if best[i] is None:
                continue
            piece = word[i:j]
            s = scores.get(piece)
            if s is None:
                if length != 1:
                    continue
                s = UNK_MICRO_NATS
            cand = best[i] + s
            if bj is None or cand > bj:
                bj, bi = cand, i
        best[j], back[j] = bj, bi
    assert best[n] is not None  # single-char fallback guarantees a path
    pieces: list[str] = []
    j = n
    while j > 0:
        i = back[j]
        pieces.append(word[i:j])
        j = i
    pieces.reverse()
    return pieces, best[n]


def _rescore(counts: dict[str, int], vocab: set[str]) -> dict[str, int]:
    """Add-one piece-unigram log-probs in integer micro-nats over the
    kept vocabulary (add-one keeps never-used coverage characters
    finite and the whole table a pure function of integer counts)."""
    total = sum(counts.get(p, 0) for p in vocab) + len(vocab)
    return {
        p: round(math.log((counts.get(p, 0) + 1) / total) * 1_000_000)
        for p in vocab
    }


def _prune(
    counts: dict[str, int], vocab: set[str], vocab_size: int
) -> set[str]:
    """Keep every single-character piece (coverage) plus the best
    multi-character pieces by (count desc, piece asc) up to
    ``vocab_size`` total; zero-count multi-char pieces drop
    unconditionally (they appear in no Viterbi path)."""
    chars = {p for p in vocab if len(p) == 1}
    multi = [p for p in vocab if len(p) > 1 and counts.get(p, 0) > 0]
    multi.sort(key=lambda p: (-counts[p], p))
    room = max(0, vocab_size - len(chars))
    return chars | set(multi[:room])


def _em_rounds(
    vocab: set[str],
    seed_counts: dict[str, int],
    vocab_size: int,
    n_rounds: int,
    segment_counts,
) -> dict[str, int]:
    """The driver-side EM fold shared by both paths: score → segment
    (``segment_counts`` abstracts WHERE the Viterbi pass runs — in-
    process over ``wf`` or distributed over the word table) → prune →
    re-score.  Returns the final piece→micro-nat table."""
    scores = _rescore(seed_counts, vocab)
    for _ in range(n_rounds):
        counts = segment_counts(scores)
        vocab = _prune(counts, vocab, vocab_size)
        scores = _rescore(counts, vocab)
    return scores


def _local_segment_counts(wf, max_piece_len):
    def run(scores: dict[str, int]) -> dict[str, int]:
        counts: dict[str, int] = {}
        for word, n in wf:
            for p in viterbi_segment(word, scores, max_piece_len)[0]:
                counts[p] = counts.get(p, 0) + n
        return counts

    return run


def learn_unigram(
    docs: DataFrame,
    text_col: str,
    vocab_size: int = 64,
    max_piece_len: int = 6,
    n_rounds: int = 4,
    seed_multiplier: int = 4,
    min_count: int = 2,
    tokenizer: str = "ws",
    local_vocab_threshold: int = 200_000,
) -> dict[str, int]:
    """Train a unigram-LM tokenizer on the corpus; returns the piece →
    integer-micro-nat score table (size ≤ ``vocab_size`` plus whatever
    single characters coverage requires).

    Seeding: every substring of every distinct word up to
    ``max_piece_len`` chars, count-weighted; all single characters are
    kept, multi-char candidates take the top ``seed_multiplier ×
    vocab_size`` by (count desc, piece asc) above ``min_count``.  Then
    ``n_rounds`` of hard EM (Viterbi counts → prune → add-one
    re-score)."""
    from yodel_etl_spark.session import ship_package

    # the distributed EM kernel closes over package functions —
    # cloudpickle serializes them BY REFERENCE (the SKILL gotcha)
    ship_package(docs.sparkSession)
    freqs = word_freq_table(docs, text_col, tokenizer).persist()
    try:
        n_words = freqs.count()
        if 0 < local_vocab_threshold and n_words <= local_vocab_threshold:
            wf = [(r["word"], r["n"]) for r in freqs.collect()]
            seed_counts: dict[str, int] = {}
            for word, n in wf:
                for ln in range(1, max_piece_len + 1):
                    for i in range(len(word) - ln + 1):
                        p = word[i : i + ln]
                        seed_counts[p] = seed_counts.get(p, 0) + n
            chars = {p for p in seed_counts if len(p) == 1}
            multi = [
                p
                for p, c in seed_counts.items()
                if len(p) > 1 and c >= min_count
            ]
            multi.sort(key=lambda p: (-seed_counts[p], p))
            vocab = chars | set(multi[: seed_multiplier * vocab_size])
            return _em_rounds(
                vocab,
                seed_counts,
                vocab_size,
                n_rounds,
                _local_segment_counts(wf, max_piece_len),
            )

        # ---------------- distributed path -------------------------
        # compact the word table once (the learn_bpe convention: rounds
        # are control-plane-latency-bound, fewer fuller tasks win)
        target = max(1, min(8, freqs.rdd.getNumPartitions()))
        words = freqs.coalesce(target).localCheckpoint(eager=True)
    finally:
        freqs.unpersist()

    # seeding: codegen substring explode over the DISTINCT-WORD table
    pieces = None
    for ln in range(1, max_piece_len + 1):
        subs = words.where(F.length("word") >= ln).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("word") - ln + 1),
                    lambda i: F.substring(F.col("word"), i, ln),
                )
            ).alias("piece"),
            "n",
        )
        pieces = subs if pieces is None else pieces.unionByName(subs)
    seed_tbl = pieces.groupBy("piece").agg(F.sum("n").alias("c")).persist()
    chars_rows = seed_tbl.where(F.length("piece") == 1).collect()
    multi_rows = (
        seed_tbl.where((F.length("piece") > 1) & (F.col("c") >= min_count))
        .orderBy(F.col("c").desc(), F.col("piece"))
        .limit(seed_multiplier * vocab_size)
        .collect()
    )
    seed_tbl.unpersist()
    seed_counts = {r["piece"]: r["c"] for r in chars_rows + multi_rows}
    vocab = set(seed_counts)

    def distributed_segment_counts(scores: dict[str, int]) -> dict[str, int]:
        frozen = dict(scores)
        mpl = max_piece_len

        def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import pandas as pd

            for pdf in batches:
                agg: dict[str, int] = {}
                for word, n in zip(pdf["word"], pdf["n"]):
                    for p in viterbi_segment(str(word), frozen, mpl)[0]:
                        agg[p] = agg.get(p, 0) + int(n)
                yield pd.DataFrame(
                    {"piece": list(agg.keys()), "c": list(agg.values())}
                )

        out = (
            words.mapInPandas(run, "piece string, c long")
            .groupBy("piece")
            .agg(F.sum("c").alias("c"))
            .collect()  # vocabulary-bounded (≤ seed size) control plane
        )
        return {r["piece"]: r["c"] for r in out}

    return _em_rounds(
        vocab, seed_counts, vocab_size, n_rounds, distributed_segment_counts
    )


def encode_word_unigram(
    word: str, scores: dict[str, int], max_piece_len: int = 6
) -> list[str]:
    """Reference encoder: the Viterbi path under the trained table."""
    return viterbi_segment(word, scores, max_piece_len)[0]


def unigram_tokenize(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    scores: dict[str, int],
    max_piece_len: int = 6,
    tokenizer: str = "ws",
) -> DataFrame:
    """Encode every document with a trained unigram table — the
    ``bpe_tokenize`` twin: Arrow-batched ``mapInPandas`` with a
    per-batch word cache (encode is a pure per-word function).  Returns
    ``(id, tokens: array<string>, n_tokens)``; feed ``tokens`` to
    ``token_stats``/BM25 wherever a learned segmentation should replace
    the whitespace proxy."""
    from yodel_etl_spark.session import ship_package

    ship_package(docs.sparkSession)
    out_schema = f"{id_col} long, tokens array<string>, n_tokens long"
    frozen = dict(scores)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            toks: list[str] = []
            for w in split_words(text, tokenizer):  # train-identical
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word_unigram(w, frozen, max_piece_len)
                toks.extend(got)
            return toks

        for pdf in batches:
            encoded = pdf[text_col].map(enc)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "tokens": encoded,
                    "n_tokens": encoded.map(len),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def save_tokenizer(
    spark, scores: dict[str, int], path: str, kind: str = "unigram"
) -> None:
    """Persist a trained tokenizer artifact as a tiny parquet table
    (``piece``, ``score_micro``, ``ord``) — train once, apply from any
    later job (the production tokenizer-artifact contract).  ``ord``
    preserves iteration order, which is the MERGE ORDER for BPE tables
    (where application order is semantics) and insertion order for
    unigram tables (cosmetic there — Viterbi reads scores, not order).
    For BPE pass ``kind="bpe"`` and encode each merge ``(a, b)`` as
    piece ``a + " " + b`` with score 0."""
    rows = [(p, int(s), i) for i, (p, s) in enumerate(scores.items())]
    (
        spark.createDataFrame(rows, "piece string, score_micro long, ord int")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/{kind}")
    )


def load_tokenizer(spark, path: str, kind: str = "unigram") -> dict[str, int]:
    """Inverse of :func:`save_tokenizer`: the piece → micro-nat table,
    in the saved order."""
    rows = sorted(
        spark.read.parquet(f"{path}/{kind}").collect(), key=lambda r: r["ord"]
    )
    return {r["piece"]: r["score_micro"] for r in rows}


def save_bpe(spark, merges: list[tuple[str, str]], path: str) -> None:
    """Persist a BPE merge list (order IS semantics) via the shared
    artifact table."""
    save_tokenizer(
        spark, {f"{a} {b}": 0 for a, b in merges}, path, kind="bpe"
    )


def load_bpe(spark, path: str) -> list[tuple[str, str]]:
    """Inverse of :func:`save_bpe`: the ordered merge list."""
    table = load_tokenizer(spark, path, kind="bpe")
    return [tuple(p.split(" ", 1)) for p in table]
