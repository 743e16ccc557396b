"""Byte-pair-encoding tokenizer training (Sennrich et al. 2016, public
paper) — the learned-subword stage of a pretraining pipeline, as an
iterative Spark algorithm in the same family as k-means and connected
components.

Scale shape:
  * the corpus reduces ONCE to a (word, count) frequency table — the
    only corpus-sized pass; everything after runs on the distinct-word
    table (heavy-tailed: ~10^6 rows for web-scale corpora, and a
    ``min_count`` floor bounds it further);
  * each merge round is one explode → groupBy(sum) over adjacent
    symbol pairs of that small table, with the single winning pair
    collected to the driver (a 1-row control-plane read, same
    convention as the REST page probe) and the merge applied as a
    narrow fold over the symbol arrays;
  * plans are ``localCheckpoint``-truncated per round (the k-means /
    large-star precedent) so k rounds stay O(k) cost, not O(k²)
    lineage;
  * applying a trained merge table to the corpus is an Arrow-batched
    ``mapInPandas`` with a per-batch word cache — encode is a pure
    function of the word, so the cache hit-rate IS the corpus word
    redundancy.

Determinism: ties in pair frequency break lexicographically, so the
merge sequence — and therefore the tokenizer — is a pure function of
the corpus.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from yodel_etl_spark.scale.textstats import tokens

# Python twin of the train-side tokenizer: word_freq_table splits with the
# JVM regex \s+, which (without UNICODE_CHARACTER_CLASS) matches ONLY the
# ASCII whitespace class [ \t\n\x0b\f\r].  The encoder must segment words
# identically or merges are learned on different boundaries than they are
# applied to (e.g. U+00A0 NBSP: a word separator to Python str.split(),
# but part of the word to the JVM split).  Casefold choice: plain
# Unicode-default lowercase on both sides (Spark `lower` / Python
# str.lower()) — no locale-sensitive mapping on either engine.
_WS_ASCII = re.compile(r"[ \t\n\x0b\f\r]+")


def _cjk_run_re():
    r"""Python twin of textstats.CJK_RUN_RE (run-grain: BPE's word
    boundary — merges happen WITHIN a contiguous CJK run) with ``\s``
    narrowed to the ASCII whitespace class (Python ``\s`` is
    Unicode-wide, Java's is ASCII — the same NBSP trap _WS_ASCII
    exists for)."""
    from yodel_etl_spark.scale.textstats import CJK_RUN_RE

    return re.compile(CJK_RUN_RE.replace("\\s", " \\t\\n\\x0b\\f\\r"))


def split_words(text: str | None, mode: str = "ws") -> list[str]:
    """Lowercased words of ``text`` under the SAME boundary rules as the
    distributed :func:`word_freq_table` (ASCII whitespace only)."""
    if mode == "cjk":
        return _cjk_run_re().findall((text or "").lower())
    return [w for w in _WS_ASCII.split((text or "").lower()) if w]


def word_freq_table(
    docs: DataFrame, text_col: str, tokenizer: str = "ws"
) -> DataFrame:
    """(word, n) counts of the lowercased words (``tokenizer="cjk"`` =
    contiguous no-space-script RUNS become words, so BPE splits a run
    into characters and merges frequent pairs into subwords — the
    standard CJK-BPE recipe) — the one corpus-sized aggregation in BPE
    training."""
    return (
        docs.select(
            F.explode(
                tokens(
                    F.lower(F.col(text_col)),
                    mode="cjk_run" if tokenizer == "cjk" else tokenizer,
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _adjacent_pairs(sym: Column) -> Column:
    left = F.slice(sym, 1, F.size(sym) - 1)
    right = F.slice(sym, 2, F.size(sym) - 1)
    return F.zip_with(left, right, lambda a, b: F.struct(a.alias("a"), b.alias("b")))


def _merge_pass(sym: Column, a: str, b: str) -> Column:
    """One greedy left-to-right merge pass replacing adjacent (a, b)
    with a+b — fold form, equivalent to the textbook two-pointer walk
    (a freshly merged token can only re-merge if it literally equals
    ``a``, which needs an empty ``b``)."""
    merged = F.array(F.lit(a + b))
    return F.aggregate(
        sym,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), merged),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _train_local(wf: list[tuple[str, int]], n_merges: int, min_count: int):
    """Merge loop over a collected (word, count) table — the same
    algorithm the distributed loop runs, in-process.  This is how every
    production tokenizer trainer works: the corpus-sized work is the
    word-count reduction (distributed, upstream); the merge loop only
    ever touches the vocabulary."""
    words = {w: list(w) for w, _ in wf}
    counts = dict(wf)
    merges: list[tuple[str, str]] = []
    from collections import Counter

    for _ in range(n_merges):
        pc: Counter = Counter()
        for w, sym in words.items():
            n = counts[w]
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        if cnt < min_count:
            break
        merges.append((a, b))
        for w in words:
            words[w] = _merge_word_local(words[w], a, b)
    return merges


def _merge_word_local(sym: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def learn_bpe(
    docs: DataFrame,
    text_col: str,
    n_merges: int = 24,
    min_count: int = 2,
    checkpoint_every: int = 4,
    local_vocab_threshold: int = 200_000,
    tokenizer: str = "ws",
) -> list[tuple[str, str]]:
    """Train ``n_merges`` BPE merges on the corpus; returns the ordered
    merge list.  Stops early when the best pair's weighted frequency
    falls below ``min_count`` (no compression value left).

    Two-phase shape: the corpus-sized work is always the distributed
    (word, count) reduction.  When the distinct vocabulary fits
    ``local_vocab_threshold`` (it almost always does — heavy-tailed
    corpora plateau around 10^6 words, and ``min_count`` prunes the
    tail), the merge loop runs in-process on the collected table — the
    standard production-tokenizer split.  Above the threshold the loop
    stays distributed: per round, one pair-count aggregation with a
    1-row argmax (control plane) and a narrow merge fold, with lineage
    truncated every ``checkpoint_every`` rounds.  Both paths implement
    the identical greedy algorithm and are pinned equal in tests."""
    # persisted: the path-deciding count() and the collect()/symbol
    # build both read it — unpersisted, the corpus-sized explode+groupBy
    # would run twice ("the corpus reduces ONCE" is the whole contract)
    freqs = word_freq_table(docs, text_col, tokenizer).persist()
    try:
        if local_vocab_threshold > 0:
            # cheap distinct count decides the path; the collect below
            # is vocabulary-sized, never corpus-sized
            if freqs.count() <= local_vocab_threshold:
                wf = [(r["word"], r["n"]) for r in freqs.collect()]
                return _train_local(wf, n_merges, min_count)
        words = freqs.select(F.split(F.col("word"), "").alias("symbols"), "n")
        # the distinct-word table is orders of magnitude smaller than
        # the corpus but inherits the corpus aggregation's partition
        # count — every training round would schedule that many tasks
        # twice.  Compact it once; rounds are control-plane-latency-
        # bound, so fewer, fuller tasks win.
        target = max(1, min(8, words.rdd.getNumPartitions()))
        words = words.coalesce(target).localCheckpoint(eager=True)
    finally:
        # the checkpoint (or the local collect) materialized everything
        # the loop needs; the training function returns a plain list,
        # so nothing escapes that could still read the cache
        freqs.unpersist()
    merges: list[tuple[str, str]] = []
    pending = 0
    for _ in range(n_merges):
        # argmax via orderBy().limit(1): plans as TakeOrderedAndProject
        # (map-side partial top-1 + driver merge — no sort exchange)
        best = (
            words.select(F.explode(_adjacent_pairs(F.col("symbols"))).alias("p"), "n")
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        words = words.select(
            _merge_pass(F.col("symbols"), a, b).alias("symbols"), "n"
        )
        pending += 1
        if pending >= checkpoint_every:
            words = words.localCheckpoint(eager=True)
            pending = 0
    return merges


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder: apply the merge list in training order (one
    :func:`_merge_word_local` pass per merge — the single source of the
    merge-pass semantics)."""
    sym = list(word)
    for a, b in merges:
        sym = _merge_word_local(sym, a, b)
    return sym


def bpe_tokenize(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
    tokenizer: str = "ws",
) -> DataFrame:
    """Encode every document with a trained merge table: Arrow-batched
    ``mapInPandas`` with a per-batch word cache (encode is a pure
    per-word function, so repeated words — the overwhelming majority of
    a natural corpus — hit the cache).  Returns
    (id, tokens: array<string>, n_tokens)."""
    import pandas as pd

    out_schema = f"{id_col} long, tokens array<string>, n_tokens long"
    frozen = list(merges)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            toks: list[str] = []
            for w in split_words(text, tokenizer):  # train-identical boundaries
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w, frozen)
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
