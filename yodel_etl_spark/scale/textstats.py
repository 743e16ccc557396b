"""Text analysis for LLM-corpus curation: token counting, quality
scoring, language ID, fingerprinting.

All pure column expressions (codegen, zero Python) — at 100 TB these run
as a single narrow pass over the corpus scan with column pruning down to
``text``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: whitespace tokenizer shared by every operator (and their SQL twins)
_WS = "\\s+"

#: no-space-script character class, written as LITERAL codepoints so the
#: one pattern string behaves identically in Java regex (Spark) and RE2
#: (DuckDB oracles): CJK Ext-A + Unified Ideographs, Hiragana, Katakana,
#: Hangul syllables, Thai — the scripts where whitespace does not
#: delimit words, so a whitespace split collapses a whole document into
#: ONE token and silently degrades every token-derived operator (BM25,
#: DSIR, BPE, perplexity bucketing, Gopher rules, n-gram decontam)
_CJK_CLASS = (
    "㐀-䶿一-鿿぀-ゟ゠-ヿ가-힯฀-๿"
)

#: CJK-safe tokenization: each no-space-script codepoint is its own
#: token (the standard CJK fallback used by BM25-over-CJK baselines —
#: unigram segmentation, deterministic, dictionary-free); runs of
#: everything else split on whitespace as before.  One alternation, one
#: regexp_extract_all pass.
CJK_TOKEN_RE = f"[{_CJK_CLASS}]|[^\\s{_CJK_CLASS}]+"

#: run-grain variant: a contiguous no-space-script RUN is one token —
#: the word boundary BPE training wants (characters are the initial
#: symbols, merges happen WITHIN a run; unigram "words" could never
#: merge), while retrieval/stats keep the unigram CJK_TOKEN_RE
CJK_RUN_RE = f"[{_CJK_CLASS}]+|[^\\s{_CJK_CLASS}]+"

#: a string is repairable mojibake iff, read as Latin-1 bytes, it is a
#: VALID UTF-8 sequence containing at least one multibyte lead — UTF-8
#: validity is a regular language, so the check is one anchored regex
#: (2-byte C2-DF + continuation; 3-byte with the E0-overlong and
#: ED-surrogate exclusions; 4-byte with the F0-overlong and the F4
#: U+10FFFF cap; C0/C1 never valid).  Guarding on THIS (not a
#: heuristic marker) makes the decode in fix_mojibake provably safe —
#: Spark 4's decode() RAISES on malformed input rather than emitting
#: U+FFFD.  Built from codepoints so the source stays ASCII; the
#: pattern itself is dialect-portable (plain classes + alternation).
def _utf8_as_latin1_re() -> str:
    c = chr
    ascii_ = f"[\x00-\x7f]"
    cont = f"[{c(0x80)}-{c(0xBF)}]"
    two = f"[{c(0xC2)}-{c(0xDF)}]{cont}"
    three = (
        f"{c(0xE0)}[{c(0xA0)}-{c(0xBF)}]{cont}"
        f"|[{c(0xE1)}-{c(0xEC)}{c(0xEE)}{c(0xEF)}]{cont}{{2}}"
        f"|{c(0xED)}[{c(0x80)}-{c(0x9F)}]{cont}"
    )
    four = (
        f"{c(0xF0)}[{c(0x90)}-{c(0xBF)}]{cont}{{2}}"
        f"|[{c(0xF1)}-{c(0xF3)}]{cont}{{3}}"
        f"|{c(0xF4)}[{c(0x80)}-{c(0x8F)}]{cont}{{2}}"
    )
    return f"^(?:{ascii_}|{two}|{three}|{four})*$"


_UTF8_AS_LATIN1_RE = _utf8_as_latin1_re()

#: any multibyte UTF-8 lead byte, as a Latin-1 char class
_UTF8_LEAD_RE = f"[{chr(0xC2)}-{chr(0xF4)}]"


def fix_mojibake(text: Column) -> Column:
    """Repair the classic mojibake: UTF-8 bytes mis-decoded as
    Latin-1 ('caf\u00e9' shown as 'caf\u00c3\u00a9') — the
    ftfy-style fix a web-corpus pipeline runs right after extraction,
    as a pure codegen expression (no Python, no UDF).

    A row is rewritten only when it contains a multibyte UTF-8 lead
    char AND the whole string, read as Latin-1 bytes, is valid UTF-8
    (:data:`_UTF8_AS_LATIN1_RE`) — real Latin-1 prose fails the
    continuation-byte grammar, CJK/anything above U+00FF fails the
    byte range, and clean ASCII has no lead char, so all pass through
    untouched.  Double-encoded text repairs one layer per application
    (compose twice for the rare double case).  No DuckDB twin (no
    charset transcode in DuckDB SQL) — goldens + idempotence +
    no-false-positive properties are pinned in pytest."""
    repairable = text.rlike(_UTF8_LEAD_RE) & text.rlike(_UTF8_AS_LATIN1_RE)
    return F.when(
        repairable, F.decode(F.encode(text, "ISO-8859-1"), "UTF-8")
    ).otherwise(text)


#: BPE-ish pre-tokenization: letter runs / digit runs / single
#: non-alnum-non-space marks (GPT-2-style contractions simplified so the
#: pattern is identical in Java regex and RE2)
BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

#: tiny per-language stopword anchors for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a"],
    "es": ["el", "la", "de", "los"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "zh": ["de", "shi", "le", "zai"],
}

STOPWORDS = ("the", "a", "and", "of")


def tokens(text: Column, mode: str = "ws") -> Column:
    """Tokenize ``text``.

    ``mode="ws"`` (default): whitespace tokens with empties removed
    (leading/trailing space would otherwise yield '' entries) —
    byte-identical to the historical behavior, so every existing
    operator and oracle is unchanged.

    ``mode="cjk"``: CJK-safe splitter — no-space-script codepoints
    (:data:`_CJK_CLASS`) become single-character tokens, anything else
    splits on whitespace, via one ``regexp_extract_all`` over
    :data:`CJK_TOKEN_RE`.  Still a pure codegen column expression; at
    100 TB both modes are the same single narrow scan pass."""
    if mode == "cjk":
        return F.regexp_extract_all(text, F.lit(CJK_TOKEN_RE), 0)
    if mode == "cjk_run":
        return F.regexp_extract_all(text, F.lit(CJK_RUN_RE), 0)
    if mode != "ws":
        raise ValueError(f"unknown tokenizer mode {mode!r} (ws|cjk|cjk_run)")
    return F.filter(F.split(text, _WS), lambda t: t != "")


def token_stats(text: Column, toks: Column) -> dict[str, Column]:
    """Corpus-quality raw counters as named expressions.

    ``toks`` MUST be a materialized column holding ``tokens(text)`` —
    the counters reference it three times, and an inlined tokenizer
    expression would re-run the regex split per reference (the
    expression-hygiene rule; see README design rules)."""
    n_tok = F.size(toks)
    n_chars = F.length(text)
    n_alpha = F.length(F.regexp_replace(text, "[^A-Za-z]", ""))
    n_digit = F.length(F.regexp_replace(text, "[^0-9]", ""))
    n_punct = F.length(F.regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "n_uniq_tokens": F.size(F.array_distinct(toks)).cast("long"),
        "n_alpha": n_alpha.cast("long"),
        "n_digit": n_digit.cast("long"),
        "n_punct": n_punct.cast("long"),
        "n_stopwords": n_stop.cast("long"),
    }


def quality_score(text: Column, toks: Column) -> Column:
    """Deterministic [0,1] quality heuristic: length band + stopword
    presence + alpha ratio − punctuation excess.  Per-row double
    arithmetic only (bit-identical across engines); the weights are the
    operator's config surface, not learned.  ``toks`` as in
    :func:`token_stats`."""
    s = token_stats(text, toks)
    n_tok = s["n_tokens"].cast("double")
    len_ok = F.when((s["n_tokens"] >= 10) & (s["n_tokens"] <= 1000), 1.0).otherwise(0.0)
    stop_ratio = F.when(n_tok > 0, s["n_stopwords"].cast("double") / n_tok).otherwise(0.0)
    alpha_ratio = F.when(s["n_chars"] > 0, s["n_alpha"].cast("double") / s["n_chars"].cast("double")).otherwise(0.0)
    punct_ratio = F.when(s["n_chars"] > 0, s["n_punct"].cast("double") / s["n_chars"].cast("double")).otherwise(0.0)
    raw = len_ok * 0.4 + stop_ratio * 0.2 + alpha_ratio * 0.4 - punct_ratio * 0.5
    return F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0))


def lang_hits(toks_lower: Column, lang: str) -> Column:
    """Stopword-anchor hit count for one language (``toks_lower`` = a
    materialized ``tokens(lower(text))`` column)."""
    markers = LANG_MARKERS[lang]
    return F.size(F.filter(toks_lower, lambda t: t.isin(*markers)))


def lang_id(toks_lower: Column) -> Column:
    """argmax over per-language marker hits, deterministic tie-break on
    language code; 'und' when nothing hits.  (A real corpus would use
    character n-gram profiles — same argmax shape, more features.)

    Shape matters: a CASE-WHEN fold (``best = when(h > best, …)``)
    embeds the running best expression twice per step, so the plan grew
    O(2^langs) copies of the hit counters (~60 array scans/row at 5
    languages).  ``array_max`` over ``struct(hits, rank, code)``
    references each counter exactly once: struct ordering is
    lexicographic, so the max is the highest hit count, and ``rank``
    (descending with alphabetical order) resolves ties toward the
    earlier language.  The 'und' fallback rides the array as a sentinel
    element ``(0, len(langs), 'und')`` — it outranks every zero-hit
    language and loses to any real hit — so the result is ONE field
    access of the argmax (a ``when(best.h > 0, …)`` guard would
    reference ``best`` twice and inline the whole argmax per
    reference; plan linearity is pinned by a test)."""
    langs = sorted(LANG_MARKERS)
    elems = [
        F.struct(
            lang_hits(toks_lower, lang).alias("h"),
            F.lit(len(langs) - 1 - i).alias("r"),
            F.lit(lang).alias("code"),
        )
        for i, lang in enumerate(langs)
    ]
    elems.append(
        F.struct(
            F.lit(0).alias("h"), F.lit(len(langs)).alias("r"), F.lit("und").alias("code")
        )
    )
    return F.array_max(F.array(*elems))["code"]


def word_ngrams(toks: Column, n: int) -> Column:
    """All ``n``-token windows of a materialized token array, joined
    with spaces (NOT deduplicated — repetition measures need the
    multiset).  Empty for docs shorter than ``n`` tokens; the guard
    sits BEFORE ``sequence`` evaluates because ``sequence(1, k)`` with
    ``k < 1`` walks descending instead of yielding []."""
    n_windows = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_windows),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(n_windows >= 1, grams).otherwise(F.array().cast("array<string>"))


def repetition_frac(grams: Column) -> Column:
    """Gopher/MassiveText-style repetition signal: the fraction of word
    n-gram windows that are repeats of an earlier window
    (``1 - distinct/total``; 0.0 for docs with no windows).
    Machine-generated and boilerplate text scores high; the published
    filters drop docs above ~0.2 (2-gram) / ~0.18 (3-gram).  O(tokens)
    per row, pure codegen, no shuffle.

    ``grams`` MUST be a materialized :func:`word_ngrams` column
    (expression-hygiene rule: the fraction references it twice)."""
    total = F.size(grams)
    uniq = F.size(F.array_distinct(grams))
    return F.when(
        total > 0, (total - uniq).cast("double") / total.cast("double")
    ).otherwise(F.lit(0.0))


def bpe_ish_count(text: Column) -> Column:
    """Token count under the BPE-ish pre-tokenizer (regexp_extract_all)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH), 0)).cast("long")


def fingerprint(toks_lower: Column) -> Column:
    """Document fingerprint: md5 of the normalized token stream
    (lowercase, collapsed whitespace) — the canonical-form hash used for
    near-exact dedup families."""
    return F.md5(F.array_join(toks_lower, " "))


def tf_idf_top_terms(df, id_col: str, text_col: str, top_n: int = 5):
    """Per-document top-``top_n`` TF-IDF terms:
    ``(doc, term, tf, term_df, score)``.

    Plan shape for 100 TB: one explode over materialized tokens, a
    map-side-combined ``(doc, term)`` count, a term-level document
    frequency aggregate (the term table is tiny next to the corpus —
    AQE broadcasts it back onto the postings), the corpus size N as a
    broadcast one-row aggregate (never a driver-side collect), then a
    per-doc window for the top-N.  Two shuffles total: the (doc, term)
    count and the per-doc rank — both on narrow rows.

    ``score = tf * (ln((N+1)/(df+1)) + 1)`` (smoothed idf), rounded to
    6 dp after per-row double arithmetic.  Rank ties (equal score ⟺
    equal (tf, df) pair, since idf is injective in df) break on term
    ascending, so output is deterministic across engines.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc"), tokens(F.lower(F.col(text_col))).alias("tk")
    )
    posts = toks.select("doc", F.explode("tk").alias("term"))
    # PERSISTED: tf feeds both the score join and the term-df aggregate;
    # without it each branch re-scans + re-explodes the corpus (verified
    # in the physical plan — exchange reuse does not fire across the
    # differing aggregates).  Narrow (doc, term, tf) rows only.
    tf = posts.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    # document frequency FROM the tf table (one row per (doc, term)
    # already): reuses the first aggregation instead of re-shuffling the
    # raw exploded postings through a distinct
    term_df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("term_df"))
    n_docs = toks.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(term_df, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("n_docs").cast("double") + 1.0)
                        / (F.col("term_df").cast("double") + 1.0)
                    )
                    + 1.0
                ),
                6,
            ),
        )
    )
    rank = F.row_number().over(
        Window.partitionBy("doc").orderBy(F.col("score").desc(), F.col("term"))
    )
    from yodel_etl_spark.session import register_persisted

    out = (
        scored.withColumn("rk", rank)
        .where(F.col("rk") <= top_n)
        .select("doc", "term", "tf", "term_df", "score")
    )
    # cache lifetime is the caller's: session.release(out) frees tf
    return register_persisted(out, tf)


def rolling_hashes(toks_lower: Column, window: int = 5) -> Column:
    """Winnowing-style candidate hashes: xxhash64 of each ``window``-token
    shingle (rows-only — xxhash64 has no cross-engine twin).  At scale,
    pick the per-document minimum per band to bound fingerprint count.
    ``toks_lower`` must be materialized: the slice inside the lambda
    reads it once per window position."""
    toks = toks_lower
    n = F.size(toks)
    # sequence(1, 0) would generate a DESCENDING range — guard short docs
    idx = F.when(n >= window, F.sequence(F.lit(1), n - window + 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i, window), " ")))


def normalized_text_map(id_col: str, text_col: str):
    """Arrow-batched Unicode canonicalization for corpus prep: NFC
    normalize → casefold(lower) → collapse whitespace runs → strip.
    Returns a ``mapInPandas`` function + output schema producing
    ``(id, text_norm)``.

    This is one of the few legitimately-Python text ops (the JVM side
    has no Unicode-normalization expression); it follows the engine's
    Python-boundary rules — vectorized pandas ``str`` kernels over
    Arrow batches, never per-row Python, placed after column pruning so
    only (id, text) crosses the boundary.  DuckDB's ``nfc_normalize``
    is the oracle twin (Python ``unicodedata.normalize('NFC', …)``
    matches it codepoint-for-codepoint).
    """
    import pandas as pd  # noqa: F401 — executor-side import
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("text_norm", T.StringType()),
        ]
    )

    def run(batches):
        import unicodedata

        for pdf in batches:
            t = pdf[text_col].map(
                lambda s: unicodedata.normalize("NFC", s) if s is not None else None
            )
            t = (
                t.str.lower()
                .str.replace(r"\s+", " ", regex=True)
                .str.strip()
            )
            yield pd.DataFrame({id_col: pdf[id_col], "text_norm": t})

    return run, schema


def normalize_text(df, id_col: str = "doc_id", text_col: str = "text"):
    """``(id, text_norm)`` via :func:`normalized_text_map` — prune to
    two columns BEFORE the opaque map (Catalyst cannot prune through
    mapInPandas)."""
    run, schema = normalized_text_map(id_col, text_col)
    return df.select(id_col, text_col).mapInPandas(run, schema)


def chunk_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    RAG-indexing / pretraining-window op: chunk ``i`` covers tokens
    ``[i·(size−overlap), i·(size−overlap)+size)``; the final chunk is
    the remainder (never duplicated — a doc shorter than one window
    yields exactly one chunk; the zero-token edge case — empty or
    all-whitespace text — still emits ONE row with ``chunk_text = ''``
    and ``n_tokens = 0``, preserving row-per-doc accounting; filter on
    ``n_tokens > 0`` if empty chunks are unwelcome downstream).

    Pure column algebra: one tokenizer pass materialized in its own
    projection (expression-hygiene rule), ``posexplode(sequence(...))``
    for the window index — a narrow per-row explode, no shuffle, no
    Python.  At 100 TB chunking is a map-only stage whose output is
    ~``1/(1−overlap/size)``× the input tokens; downstream ops see
    (doc_id, chunk_id) grain with deterministic ids for exactly-once
    re-chunking."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    staged = df.select(
        F.col(id_col), F.col(text_col), tokens(F.col(text_col)).alias("_tk")
    ).select(
        id_col,
        "_tk",
        F.size("_tk").alias("_n"),
        # number of windows: 1 + ceil(max(0, n - size) / step)
        (
            F.lit(1)
            + F.ceil(
                F.greatest(F.size("_tk") - chunk_size, F.lit(0)) / F.lit(step)
            ).cast("int")
        ).alias("_nc"),
    )
    exploded = staged.select(
        id_col,
        "_tk",
        "_n",
        F.posexplode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id", "_i"),
    )
    start = F.col("chunk_id") * step
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(F.slice("_tk", start + 1, chunk_size), " ").alias("chunk_text"),
        F.least(F.col("_n") - start, F.lit(chunk_size)).cast("int").alias("n_tokens"),
    )


# -------------------------------------------------------- HTML extract
def html_extract(col: Column) -> Column:
    """Plain text from raw HTML — the WET-style extraction a web-corpus
    pipeline runs before any text analysis: drop <script>/<style>
    blocks wholesale, strip remaining tags, decode the five standard
    entities (&amp; LAST so it cannot double-decode), collapse
    whitespace.  A chain of codegen ``regexp_replace`` in the
    RE2 ∩ Java-regex dialect (same portability rule as scale.redact):
    ``(?s)`` dotall + lazy ``.*?`` are both dialect-safe, so the DuckDB
    oracle runs the identical patterns.  Narrow, shuffle-free, and
    whole-stage-codegen'd — at 100 TB this is a pure scan-stage map."""
    out = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]*>", " ")
    for ent, rep in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def html_extract_sql(col: str) -> str:
    """DuckDB twin of :func:`html_extract` — the identical pattern
    chain (the patterns live in the RE2 ∩ Java-regex dialect on
    purpose), for assembling oracles that reduce inner markup the way
    the corpus path does (the `anchor` oracle; the `text_html` oracle
    spells the same chain inline)."""
    t = (
        f"regexp_replace(regexp_replace(regexp_replace({col}, "
        f"'(?is)<script[^>]*>.*?</script>', ' ', 'g'), "
        f"'(?is)<style[^>]*>.*?</style>', ' ', 'g'), "
        f"'(?s)<[^>]*>', ' ', 'g')"
    )
    t = (
        f"replace(replace(replace(replace(replace(replace({t}, "
        f"'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), '&#39;', ''''), "
        f"'&nbsp;', ' '), '&amp;', '&')"
    )
    return f"trim(regexp_replace({t}, '\\s+', ' ', 'g'))"
