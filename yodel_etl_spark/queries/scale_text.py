"""Text-analysis queries over ``documents`` (north-star: corpus
curation at 100 TB — every query is one narrow codegen pass)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.registry import register
from yodel_etl_spark.scale.textstats import (
    _CJK_CLASS,
    CJK_TOKEN_RE,
    LANG_MARKERS,
    bpe_ish_count,
    fingerprint,
    lang_id,
    quality_score,
    repetition_frac,
    token_stats,
    tokens,
    word_ngrams,
)
from yodel_etl_spark.session import load_tables, spread

#: DuckDB fragments mirroring scale.textstats
TOK_SQL = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"
TOK_LOWER_SQL = "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"
_STOP = "['the', 'a', 'and', 'of']"


@register(
    "text_token_stats",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text, {TOK_SQL} AS tk FROM documents
    ),
    c AS (
      SELECT doc_id, text, tk,
             length(text) AS n_chars,
             len(tk) AS n_tokens,
             len(list_distinct(tk)) AS n_uniq_tokens,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct,
             len(list_filter(tk, t -> list_contains({_STOP}, lower(t)))) AS n_stopwords,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_ish,
             list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
               i -> array_to_string(tk[i:i+1], ' ')) AS g2,
             list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
               i -> array_to_string(tk[i:i+2], ' ')) AS g3
      FROM s
    )
    SELECT doc_id, n_chars, n_tokens, n_uniq_tokens, n_alpha, n_digit,
           n_punct, n_stopwords, n_bpe_ish,
           greatest(least(
             CASE WHEN n_tokens >= 10 AND n_tokens <= 1000 THEN 1.0 ELSE 0.0 END * 0.4
             + CASE WHEN CAST(n_tokens AS DOUBLE) > 0
                    THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END * 0.2
             + CASE WHEN n_chars > 0
                    THEN CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 0.4
             - CASE WHEN n_chars > 0
                    THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END * 0.5,
           1.0), 0.0) AS quality,
           CASE WHEN len(g2) > 0
                THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / CAST(len(g2) AS DOUBLE)
                ELSE 0.0 END AS rep_2gram_frac,
           CASE WHEN len(g3) > 0
                THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / CAST(len(g3) AS DOUBLE)
                ELSE 0.0 END AS rep_3gram_frac
    FROM c
    """,
    doc="Token/char/punct/stopword counters, the BPE-ish pre-tokenizer "
    "count, the deterministic [0,1] quality heuristic (length band, "
    "stopword presence, alpha ratio, punct penalty) and the "
    "Gopher/MassiveText-style repetition signals (fraction of repeated "
    "word 2-/3-gram windows) — the full raw-signal surface of corpus "
    "quality filtering, same doc grain, one narrow pass (merged from "
    "the former text_quality_score: identical grain, shared token "
    "staging, so two registry slots were one scan apart).",
    tags=("textstats",),
    bench=True,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    staged = docs.select("doc_id", "text", tokens(F.col("text")).alias("tk"))
    grams = staged.select(
        "*",
        word_ngrams(F.col("tk"), 2).alias("g2"),
        word_ngrams(F.col("tk"), 3).alias("g3"),
    )
    stats = token_stats(F.col("text"), F.col("tk"))
    return grams.select(
        "doc_id",
        *[c.alias(n) for n, c in stats.items()],
        bpe_ish_count(F.col("text")).alias("n_bpe_ish"),
        quality_score(F.col("text"), F.col("tk")).alias("quality"),
        repetition_frac(F.col("g2")).alias("rep_2gram_frac"),
        repetition_frac(F.col("g3")).alias("rep_3gram_frac"),
    )


def _lang_hits_sql(lang: str) -> str:
    markers = "[" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + "]"
    return f"len(list_filter({TOK_LOWER_SQL}, t -> list_contains({markers}, t)))"


_LANGS = sorted(LANG_MARKERS)
_HITS = ", ".join(f"{_lang_hits_sql(lang)} AS h_{lang}" for lang in _LANGS)
_GREATEST = "greatest(" + ", ".join(f"h_{lang}" for lang in _LANGS) + ")"
_ARGMAX = " ".join(
    f"WHEN h_{lang} >= {_GREATEST} THEN '{lang}'" for lang in _LANGS
)


@register(
    "text_lang_id",
    oracle=f"""
    WITH h AS (SELECT doc_id, lang, {_HITS} FROM documents)
    SELECT doc_id, lang AS lang_actual,
           CASE WHEN {_GREATEST} = 0 THEN 'und' {_ARGMAX} ELSE 'und' END AS lang_pred
    FROM h
    """,
    doc="Stopword-anchor language ID: argmax of per-language marker "
    "hits, alphabetical tie-break, 'und' when silent.",
    tags=("textstats",),
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    staged = docs.select(
        "doc_id", "lang", tokens(F.lower(F.col("text"))).alias("tkl")
    )
    return staged.select(
        "doc_id", F.col("lang").alias("lang_actual"), lang_id(F.col("tkl")).alias("lang_pred")
    )


# (text_bpe_counts was folded into text_token_stats as the n_bpe_ish
# column — same table, same per-doc grain, one fewer registry slot so
# every oracle-backed query fits the driver's correctness window)


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, md5(array_to_string({TOK_LOWER_SQL}, ' ')) AS fp
    FROM documents
    """,
    doc="Canonical-form document fingerprint: md5 of the normalized "
    "(lowercased, whitespace-collapsed) token stream.",
    tags=("textstats", "dedup"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    staged = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("tkl"))
    return staged.select("doc_id", fingerprint(F.col("tkl")).alias("fp"))


@register(
    "winnow",
    oracle=None,  # xxhash64 has no DuckDB twin -> rows-only
    doc="Winnowing-style fingerprints: xxhash64 over 5-token rolling "
    "windows, reduced to per-doc count + minimum (the band-minimum "
    "that bounds fingerprint volume at corpus scale).",
    tags=("textstats", "dedup"),
)
def winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.textstats import rolling_hashes

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    staged = docs.select("doc_id", tokens(F.lower(F.col("text"))).alias("tkl"))
    rh = staged.select("doc_id", rolling_hashes(F.col("tkl"), 5).alias("rh"))
    return rh.select(
        "doc_id", F.size("rh").alias("n_hashes"), F.array_min("rh").alias("min_hash")
    )


def _pii_oracle(table: str = "documents") -> str:
    """Oracle mirroring redact_documents: counts on the progressively
    redacted text, then md5 of the fully redacted text.  Patterns embed
    verbatim — DuckDB SQL strings pass backslashes through to RE2
    untouched, matching Spark's Java-regex literal."""
    from yodel_etl_spark.scale.redact import PII_PATTERNS

    cur = "text"
    cols = []
    for kind, pat, rep in PII_PATTERNS:
        cols.append(f"len(regexp_extract_all({cur}, '{pat}')) AS n_{kind}")
        cur = f"regexp_replace({cur}, '{pat}', '{rep}', 'g')"
    cols.append(f"md5({cur}) AS redacted_md5")
    return "SELECT doc_id, " + ", ".join(cols) + f" FROM {table}"


@register(
    "text_pii_redact",
    oracle=_pii_oracle(),
    doc="PII scrub: ordered email/SSN/card/IPv4/phone redaction as "
    "chained codegen regexp_replace (one narrow pass), per-kind counts "
    "on the progressively-redacted text, md5 of the scrubbed output.  "
    "Patterns restricted to the Java-regex ∩ RE2 dialect so the oracle "
    "pins cross-engine behavior; planted-PII semantics pinned in "
    "tests/test_redact.py.",
    tags=("textstats", "scale"),
    bench=True,
    tier=1,
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.redact import redact_documents

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    out = redact_documents(docs, "doc_id", "text")
    return out.select(
        "doc_id", "n_email", "n_ssn", "n_card", "n_ipv4", "n_phone",
        F.md5("redacted").alias("redacted_md5"),
    )


@register(
    "text_tfidf_top",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS doc,
             list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '') AS tk
      FROM documents
    ),
    posts AS (SELECT doc, unnest(tk) AS term FROM toks),
    tf AS (SELECT doc, term, count(*) AS tf FROM posts GROUP BY doc, term),
    tdf AS (SELECT term, count(DISTINCT doc) AS term_df FROM posts GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM toks),
    scored AS (
      SELECT doc, tf.term AS term, tf, term_df,
             round(CAST(tf AS DOUBLE)
                   * (ln((CAST(n_docs AS DOUBLE) + 1) / (CAST(term_df AS DOUBLE) + 1)) + 1),
                   6) AS score
      FROM tf JOIN tdf USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc ORDER BY score DESC, term) AS rk
      FROM scored
    )
    SELECT doc, term, tf, term_df, score FROM ranked WHERE rk <= 5
    """,
    doc="Per-doc top-5 TF-IDF terms: explode → map-side-combined "
    "(doc,term) counts, tiny term-df table broadcast back by AQE, "
    "corpus size as a broadcast one-row aggregate (no driver collect), "
    "per-doc window rank with deterministic term tie-break.",
    tags=("textstats", "scale"),
    bench=True,
    tier=1,
)
def text_tfidf_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.textstats import tf_idf_top_terms

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return tf_idf_top_terms(docs, "doc_id", "text", top_n=5)


@register(
    "text_normalize",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(lower(nfc_normalize(text)), '\\s+', ' ', 'g'))
             AS text_norm
    FROM documents
    """,
    doc="Unicode canonicalization for corpus prep: NFC normalize → "
    "lower → collapse whitespace runs → strip.  One of the few "
    "legitimately-Python text ops (no JVM Unicode-normalize "
    "expression): vectorized pandas str kernels over Arrow batches, "
    "pruned to (id, text) before the opaque map.  Oracle twin is "
    "DuckDB nfc_normalize (codepoint-identical to Python "
    "unicodedata; non-ASCII behavior pinned by unit fixtures since "
    "the testdata is ASCII).",
    tags=("textstats", "scale"),
    bench=True,
    tier=2,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.textstats import normalize_text

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return normalize_text(docs)


@register(
    "text_chunks",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk
      FROM documents
    ), s AS (
      SELECT doc_id, tk, len(tk) AS n,
             1 + CAST(ceil(greatest(len(tk) - 64, 0) / 48.0) AS INT) AS nc
      FROM t
    )
    SELECT doc_id,
           u.i - 1 AS chunk_id,
           array_to_string(list_slice(tk, (u.i - 1) * 48 + 1, (u.i - 1) * 48 + 64), ' ')
             AS chunk_text,
           CAST(least(n - (u.i - 1) * 48, 64) AS INT) AS n_tokens
    FROM s, unnest(range(1, nc + 1)) AS u(i)
    """,
    doc="Overlapping token-window chunking (64-token windows, 16-token "
    "overlap — the RAG-indexing / pretraining-window op): chunk i "
    "covers tokens [i*48, i*48+64), final chunk is the remainder, a "
    "short doc yields exactly one chunk.  Map-only explode, no "
    "shuffle; deterministic (doc_id, chunk_id) grain for exactly-once "
    "re-chunking.  Promoted to tier 0 in r4: the dedup_exact_groups/"
    "dedup_incremental_novel same-scan merge freed its driver-window "
    "slot.",
    tags=("textstats", "scale"),
    bench=True,
)
def text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.textstats import chunk_tokens

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return chunk_tokens(docs, "doc_id", "text", chunk_size=64, overlap=16)


@register(
    "text_gopher",
    oracle="""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS tk,
             string_split(text, chr(10)) AS ln
      FROM documents
    ), c AS (
      SELECT doc_id,
             CAST(len(tk) AS BIGINT) AS n_words,
             CAST(coalesce(list_sum(list_transform(tk, x -> len(x))), 0) AS BIGINT)
               AS n_word_chars,
             CAST(len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
               AS n_alpha_words,
             CAST((len(text) - len(replace(text, '#', '')))
                  + (len(text) - len(replace(text, '...', ''))) / 3 AS BIGINT)
               AS n_symbols,
             CAST(len(ln) AS BIGINT) AS n_lines,
             CAST(len(list_filter(ln, l -> regexp_matches(trim(l), '^[-*•]'))) AS BIGINT)
               AS n_bullet_lines,
             CAST(len(list_filter(ln, l -> ends_with(l, '...'))) AS BIGINT)
               AS n_ellipsis_lines,
             CAST(len(list_intersect(list_transform(tk, x -> lower(x)),
                    ['the','be','to','of','and','that','have','with'])) AS BIGINT)
               AS n_stop_hits
      FROM t
    ), r AS (
      SELECT doc_id, n_words,
             round(CASE WHEN n_words > 0
                        THEN CAST(n_word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
                        ELSE 0.0 END, 6) AS mean_word_len,
             n_stop_hits,
             (n_words BETWEEN 50 AND 100000) AS ok_word_count,
             (CASE WHEN n_words > 0
                   THEN CAST(n_word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
                   ELSE 0.0 END >= 3.0
              AND CASE WHEN n_words > 0
                       THEN CAST(n_word_chars AS DOUBLE) / CAST(n_words AS DOUBLE)
                       ELSE 0.0 END <= 10.0) AS ok_mean_word_len,
             (CASE WHEN n_words > 0
                   THEN CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.1
                   ELSE FALSE END) AS ok_symbol_ratio,
             (CAST(n_bullet_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) < 0.9)
               AS ok_bullet_lines,
             (CAST(n_ellipsis_lines AS DOUBLE) / CAST(n_lines AS DOUBLE) < 0.3)
               AS ok_ellipsis_lines,
             (CASE WHEN n_words > 0
                   THEN CAST(n_alpha_words AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.8
                   ELSE FALSE END) AS ok_alpha_words,
             (n_stop_hits >= 2) AS ok_stopwords
      FROM c
    )
    SELECT *,
           (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
            AND ok_bullet_lines AND ok_ellipsis_lines AND ok_alpha_words
            AND ok_stopwords) AS pass_gopher
    FROM r
    """,
    doc="Gopher-style quality-rule gate (Rae et al. 2021, App. A — "
    "public paper): word-count band, mean-word-length band, "
    "symbol-to-word ratio, bullet/ellipsis line fractions, alpha-word "
    "fraction, stop-word floor — per-rule booleans + the conjunction a "
    "pretraining pipeline filters on.  Pure column expressions: one "
    "WholeStageCodegen pass over the scan pruned to (doc_id, text), no "
    "shuffle.  Tier 2: yields its driver-window slot to the "
    "established set; parity pinned by the pytest oracle suite and the "
    "driver-sim at sf0.01.",
    tags=("textstats", "scale", "quality"),
    bench=True,
    tier=2,
)
def text_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.quality import gopher_rules

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return gopher_rules(docs, "doc_id", "text")


@register(
    "text_ppl",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), t -> t <> '') AS tk
      FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)), i -> tk[i])) AS w1,
             unnest(list_transform(range(1, len(tk)), i -> tk[i + 1])) AS w2
      FROM toks WHERE len(tk) >= 2
    ), big AS (
      SELECT w1, w2, count(*) AS c12 FROM g GROUP BY w1, w2
    ), uni AS (
      SELECT w1, sum(c12) AS c1 FROM big GROUP BY w1
    ), vv AS (
      SELECT count(*) AS v FROM uni
    ), lm AS (
      SELECT w1, w2,
             CAST(round(ln((c12 + 1.0) / CAST(c1 + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS nats
      FROM big JOIN uni USING (w1), vv
    ), sc AS (
      SELECT g.doc_id, count(*) AS n_grams, sum(l.nats) AS s
      FROM g JOIN lm l USING (w1, w2) GROUP BY g.doc_id
    ), scored AS (
      SELECT doc_id, n_grams,
             round(CAST(s AS DOUBLE) / 1000000.0 / n_grams, 6) AS score
      FROM sc
    ), ranked AS (
      SELECT *, row_number() OVER (ORDER BY score DESC, doc_id) AS rn,
             count(*) OVER () AS n
      FROM scored
    )
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, score,
           CASE WHEN rn <= floor(n * 30 / 100) THEN 'head'
                WHEN rn > n - floor(n * 30 / 100) THEN 'tail'
                ELSE 'middle' END AS bucket
    FROM ranked
    """,
    doc="CCNet-style perplexity bucketing (Wenzek et al. 2020): train "
    "an add-one-smoothed word-bigram LM on the corpus itself, score "
    "every doc by average log-probability, and cut head/middle/tail "
    "(30/40/30) by deterministic rank.  Per-doc sums are exact integer "
    "micro-nats so shuffle order can never flip the oracle hash; LM "
    "training is two gram-keyed shuffles and doc scoring is a "
    "broadcast join that degrades to a (w1,w2) shuffle join at "
    "vocabulary scale.  The global rank cut is doc-grain and "
    "oracle-exact; the 100 TB form is method='threshold' (implemented: "
    "one percentile_approx aggregate, two broadcast cutpoints, NO "
    "window anywhere — agreement with rank away from cut ties and the "
    "no-window plan are pinned in pytest).  Tier 2: yields its "
    "driver-window slot; parity via pytest oracle suite + driver-sim.",
    tags=("text", "scale", "quality"),
    bench=True,
    tier=2,
)
def text_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.lm import perplexity_buckets

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return perplexity_buckets(docs, "doc_id", "text", head_pct=30, tail_pct=30)


@register(
    "pplc",
    oracle=None,  # cutpoints come from percentile_approx, so bucket
    # membership at the cut is engine-specific by design; correctness
    # anchors are the pytest rank-agreement + inclusive-tie-band pins
    # (tests/test_quality.py) and the no-Window plan pin
    # (tests/test_plans.py) — rows-only: 3 bucket rows, stable counts
    doc="The 100 TB form of perplexity bucketing, as a RECORDED bench "
    "number: method='threshold' — same corpus-trained bigram LM and "
    "integer micro-nat scoring as text_ppl, but the head/tail cut is "
    "two percentile_approx cutpoints computed in ONE partial-merge "
    "aggregate, broadcast back, bucket by comparison — NO window, no "
    "global sort, no single-task funnel anywhere (text_ppl's exact "
    "rank form stays the oracle vehicle; this entry records what the "
    "scale-safe plan costs across rounds).  Output: bucket, n_docs, "
    "n_grams summed exactly per bucket.",
    tags=("text", "scale", "quality"),
    bench=True,
)
def ppl_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.lm import perplexity_buckets

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    bucketed = perplexity_buckets(
        docs, "doc_id", "text", head_pct=30, tail_pct=30, method="threshold"
    )
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").alias("n_grams"),
    )


@register(
    "text_html",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id,
             '<html><head><title>d' || CAST(doc_id AS VARCHAR)
             || '</title><style type="text/css">p { color: red; }</style></head>'
             || '<body class="main"><h1>Doc &quot;' || CAST(doc_id AS VARCHAR)
             || '&quot;</h1><p>' || text
             || '</p><script type="text/javascript">if (a < b) { alert("x"); }</script>'
             || '<p>tail &lt;marker&gt; &amp; done</p></body></html>' AS html
      FROM documents
    ), stripped AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                 '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<[^>]*>', ' ', 'g') AS t
      FROM raw
    ), decoded AS (
      SELECT doc_id,
             replace(replace(replace(replace(replace(replace(t,
               '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
               '&nbsp;', ' '), '&amp;', '&') AS t
      FROM stripped
    )
    SELECT doc_id,
           trim(regexp_replace(t, '\s+', ' ', 'g')) AS extracted,
           CAST(length(trim(regexp_replace(t, '\s+', ' ', 'g'))) AS BIGINT) AS n_chars
    FROM decoded
    """,
    doc="WET-style HTML text extraction: documents wrapped in a "
    "deterministic HTML envelope (style + script blocks, attributes, "
    "entities) and recovered by the codegen regexp chain — script/style "
    "dropped wholesale, tags stripped, five standard entities decoded "
    "with &amp; last, whitespace collapsed.  Patterns live in the "
    "RE2 ∩ Java-regex dialect so the oracle runs the identical chain.  "
    "Narrow scan-stage map, no shuffle.  Tier 2: yields its "
    "driver-window slot; parity via pytest oracle suite + driver-sim.",
    tags=("text", "scale"),
    bench=True,
    tier=2,
)
def text_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.textstats import html_extract

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    did = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<html><head><title>d'), did,
        F.lit('</title><style type="text/css">p { color: red; }</style></head>'),
        F.lit('<body class="main"><h1>Doc &quot;'), did,
        F.lit('&quot;</h1><p>'), F.col("text"),
        F.lit('</p><script type="text/javascript">if (a < b) { alert("x"); }</script>'),
        F.lit('<p>tail &lt;marker&gt; &amp; done</p></body></html>'),
    )
    staged = docs.select("doc_id", html.alias("_html"))
    ex = html_extract(F.col("_html"))
    return staged.select("doc_id", ex.alias("extracted")).withColumn(
        "n_chars", F.length("extracted").cast("long")
    )


@register(
    "bpem",
    oracle=None,  # iterative training is not single-statement SQL —
    # parity vs a literal single-process BPE trainer (merge list, order,
    # encodings) pinned in tests/test_bpe.py; rows-only registry tail
    doc="Learned BPE subword merges (Sennrich et al. 2016), two-phase: "
    "the corpus-sized work is the distributed (word, count) reduction; "
    "the merge loop runs in-process on the vocabulary-sized table (the "
    "production-tokenizer split), falling back to a fully distributed "
    "per-round explode+groupBy+argmax loop above a vocab threshold — "
    "both paths implement the identical greedy algorithm and are "
    "pinned equal in tests.  Deterministic (frequency ties break "
    "lexicographically).  Returns the ordered merge table.",
    tags=("text", "scale"),
    bench=True,
    tier=2,
)
def bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.bpe import learn_bpe

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    merges = learn_bpe(docs, "text", n_merges=16)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank long, left string, right string, merged string",
    )


@register(
    "bpee",
    oracle=None,  # the merge table is data-dependent and its application
    # iterative — not single-statement SQL; per-word encode parity vs the
    # textbook single-process encoder is pinned in tests/test_bpe.py
    doc="Tokenize the corpus with the trained BPE merge table — the "
    "apply half of the train→apply tokenizer pair (bpem "
    "trains; this encodes every document and reports token counts and "
    "the md5 of the token stream).  The merge table is control-plane "
    "data (16 rows) closed over an Arrow-batched mapInPandas whose "
    "per-batch word cache turns corpus word redundancy directly into "
    "cache hits; the encode pass is narrow (no shuffle — the scan "
    "prunes to (doc_id, text) and each batch writes its own rows).  "
    "The n_tokens column is what packs and "
    "sample_domain_mix budget against — trained-tokenizer counts, not "
    "the whitespace proxy.  Tier 2: yields its driver-window slot; "
    "rows-only with per-word parity + roundtrip invariants in pytest.",
    tags=("text", "scale"),
    bench=True,
    tier=2,
)
def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.bpe import bpe_tokenize, learn_bpe

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    merges = learn_bpe(docs, "text", n_merges=16)
    enc = bpe_tokenize(docs, "doc_id", "text", merges)
    # md5 over the joined stream: a value-stable digest the driver can
    # hash without a top-level array column (drivers sort rows by value)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.md5(F.array_join("tokens", " ")).alias("tokens_md5"),
    )


_BM25_TERMS = ("spark", "vector", "customer")
_BM25_TF_SQL = ",\n         ".join(
    f"len(list_filter(tk, t -> t = '{t}')) AS tf_{t}" for t in _BM25_TERMS
)
_BM25_DF_SQL = ",\n         ".join(
    f"sum(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}" for t in _BM25_TERMS
)
#: per-term BM25 contribution, parenthesized exactly as the Spark side
#: builds it ((idf * (tf * (k1+1))) / (tf + k1*(1-b + b*dl/avgdl))) so
#: the left-associated double arithmetic matches bit-for-bit
_BM25_TERM_SQL = """(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df_{t} AS DOUBLE) + 0.5)
           / (CAST(df_{t} AS DOUBLE) + 0.5))
      * (CAST(tf_{t} AS DOUBLE) * 2.2))
     / (CAST(tf_{t} AS DOUBLE)
        + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE)
                 / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))))"""
_BM25_SCORE_SQL = "\n   + ".join(_BM25_TERM_SQL.format(t=t) for t in _BM25_TERMS)


@register(
    "text_bm25",
    oracle=f"""
    WITH t0 AS (
      SELECT doc_id, {TOK_LOWER_SQL} AS tk FROM documents
    ), f AS (
      SELECT doc_id,
         len(tk) AS dl,
         {_BM25_TF_SQL}
      FROM t0
    ), s AS (
      SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
         {_BM25_DF_SQL}
      FROM f
    )
    SELECT doc_id, dl, {", ".join(f"tf_{t}" for t in _BM25_TERMS)},
           round({_BM25_SCORE_SQL}, 6) AS score
    FROM f, s
    ORDER BY score DESC, doc_id
    LIMIT 20
    """,
    doc="Distributed keyword retrieval: top-20 documents by BM25 "
    "(Lucene-default plus-one idf, k1=1.2, b=0.75) against a bounded "
    "query-term set — corpus forensics / topic probes without building "
    "a serving index.  The scale story is the ABSENT inverted index: "
    "per-term tf is a narrow size(filter(tokens)) projection in the "
    "scan stage (no explode, no (doc,term) shuffle), corpus stats "
    "(N, Σdl, per-term df) are ONE one-row aggregate broadcast back, "
    "and the top-k is TakeOrderedAndProject — one corpus scan total, "
    "the same plan at 500 rows and 100 TB.  Tier 1: new this round, "
    "yields its driver-window slot; parity via the pytest oracle gate.",
    tags=("text", "scale", "search"),
    bench=True,
    tier=1,
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.search import bm25_topk

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    return bm25_topk(docs, list(_BM25_TERMS), top_n=20)


@register(
    "clf",
    oracle=None,  # iterative gradient descent — not single-statement
    # SQL; bit-reproducibility, numpy-twin parity, loss descent and
    # accuracy-over-base-rate are pinned in tests/test_classifier.py
    doc="Train a fastText-style hashed-unigram logistic quality "
    "classifier ON the cluster (4 full-batch GD rounds, 512 buckets, "
    "mean-pooled features; label: quality_score ≥ its exact corpus "
    "median — distilling the rule-based heuristic into a learned "
    "linear scorer, the standard cheap-filter recipe) and "
    "score every document under the final weights — the "
    "quality-filter-training stage of a pretraining pipeline "
    "(CCNet/DCLM-style linear filter).  Training is bit-reproducible: "
    "per-doc residuals quantize to integer micro-units before the "
    "gradient aggregation, so shuffle order can never perturb the "
    "weights.  Per round: one cached-corpus scan, one "
    "vocabulary-sized (513-row) gradient shuffle, bounded driver "
    "fold — the BPE/k-means control-plane convention.  Output: "
    "(doc_id, y, score_micro, pred) under the trained model.  4 "
    "rounds at lr 4 reach the same 0.91 accuracy as 8 at lr 2 on "
    "this convex objective (probed in the literal twin) at half the "
    "scan cost.  "
    "Rows-only registry tail by design.",
    tags=("text", "scale", "classifier"),
    bench=True,
)
def quality_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.classifier import train_quality_lr
    from yodel_etl_spark.scale.textstats import quality_score

    from yodel_etl_spark.session import release

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    # persisted: the quality expression (three regexp passes) feeds
    # both the median aggregate and the label column — without the pin
    # it runs twice over the corpus
    staged = docs.select(
        "doc_id",
        "text",
        quality_score(F.col("text"), tokens(F.col("text"))).alias("q"),
    ).persist()
    med = staged.agg(F.percentile("q", F.lit(0.5)).alias("m"))
    labeled = staged.crossJoin(F.broadcast(med))
    _, scored = train_quality_lr(
        labeled, F.col("q") >= F.col("m"), n_buckets=512, rounds=4, lr=4.0
    )
    release(staged)  # the trainer cached its own bucketed base
    return scored


#: planted no-space-script snippets (zh, ja, ko, th) — literal constants
#: embedded identically in the Spark expression and the DuckDB oracle,
#: so the tokenizer is exercised on real CJK/Thai text without needing a
#: CJK column in the synthetic testdata
_CJK_SNIPS = (
    "深度学习模型需要大量训练数据",
    "自然言語処理モデルを学習する",
    "한국어 텍스트 처리 모델 학습",
    "ปัญญาประดิษฐ์ประมวลผลข้อความ",
)


@register(
    "cjk_tokens",
    oracle=f"""
    WITH s AS (
      SELECT doc_id,
             substr(text, 1, 40) || ' ' ||
             (['{_CJK_SNIPS[0]}', '{_CJK_SNIPS[1]}',
               '{_CJK_SNIPS[2]}', '{_CJK_SNIPS[3]}'])[CAST(doc_id % 4 + 1 AS INT)]
               AS mixed
      FROM documents
    ),
    t AS (
      SELECT doc_id, mixed,
             regexp_extract_all(mixed, '{CJK_TOKEN_RE}') AS tkc,
             list_filter(string_split_regex(mixed, '\\s+'), t -> t <> '') AS tkw
      FROM s
    )
    SELECT doc_id,
           len(tkw) AS n_ws,
           len(tkc) AS n_cjk,
           len(list_distinct(tkc)) AS n_uniq_cjk,
           length(regexp_replace(mixed, '[^{_CJK_CLASS}]', '', 'g')) AS n_cjk_chars,
           array_to_string(tkc[1:8], '|') AS head_toks
    FROM t
    """,
    doc="CJK-safe tokenization over documents with planted zh/ja/ko/th "
    "snippets (literal constants keyed by doc_id % 4, mixed with the "
    "English head of each doc): per doc the whitespace token count, "
    "the CJK-mode count (no-space-script codepoints are unigram "
    "tokens), distinct-token count via token_stats' counter shape, the "
    "raw CJK-codepoint count, and the first 8 CJK-mode tokens joined "
    "with '|'.  Why it exists: a whitespace split collapses a CJK/Thai "
    "document to ONE token and silently degrades every token-derived "
    "operator (BM25, DSIR, BPE, perplexity bucketing, Gopher, n-gram "
    "decontam) — on a multilingual corpus, the NORMAL case at 100 TB.  "
    "Same single narrow codegen scan as every textstats pass; the "
    "regex alternation is literal-codepoint so Java regex and RE2 "
    "agree byte-for-byte.",
    tags=("textstats", "cjk"),
    tier=2,
)
def cjk_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    snip = F.element_at(
        F.array(*[F.lit(s) for s in _CJK_SNIPS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    # expression hygiene: mixed feeds two tokenizers + a regex counter,
    # the token arrays feed multiple counters — each gets its own
    # projection so nothing re-evaluates per reference
    staged = docs.select(
        "doc_id",
        F.concat(F.substring(F.col("text"), 1, 40), F.lit(" "), snip).alias("mixed"),
    )
    toked = staged.select(
        "doc_id",
        "mixed",
        tokens(F.col("mixed"), mode="cjk").alias("tkc"),
        tokens(F.col("mixed")).alias("tkw"),
    )
    return toked.select(
        "doc_id",
        F.size("tkw").cast("long").alias("n_ws"),
        F.size("tkc").cast("long").alias("n_cjk"),
        F.size(F.array_distinct("tkc")).cast("long").alias("n_uniq_cjk"),
        F.length(F.regexp_replace("mixed", f"[^{_CJK_CLASS}]", ""))
        .cast("long")
        .alias("n_cjk_chars"),
        F.array_join(F.slice("tkc", 1, 8), "|").alias("head_toks"),
    )


@register(
    "moji",
    oracle=None,  # DuckDB SQL has no charset transcode, so the repair
    # itself has no oracle; goldens, idempotence and the
    # no-false-positive property are pinned in tests (fix_mojibake)
    doc="Mojibake repair sweep (scale.textstats.fix_mojibake): every "
    "third document gets a planted UTF-8-as-Latin-1 suffix ('cafÃ© "
    "naÃ¯ve'), the ftfy-style transcode-repair expression rewrites "
    "exactly the damaged rows (pure codegen — encode(Latin-1) → "
    "decode(UTF-8) behind a byte-grammar guard, no Python), and the "
    "output pins per-doc: planted?, repaired?, and the char-count "
    "delta (each 2-byte mojibake pair collapses to 1 char).  Clean "
    "rows must pass through untouched (repaired=false, delta=0) — the "
    "no-false-positive half of the contract a web-corpus pipeline "
    "depends on.",
    tags=("text", "cleanse", "bench"),
    bench=True,
)
def moji(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.textstats import fix_mojibake

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"]).select(
        "doc_id", "text"
    )
    planted = F.pmod("doc_id", F.lit(3)) == 0
    broken = F.when(
        planted, F.concat("text", F.lit(" cafÃ© naÃ¯ve"))
    ).otherwise(F.col("text"))
    out = docs.select(
        "doc_id", planted.alias("planted"), broken.alias("_b"),
        fix_mojibake(broken).alias("_f"),
    )
    return out.select(
        "doc_id",
        "planted",
        (F.col("_f") != F.col("_b")).alias("repaired"),
        (F.length("_b") - F.length("_f")).cast("long").alias("chars_recovered"),
    )
