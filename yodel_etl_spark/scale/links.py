"""Hyperlink extraction + resolution — the edge PRODUCER for the link
graph: :mod:`yodel_etl_spark.scale.graph` ranks hosts by PageRank over a
``(src, dst)`` edge list, and this module is the step that turns raw
crawled HTML into that edge list (``read_warc`` → ``extract_hrefs`` →
``resolve_href`` → ``canonical_url`` → host-grain ``link_edges`` →
``pagerank``).  Without it the centrality prior has no input; with it
the crawl→graph→quality-prior chain is end-to-end.

Scale shape: extraction and resolution are pure codegen regexp/string
chains in the RE2 ∩ Java-regex dialect (the redact/html_extract/urlnorm
portability rule — NO lookaround, so the DuckDB twins run the IDENTICAL
patterns), evaluated scan-side before the one explode (``Generate``,
bounded by links-per-page) and ONE aggregation shuffle at host grain —
host cardinality is millions where page cardinality is billions, so the
shuffle is the small side of the job by construction.

Resolution semantics (RFC 3986 §5-lite, the conservative crawler core):
absolute ``http(s)://`` kept as-is; any other explicit scheme
(``mailto:``, ``javascript:``, ``data:``, ``ftp:``) dropped;
protocol-relative ``//host/…`` takes the base scheme; root-relative
``/p`` takes the base origin; everything else joins the base directory.
Dot segments (``./``, ``../``) are removed by a bounded fixed-point of
codegen replaces — nesting deeper than :data:`DOT_PASSES` is left
unreduced (crawl hrefs do not nest that deep; the bound is what makes
the chain loop-free and oracle-translatable), and ``..`` past the root
clamps to the root per the RFC.  Fragments survive resolution and are
dropped by :func:`~yodel_etl_spark.scale.urlnorm.canonical_url`
downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: href extraction, one pattern per quote style (two capture-group-1
#: passes instead of one alternation so the group index stays 1 in both
#: engines); ``<a\b`` keeps <area>/<abbr> out, ``[^>]*?`` stays inside
#: the tag
HREF_DQ_RE = r'(?is)<a\b[^>]*?\bhref\s*=\s*"([^"]*)"'
HREF_SQ_RE = r"(?is)<a\b[^>]*?\bhref\s*=\s*'([^']*)'"

_SCHEME_HOST_RE = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
_BASE_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_SUFFIX_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*(.*)$"

#: fixed-point passes for dot-segment removal (each pass eliminates one
#: nesting level of ``../`` / ``./``); 8 covers any real href
DOT_PASSES = 8


def extract_hrefs(html: Column) -> Column:
    """``array<string>`` of raw href attribute values from anchor tags
    (double-quoted then single-quoted, each in document order)."""
    return F.concat(
        F.regexp_extract_all(html, F.lit(HREF_DQ_RE), 1),
        F.regexp_extract_all(html, F.lit(HREF_SQ_RE), 1),
    )


def _remove_dot_segments(path: Column) -> Column:
    p = path
    for _ in range(DOT_PASSES):
        p = F.regexp_replace(p, r"/\./", "/")
        p = F.regexp_replace(p, r"/[^/]+/\.\./", "/")
    p = F.regexp_replace(p, r"/\.$", "/")
    p = F.regexp_replace(p, r"/[^/]+/\.\.$", "/")
    # ``..`` that would climb past the root clamps to the root (RFC
    # 3986 §5.2.4 remove_dot_segments drops such segments).
    p = F.regexp_replace(p, r"^(/\.\.)+(/|$)", "/")
    # The whole chain is an identity on paths without a "/." substring
    # (every pattern requires one), so the common case — crawl hrefs
    # almost never carry dot segments — skips all ~19 regex ops behind
    # one substring probe.
    return F.when(path.contains("/."), p).otherwise(path)


def _resolve_raw(base: Column, href: Column) -> Column:
    """Stage 1 of resolution: the joined-but-unnormalized absolute URL
    (or NULL for empty/fragment-only/non-http hrefs and scheme-less
    bases).  Split from :func:`_finish_resolved` so a DataFrame
    pipeline can BIND this value once before the finish stage reads it
    several times — inlined, the tree gets re-evaluated per reference."""
    h = F.trim(href)
    scheme = F.regexp_extract(h, "^([A-Za-z][A-Za-z0-9+.-]*):", 1)
    base_scheme = F.lower(F.regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    origin = F.regexp_extract(base, _SCHEME_HOST_RE, 1)
    base_path = F.regexp_extract(base, _BASE_PATH_RE, 1)
    base_dir = F.when(base_path == "", F.lit("/")).otherwise(
        F.regexp_replace(base_path, "[^/]*$", "")
    )
    return (
        F.when(base_scheme == "", F.lit(None).cast("string"))
        .when((h == "") | h.startswith("#"), F.lit(None).cast("string"))
        .when(h.rlike("^(?i)https?://"), h)
        .when(scheme != "", F.lit(None).cast("string"))
        .when(h.startswith("//"), F.concat(base_scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.concat(origin, base_dir, h))
    )


def _finish_resolved(raw: Column) -> Column:
    """Stage 2 of resolution: split ``raw`` into origin/path/suffix,
    normalize dot segments, and rejoin.  NULL-transparent (``concat``
    is null if any part is null).  Pass a BOUND column when the input
    tree is large."""
    o2 = F.regexp_extract(raw, _SCHEME_HOST_RE, 1)
    p2 = F.regexp_extract(raw, _BASE_PATH_RE, 1)
    s2 = F.regexp_extract(raw, _SUFFIX_RE, 1)
    path = _remove_dot_segments(F.when(p2 == "", F.lit("/")).otherwise(p2))
    return F.concat(o2, path, s2)


def resolve_href(base: Column, href: Column) -> Column:
    """Absolute http(s) URL for ``href`` against page URL ``base``, or
    NULL when the href does not yield one (empty, fragment-only, or a
    non-http scheme like ``mailto:``).  See module docstring for the
    rule set; every expression is dialect-portable codegen.  For bulk
    pipelines prefer :func:`link_edges`, which binds the intermediate
    stages in their own projections."""
    return _finish_resolved(_resolve_raw(base, href))


def host_of(url: Column) -> Column:
    """Lowercased host of an absolute URL: userinfo and port stripped,
    '' when the value has no ``scheme://`` prefix."""
    hostport = F.lower(F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    return F.regexp_replace(F.regexp_replace(hostport, "^.*@", ""), ":[0-9]+$", "")


def link_edges(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    drop_self: bool = False,
) -> DataFrame:
    """``(src_host, dst_host, weight)`` host-grain edge list from pages:
    extract → resolve → canonicalize → host → ONE groupBy shuffle.
    ``weight`` counts resolved links (a page linking a host three times
    contributes 3 — ``pagerank`` treats duplicate edges as weighted; for
    the unweighted graph, drop the weight and ``distinct()``).  With
    ``drop_self`` intra-host links (the overwhelming majority on real
    sites, and rank-noise for a cross-host centrality prior) are
    filtered before the shuffle."""
    from yodel_etl_spark.scale.urlnorm import canonical_url
    from yodel_etl_spark.session import guarded_filter

    # src host is a PAGE-grain value: canonicalize the base once per
    # page, before the explode multiplies rows by links-per-page
    page_canon = df.select(
        F.col(url_col).alias("_base"),
        canonical_url(F.col(url_col)).alias("_src_canon"),
        F.col(html_col).alias("_html"),
    )
    staged = page_canon.select(
        host_of(F.col("_src_canon")).alias("src_host"),
        F.col("_base"),
        F.explode(extract_hrefs(F.col("_html"))).alias("_href"),
    )
    # Each stage binds its intermediate ONCE before the next consumes
    # it several times (canonical_url references its argument ~10×,
    # resolve_href is a large tree): inlined, the composed expression
    # multiplies out to thousands of regexp nodes and falls out of
    # whole-stage codegen; staged, CollapseProject keeps the
    # projections separate because the aliases are non-cheap and
    # multiply-referenced.  Measured on the registered links query at
    # sf0.1: 5.9 s inlined → staged is the plan this op ships with.
    raw0 = staged.select(
        "src_host", _resolve_raw(F.col("_base"), F.col("_href")).alias("_raw")
    )
    resolved0 = raw0.select(
        "src_host", _finish_resolved(F.col("_raw")).alias("_dst")
    )
    canon = resolved0.select(
        "src_host", canonical_url(F.col("_dst")).alias("_cd")
    )
    hosts = canon.select(
        "src_host",
        host_of(F.col("_cd")).alias("dst_host"),
    )
    # FENCED filter: a plain .where would push below the staged
    # projections, substituting the whole resolve/canonicalize chain
    # into the predicate — every row then pays the chain twice (the
    # curate signal-pass pathology; see session.guarded_filter)
    cond = F.col("dst_host").isNotNull() & (F.col("dst_host") != "")
    if drop_self:
        cond = cond & (F.col("src_host") != F.col("dst_host"))
    resolved = guarded_filter(hosts, cond)
    return resolved.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("weight")
    )


# ---------------------------------------------------------------- SQL twins


def _sq(pattern: str) -> str:
    """Escape a regex for embedding in a single-quoted SQL literal."""
    return pattern.replace("'", "''")


def extract_hrefs_sql(col: str) -> str:
    """DuckDB twin of :func:`extract_hrefs` (a list expression)."""
    return (
        f"list_concat(regexp_extract_all({col}, '{_sq(HREF_DQ_RE)}', 1),"
        f" regexp_extract_all({col}, '{_sq(HREF_SQ_RE)}', 1))"
    )


def _remove_dot_segments_sql(path: str) -> str:
    p = path
    for _ in range(DOT_PASSES):
        p = f"regexp_replace({p}, '/\\./', '/', 'g')"
        p = f"regexp_replace({p}, '/[^/]+/\\.\\./', '/', 'g')"
    p = f"regexp_replace({p}, '/\\.$', '/')"
    p = f"regexp_replace({p}, '/[^/]+/\\.\\.$', '/')"
    return f"regexp_replace({p}, '^(/\\.\\.)+(/|$)', '/')"


def resolve_raw_sql(base: str, href: str) -> str:
    """DuckDB twin of :func:`_resolve_raw` (stage 1)."""
    h = f"trim({href})"
    scheme = f"regexp_extract({h}, '^([A-Za-z][A-Za-z0-9+.-]*):', 1)"
    base_scheme = f"lower(regexp_extract({base}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    origin = f"regexp_extract({base}, '{_SCHEME_HOST_RE}', 1)"
    base_path = f"regexp_extract({base}, '{_BASE_PATH_RE}', 1)"
    base_dir = (
        f"(CASE WHEN {base_path} = '' THEN '/'"
        f" ELSE regexp_replace({base_path}, '[^/]*$', '') END)"
    )
    return (
        f"(CASE WHEN {base_scheme} = '' THEN NULL"
        f" WHEN {h} = '' OR {h} LIKE '#%' THEN NULL"
        f" WHEN regexp_matches({h}, '^(?i)https?://') THEN {h}"
        f" WHEN {scheme} <> '' THEN NULL"
        f" WHEN {h} LIKE '//%' THEN {base_scheme} || ':' || {h}"
        f" WHEN {h} LIKE '/%' THEN {origin} || {h}"
        f" ELSE {origin} || {base_dir} || {h} END)"
    )


def finish_resolved_sql(raw: str) -> str:
    """DuckDB twin of :func:`_finish_resolved` (stage 2) — bind ``raw``
    in a CTE when the stage-1 expression is large (the same reason the
    Spark pipeline binds it in its own projection)."""
    o2 = f"regexp_extract({raw}, '{_SCHEME_HOST_RE}', 1)"
    p2 = f"regexp_extract({raw}, '{_BASE_PATH_RE}', 1)"
    s2 = f"regexp_extract({raw}, '{_SUFFIX_RE}', 1)"
    path = _remove_dot_segments_sql(f"(CASE WHEN {p2} = '' THEN '/' ELSE {p2} END)")
    return f"({o2} || {path} || {s2})"


def resolve_href_sql(base: str, href: str) -> str:
    """DuckDB twin of :func:`resolve_href` — IDENTICAL patterns, CASE
    for CASE.  ``base``/``href`` are SQL expressions."""
    return finish_resolved_sql(resolve_raw_sql(base, href))


def host_of_sql(col: str) -> str:
    """DuckDB twin of :func:`host_of`."""
    hostport = (
        f"lower(regexp_extract({col}, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    )
    return (
        f"regexp_replace(regexp_replace({hostport}, '^.*@', ''), ':[0-9]+$', '')"
    )


#: anchor (href, inner-text) extraction, one pattern per quote style —
#: group 1 is the href, group 2 the inner markup up to the closing tag
ANCHOR_DQ_RE = r'(?is)<a\b[^>]*?\bhref\s*=\s*"([^"]*)"[^>]*>(.*?)</a>'
ANCHOR_SQ_RE = r"(?is)<a\b[^>]*?\bhref\s*=\s*'([^']*)'[^>]*>(.*?)</a>"


def extract_anchors(html: Column) -> Column:
    """``array<struct<href string, atext string>>`` of anchor tags with
    their inner markup (both quote styles, double-quoted pass first).
    The two capture groups are pulled by two ``regexp_extract_all``
    passes over the SAME pattern and zipped positionally — both engines
    enumerate matches in document order, so the zip is exact (pinned in
    tests/test_links.py)."""
    dq = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(ANCHOR_DQ_RE), 1).alias("href"),
        F.regexp_extract_all(html, F.lit(ANCHOR_DQ_RE), 2).alias("atext"),
    )
    sq = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(ANCHOR_SQ_RE), 1).alias("href"),
        F.regexp_extract_all(html, F.lit(ANCHOR_SQ_RE), 2).alias("atext"),
    )
    return F.concat(dq, sq)


def anchor_text_table(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """``(dst_host, anchor, n)`` — how the web DESCRIBES each target:
    the anchor-text aggregate retrieval pipelines mine for weak
    (query, document) supervision and crawlers use as an off-page
    relevance signal (the text OTHER pages put on their links to you is
    a better summary than your own boilerplate).  Inner markup is
    reduced to clean text by the same ``html_extract`` chain the corpus
    path uses (tags stripped, entities decoded, whitespace collapsed);
    empty anchors (image links) drop.

    Same scale shape as :func:`link_edges` — staged scan-side codegen,
    one explode bounded by anchors-per-page, ONE aggregation shuffle at
    (host, anchor) grain."""
    from yodel_etl_spark.scale.textstats import html_extract
    from yodel_etl_spark.scale.urlnorm import canonical_url
    from yodel_etl_spark.session import guarded_filter

    staged = df.select(
        F.col(url_col).alias("_base"),
        F.explode(extract_anchors(F.col(html_col))).alias("_a"),
    )
    raw0 = staged.select(
        F.col("_a.atext").alias("_atext"),
        _resolve_raw(F.col("_base"), F.col("_a.href")).alias("_raw"),
    )
    resolved0 = raw0.select(
        "_atext", _finish_resolved(F.col("_raw")).alias("_dst")
    )
    canon = resolved0.select(
        "_atext", canonical_url(F.col("_dst")).alias("_cd")
    )
    cleaned = canon.select(
        host_of(F.col("_cd")).alias("dst_host"),
        html_extract(F.col("_atext")).alias("anchor"),
    )
    kept = guarded_filter(
        cleaned,
        F.col("dst_host").isNotNull()
        & (F.col("dst_host") != "")
        & (F.col("anchor") != ""),
    )
    return kept.groupBy("dst_host", "anchor").agg(
        F.count(F.lit(1)).alias("n")
    )
