"""Hyperlink extraction/resolution: extraction goldens, RFC-lite
resolution goldens (incl. dot-segment clamping), byte-for-byte DuckDB
parity for every twin, the host-grain edge op, and the edge→pagerank
chain that makes the crawl→graph quality prior end-to-end."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.links import (
    extract_hrefs,
    extract_hrefs_sql,
    host_of,
    host_of_sql,
    link_edges,
    resolve_href,
    resolve_href_sql,
)

BASE = "https://www.Example.com:443/a/b/page.html?x=1#top"

RESOLVE_CASES = [
    # (href, expected absolute URL or None)
    ("http://other.com/x", "http://other.com/x"),
    ("HTTPS://UPPER.com/y", "HTTPS://UPPER.com/y"),  # kept as-is; canon later
    ("//cdn.net/lib.js", "https://cdn.net/lib.js"),
    ("/rooted/p", "https://www.Example.com:443/rooted/p"),
    ("rel/p", "https://www.Example.com:443/a/b/rel/p"),
    ("../up", "https://www.Example.com:443/a/up"),
    ("../../up2", "https://www.Example.com:443/up2"),
    ("../../../clamped", "https://www.Example.com:443/clamped"),  # past root
    ("./same/./d", "https://www.Example.com:443/a/b/same/d"),
    ("a/../b/../c", "https://www.Example.com:443/a/b/c"),
    ("..", "https://www.Example.com:443/a/"),  # /a/b/ + .. = /a/ (RFC 5.2.4)
    ("rel?q=2", "https://www.Example.com:443/a/b/rel?q=2"),
    ("rel#frag", "https://www.Example.com:443/a/b/rel#frag"),  # frag dropped later
    ("", None),
    ("#section", None),
    ("mailto:a@b.c", None),
    ("javascript:void(0)", None),
    ("data:text/plain,hi", None),
    ("ftp://host/file", None),
    ("tel:+1-555", None),
]

HTML = (
    '<html><body><a href="http://x.com/1">a</a>'
    "<A HREF='http://y.com/2'>b</A>"
    '<a class="c" href="/three">c</a>'
    "<a name=anchor>no href</a>"
    '<area href="http://not-an-anchor.com/">'
    '<a\nhref="http://multi.line/4">d</a></body></html>'
)


def test_extract_hrefs_golden(spark):
    row = (
        spark.range(1)
        .select(extract_hrefs(F.lit(HTML)).alias("h"))
        .collect()[0]["h"]
    )
    # double-quoted pass first (doc order), then single-quoted
    assert row == ["http://x.com/1", "/three", "http://multi.line/4", "http://y.com/2"]


def test_extract_hrefs_duckdb_parity(spark):
    got = duckdb.connect().execute(
        f"SELECT {extract_hrefs_sql('h')} FROM (SELECT ? AS h)", [HTML]
    ).fetchone()[0]
    want = (
        spark.range(1)
        .select(extract_hrefs(F.lit(HTML)).alias("h"))
        .collect()[0]["h"]
    )
    assert list(got) == want


@pytest.fixture(scope="module")
def resolved(spark):
    df = spark.createDataFrame(
        [(BASE, h) for h, _ in RESOLVE_CASES], ["base", "href"]
    )
    rows = df.select(
        "href", resolve_href(F.col("base"), F.col("href")).alias("r")
    ).collect()
    return {r["href"]: r["r"] for r in rows}


def test_resolve_goldens(resolved):
    for href, want in RESOLVE_CASES:
        assert resolved[href] == want, href


def test_resolve_duckdb_parity(resolved):
    con = duckdb.connect()
    expr = resolve_href_sql("base", "href")
    for href, _ in RESOLVE_CASES:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS base, ? AS href)", [BASE, href]
        ).fetchone()[0]
        assert got == resolved[href], href


def test_resolve_no_scheme_base_is_null(spark):
    out = (
        spark.createDataFrame([("relative/base", "x/y")], ["base", "href"])
        .select(resolve_href(F.col("base"), F.col("href")).alias("r"))
        .collect()[0]["r"]
    )
    assert out is None


HOST_CASES = [
    ("https://User:p@WWW.Host.COM:8443/p?q#f", "www.host.com"),
    ("http://plain.org", "plain.org"),
    ("http://h.io:80/", "h.io"),
    ("no-scheme/path", ""),
]


def test_host_of_goldens_and_parity(spark):
    df = spark.createDataFrame([(u,) for u, _ in HOST_CASES], ["u"])
    rows = {r["u"]: r["h"] for r in df.select("u", host_of(F.col("u")).alias("h")).collect()}
    con = duckdb.connect()
    for u, want in HOST_CASES:
        assert rows[u] == want, u
        got = con.execute(
            f"SELECT {host_of_sql('u')} FROM (SELECT ? AS u)", [u]
        ).fetchone()[0]
        assert got == want, u


def _pages(spark):
    return spark.createDataFrame(
        [
            (
                "https://a.org/idx.html",
                '<a href="https://b.org/1">.</a><a href="https://b.org/2">.</a>'
                '<a href="/self">.</a><a href="mailto:x@y">.</a>',
            ),
            (
                "https://b.org/page",
                "<a href='//c.net/x'>.</a><a href='../rel'>.</a>",
            ),
        ],
        ["url", "html"],
    )


def test_link_edges_golden(spark):
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in link_edges(_pages(spark)).collect()
    }
    assert got == {
        ("a.org", "b.org"): 2,
        ("a.org", "a.org"): 1,
        ("b.org", "c.net"): 1,
        ("b.org", "b.org"): 1,
    }


def test_link_edges_drop_self(spark):
    got = {
        (r["src_host"], r["dst_host"]): r["weight"]
        for r in link_edges(_pages(spark), drop_self=True).collect()
    }
    assert got == {("a.org", "b.org"): 2, ("b.org", "c.net"): 1}


def test_edges_feed_pagerank_end_to_end(spark):
    """The chain the module exists for: pages → host edges → pagerank.
    The cross-host graph is the chain a.org → b.org → c.net, so rank
    accumulates down the chain (r_b = t + d·r_a ⇒ r_b − r_a = d·r_a > 0,
    and symmetrically for c); ranks sum to 1."""
    from yodel_etl_spark.scale.graph import pagerank

    edges = link_edges(_pages(spark), drop_self=True)
    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "src_host", "dst_host", tol=1e-10).collect()
    }
    assert set(ranks) == {"a.org", "b.org", "c.net"}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks["c.net"] > ranks["b.org"] > ranks["a.org"] > 0


def test_link_edges_plan_one_exchange(spark):
    """Extraction/resolution stay scan-side: the host-grain plan has
    exactly the ONE aggregation Exchange and no CartesianProduct."""
    plan = link_edges(_pages(spark))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------ anchor text


ANCHOR_HTML = (
    '<a href="http://x.com/1" class="z">First Link</a>'
    "<a href='/two' rel=nofollow>Second <b>bold</b></a>"
    '<a href="http://x.com/1">First&nbsp;Link</a>'
    '<a href="http://img.com/i"><img src="p.png"/></a>'  # empty after strip
    '<a href="mailto:x@y">mail me</a>'
)


def test_extract_anchors_zip_golden_and_parity(spark):
    from yodel_etl_spark.scale.links import ANCHOR_DQ_RE, ANCHOR_SQ_RE, extract_anchors

    got = (
        spark.range(1)
        .select(extract_anchors(F.lit(ANCHOR_HTML)).alias("a"))
        .collect()[0]["a"]
    )
    pairs = [(r["href"], r["atext"]) for r in got]
    assert pairs == [
        ("http://x.com/1", "First Link"),
        ("http://x.com/1", "First&nbsp;Link"),
        ("http://img.com/i", '<img src="p.png"/>'),
        ("mailto:x@y", "mail me"),
        ("/two", "Second <b>bold</b>"),
    ]
    # DuckDB zips parallel unnests positionally — the oracle formulation
    con = duckdb.connect()
    for pat in (ANCHOR_DQ_RE, ANCHOR_SQ_RE):
        sql = (
            "SELECT unnest(regexp_extract_all(h, ?, 1)),"
            " unnest(regexp_extract_all(h, ?, 2)) FROM (SELECT ? AS h)"
        )
        rows = con.execute(sql, [pat, pat, ANCHOR_HTML]).fetchall()
        spark_rows = [
            p for p in pairs
            if (pat == ANCHOR_DQ_RE) == (p in pairs[:4])
        ]
        assert rows == spark_rows, pat


def test_anchor_text_table_golden(spark):
    from yodel_etl_spark.scale.links import anchor_text_table

    pages = spark.createDataFrame(
        [
            ("https://a.org/idx", ANCHOR_HTML),
            ("https://b.org/p", '<a href="//x.com/1?utm_source=s">First Link</a>'),
        ],
        ["url", "html"],
    )
    got = {
        (r["dst_host"], r["anchor"]): r["n"]
        for r in anchor_text_table(pages).collect()
    }
    # mailto dropped; empty-after-strip image anchor dropped; entities
    # decoded by html_extract; counts aggregate across pages/variants
    assert got == {
        ("x.com", "First Link"): 3,
        ("a.org", "Second bold"): 1,
    }


def test_anchor_table_plan_one_exchange(spark):
    from yodel_etl_spark.scale.links import anchor_text_table

    pages = spark.createDataFrame([("https://a.org/", ANCHOR_HTML)], ["url", "html"])
    plan = anchor_text_table(pages)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "CartesianProduct" not in plan


def test_html_extract_sql_twin_parity(spark):
    """html_extract_sql must reduce inner markup byte-identically to
    the Spark chain — the assembled `anchor` oracle rides on it."""
    cases = [
        "Visit <b>Site 3</b> now",
        "asset &amp; more",
        'rel &quot;2&quot;',
        '<img src="p.png"/>',
        "a < b &gt; c &nbsp; d &#39;q&#39;",
        "<script>x</script>keep<style>s</style> tail",
        "  spaced   <i>out</i>  ",
    ]
    from yodel_etl_spark.scale.textstats import html_extract, html_extract_sql

    got = [
        r["e"]
        for r in spark.createDataFrame([(c,) for c in cases], ["h"])
        .select(html_extract(F.col("h")).alias("e"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {html_extract_sql('h')} FROM (SELECT ? AS h)", [c]
        ).fetchone()[0]
        for c in cases
    ]
    assert got == want
