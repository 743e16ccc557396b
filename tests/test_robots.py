"""robots.txt gate: RFC 9309 parsing semantics (group selection,
most-specific wins, Allow ties, wildcards/anchors), the Spark rule
table + URL filter, and the corpus-never-shuffles plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from yodel_etl_spark.scale.robots import (
    filter_disallowed,
    parse_robots,
    robots_rules,
    rule_pattern,
)

RFC_EXAMPLE = """
# comment
User-agent: *
Disallow: /private/
Allow: /private/public.html
Disallow: /tmp/$
Disallow: /downloads/*.pdf

User-agent: googlebot
User-agent: bingbot
Disallow: /shared-block/
"""


def test_parse_group_selection():
    star = parse_robots(RFC_EXAMPLE, "*")
    assert ("/private/" in {p for _, p, _ in star})
    goog = parse_robots(RFC_EXAMPLE, "googlebot")
    assert {p for _, p, _ in goog} == {"/shared-block/"}
    bing = parse_robots(RFC_EXAMPLE, "bingbot")
    assert {p for _, p, _ in bing} == {"/shared-block/"}
    # unknown agent falls back to the * group
    other = parse_robots(RFC_EXAMPLE, "yodelbot")
    assert ("/private/" in {p for _, p, _ in other})


def test_group_token_matching_is_one_directional():
    """RFC 9309 product-token semantics: group `googlebot-images` must
    NOT govern agent `googlebot` (the old bidirectional substring test
    let it win via longest-wins); agent `googlebot-news` DOES match
    group `googlebot` (token contained in agent name)."""
    txt = """
User-agent: googlebot-images
Disallow: /images-only/

User-agent: googlebot
Disallow: /goog/
"""
    goog = {p for _, p, _ in parse_robots(txt, "googlebot")}
    assert goog == {"/goog/"}
    imgs = {p for _, p, _ in parse_robots(txt, "googlebot-images")}
    assert imgs == {"/images-only/"}  # longest matching token wins
    news = {p for _, p, _ in parse_robots(txt, "googlebot-news")}
    assert news == {"/goog/"}


def test_multiple_matching_groups_merge():
    """RFC 9309 §2.1: every group matching the governing token combines
    into one rule set — two separate `googlebot` groups both apply, and
    multiple `*` groups merge for the fallback too."""
    txt = """
User-agent: googlebot
Disallow: /a/

User-agent: *
Disallow: /star1/

User-agent: googlebot
Disallow: /b/

User-agent: *
Disallow: /star2/
"""
    goog = {p for _, p, _ in parse_robots(txt, "googlebot")}
    assert goog == {"/a/", "/b/"}
    star = {p for _, p, _ in parse_robots(txt, "someotherbot")}
    assert star == {"/star1/", "/star2/"}


def test_parse_empty_disallow_and_blank_file():
    assert parse_robots("User-agent: *\nDisallow:") == []
    assert parse_robots("") == []
    assert parse_robots("User-agent: x\nDisallow: /a") == []  # no * group


def test_rule_pattern_compilation():
    assert rule_pattern("/a/b") == "^/a/b"
    assert rule_pattern("/tmp/$") == "^/tmp/$"
    assert rule_pattern("/d/*.pdf") == "^/d/.*\\.pdf"
    assert rule_pattern("/x+y?") == "^/x\\+y\\?"  # regex metachars escaped


def _decide(rules, path):
    """Single-process twin of the fold: most-specific wins, Allow wins
    ties, no match => allowed."""
    import re

    best = (-1, True)
    for allow, prefix, spec in rules:
        if re.match(rule_pattern(prefix), path):
            if spec > best[0] or (spec == best[0] and allow and not best[1]):
                best = (spec, allow)
    return best[1]


DECISION_CASES = [
    ("/private/secret.html", False),
    ("/private/public.html", True),   # longer Allow overrides
    ("/public/x", True),              # no matching rule
    ("/tmp/", False),                 # $-anchored exact
    ("/tmp/file", True),              # anchor does not match deeper path
    ("/downloads/a.pdf", False),      # wildcard
    ("/downloads/a.txt", True),
]


def test_decision_twin_on_rfc_example():
    rules = parse_robots(RFC_EXAMPLE, "*")
    for path, want in DECISION_CASES:
        assert _decide(rules, path) == want, path


@pytest.fixture(scope="module")
def rule_df(spark):
    robots = spark.createDataFrame(
        [("site.com", RFC_EXAMPLE), ("open.org", "User-agent: *\nDisallow:")],
        ["host", "robots_txt"],
    )
    return robots_rules(robots).persist()


def test_robots_rules_table(rule_df):
    rows = {(r["host"], r["allow"], r["prefix"]) for r in rule_df.collect()}
    assert ("site.com", False, "/private/") in rows
    assert ("site.com", True, "/private/public.html") in rows
    assert not any(h == "open.org" for h, _, _ in rows)  # empty Disallow


def test_filter_disallowed_golden(spark, rule_df):
    urls = spark.createDataFrame(
        [(f"https://site.com{p}",) for p, _ in DECISION_CASES]
        + [("https://open.org/anything",), ("https://unknown.net/x",)],
        ["url"],
    )
    kept = {r["url"] for r in filter_disallowed(urls, rule_df).collect()}
    for path, want in DECISION_CASES:
        assert ((f"https://site.com{path}") in kept) == want, path
    assert "https://open.org/anything" in kept  # host with zero rules
    assert "https://unknown.net/x" in kept      # unmatched host kept


def test_filter_allowlist_mode_drops_unmatched(spark, rule_df):
    urls = spark.createDataFrame(
        [("https://unknown.net/x",), ("https://site.com/public/ok",)], ["url"]
    )
    kept = {
        r["url"]
        for r in filter_disallowed(
            urls, rule_df, keep_unmatched_hosts=False
        ).collect()
    }
    assert kept == {"https://site.com/public/ok"}


def test_filter_preserves_caller_host_column(spark, rule_df):
    """A caller-supplied `host` column on the URLs side must survive the
    filter: only the rules side's join key is dropped (drop-by-name
    would silently clobber both)."""
    urls = spark.createDataFrame(
        [("https://site.com/public/x", "my-upstream-host"),
         ("https://site.com/private/x", "blocked-host")],
        ["url", "host"],
    )
    out = filter_disallowed(urls, rule_df)
    assert out.columns == ["url", "host"]
    rows = {(r["url"], r["host"]) for r in out.collect()}
    assert rows == {("https://site.com/public/x", "my-upstream-host")}


def test_robots_from_warc_signature_annotations_resolve():
    """robots_from_warc annotates SparkSession — a missing import is a
    latent NameError under typing.get_type_hints."""
    import typing

    from yodel_etl_spark.scale import robots as mod

    hints = typing.get_type_hints(mod.robots_from_warc)
    assert hints["spark"].__name__ == "SparkSession"


def test_filter_preserves_columns_and_never_shuffles_corpus(spark, rule_df):
    urls = spark.createDataFrame(
        [("https://site.com/public/x", 7)], ["url", "payload"]
    )
    out = filter_disallowed(urls, rule_df)
    assert out.columns == ["url", "payload"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # the only hash exchange is the rule-table groupBy — the URL side
    # must not shuffle
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "CartesianProduct" not in plan


def test_query_string_is_part_of_the_matched_path(spark, rule_df):
    """RFC 9309 matches against path + query; a Disallow on /private/
    must also block /private/x?download=1."""
    urls = spark.createDataFrame(
        [("https://site.com/private/x?download=1",)], ["url"]
    )
    assert filter_disallowed(urls, rule_df).count() == 0


def test_robots_from_warc_chain(spark, tmp_path):
    """Politeness rules off the same container bytes as the corpus: a
    WARC holding two robots.txt fetches for one host (newest wins), one
    for another, a 404 robots fetch (ignored), and ordinary pages
    (ignored) → rule table → URL filter."""
    from yodel_etl_spark.io.warc import write_warc
    from yodel_etl_spark.scale.robots import robots_from_warc

    recs = [
        {"url": "https://site.com/robots.txt", "ts": "2024-01-01T00:00:00Z",
         "payload": b"User-agent: *\nDisallow: /old/"},
        {"url": "https://site.com/robots.txt", "ts": "2024-02-01T00:00:00Z",
         "payload": b"User-agent: *\nDisallow: /new/"},
        {"url": "http://other.org/robots.txt", "ts": "2024-01-05T00:00:00Z",
         "payload": b"User-agent: *\nDisallow: /x"},
        {"url": "https://gone.net/robots.txt", "ts": "2024-01-01T00:00:00Z",
         "payload": b"User-agent: *\nDisallow: /", "status": 404},
        {"url": "https://site.com/page.html", "ts": "2024-01-01T00:00:00Z",
         "payload": b"<html>User-agent: decoy</html>"},
    ]
    p = str(tmp_path / "robots.warc.gz")
    write_warc(recs, p)

    rules = robots_from_warc(spark, p)
    got = {(r["host"], r["prefix"]) for r in rules.collect()}
    # newest site.com fetch wins; the 404 host contributes nothing;
    # the HTML page is not parsed as robots
    assert got == {("site.com", "/new/"), ("other.org", "/x")}

    urls = spark.createDataFrame(
        [("https://site.com/old/a",), ("https://site.com/new/a",),
         ("https://gone.net/anything",)],
        ["url"],
    )
    kept = {r["url"] for r in filter_disallowed(urls, rules).collect()}
    assert kept == {"https://site.com/old/a", "https://gone.net/anything"}


def test_parse_robots_meta_groups_and_sitemaps():
    """Crawl-delay is group-scoped (governing group wins; merged groups
    take the MAX — the polite merge); Sitemap lines are file-global and
    deduped; malformed delays are ignored."""
    from yodel_etl_spark.scale.robots import parse_robots_meta

    txt = """
Sitemap: https://site.com/a.xml
User-agent: googlebot
Crawl-delay: 2.5
Disallow: /x

User-agent: *
Crawl-delay: 10
Sitemap: https://site.com/b.xml

User-agent: googlebot
Crawl-delay: 4
Sitemap: https://site.com/a.xml
"""
    assert parse_robots_meta(txt, "googlebot") == (
        4.0,  # two merged googlebot groups: max(2.5, 4)
        ["https://site.com/a.xml", "https://site.com/b.xml"],
    )
    assert parse_robots_meta(txt, "otherbot")[0] == 10.0
    assert parse_robots_meta("User-agent: *\nCrawl-delay: soon", "x") == (None, [])
    assert parse_robots_meta("", "x") == (None, [])
    # one-directional matching holds for meta too
    txt2 = "User-agent: googlebot-images\nCrawl-delay: 9\nUser-agent: *\nCrawl-delay: 1\nDisallow: /x"
    assert parse_robots_meta(txt2, "googlebot")[0] == 1.0


def test_robots_meta_frame(spark):
    from yodel_etl_spark.scale.robots import robots_meta

    robots = spark.createDataFrame(
        [
            ("site.com", "User-agent: *\nCrawl-delay: 3\nDisallow: /p\nSitemap: https://site.com/s.xml"),
            ("open.org", "User-agent: *\nDisallow:"),
        ],
        ["host", "robots_txt"],
    )
    got = {r["host"]: (r["crawl_delay"], r["sitemaps"]) for r in robots_meta(robots).collect()}
    assert got["site.com"] == (3.0, "https://site.com/s.xml")
    assert got["open.org"] == (None, "")


def test_rule_and_meta_parsers_partition_groups_identically():
    """A Crawl-delay interposed between user-agent lines must split
    groups the SAME way in both parsers: agent `a` gets its own group
    (delay 10, no rules), `b` gets the Disallow — the rules gate and
    the politeness table must never disagree about group membership."""
    from yodel_etl_spark.scale.robots import parse_robots, parse_robots_meta

    txt = "User-agent: a\nCrawl-delay: 10\nUser-agent: b\nDisallow: /x"
    assert {p for _, p, _ in parse_robots(txt, "a")} == set()
    assert {p for _, p, _ in parse_robots(txt, "b")} == {"/x"}
    assert parse_robots_meta(txt, "a")[0] == 10.0
    assert parse_robots_meta(txt, "b")[0] is None
