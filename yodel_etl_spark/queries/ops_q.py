"""Operator bindings for the funnel walk, the keyed table diff, and the
end-to-end crawl-curation chain.

``funnel`` is oracle-backed (tier 3: it yields its driver-window slot to
the established queries; parity also pinned by the join-chain oracle in
tests/test_funnel.py).  ``tdiff``/``xspan``/``anchor`` flipped to
oracle-backed (tier 4) in round 12 per the staged recipe in
tools/r12_oracle_flip.md — the counter-11 window simulation and both-SF
DuckDB parity were pinned in tests/test_r12_flip.py a round before the
wire-up.  ``crawl`` stays rows-only: it composes container ingest, the
robots gate, curation, link extraction and PageRank, whose iterative
core is not a single SQL statement.
"""

from __future__ import annotations

import atexit
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yodel_etl_spark.ops.funnel import funnel_oracle_sql, funnel_steps
from yodel_etl_spark.registry import register
from yodel_etl_spark.session import load_tables

_STEPS = ("view", "click", "purchase")

_FUNNEL_ORACLE = (
    "SELECT key AS user_id, t1, t2, t3, stage FROM ("
    + funnel_oracle_sql("events", "user_id", "ts", "event_type", _STEPS)
    + ")"
)


@register(
    "funnel",
    oracle=_FUNNEL_ORACLE,
    doc="Funnel / ordered-sequence match (view → click → purchase) per "
    "user over the event log: ONE shuffle (groupBy user after a step-"
    "type pre-filter), per-key sorted event array walked by a codegen "
    "aggregate lambda whose state is the (t1..t3) vector — each t_i the "
    "MINIMUM ts of step i strictly after t_{i-1}.  The oracle is the "
    "textbook k-pass join-chain (k scans + k joins), which is exactly "
    "the plan shape this operator exists to avoid at 100 TB.  Tier 3: "
    "yields its driver-window slot; parity also pinned in "
    "tests/test_funnel.py.",
    tags=("events", "ops", "funnel"),
    bench=True,
    tier=3,
)
def funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    out = funnel_steps(
        t["events"], "user_id", "ts", "event_type", _STEPS, tiebreak_col="event_id"
    )
    return out.select(F.col("key").alias("user_id"), "t1", "t2", "t3", "stage")


# Staged round-12 oracle for `tdiff` (see tools/r12_oracle_flip.md):
# executable NOW via tests/test_r12_flip.py (DuckDB parity against the
# registered builder at sf0.001 AND sf0.01), wired as `oracle=` only in
# round 12 when the rotation-window arithmetic admits two insertions
# without evicting a never-windowed query.  Mirrors the builder above
# it exactly: old = customers minus %11==3, new = customers minus
# %13==5 with %7==0 acctbal bumped (round to 2) and %17==0 segment
# migrated; unchanged rows dropped; changed_cols is the sorted
# comma-joined null-safe difference list.
TDIFF_ORACLE = """
WITH o AS (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment
  FROM customer WHERE c_custkey % 11 <> 3
), n AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 7 = 0 THEN round(c_acctbal + 10.0, 2)
              ELSE c_acctbal END AS c_acctbal,
         CASE WHEN c_custkey % 17 = 0 THEN 'MIGRATED'
              ELSE c_mktsegment END AS c_mktsegment
  FROM customer WHERE c_custkey % 13 <> 5
)
SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
       CASE WHEN o.c_custkey IS NULL THEN 'added'
            WHEN n.c_custkey IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       CASE WHEN o.c_custkey IS NULL OR n.c_custkey IS NULL THEN ''
            ELSE array_to_string(list_sort(list_filter(
              [CASE WHEN o.c_name       IS DISTINCT FROM n.c_name       THEN 'c_name' END,
               CASE WHEN o.c_acctbal    IS DISTINCT FROM n.c_acctbal    THEN 'c_acctbal' END,
               CASE WHEN o.c_mktsegment IS DISTINCT FROM n.c_mktsegment THEN 'c_mktsegment' END],
              x -> x IS NOT NULL)), ',') END AS changed_cols
FROM o FULL OUTER JOIN n ON o.c_custkey = n.c_custkey
WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
   OR o.c_name IS DISTINCT FROM n.c_name
   OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
   OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
"""


@register(
    "tdiff",
    oracle=TDIFF_ORACLE,  # flipped on in round 12 per the staged recipe
    # (tools/r12_oracle_flip.md): parity pinned at both SFs by
    # tests/test_r12_flip.py before the wire-up; tier 4 appends it at
    # the end of the oracle block, the placement the counter-11 window
    # simulation assumes
    tier=4,
    doc="Keyed table diff between two deterministic customer snapshots "
    "(keys dropped on either side, acctbal bumped on a residue class, "
    "segment migrated on another): ONE co-partitioned full-outer join "
    "on the key, per-row classification added/removed/changed plus the "
    "comma-joined changed-column list from null-safe comparisons — "
    "pure column algebra, no window, no second pass.  DuckDB parity "
    "and the diff∘apply identity are pinned in tests/test_diff.py.",
    tags=("ops", "cdc", "diff"),
)
def tdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.ops.diff import table_diff

    t = load_tables(spark, sf_dir)
    cust = t["customer"].select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    old = cust.where(F.col("c_custkey") % 11 != 3)
    new = (
        cust.where(F.col("c_custkey") % 13 != 5)
        .withColumn(
            "c_acctbal",
            F.when(
                F.col("c_custkey") % 7 == 0, F.round(F.col("c_acctbal") + 10.0, 2)
            ).otherwise(F.col("c_acctbal")),
        )
        .withColumn(
            "c_mktsegment",
            F.when(F.col("c_custkey") % 17 == 0, F.lit("MIGRATED")).otherwise(
                F.col("c_mktsegment")
            ),
        )
    )
    return table_diff(old, new, ["c_custkey"])


# Staged round-12 oracle for `xspan` (tools/r12_oracle_flip.md; pinned
# executable by tests/test_r12_flip.py).  Tokenization mirrors
# duplicated_spans EXACTLY: split on a literal single space with
# empties KEPT (`string_split(text, ' ')` ≡ Spark `split(text, " ")`),
# NOT a \s+ filtered split — the digest need not match (positions are
# re-derived independently) but the token grid must.  The reprint body
# mirrors the builder: DuckDB 1-based inclusive tk[10:40] ≡ Spark
# slice(tk, 10, 31) = elements 10..40.
XSPAN_ORACLE = """
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id,
         'reprint of ' || CAST(doc_id AS VARCHAR) || ' begins ' ||
         array_to_string(string_split(text, ' ')[10:40], ' ') ||
         ' ends here' AS text
  FROM documents WHERE doc_id % 10 = 0
), tok AS (
  SELECT doc_id, string_split(text, ' ') AS tk FROM base
), anch AS (
  SELECT doc_id, u.p - 1 AS pos,
         md5(array_to_string(tk[u.p : u.p + 7], ' ')) AS h
  FROM tok, UNNEST(generate_series(1, len(tk) - 7)) AS u(p)
  WHERE len(tk) >= 8
), dup AS (
  SELECT h FROM anch GROUP BY h HAVING count(*) > 1
), runs AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM anch WHERE h IN (SELECT h FROM dup)
)
SELECT doc_id, CAST(min(pos) AS BIGINT) AS start,
       CAST(max(pos) - min(pos) + 8 AS BIGINT) AS length
FROM runs GROUP BY doc_id, grp
"""


@register(
    "xspan",
    oracle=XSPAN_ORACLE,  # flipped on in round 12 (tools/
    # r12_oracle_flip.md) — the single-space-with-empties tokenization
    # twin, parity pinned at both SFs by tests/test_r12_flip.py
    tier=4,
    doc="Exact-substring duplicate spans, the suffix-array move of Lee "
    "et al. 2022 §4.1 reformulated for a 1000-executor plan (no global "
    "suffix sort): every position emits its k-token anchor digest, "
    "duplicated digests mark duplicated positions, and maximal runs of "
    "consecutive duplicated positions are the maximal spans — every "
    "k-window inside a reported span occurs verbatim elsewhere in the "
    "corpus.  Alignment-free complement of dedup_spans' C4 lattice.  "
    "Corpus: documents plus planted reprints (every 10th doc's tokens "
    "10..40 embedded in a fresh doc) so found spans are guaranteed and "
    "checkable.  Shuffles carry (id, pos, 16-byte digest) — text never "
    "leaves its scan partition; the run window sees only duplicated "
    "positions.",
    tags=("dedup", "scale", "text"),
    bench=True,
)
def xspan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.dedup import duplicated_spans

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "text")
    src = docs.where(F.col("doc_id") % 10 == 0)
    reprint_body = F.concat(
        F.lit("reprint of "),
        F.col("doc_id").cast("string"),
        F.lit(" begins "),
        F.array_join(F.slice(F.split(F.col("text"), " "), 10, 31), " "),
        F.lit(" ends here"),
    )
    reprints = src.select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        reprint_body.alias("text"),
    )
    corpus = docs.unionByName(reprints)
    return duplicated_spans(corpus, "doc_id", "text", k=8)


# ---------------------------------------------------------------- crawl

#: ~100-word vocabulary: page bodies sample it with coprime strides so
#: n-gram repetition stays under the curate caps (the 24-word warc bank
#: cycles every 8 words under its stride — Gopher-style repetition
#: filters would drop every page)
_VOCAB = [
    f"{w}{d}"
    for w in (
        "key agg row scan slow fast table value part hash batch window "
        "spark order data column join small group sort stream filter merge"
    ).split()
    for d in ("", "er", "ing", "ed")
] + ["the"]

_N_HOSTS = 5
_N_PAGES = 240


def _crawl_page(i: int) -> str:
    """Deterministic page ``i``: body of 80 vocab words (coprime stride
    → low n-gram repetition, passes curate), three hyperlinks (cross-
    host absolute, same-host root-relative, cross-host with tracking
    params to canonicalize away), plus a mailto that must drop.  Every
    9th page is a repetition-spam page curate must reject."""
    k = i % _N_HOSTS
    if i % 9 == 0:
        body = " ".join(["buy now best price"] * 30)
    else:
        # every third word is a common English function word so the
        # n-gram language heuristic reads the page as `en` — an
        # all-jargon body classifies `und` and curate would drop it
        stop = "the and of to in is for with that on this from".split()
        body = " ".join(
            stop[(i + j) % len(stop)]
            if j % 3 == 0
            else _VOCAB[(i * 13 + j * 7 + (j * j) % 11) % len(_VOCAB)]
            for j in range(80)
        )
    nxt = (k + 1) % _N_HOSTS
    trk = (k + 2) % _N_HOSTS
    return (
        f"<html><head><title>doc {i}</title></head><body>"
        f"<p>{body}</p>"
        f'<a href="https://h{nxt}.example.org/page/p{(i + 1) % _N_PAGES}">n</a>'
        f'<a href="/page/p{(i + 3) % _N_PAGES}">s</a>'
        f'<a href="http://h{trk}.example.org:80/page/p{(i + 5) % _N_PAGES}'
        f'?utm_source=x&b=2">t</a>'
        '<a href="https://h0.example.org/page/p0">h</a>'  # hub: every
        # page links h0, so the rank prior is non-uniform by design
        '<a href="mailto:a@b.c">m</a>'
        "</body></html>"
    )


_CRAWL_DIRS: set[str] = set()


def crawl_fixture_dir() -> str:
    """Write (once per process) the crawl fixture: 4 ``.warc.gz``
    archives holding per-host robots.txt fetches (hosts h0-h3 disallow
    ``/private/``; h4's robots is a 404, so it stays an unmatched host)
    and 240 interlinked HTML pages across the 5 hosts, every 6th under
    the disallowed ``/private/`` prefix.  tmpfs, pid-keyed, removed at
    exit (the web_q fixture convention)."""
    from yodel_etl_spark.io.warc import write_warc

    root = "/dev/shm" if os.access("/dev/shm", os.W_OK) else None
    base = os.path.join(root or "/tmp", f"yodel_crawl_{os.getpid()}")
    if base not in _CRAWL_DIRS:
        _CRAWL_DIRS.add(base)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
    marker = os.path.join(base, ".complete")
    if os.path.exists(marker):
        return base
    os.makedirs(base, exist_ok=True)
    robots = [
        {
            "url": f"https://h{k}.example.org/robots.txt",
            "ts": "2024-01-01T00:00:00Z",
            "payload": b"User-agent: *\nDisallow: /private/\n",
        }
        for k in range(_N_HOSTS - 1)
    ] + [
        {
            "url": f"https://h{_N_HOSTS - 1}.example.org/robots.txt",
            "ts": "2024-01-01T00:00:00Z",
            "payload": b"not found",
            "status": 404,
        }
    ]
    per_file = _N_PAGES // 4
    for f in range(4):
        recs = [
            {
                "url": (
                    f"https://h{i % _N_HOSTS}.example.org/"
                    + ("private/" if i % 6 == 0 else "page/")
                    + f"p{i}"
                ),
                "ts": "2024-01-01T00:00:00Z",
                "payload": _crawl_page(i).encode(),
                "mime": "text/html",
            }
            for i in range(f * per_file, (f + 1) * per_file)
        ]
        if f == 0:
            recs = robots + recs
        write_warc(recs, os.path.join(base, f"part-{f}.warc.gz"))
    with open(marker, "w") as fh:
        fh.write("ok")
    return base


@register(
    "crawl",
    oracle=None,  # PageRank's iterative core is not one SQL statement;
    # every stage is individually pinned (tests/test_warc.py,
    # test_robots.py, test_curate.py, test_links.py, test_graph.py)
    doc="The crawl-curation chain end-to-end, every stage an engine "
    "operator: read_warc (file-grain mapInPandas container split) → "
    "robots_from_warc + filter_disallowed (RFC 9309 gate: rules "
    "broadcast as one array row per host, winner picked by a codegen "
    "aggregate fold — the corpus never shuffles for politeness) → "
    "html_extract → curate (quality/repetition/lang filters + "
    "fingerprint dedup; spam fixture pages must drop) → link_edges "
    "(staged codegen extract/resolve/canonicalize, ONE host-grain "
    "shuffle) → budgeted PageRank (8 rounds, tol=None) → per-host "
    "(kept pages, rank).  Rows-only: one row per host in the link "
    "graph; registered so the full-chain cost is a recorded bench "
    "number, not just its stages'.",
    tags=("web", "scale", "pipeline", "graph"),
    bench=True,
)
def crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.io.warc import read_warc
    from yodel_etl_spark.pipelines.curate import curate
    from yodel_etl_spark.scale.graph import pagerank
    from yodel_etl_spark.scale.links import host_of, link_edges
    from yodel_etl_spark.scale.robots import filter_disallowed, robots_from_warc
    from yodel_etl_spark.scale.textstats import html_extract
    from yodel_etl_spark.scale.urlnorm import canonical_url
    from yodel_etl_spark.session import ship_package

    ship_package(spark)
    path = os.path.join(crawl_fixture_dir(), "*.warc.gz")
    rules = robots_from_warc(spark, path)
    raw = read_warc(spark, path)
    pages = raw.where(
        (~F.col("url").rlike("/robots\\.txt$"))
        & (F.col("status") >= 200)
        & (F.col("status") < 300)
    )
    allowed = filter_disallowed(pages, rules)
    docs = allowed.select(
        F.xxhash64(F.col("url")).alias("doc_id"),
        "url",
        F.col("payload").cast("string").alias("html"),
    )
    docs = docs.select(
        "doc_id", "url", "html", html_extract(F.col("html")).alias("text")
    )
    from yodel_etl_spark.session import register_persisted

    # persist the survivors: consumed twice (edge extraction and the
    # per-host page counts) atop a deep ingest+curate plan
    cur = curate(docs)
    kept = cur.select("url", "html").persist()
    edges = link_edges(kept, "url", "html", drop_self=True)
    ranks = pagerank(edges, src="src_host", dst="dst_host", tol=None, max_iter=8)
    counts = kept.groupBy(
        host_of(canonical_url(F.col("url"))).alias("host")
    ).agg(F.count(F.lit(1)).alias("n_pages"))
    out = (
        ranks.join(counts, ranks["node"] == counts["host"], "left")
        .select(
            F.col("node").alias("host"),
            F.coalesce(F.col("n_pages"), F.lit(0)).cast("long").alias("n_pages"),
            F.round(F.col("rank"), 6).alias("rank"),
        )
    )
    # caller-released caches: kept + curate's internals + pagerank's
    # registered edge/state handles (ranks adopts them)
    return register_persisted(out, ranks, kept, cur)


# Staged round-12 oracle for `anchor` (tools/r12_oracle_flip.md;
# executable via tests/test_r12_flip.py): assembled from the pinned
# SQL twins — the parallel-unnest zip of the two quote-style regex
# passes (byte-pinned in tests/test_links.py), resolve_href_sql,
# canonical_url_sql, host_of_sql, and the html_extract chain
# (html_extract_sql).  Mirrors the documents-derived envelope below.
def _anchor_oracle() -> str:
    from yodel_etl_spark.scale.links import (
        ANCHOR_DQ_RE,
        ANCHOR_SQ_RE,
        host_of_sql,
        resolve_href_sql,
    )
    from yodel_etl_spark.scale.textstats import html_extract_sql
    from yodel_etl_spark.scale.urlnorm import canonical_url_sql

    dq = ANCHOR_DQ_RE.replace("'", "''")
    sq = ANCHOR_SQ_RE.replace("'", "''")
    return f"""
    WITH pages AS (
      SELECT 'https://page' || CAST(doc_id % 5 AS VARCHAR)
               || '.example.org/dir/p' || CAST(doc_id AS VARCHAR)
               || '.html' AS url,
             '<a href="http://WWW.Site' || CAST(doc_id % 7 AS VARCHAR)
               || '.Example.com:80/x?utm_source=t&q=1">Visit <b>Site '
               || CAST(doc_id % 7 AS VARCHAR) || '</b> now</a>'
               || '<A HREF=''//cdn.example.net/asset'
               || CAST(doc_id % 3 AS VARCHAR) || '''>asset &amp; more</A>'
               || '<a href="../rel/page' || CAST(doc_id % 4 AS VARCHAR)
               || '">rel &quot;' || CAST(doc_id % 4 AS VARCHAR) || '&quot;</a>'
               || '<a href="http://img.example.com/i"><img src="p.png"/></a>'
               || '<a href="mailto:a@b.c">mail</a><a href="#top">frag</a>'
               AS html
      FROM documents
    ), ex AS (
      SELECT url, unnest(regexp_extract_all(html, '{dq}', 1)) AS href,
             unnest(regexp_extract_all(html, '{dq}', 2)) AS atext
      FROM pages
      UNION ALL
      SELECT url, unnest(regexp_extract_all(html, '{sq}', 1)) AS href,
             unnest(regexp_extract_all(html, '{sq}', 2)) AS atext
      FROM pages
    ), rs AS (
      SELECT atext, {resolve_href_sql('url', 'href')} AS dst FROM ex
    ), cn AS (
      SELECT atext, {canonical_url_sql('dst')} AS cd
      FROM rs WHERE dst IS NOT NULL
    ), hosts AS (
      SELECT {host_of_sql('cd')} AS dst_host,
             {html_extract_sql('atext')} AS anchor
      FROM cn
    )
    SELECT dst_host, anchor, CAST(count(*) AS BIGINT) AS n
    FROM hosts
    WHERE dst_host IS NOT NULL AND dst_host <> '' AND anchor <> ''
    GROUP BY dst_host, anchor
    """


ANCHOR_ORACLE = _anchor_oracle()


@register(
    "anchor",
    oracle=ANCHOR_ORACLE,  # flipped on in round 12 together with
    # tdiff/xspan — the counter-11 three-flip window was simulation-
    # pinned and the SQL parity pre-verified in tests/test_r12_flip.py
    tier=4,
    doc="Anchor-text table — how the web DESCRIBES each target host, "
    "the weak (query, document) supervision signal retrieval pipelines "
    "mine: anchor tags (both quote styles) zipped positionally from "
    "two regexp_extract_all passes, hrefs resolved/canonicalized by "
    "the staged scan-side codegen chain links shares, inner markup "
    "reduced by html_extract, ONE aggregation shuffle at (dst_host, "
    "anchor) grain.  r11 rework: pages synthesize from documents with "
    "a deterministic anchor envelope (the links convention — tracking "
    "params + www/port to canonicalize, protocol-relative single-"
    "quoted uppercase tag, dot-segment relative, entity-bearing inner "
    "markup, mailto/fragment/empty-after-strip drops) so the operator "
    "carries a DuckDB oracle; WARC-container ingest cost stays benched "
    "by `warc` and `crawl`.",
    tags=("web", "scale"),
)
def anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    from yodel_etl_spark.scale.links import anchor_text_table
    from yodel_etl_spark.session import spread

    docs = spread(load_tables(spark, sf_dir, ("documents",))["documents"])
    d7 = (F.col("doc_id") % 7).cast("string")
    d4 = (F.col("doc_id") % 4).cast("string")
    url = F.concat(
        F.lit("https://page"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".example.org/dir/p"),
        F.col("doc_id").cast("string"),
        F.lit(".html"),
    )
    html = F.concat(
        F.lit('<a href="http://WWW.Site'),
        d7,
        F.lit('.Example.com:80/x?utm_source=t&q=1">Visit <b>Site '),
        d7,
        F.lit("</b> now</a>"),
        F.lit("<A HREF='//cdn.example.net/asset"),
        (F.col("doc_id") % 3).cast("string"),
        F.lit("'>asset &amp; more</A>"),
        F.lit('<a href="../rel/page'),
        d4,
        F.lit('">rel &quot;'),
        d4,
        F.lit('&quot;</a>'),
        F.lit('<a href="http://img.example.com/i"><img src="p.png"/></a>'),
        F.lit('<a href="mailto:a@b.c">mail</a><a href="#top">frag</a>'),
    )
    pages = docs.select(url.alias("url"), html.alias("html"))
    return anchor_text_table(pages, "url", "html")
