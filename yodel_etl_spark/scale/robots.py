"""robots.txt parsing + URL filtering — the crawl-politeness gate that
sits between URL discovery (``scale/links.py``) and fetching/keeping
pages: a corpus pipeline re-checking exclusions before training drops
every URL a host's robots.txt disallows for its crawler.

Semantics implemented (the Robots Exclusion Protocol core, RFC 9309):

  * group selection: a ``User-agent:`` token matches when it is a
    case-insensitive substring of the crawler name (product-token
    semantics — ``googlebot`` matches agent ``googlebot-news``, but
    group ``googlebot-images`` does NOT match agent ``googlebot``);
    the LONGEST matching token governs, and the rules of ALL groups
    carrying a token of that winning length are merged into one group
    (RFC 9309 §2.1: multiple matching groups MUST be combined).  ``*``
    is the fallback group (multiple ``*`` groups merge too).
    Consecutive ``User-agent`` lines share one group;
    ``Sitemap`` lines are file-global and do not touch group structure;
    ``Crawl-delay`` opens a group's body exactly as a rule does (both
    parsers below partition a file into the SAME groups).
  * ``Allow`` / ``Disallow`` rules are path prefixes; the decision for
    a URL is the matching rule with the LONGEST rule string (RFC 9309
    §2.2.2 most-specific wins), ``Allow`` winning length ties; no
    matching rule ⇒ allowed.  An empty ``Disallow:`` matches nothing.
  * ``*`` wildcards and ``$`` end anchors (the de-facto extension RFC
    9309 §2.2.3 standardizes) are supported — each rule is compiled at
    PARSE time into an anchored regex in the RE2 ∩ Java-regex dialect;
    specificity stays the literal rule length.

Scale shape: parsing is a small per-host kernel (robots files are KB-
sized, one per host) run via ``mapInPandas`` over the robots corpus;
the output rule table is hosts × rules — TINY next to the URL corpus.
The filter collapses rules to ONE ARRAY ROW PER HOST (rule-table-sized
groupBy), broadcast-joins that onto the URLs, and picks the winning
rule with a codegen ``aggregate`` fold (``regexp_like`` over the
precompiled patterns) — the URL corpus never shuffles and never
touches Python.
"""

from __future__ import annotations

import re as _re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("allow", T.BooleanType()),
        T.StructField("prefix", T.StringType()),
        T.StructField("pattern", T.StringType()),
        T.StructField("spec", T.IntegerType()),  # specificity = rule length
    ]
)


def rule_pattern(prefix: str) -> str:
    """Anchored regex for a robots path rule: literals escaped, ``*`` →
    ``.*``, trailing ``$`` → end anchor.  Plain escapes only — the
    RE2 ∩ Java-regex portability dialect."""
    anchored_end = prefix.endswith("$")
    body = prefix[:-1] if anchored_end else prefix
    pat = "^" + ".*".join(_re.escape(part) for part in body.split("*"))
    return pat + "$" if anchored_end else pat


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str, int]]:
    """``[(allow, prefix, specificity)]`` for the group governing
    ``agent``.  Pure function — the single-process kernel the Spark op
    maps, and the twin the tests pin against RFC 9309's own examples."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_group_body = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_group_body = False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow", "crawl-delay"):
            # crawl-delay opens the group body exactly as a rule does,
            # so this parser and parse_robots_meta partition the SAME
            # file into the SAME groups — otherwise a crawl-delay
            # interposed between user-agent lines would merge agents
            # here while the meta parser splits them
            in_group_body = True
            if field != "crawl-delay" and value:
                cur_rules.append((field == "allow", value))
            # empty "Disallow:" = allow everything; record nothing
    if cur_agents or cur_rules:
        groups.append((cur_agents, cur_rules))

    chosen: list[tuple[bool, str]] = []
    for _, rules in _governing_groups(groups, agent):
        chosen.extend(rules)
    return [(allow, prefix, len(prefix)) for allow, prefix in chosen]


def _governing_groups(groups: list, agent: str) -> list:
    """The groups governing ``agent`` — group selection is
    one-directional: a group token governs only if it is contained IN
    the agent name (product-token semantics); the reverse test would
    let an unrelated longer group (``googlebot-images``) hijack agent
    ``googlebot`` via longest-wins.  All groups whose matching token
    ties the winning length MERGE (RFC 9309 §2.1); so do multiple
    ``*`` fallback groups.  Each group is ``(agents, payload)``."""

    def _tok(a: str) -> bool:
        return bool(a) and a != "*" and a in agent

    best_len = max(
        (len(a) for agents, _ in groups for a in agents if _tok(a)), default=-1
    )
    out = []
    for agents, payload in groups:
        if best_len >= 0:
            hit = any(_tok(a) and len(a) == best_len for a in agents)
        else:
            hit = "*" in agents
        if hit:
            out.append((agents, payload))
    return out


def parse_robots_meta(
    text: str, agent: str = "*"
) -> tuple[float | None, list[str]]:
    """Scheduler metadata from a robots.txt body: ``(crawl_delay,
    sitemaps)``.  ``Crawl-delay`` is the de-facto politeness directive
    (not in RFC 9309 but honored by most crawlers except Google): the
    value of the group governing ``agent``; when §2.1 merging selects
    several groups with different delays, the MAXIMUM wins (the polite
    merge).  ``Sitemap`` lines are file-global per the sitemaps
    protocol — collected in document order regardless of grouping,
    duplicates dropped.  Malformed delay values are ignored."""
    groups: list[tuple[list[str], list[float]]] = []
    cur_agents: list[str] = []
    cur_delays: list[float] = []
    in_group_body = False
    sitemaps: list[str] = []
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_body:
                groups.append((cur_agents, cur_delays))
                cur_agents, cur_delays = [], []
                in_group_body = False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow", "crawl-delay"):
            in_group_body = True
            if field == "crawl-delay":
                try:
                    cur_delays.append(float(value))
                except ValueError:
                    pass
        elif field == "sitemap":
            # file-global: does not open or close a group
            if value and value not in sitemaps:
                sitemaps.append(value)
    if cur_agents or cur_delays:
        groups.append((cur_agents, cur_delays))
    delays = [
        d for _, ds in _governing_groups(groups, agent.lower()) for d in ds
    ]
    return (max(delays) if delays else None, sitemaps)


META_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("crawl_delay", T.DoubleType()),
        T.StructField("sitemaps", T.StringType()),  # \n-joined, '' if none
    ]
)


def robots_meta(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Per-host scheduler metadata ``(host, crawl_delay, sitemaps)``
    from robots.txt bodies — the companion table to :func:`robots_rules`
    a crawl scheduler joins for politeness pacing and discovery seeds.
    Same shape: one Arrow pass over the tiny per-host robots corpus."""
    out_schema = META_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                delay, maps = parse_robots_meta(str(text), agent)
                rows.append((host, delay, "\n".join(maps)))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(batches, out_schema)


def robots_rules(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Rule table ``(host, allow, prefix, pattern, spec)`` from per-host
    robots.txt bodies — one Arrow batch pass over the (tiny, one-per-
    host) robots corpus; patterns precompiled here so the URL-sized
    filter below stays pure column algebra."""
    out_schema = RULES_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for host, text in zip(pdf[host_col], pdf[text_col]):
                for allow, prefix, spec in parse_robots(str(text), agent):
                    rows.append((host, allow, prefix, rule_pattern(prefix), spec))
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(batches, out_schema)


def filter_disallowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    keep_unmatched_hosts: bool = True,
) -> DataFrame:
    """Drop URLs whose host's robots rules disallow their path —
    most-specific rule wins, ``Allow`` wins specificity ties, no
    matching rule ⇒ allowed.  Hosts with no rule rows are kept (or
    dropped with ``keep_unmatched_hosts=False`` for allowlist-style
    pipelines).

    The URL corpus never shuffles: rules collapse to one array row per
    host (a rule-table-sized groupBy), broadcast-join onto the URLs,
    and the winner falls out of a codegen ``aggregate`` fold running
    ``regexp_like`` against the precompiled patterns — no Python, no
    window, no corpus exchange."""
    from yodel_etl_spark.scale.links import host_of
    from yodel_etl_spark.session import guarded_filter

    per_host = (
        rules.select(
            "host",
            F.struct(F.col("spec"), F.col("allow"), F.col("pattern")).alias("r"),
        )
        .groupBy("host")
        .agg(F.collect_list("r").alias("_rules"))
    )
    with_host = urls.withColumn("_h", host_of(F.col(url_col)))
    raw_path = F.regexp_extract(
        F.col(url_col), "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    # drop the RULES side's host by DataFrame reference: drop-by-name
    # removes every column named `host`, clobbering a caller-supplied
    # one on the URLs side
    joined = with_host.join(
        F.broadcast(per_host), with_host["_h"] == per_host["host"], "left"
    ).drop(per_host["host"])
    staged = joined.withColumn(
        "_path", F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    )
    init = F.struct(
        F.lit(-1).alias("spec"), F.lit(True).cast("boolean").alias("allow")
    )

    def pick(acc, r):
        matches = F.regexp_like(F.col("_path"), r["pattern"])
        better = matches & (
            (r["spec"] > acc["spec"])
            | ((r["spec"] == acc["spec"]) & r["allow"] & ~acc["allow"])
        )
        return F.struct(
            F.when(better, r["spec"]).otherwise(acc["spec"]).alias("spec"),
            F.when(better, r["allow"]).otherwise(acc["allow"]).alias("allow"),
        )

    folded = staged.withColumn(
        "_allow",
        F.when(F.col("_rules").isNull(), F.lit(None).cast("boolean")).otherwise(
            F.aggregate(F.col("_rules"), init, pick)["allow"]
        ),
    )
    if keep_unmatched_hosts:
        cond = F.col("_allow").isNull() | F.col("_allow")
    else:
        cond = F.col("_allow").isNotNull() & F.col("_allow")
    return guarded_filter(folded, cond).drop("_h", "_rules", "_path", "_allow")


def robots_from_warc(
    spark: SparkSession, path: str, agent: str = "*", corrupt: str = "raise"
) -> DataFrame:
    """Rule table straight from a crawl: read WARC archives under
    ``path`` (Common Crawl publishes robots.txt fetches as ordinary
    response records), keep the ``/robots.txt`` responses with a 2xx
    status, and parse each host's newest body — the glue that makes the
    politeness gate run off the same container bytes as the corpus
    (``read_warc`` → this → :func:`filter_disallowed`).

    One host can appear in several archives; the LATEST fetch wins
    (max ``ts`` per host — a tiny per-host window over the robots
    subset, never the corpus)."""
    from pyspark.sql import Window

    from yodel_etl_spark.io.warc import read_warc
    from yodel_etl_spark.scale.links import host_of

    raw = read_warc(spark, path, corrupt=corrupt)
    robots = raw.where(
        F.col("url").rlike("(?i)^https?://[^/?#]+/robots\\.txt$")
        & (F.col("status") >= 200)
        & (F.col("status") < 300)
    ).select(
        host_of(F.col("url")).alias("host"),
        F.col("ts"),
        F.col("payload").cast("string").alias("robots_txt"),
    )
    w = Window.partitionBy("host").orderBy(F.col("ts").desc())
    newest = (
        robots.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "ts")
    )
    return robots_rules(newest, "host", "robots_txt", agent)
