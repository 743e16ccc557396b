"""URL canonicalization — the first dedup key a web-corpus pipeline
computes: crawls see the same page as ``http://WWW.Site.com:80/a//b/?
utm_source=x&b=2&a=1#frag`` and ``http://site.com/a/b?a=1&b=2``, and
exact-URL dedup, per-domain mixing, and robots bookkeeping all need ONE
canonical spelling.

Rules (the conservative, lossless-in-practice core every crawler
normalizer shares — RFC 3986 §6 syntax-based normalization plus the
standard tracking-param scrub):

  * scheme and host lowercase; leading ``www.`` stripped;
  * default ports dropped (``:80`` for http, ``:443`` for https);
  * fragment dropped;
  * path: duplicate slashes collapsed, trailing slash stripped (root
    stays ``/``), empty path becomes ``/``;
  * query: tracking params removed (``utm_*``, ``gclid``, ``fbclid``,
    ``msclkid``), remaining params sorted lexicographically, empty
    query dropped.

Everything is ONE chain of codegen string/regexp/array expressions in
the RE2 ∩ Java-regex dialect (the redact/html_extract portability
rule), so the DuckDB twin (:func:`canonical_url_sql`) runs the
IDENTICAL patterns and the two engines agree byte-for-byte —
tests/test_urlnorm.py pins that parity on adversarial URLs.  At 100 TB
this is a narrow scan-stage map; the canonical string then feeds plain
exact dedup (hash-groupBy) or the domain-mix sampler.

Not registered as its own query (the bench stdout byte budget is at
its pin); it rides the registered ``warc`` ingest query as the
``canon_url`` column and carries its own DuckDB-parity pytest gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tracking parameters stripped from query strings (prefix-match for
#: utm_*; exact for the click ids)
TRACKING_RE = "^(utm_[^=]*|gclid|fbclid|msclkid)(=|$)"

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url(url: Column) -> Column:
    """Canonical form of an absolute http(s)-style URL column (see
    module docstring for the rule set).  Inputs without a
    ``scheme://`` prefix pass through unchanged (relative URLs have no
    canonical absolute form without a base)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    rest = F.regexp_replace(
        F.regexp_replace(url, _SCHEME_RE, ""), "#.*$", ""
    )
    hostport = F.lower(F.regexp_extract(rest, "^([^/?]*)", 1))
    nowww = F.regexp_replace(hostport, "^www\\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(nowww, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(nowww, ":443$", ""))
        .otherwise(nowww)
    )
    pathq = F.regexp_replace(rest, "^[^/?]*", "")
    path0 = F.regexp_extract(pathq, "^([^?]*)", 1)
    path1 = F.regexp_replace(path0, "/{2,}", "/")
    path2 = F.regexp_replace(path1, "(.)/$", "$1")
    path = F.when(path2 == "", F.lit("/")).otherwise(path2)
    qs = F.regexp_extract(pathq, "\\?(.*)$", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", url).otherwise(canon)


def canonical_url_sql(col: str) -> str:
    """DuckDB twin of :func:`canonical_url` — the IDENTICAL regex
    patterns in RE2, for oracle parity tests and future registered
    queries.  Returns a SQL expression string over ``col``."""
    scheme = f"lower(regexp_extract({col}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = (
        f"regexp_replace(regexp_replace({col}, '^[A-Za-z][A-Za-z0-9+.-]*://', ''),"
        " '#.*$', '')"
    )
    hostport = f"lower(regexp_extract({rest}, '^([^/?]*)', 1))"
    nowww = f"regexp_replace({hostport}, '^www\\.', '')"
    host = (
        f"(CASE WHEN {scheme} = 'http' THEN regexp_replace({nowww}, ':80$', '')"
        f" WHEN {scheme} = 'https' THEN regexp_replace({nowww}, ':443$', '')"
        f" ELSE {nowww} END)"
    )
    pathq = f"regexp_replace({rest}, '^[^/?]*', '')"
    path0 = f"regexp_extract({pathq}, '^([^?]*)', 1)"
    path1 = f"regexp_replace({path0}, '/{{2,}}', '/', 'g')"
    path2 = f"regexp_replace({path1}, '(.)/$', '\\1')"
    path = f"(CASE WHEN {path2} = '' THEN '/' ELSE {path2} END)"
    qs = f"regexp_extract({pathq}, '\\?(.*)$', 1)"
    params = (
        f"list_filter(string_split({qs}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}'))"
    )
    sq = f"array_to_string(list_sort({params}), '&')"
    canon = (
        f"({scheme} || '://' || {host} || {path} ||"
        f" (CASE WHEN {sq} <> '' THEN '?' || {sq} ELSE '' END))"
    )
    return f"(CASE WHEN {scheme} = '' THEN {col} ELSE {canon} END)"
