"""WARC reader: golden record parity on hand-built archives (gzip-member
and plain), member splitting, HTTP header stripping, honest corrupt-input
gates, and the registered end-to-end query."""

from __future__ import annotations

import gzip

import pytest

from yodel_etl_spark.io.warc import (
    parse_warc_records,
    read_warc,
    split_gzip_members,
    write_warc,
)

HTML_A = b"<html><body><p>hello world</p></body></html>"
HTML_B = b"<html><body><script>x=1</script><p>bye &amp; thanks</p></body></html>"


def _record(
    url: str, payload: bytes, rtype: bytes = b"response", http: bool = True
) -> bytes:
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n" + payload
        if http
        else payload
    )
    return (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rtype + b"\r\n"
        b"WARC-Target-URI: " + url.encode() + b"\r\n"
        b"WARC-Date: 2024-03-04T05:06:07Z\r\n"
        b"Content-Type: application/http; msgtype=response\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        + body
        + b"\r\n\r\n"
    )


def test_split_gzip_members_roundtrip():
    parts = [b"first member", b"second", b"third one here"]
    blob = b"".join(gzip.compress(p, mtime=0) for p in parts)
    assert list(split_gzip_members(blob)) == parts


def test_split_gzip_members_corrupt_raises():
    blob = gzip.compress(b"fine", mtime=0) + b"\x1f\x8b garbage not gzip"
    with pytest.raises(ValueError):
        list(split_gzip_members(blob))


def test_parse_warc_records_golden():
    buf = _record("https://a.example/x", HTML_A) + _record(
        "https://a.example/y", HTML_B
    )
    recs = list(parse_warc_records(buf))
    assert len(recs) == 2
    assert recs[0]["headers"]["warc-target-uri"] == "https://a.example/x"
    assert recs[0]["headers"]["warc-date"] == "2024-03-04T05:06:07Z"
    assert recs[0]["block"].endswith(HTML_A)  # HTTP strip happens later


def test_parse_warc_records_bad_inputs():
    with pytest.raises(ValueError, match="expected WARC/"):
        list(parse_warc_records(b"NOT A WARC"))
    # Content-Length larger than the buffer
    rec = _record("https://a.example/x", HTML_A)
    with pytest.raises(ValueError, match="overruns"):
        list(parse_warc_records(rec[: len(rec) - len(HTML_A) - 10]))
    # missing Content-Length
    broken = rec.replace(b"Content-Length:", b"X-Length:")
    with pytest.raises(ValueError, match="Content-Length"):
        list(parse_warc_records(broken))


@pytest.fixture(scope="module")
def archive_dir(tmp_path_factory):
    """One gzip-member archive + one plain archive, three records each
    (two responses + one warcinfo)."""
    d = tmp_path_factory.mktemp("warc")
    recs = [
        {
            "url": "https://w.example/0",
            "ts": "2024-03-04T05:06:07Z",
            "payload": HTML_A,
            "mime": "text/html; charset=utf-8",
        },
        {"url": "https://w.example/1", "ts": "2024-03-04T05:06:08Z", "payload": HTML_B},
        {
            "url": "https://w.example/info",
            "ts": "2024-03-04T05:06:09Z",
            "payload": b"software: test",
            "http": False,
            "warc_type": "warcinfo",
            "mime": "application/warc-fields",
        },
    ]
    write_warc(recs, str(d / "a.warc.gz"), gzip_members=True)
    write_warc(recs, str(d / "b.warc"), gzip_members=False)
    return str(d)


def test_read_warc_end_to_end(spark, archive_dir):
    df = read_warc(spark, archive_dir + "/*").orderBy("src_file", "url")
    rows = df.collect()
    # default record_types=('response',): 2 responses x 2 archives
    assert len(rows) == 4
    r0 = rows[0]
    assert r0["url"] == "https://w.example/0"
    assert r0["ts"] == "2024-03-04T05:06:07Z"
    assert r0["warc_type"] == "response"
    assert r0["status"] == 200
    assert r0["mime"] == "text/html; charset=utf-8"  # from the HTTP header
    assert bytes(r0["payload"]) == HTML_A  # HTTP envelope stripped
    assert r0["n_bytes"] == len(HTML_A)


def test_read_warc_record_type_filter(spark, archive_dir):
    df = read_warc(spark, archive_dir + "/a.warc.gz", record_types=None)
    got = {(r["warc_type"], r["url"]) for r in df.collect()}
    assert ("warcinfo", "https://w.example/info") in got
    assert len(got) == 3
    only_info = read_warc(
        spark, archive_dir + "/a.warc.gz", record_types=("warcinfo",)
    )
    assert only_info.count() == 1


def test_registered_warc_query(spark):
    from yodel_etl_spark.registry import load_all

    out = load_all()["warc"].build(spark, "/root/testdata/sf0.001")
    pdf = out.toPandas()
    assert len(pdf) == 512
    assert (pdf["status"] == 200).all()
    # extracted text: script/style stripped, entities decoded -> stable
    # token count = 60 body words + 'Doc <i>' + '& entities <stay> "decoded"'
    assert (pdf["n_tokens"] == 68).all()
    assert pdf["n_uniq"].between(10, 40).all()


def test_corrupt_skip_resynchronizes_gzip_members():
    """skip mode: a damaged member in the middle must not sink the
    archive — later members still decode; raise mode still raises."""
    parts = [b"member one", b"member two", b"member three"]
    m = [gzip.compress(p, mtime=0) for p in parts]
    # damage the middle member's deflate stream (keep its magic intact)
    bad = bytearray(m[1])
    bad[12:18] = b"\x00\xff\x00\xff\x00\xff"
    blob = m[0] + bytes(bad) + m[2]
    with pytest.raises(ValueError):
        list(split_gzip_members(blob))
    got = list(split_gzip_members(blob, corrupt="skip"))
    assert parts[0] in got and parts[2] in got
    assert parts[1] not in got
    with pytest.raises(ValueError, match="corrupt="):
        list(split_gzip_members(blob, corrupt="nope"))


def test_corrupt_skip_resynchronizes_plain_records():
    """skip mode over an uncompressed archive: resync at the next
    WARC/ line past a record whose Content-Length is mangled."""
    good1 = _record("https://a.example/1", HTML_A)
    bad = _record("https://a.example/2", HTML_B).replace(
        b"Content-Length:", b"Content-Length: zzz\r\nX:", 1
    )
    good2 = _record("https://a.example/3", HTML_A)
    buf = good1 + bad + good2
    with pytest.raises(ValueError):
        list(parse_warc_records(buf))
    got = list(parse_warc_records(buf, corrupt="skip"))
    urls = [r["headers"]["warc-target-uri"] for r in got]
    assert "https://a.example/1" in urls and "https://a.example/3" in urls
    assert "https://a.example/2" not in urls


def test_read_warc_corrupt_skip_end_to_end(spark, tmp_path):
    """A damaged middle member inside a .warc.gz shard: skip mode
    yields the surviving records, raise mode fails the read."""
    recs = [
        {"url": f"https://w.example/{i}", "ts": "2024-03-04T05:06:07Z",
         "payload": HTML_A}
        for i in range(3)
    ]
    p = str(tmp_path / "damaged.warc.gz")
    write_warc(recs, p, gzip_members=True)
    blob = bytearray(open(p, "rb").read())
    # find the second member's magic and mangle its deflate bytes
    second = blob.find(b"\x1f\x8b\x08", 3)
    blob[second + 12 : second + 16] = b"\x00\xff\x00\xff"
    open(p, "wb").write(bytes(blob))
    with pytest.raises(Exception):
        read_warc(spark, p).count()
    ok = read_warc(spark, p, corrupt="skip")
    urls = sorted(r["url"] for r in ok.collect())
    assert len(urls) == 2 and "https://w.example/0" in urls


def test_warc_to_curate_pipeline(spark, tmp_path):
    """The full web-corpus chain: WARC archive → read_warc →
    canonical_url → html_extract → curate (quality + repetition + lang
    filters, exact dedup) — the end-to-end path a crawl takes into a
    training corpus: junk pages drop, duplicate pages collapse to one
    canonical row, clean English pages survive tag-free."""
    import pyspark.sql.functions as F

    from yodel_etl_spark.pipelines.curate import curate
    from yodel_etl_spark.scale.textstats import html_extract
    from yodel_etl_spark.scale.urlnorm import canonical_url

    subjects = ["cat", "dog", "bird", "horse", "whale", "fox", "owl", "bear"]
    def page(i):
        s1 = subjects[i % len(subjects)]
        s2 = subjects[(i + 3) % len(subjects)]
        return (
            f"<html><body><p>the {s1} and the {s2} walked out of a quiet "
            f"village number {i} and spoke of the weather and a long road "
            f"to the sea with a friend of the family</p></body></html>"
        ).encode()
    recs = [
        {"url": f"https://site{i}.example/a", "ts": "2024-01-01T00:00:00Z",
         "payload": page(i)}
        for i in range(20)
    ]
    # five duplicate pages (same extracted text as page 0, new urls)
    recs += [
        {"url": f"https://mirror{k}.example/a", "ts": "2024-01-01T00:00:00Z",
         "payload": page(0)}
        for k in range(5)
    ]
    # one junk page: no stopwords, heavy repetition -> filtered
    recs.append(
        {"url": "https://junk.example/a", "ts": "2024-01-01T00:00:00Z",
         "payload": b"<html><body>" + b"zzz " * 40 + b"</body></html>"}
    )
    p = str(tmp_path / "crawl.warc.gz")
    write_warc(recs, p)

    raw = read_warc(spark, p)
    docs = raw.select(
        F.xxhash64(canonical_url(F.col("url"))).alias("doc_id"),
        html_extract(F.col("payload").cast("string")).alias("text"),
    )
    out = curate(docs).select("doc_id", "text")
    rows = out.collect()
    texts = [r["text"] for r in rows]
    assert len(rows) == 20  # 20 distinct pages; 5 mirrors deduped, junk dropped
    assert len(set(texts)) == 20
    assert sum("village number 0" in t for t in texts) == 1  # one canonical
    assert all("<" not in t for t in texts)  # tags gone
    assert not any("zzz" in t for t in texts)  # junk filtered


def test_warc_to_graph_pipeline(spark, tmp_path):
    """The other half of the crawl chain: WARC archive → read_warc →
    robots gate → link extraction → host-grain edges → pagerank — the
    quality-prior path, end to end from container bytes.  hub.example
    links everyone; every allowed page links popular.example; one
    page's URL is robots-disallowed and must contribute NO edges; the
    rank order follows the in-link structure and ranks sum to 1."""
    import pyspark.sql.functions as F

    from yodel_etl_spark.scale.graph import pagerank
    from yodel_etl_spark.scale.links import link_edges
    from yodel_etl_spark.scale.robots import filter_disallowed, robots_rules

    def page(i, links):
        body = "".join(f'<a href="{u}">x</a>' for u in links)
        return f"<html><body>{body}</body></html>".encode()

    recs = [
        {
            "url": "https://hub.example/index",
            "ts": "2024-01-01T00:00:00Z",
            "payload": page(0, [
                "https://popular.example/a",
                "https://site1.example/a",
                "https://site2.example/a",
                "https://blocked.example/private/x",
            ]),
        },
        {
            "url": "https://site1.example/a",
            "ts": "2024-01-01T00:00:00Z",
            "payload": page(1, ["https://popular.example/b", "/self"]),
        },
        {
            "url": "https://site2.example/a",
            "ts": "2024-01-01T00:00:00Z",
            "payload": page(2, ["https://popular.example/c"]),
        },
        # this PAGE is disallowed: its outgoing links must not count
        {
            "url": "https://blocked.example/private/page",
            "ts": "2024-01-01T00:00:00Z",
            "payload": page(3, ["https://spam.example/x"]),
        },
    ]
    p = str(tmp_path / "graphcrawl.warc.gz")
    write_warc(recs, p)

    rules = robots_rules(
        spark.createDataFrame(
            [("blocked.example", "User-agent: *\nDisallow: /private/")],
            ["host", "robots_txt"],
        )
    )
    raw = read_warc(spark, p)
    allowed = filter_disallowed(raw, rules, url_col="url")
    pages = allowed.select("url", F.col("payload").cast("string").alias("html"))
    edges = link_edges(pages, "url", "html", drop_self=True)
    e = {(r["src_host"], r["dst_host"]): r["weight"] for r in edges.collect()}
    # the blocked page contributed nothing; spam.example never appears
    assert not any(s == "blocked.example" for s, _ in e)
    # blocked.example still RECEIVES a link (robots gates fetching a
    # page, not other pages' references to it)
    assert e[("hub.example", "blocked.example")] == 1
    assert e[("hub.example", "popular.example")] == 1
    assert e[("site1.example", "popular.example")] == 1
    assert e[("site2.example", "popular.example")] == 1

    ranks = {
        r["node"]: r["rank"]
        for r in pagerank(edges, "src_host", "dst_host", tol=1e-10).collect()
    }
    assert "spam.example" not in ranks
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # 3 in-links beat 1 in-link beat 0 in-links
    assert ranks["popular.example"] > ranks["site1.example"] > 0
    assert ranks["popular.example"] > ranks["blocked.example"]
    assert min(ranks["site1.example"], ranks["site2.example"]) > ranks["hub.example"] * 0.5
