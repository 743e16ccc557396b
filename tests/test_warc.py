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
