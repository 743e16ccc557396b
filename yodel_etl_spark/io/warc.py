"""WARC (ISO 28500) ingest — the step upstream of the whole web-corpus
curation family: Common-Crawl-style archives → ``(url, ts, warc_type,
mime, status, payload)`` rows feeding ``html_extract`` → token stats →
dedup/quality/decontam.

Format (public spec + Common Crawl convention): a WARC file is a
sequence of records — ``WARC/1.x`` version line, header lines, blank
line, ``Content-Length`` bytes of block, ``\\r\\n\\r\\n`` separator —
and a ``.warc.gz`` compresses EACH RECORD as its own gzip member
(concatenated), so a reader can split members without decompressing the
whole archive serially per record boundary guesswork.

Scale shape: one archive file = one ``binaryFile`` row = one Arrow
``mapInPandas`` task — the same per-file decode posture as the
image/audio codecs (Common Crawl shards are ~1 GB each precisely so
file-grain parallelism is enough; a 100 TB crawl is ~100k files, which
spreads over any executor fleet with zero shuffle).  Record parsing is
pure stdlib (zlib), payloads never leave the executor, and the HTTP
header strip happens in the same pass, so downstream sees clean bodies.

Reference note: the reference engine (see SURVEY.md §2 sources) has no
container ingest; this extends its JSON/text scan family (S1/S2) with
the container format a web-scale text pipeline actually receives.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: output schema of :func:`read_warc` (payload = the record block with
#: any HTTP response header already stripped)
WARC_SCHEMA = T.StructType(
    [
        T.StructField("src_file", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("ts", T.StringType()),  # WARC-Date, ISO-8601 as written
        T.StructField("warc_type", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

_GZIP_MAGIC = b"\x1f\x8b"


_GZ_DEFLATE_MAGIC = b"\x1f\x8b\x08"


def split_gzip_members(blob: bytes, corrupt: str = "raise") -> Iterator[bytes]:
    """Decompress a concatenated-gzip-member blob, yielding one bytes
    object per member (the Common Crawl record-per-member convention).

    ``corrupt="raise"`` (default): ``ValueError`` on a corrupt or
    truncated member — the codec modules' honest-gate policy.
    ``corrupt="skip"``: resynchronize at the next gzip-member magic and
    keep going — the crawl-scale policy (a 100 TB crawl WILL contain
    damaged shards, and one bad member must not sink a 1 GB archive;
    the S1 JSON scan's corrupt-file policy, at member grain)."""
    if corrupt not in ("raise", "skip"):
        raise ValueError(f"corrupt={corrupt!r} (expected 'raise' or 'skip')")
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        err = None
        out = b""
        try:
            out = d.decompress(blob[pos:])
            out += d.flush()
        except zlib.error as e:
            err = f"corrupt gzip member at offset {pos}: {e}"
        if err is None and not d.eof:
            err = f"truncated gzip member at offset {pos}"
        if err is None:
            consumed = len(blob) - pos - len(d.unused_data)
            if consumed <= 0:  # defensive: zero-progress would loop forever
                err = f"gzip member at offset {pos} consumed no bytes"
        if err is not None:
            if corrupt == "raise":
                raise ValueError(err)
            nxt = blob.find(_GZ_DEFLATE_MAGIC, pos + 1)
            if nxt < 0:
                return
            pos = nxt
            continue
        yield out
        pos += consumed


def parse_warc_records(buf: bytes, corrupt: str = "raise") -> Iterator[dict]:
    """Parse every WARC record in a decompressed buffer (a buffer may
    hold one record — the per-member case — or a whole uncompressed
    archive).  Yields dicts with the raw block; HTTP handling happens
    in :func:`_finish_record` so response records expose clean bodies.

    ``corrupt="skip"`` resynchronizes at the next ``WARC/`` version
    line instead of raising (same rationale as
    :func:`split_gzip_members`)."""
    if corrupt not in ("raise", "skip"):
        raise ValueError(f"corrupt={corrupt!r} (expected 'raise' or 'skip')")
    pos = 0
    n = len(buf)

    def _bad(msg: str) -> int | None:
        """raise, or return the resync offset (None = end of buffer)."""
        if corrupt == "raise":
            raise ValueError(msg)
        nxt = buf.find(b"WARC/", pos + 1)
        return nxt if nxt >= 0 else None

    while pos < n:
        # tolerate inter-record \r\n padding
        while pos < n and buf[pos : pos + 2] in (b"\r\n", b"\n"):
            pos += 2 if buf[pos : pos + 2] == b"\r\n" else 1
        if pos >= n:
            return
        if not buf.startswith(b"WARC/", pos):
            resync = _bad(f"expected WARC/ version line at offset {pos}")
            if resync is None:
                return
            pos = resync
            continue
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            resync = _bad(f"unterminated WARC header at offset {pos}")
            if resync is None:
                return
            pos = resync
            continue
        headers: dict[str, str] = {}
        lines = buf[pos:hdr_end].decode("latin-1").split("\r\n")
        for line in lines[1:]:  # lines[0] is the version line
            k, _, v = line.partition(":")
            if _:
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            resync = _bad(f"bad Content-Length at offset {pos}")
            if resync is None:
                return
            pos = resync
            continue
        block_start = hdr_end + 4
        if block_start + clen > n:
            resync = _bad(f"record block at offset {pos} overruns the buffer")
            if resync is None:
                return
            pos = resync
            continue
        yield {"headers": headers, "block": buf[block_start : block_start + clen]}
        pos = block_start + clen


def _finish_record(rec: dict, src_file: str) -> tuple:
    """Flatten a parsed record to a WARC_SCHEMA tuple.  For
    ``response`` records the block is an HTTP message: the status line
    and headers are stripped (and surfaced as ``status`` / ``mime``) so
    ``payload`` is the body every downstream text operator wants."""
    h = rec["headers"]
    block = rec["block"]
    warc_type = h.get("warc-type", "")
    mime = h.get("content-type", "")
    status = None
    if warc_type == "response" and block[:5] in (b"HTTP/",):
        split = block.find(b"\r\n\r\n")
        if split >= 0:
            http_hdr = block[:split].decode("latin-1", "replace")
            block = block[split + 4 :]
            first, *rest = http_hdr.split("\r\n")
            parts = first.split()
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for line in rest:
                k, _, v = line.partition(":")
                if k.strip().lower() == "content-type":
                    mime = v.strip()
                    break
    return (
        src_file,
        h.get("warc-target-uri"),
        h.get("warc-date"),
        warc_type,
        mime,
        status,
        block,
        len(block),
    )


def _file_to_records(
    path: str, blob: bytes, record_types, corrupt: str = "raise"
) -> list[tuple]:
    """One archive file → WARC_SCHEMA tuples (executor-side kernel)."""
    out: list[tuple] = []
    if blob[:2] == _GZIP_MAGIC:
        buffers: Iterator[bytes] = split_gzip_members(blob, corrupt)
    else:
        buffers = iter((blob,))
    for buf in buffers:
        for rec in parse_warc_records(buf, corrupt):
            row = _finish_record(rec, path)
            if record_types is None or row[3] in record_types:
                out.append(row)
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] | None = ("response",),
    corrupt: str = "raise",
) -> DataFrame:
    """Read WARC / WARC-gz archives under ``path`` (a ``binaryFile``
    glob) into :data:`WARC_SCHEMA` rows.

    ``record_types`` filters on ``WARC-Type`` executor-side (default:
    only ``response`` — the crawl payloads; ``None`` keeps everything,
    including ``warcinfo``/``request``/``metadata``).  Parallelism is
    file-grain: each archive decodes in one Arrow task, records never
    shuffle to be parsed.

    ``corrupt``: ``"raise"`` (default — honest gate for curated
    inputs) or ``"skip"`` — resynchronize past damaged gzip members /
    malformed records at the next member magic / ``WARC/`` line, so one
    bad record cannot sink a 1 GB shard (the crawl-scale policy; a real
    100 TB crawl always contains some damage)."""
    from yodel_etl_spark.session import ship_package

    if corrupt not in ("raise", "skip"):
        raise ValueError(f"corrupt={corrupt!r} (expected 'raise' or 'skip')")
    ship_package(spark)  # the kernel closes over package fns (by-ref pickle)
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    wanted = tuple(record_types) if record_types is not None else None

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in it:
            rows: list[tuple] = []
            for path_, blob in zip(pdf["path"], pdf["content"]):
                rows.extend(_file_to_records(path_, bytes(blob), wanted, corrupt))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(batches, schema=WARC_SCHEMA)


def write_warc(records: list[dict], path: str, gzip_members: bool = True) -> None:
    """Serialize ``records`` (dicts with ``url``, ``ts``, ``payload``
    bytes, optional ``http`` bool for an HTTP wrapper and optional
    ``status`` int, default 200) to a WARC
    file — the test-fixture/roundtrip twin of :func:`read_warc`, also
    handy for re-sharding curated subsets back into the archive format.
    With ``gzip_members`` each record is its own gzip member (the
    Common Crawl layout the reader's member splitter expects)."""
    import gzip

    out = bytearray()
    for i, rec in enumerate(records):
        payload = rec["payload"]
        if rec.get("http", True):
            body = (
                b"HTTP/1.1 "
                + str(rec.get("status", 200)).encode()
                + b" X\r\nContent-Type: "
                + rec.get("mime", "text/html").encode()
                + b"\r\nContent-Length: "
                + str(len(payload)).encode()
                + b"\r\n\r\n"
                + payload
            )
            rtype = b"response"
            ctype = b"application/http; msgtype=response"
        else:
            body = payload
            rtype = rec.get("warc_type", "resource").encode()
            ctype = rec.get("mime", "text/plain").encode()
        hdr = (
            b"WARC/1.0\r\n"
            b"WARC-Type: " + rtype + b"\r\n"
            b"WARC-Record-ID: <urn:uuid:rec-" + str(i).encode() + b">\r\n"
            b"WARC-Target-URI: " + rec["url"].encode() + b"\r\n"
            b"WARC-Date: " + rec["ts"].encode() + b"\r\n"
            b"Content-Type: " + ctype + b"\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        )
        record = hdr + body + b"\r\n\r\n"
        out += gzip.compress(record, mtime=0) if gzip_members else record
    with open(path, "wb") as fh:
        fh.write(bytes(out))
