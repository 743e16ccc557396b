"""Multimodal plumbing invariants (scale/multimodal.py) beyond the
driver-checked metadata/feature queries: the resize kernel's batch
shape, output geometry, and fail-soft empty handling."""

from __future__ import annotations

from pyspark.sql import Row

from yodel_etl_spark.scale.multimodal import _fake_decode, decode_meta, resize_media
from yodel_etl_spark.session import ship_package


def _blobs(spark):
    rows = [
        Row(media_id=1, content=bytes(range(200))),
        Row(media_id=2, content=b"\xff" * 33),
        Row(media_id=3, content=b""),
        Row(media_id=4, content=None),
    ]
    return spark.createDataFrame(rows)


def test_resize_output_geometry(spark):
    ship_package(spark)
    out = {r["media_id"]: r for r in resize_media(_blobs(spark), width=8, height=8).collect()}
    for mid in (1, 2):
        r = out[mid]
        c = _fake_decode(bytes(r["content"]))[2]
        assert len(r["resized"]) == 8 * 8 * c
        assert (r["r_width"], r["r_height"], r["r_channels"]) == (8, 8, c)
    # empty/NULL blobs fail soft to empty output, never raise
    assert out[3]["resized"] == bytearray(b"") and out[3]["r_channels"] == 0
    assert out[4]["resized"] == bytearray(b"")


def test_resize_deterministic(spark):
    ship_package(spark)
    a = {r["media_id"]: bytes(r["resized"]) for r in resize_media(_blobs(spark)).collect()}
    b = {r["media_id"]: bytes(r["resized"]) for r in resize_media(_blobs(spark)).collect()}
    assert a == b


def test_decode_meta_then_resize_compose(spark):
    """The metadata stage and the resize stage compose in one DAG —
    schema append is additive, no column clashes."""
    ship_package(spark)
    out = resize_media(decode_meta(_blobs(spark)), width=4, height=2).collect()
    r = {x["media_id"]: x for x in out}[1]
    assert r["width"] == _fake_decode(bytes(r["content"]))[0]
    assert len(r["resized"]) == 4 * 2 * r["r_channels"]


# ---------- real-format header parse + pure-stdlib PNG decode ----------

def _png_bytes(px, color_type=2, filters=None, palette=None):
    """Minimal PNG encoder for fixtures: real chunks, real CRCs, real
    zlib stream, per-row filter bytes actually APPLIED (so the decoder's
    unfilter path is exercised, not just filter 0)."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[:2]
    nch = 1 if px.ndim == 2 else px.shape[2]
    flat = px.reshape(h, w * nch).astype(np.int32)
    filters = filters or [0] * h
    bpp = nch
    lines = []
    for y in range(h):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * nch, dtype=np.int32)
        f = filters[y]
        enc = np.empty(w * nch, dtype=np.int32)
        for x in range(w * nch):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([f]) + enc.astype(np.uint8).tobytes())

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(b"".join(lines)))
    return out + chunk(b"IEND", b"")


def test_parse_real_image_headers():
    import struct

    import numpy as np

    from yodel_etl_spark.scale.multimodal import parse_image_header

    png = _png_bytes(np.arange(5 * 7 * 3, dtype=np.uint8).reshape(5, 7, 3))
    assert parse_image_header(png) == (7, 5, 3)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\xf7\x00\x00" + b"\x00" * 8
    assert parse_image_header(gif) == (320, 200, 3)
    bmp = (
        b"BM" + struct.pack("<IHHI", 150, 0, 0, 54)
        + struct.pack("<IiiHH", 40, 640, -480, 1, 24) + b"\x00" * 30
    )
    assert parse_image_header(bmp) == (640, 480, 3)  # negative h = top-down
    jpeg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 480, 640, 3) + b"\x00" * 6
        + b"\xff\xd9"
    )
    assert parse_image_header(jpeg) == (640, 480, 3)
    # text and garbage must NOT parse: the synthetic corpus depends on it
    assert parse_image_header(b"BMW makes cars, not bitmaps, truly") is None
    assert parse_image_header("some utf-8 text éé".encode()) is None
    assert parse_image_header(b"") is None


def test_png_pixels_roundtrip_all_filters():
    """Encode with every filter type (None/Sub/Up/Average/Paeth) and
    recover the exact pixel array — byte-for-byte, no codec library."""
    import numpy as np

    from yodel_etl_spark.scale.multimodal import decode_png_pixels

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 6, 3), dtype=np.uint8)
    blob = _png_bytes(px, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(decode_png_pixels(blob), px)
    # grayscale and palette variants
    gray = rng.randint(0, 256, size=(4, 4), dtype=np.uint8)
    assert np.array_equal(
        decode_png_pixels(_png_bytes(gray, color_type=0, filters=[4, 3, 2, 1])),
        gray.reshape(4, 4, 1),
    )
    idx = rng.randint(0, 4, size=(3, 3), dtype=np.uint8)
    pal = bytes(rng.randint(0, 256, size=12, dtype=np.uint8))
    got = decode_png_pixels(_png_bytes(idx, color_type=3, palette=pal))
    want = np.frombuffer(pal, dtype=np.uint8).reshape(4, 3)[idx]
    assert np.array_equal(got, want)


def test_decode_meta_real_png_in_dataframe(spark):
    """End-to-end through the mapInPandas kernel: a REAL PNG's header
    dims come out exact while synthetic text blobs keep the
    deterministic fake dims (the oracle contract)."""
    import numpy as np

    ship_package(spark)
    png = _png_bytes(np.zeros((12, 34, 3), dtype=np.uint8))
    df = spark.createDataFrame(
        [Row(doc_id=1, content=bytearray(png)),
         Row(doc_id=2, content=bytearray(b"plain text blob"))]
    )
    rows = {r["doc_id"]: r for r in decode_meta(df, "content").collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (34, 12, 3)
    exp = _fake_decode(b"plain text blob")
    assert (rows[2]["width"], rows[2]["height"], rows[2]["channels"]) == exp


def test_resize_real_png_uses_decoded_pixels(spark):
    """resize_media on a real PNG must sample the true pixel plane:
    a constant-color image resizes to that exact color everywhere."""
    import numpy as np

    ship_package(spark)
    px = np.full((16, 16, 3), 200, dtype=np.uint8)
    png = _png_bytes(px)
    df = spark.createDataFrame([Row(doc_id=1, content=bytearray(png))])
    row = resize_media(df, "content", width=4, height=4).collect()[0]
    assert row["r_channels"] == 3
    assert bytes(row["resized"]) == bytes([200] * (4 * 4 * 3))


def test_resize_is_fail_soft_on_unsupported_png(spark):
    """A PNG-magic blob outside the supported decode profile (here: a
    truncated header) must fall back to the fake plane like any other
    blob — one bad byte stream never aborts the resize job."""
    import struct
    import zlib

    from yodel_etl_spark.scale.multimodal import resize_media

    # valid magic + IHDR declaring 16-bit depth (unsupported profile)
    ihdr = struct.pack(">II", 4, 4) + bytes([16, 0, 0, 0, 0])
    chunk = struct.pack(">I", 13) + b"IHDR" + ihdr + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    blob = b"\x89PNG\r\n\x1a\n" + chunk
    df = spark.createDataFrame([(1, bytearray(blob)), (2, bytearray(b"notapng"))],
                               "id long, content binary")
    rows = {r["id"]: r for r in resize_media(df, "content", width=4, height=4).collect()}
    assert rows[1]["r_channels"] > 0 and len(rows[1]["resized"]) > 0
    assert rows[2]["r_channels"] > 0


def test_jpeg_header_walk_skips_fill_bytes(spark):
    """JPEG spec B.1.1.2: 0xFF fill bytes may pad any marker — the
    header walk must skip them, not misread a length."""
    import struct

    from yodel_etl_spark.scale.multimodal import parse_image_header

    sof = b"\xff\xc0" + struct.pack(">H", 11) + bytes([8]) + struct.pack(">HH", 7, 9) + bytes([3, 0, 0, 0])
    # SOI + APP0 with two fill bytes before it + fill byte before SOF
    app0 = b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
    blob = b"\xff\xd8" + b"\xff" + app0 + b"\xff" + sof
    assert parse_image_header(blob) == (9, 7, 3)


def test_decode_pixels_external_decoder_hook(spark):
    """The r12 pluggable-codec hook on the image side: unrecognized
    containers (a fake video frame) and recognized-but-broken profiles
    (a truncated BMP) fall through to the external decoder; dHash rides
    the same hook end-to-end; and without a decoder both gates still
    raise — the honest defaults, untouched."""
    import numpy as np
    import pytest

    from yodel_etl_spark.scale.codecs import bmp_pack
    from yodel_etl_spark.scale.multimodal import decode_pixels
    from yodel_etl_spark.scale.phash import dhash64, image_dhash

    grad = np.tile(
        np.arange(0, 160, 10, dtype=np.uint8)[None, :, None], (12, 1, 3)
    )

    def mock_decoder(blob):
        # deterministic 12x16x3 plane keyed off the first payload byte
        return (grad + (blob[-1] % 7)).astype(np.uint8)

    fake_frame = b"\x00\x00\x01\xb3video-frame-payload"  # no known magic
    bad_bmp = b"BM" + b"\x01" * 10  # recognized magic, truncated body

    px = decode_pixels(fake_frame, decoder=mock_decoder)
    assert px.shape == (12, 16, 3)
    assert decode_pixels(bad_bmp, decoder=mock_decoder).shape == (12, 16, 3)
    with pytest.raises(NotImplementedError):
        decode_pixels(fake_frame)
    with pytest.raises(ValueError):
        decode_pixels(bad_bmp)

    real_bmp = bmp_pack(grad)
    df = spark.createDataFrame(
        [(1, bytearray(real_bmp)), (2, bytearray(fake_frame))],
        "id long, content binary",
    )
    got = {
        r["id"]: r for r in image_dhash(df, decoder=mock_decoder).collect()
    }
    assert got[1]["dhash"] == dhash64(grad)  # builtin path untouched
    assert got[2]["dhash"] == dhash64(mock_decoder(fake_frame))
    assert (got[2]["img_h"], got[2]["img_w"]) == (12, 16)
    with pytest.raises(Exception, match="NotImplemented|pyav"):
        image_dhash(df).collect()  # default gate intact


def test_decode_pixels_refuses_non_uint8_decoder_output():
    """A decoder returning float [0,1] (the common ML-decoder
    convention) must be REFUSED, not coerced — truncating to uint8
    would hash every such image as black (the silent-fake mode)."""
    import numpy as np
    import pytest

    from yodel_etl_spark.scale.multimodal import decode_pixels

    def float_decoder(blob):
        return np.full((4, 4, 3), 0.5, dtype=np.float32)

    with pytest.raises(ValueError, match="uint8"):
        decode_pixels(b"\x00\x00\x01\xb3frame", decoder=float_decoder)
