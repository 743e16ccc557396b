"""Multimodal (image/audio/video) column plumbing.

Posture: media are opaque ``BINARY`` columns + typed metadata structs;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched Pandas UDFs over ``mapInPandas`` so bytes never cross a
row-at-a-time Python boundary.  Header metadata (width/height/channels)
parses REAL image formats dependency-free (:func:`parse_image_header`:
PNG/GIF/BMP/JPEG magic bytes), and PIXELS decode pure-stdlib for all
four via :func:`decode_pixels` — PNG (zlib + unfilter, here), baseline
JPEG (Huffman + IDCT, ``scale/jpeg.py``), GIF (LZW) and BI_RGB BMP
(``scale/codecs.py``); blobs that are not a recognized format (the
synthetic text-as-bytes corpus) fall back to a deterministic fake the
SQL oracle can reproduce.  Video/audio pixels remain honestly gated on
pyav in :func:`try_real_decode`.

At 100 TB: binaries dominate partition size — set
``spark.sql.files.maxPartitionBytes`` down (e.g. 32 MB) so a partition
of blobs still fits executor memory, and keep metadata in separate
(pruned) columns so metadata-only queries never touch bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata schema attached by decode_meta
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("byte_len", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def _fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in dims for blobs that are NOT a recognized
    image format (the synthetic text-as-bytes corpus): derived from the
    first bytes so the SQL oracle can reproduce them."""
    if not blob:
        return (0, 0, 0)
    b0 = blob[0]
    b1 = blob[1] if len(blob) > 1 else 0
    return (b0 % 64 + 1, b1 % 64 + 1, 3)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> samples per pixel (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: JPEG start-of-frame markers that carry dimensions (SOF0-15 minus
#: DHT/JPG/DAC which share the 0xC range)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
#: valid DIB header sizes (CORE, INFO, V2-V5) — doubles as the BMP
#: validity check: the field's upper bytes are NUL, so no UTF-8 text
#: blob can false-positive as BMP
_BMP_DIB_SIZES = frozenset({12, 40, 52, 56, 64, 108, 124})


def parse_image_header(blob: bytes) -> tuple[int, int, int] | None:
    """Dependency-free (width, height, channels) from real image magic
    bytes — PNG IHDR, GIF logical screen descriptor, BMP DIB header,
    JPEG SOF marker walk.  Returns None for anything unrecognized, so
    callers fall back to the deterministic fake for synthetic blobs.

    Validation is strict enough that valid-UTF-8 text can never parse
    as an image: PNG's \\x89 and JPEG's \\xff are illegal UTF-8 lead
    bytes, BMP requires NUL bytes inside the DIB-size field, and GIF
    requires the exact 6-byte version magic (no English text starts
    'GIF87a'/'GIF89a')."""
    import struct

    if len(blob) < 16:
        return None
    if blob[:8] == _PNG_MAGIC and blob[12:16] == b"IHDR" and len(blob) >= 26:
        w, h = struct.unpack(">II", blob[16:24])
        color_type = blob[25]
        ch = _PNG_CHANNELS.get(color_type)
        return (w, h, ch) if ch and w and h else None
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", blob[6:10])
        return (w, h, 3) if w and h else None
    if blob[:2] == b"BM" and len(blob) >= 30:
        (dib,) = struct.unpack("<I", blob[14:18])
        if dib not in _BMP_DIB_SIZES:
            return None
        if dib == 12:  # BITMAPCOREHEADER: uint16 dims
            w, h = struct.unpack("<HH", blob[18:22])
            (bpp,) = struct.unpack("<H", blob[24:26])
        else:  # BITMAPINFOHEADER and later: int32 dims (h<0 = top-down)
            w, h = struct.unpack("<ii", blob[18:26])
            (bpp,) = struct.unpack("<H", blob[28:30])
            h = abs(h)
        ch = max(1, bpp // 8)
        return (w, h, ch) if w and h else None
    if blob[:3] == b"\xff\xd8\xff":
        # marker walk to the first SOF segment
        i = 2
        while i + 9 <= len(blob):
            if blob[i] != 0xFF:
                return None
            marker = blob[i + 1]
            if marker == 0xFF:
                # spec B.1.1.2: any number of 0xFF fill bytes may pad a
                # marker — skip them or the walk misreads the real
                # marker byte as a segment length
                i += 1
                continue
            if marker in _JPEG_SOF:
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                ncomp = blob[i + 9] if i + 9 < len(blob) else 0
                return (w, h, ncomp) if w and h and ncomp else None
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            (seglen,) = struct.unpack(">H", blob[i + 2 : i + 4])
            i += 2 + seglen
        return None
    return None


def decode_png_pixels(blob: bytes):
    """Pure-stdlib PNG decode to an ``(h, w, channels)`` uint8 numpy
    array: zlib inflate + per-scanline unfilter (None/Sub/Up/Average/
    Paeth) + palette expansion — no codec library involved.

    Supports the overwhelmingly common profile: bit depth 8,
    non-interlaced, color types 0/2/3/4/6.  Raises ValueError on
    anything else (16-bit, Adam7) — callers fall back or fail loudly,
    never silently mis-decode."""
    import struct
    import zlib

    import numpy as np

    if blob[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, b"", None
    w = h = depth = color_type = interlace = None
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        ctype = blob[pos + 4 : pos + 8]
        data = blob[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            w, h, depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + crc
    if w is None:
        raise ValueError("missing IHDR")
    if depth != 8 or interlace != 0:
        raise ValueError(f"unsupported PNG profile: depth={depth} interlace={interlace}")
    nch = _PNG_CHANNELS.get(color_type)
    if nch is None:
        raise ValueError(f"unsupported color type {color_type}")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = w * nch + 1
    if len(raw) != h * stride:
        raise ValueError("IDAT size mismatch")
    rows = raw.reshape(h, stride)
    out = np.zeros((h, w * nch), dtype=np.uint8)
    bpp = nch  # bytes per pixel at depth 8
    for y in range(h):
        filt, line = rows[y, 0], rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(w * nch, dtype=np.int32)
        if filt == 0:
            cur = line
        elif filt == 2:  # Up
            cur = (line + prev) & 0xFF
        elif filt in (1, 3, 4):  # Sub/Average/Paeth need left-to-right
            cur = np.empty(w * nch, dtype=np.int32)
            for x in range(w * nch):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if filt == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif filt == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad filter byte {filt}")
        out[y] = cur.astype(np.uint8)
    px = out.reshape(h, w, nch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        px = plte[px[:, :, 0]]
    return px


def decode_pixels(blob: bytes, decoder=None):
    """Pure-stdlib pixel decode to a ``(h, w, channels)`` uint8 array
    for every image format :func:`parse_image_header` recognizes.
    Raises (ValueError for unsupported profiles, NotImplementedError for
    non-image formats) — never a silent fake.

    ``decoder`` (opt-in) is the pluggable-codec hook: an unrecognized
    container (H.26x/AV1 video frame, WebP, …) or ANY ``ValueError``
    from the builtin path — which covers both unsupported profiles
    (progressive JPEG, RLE BMP, 16-bit/Adam7 PNG) and corrupt/truncated
    streams, the builtins do not distinguish them — falls through to
    ``decoder(blob)``; the decoder sees the raw blob and applies its
    own validation.  It must return ``(h, w, channels)`` (or 2-D gray)
    **uint8** — any other dtype raises rather than being coerced, since
    silently truncating a float/16-bit plane to zeros is the
    hash-every-image-as-black bug.  A decoder failure propagates — the
    defaults stay raising."""
    import numpy as np

    try:
        if blob[:8] == _PNG_MAGIC:
            return decode_png_pixels(blob)
        if blob[:3] == b"\xff\xd8\xff":
            from yodel_etl_spark.scale.jpeg import decode_jpeg_pixels

            return decode_jpeg_pixels(blob)
        if blob[:6] in (b"GIF87a", b"GIF89a"):
            from yodel_etl_spark.scale.codecs import decode_gif_pixels

            return decode_gif_pixels(blob)
        if blob[:2] == b"BM":
            from yodel_etl_spark.scale.codecs import decode_bmp_pixels

            return decode_bmp_pixels(blob)
        raise NotImplementedError(
            "pixel decode for video/audio requires pyav, absent from this "
            "runtime; every image format parse_image_header recognizes "
            "(PNG/JPEG/GIF/BMP) decodes pure-stdlib above (unsupported "
            "profiles — progressive JPEG, RLE BMP, 16-bit/Adam7 PNG — "
            "raise ValueError, never a silent fake)"
        )
    except (NotImplementedError, ValueError):
        if decoder is None:
            raise
    px = np.asarray(decoder(blob))
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3:
        raise ValueError(
            f"external decoder returned shape {px.shape}; want (h, w, c)"
        )
    if px.dtype != np.uint8:
        raise ValueError(
            f"external decoder returned dtype {px.dtype}; the contract "
            "is uint8 pixels — coercing a float [0,1] or 16-bit plane "
            "would silently truncate to zeros/wrapped values"
        )
    return px


def try_real_decode(blob: bytes):
    """Real pixel decode: PIL when present (returns a PIL Image), else
    the pure-stdlib :func:`decode_pixels` array paths."""
    try:
        import io

        from PIL import Image

        return Image.open(io.BytesIO(blob))  # pragma: no cover - no PIL here
    except ImportError:
        pass
    return decode_pixels(blob)


def _decode(blob: bytes) -> tuple[int, int, int]:
    """Header dims: real parse for recognized image magics, the
    deterministic fake otherwise (synthetic text-as-bytes corpus)."""
    if not blob:
        return (0, 0, 0)
    return parse_image_header(blob) or _fake_decode(blob)


def decode_meta(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Attach MEDIA_META_SCHEMA columns from the binary column via
    ``mapInPandas`` (one Arrow batch at a time, hashlib on raw bytes —
    no per-row Python function dispatch beyond the batch loop)."""
    import hashlib

    out_schema = T.StructType(df.schema.fields + list(MEDIA_META_SCHEMA.fields))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf[binary_col]
            pdf = pdf.copy()
            pdf["byte_len"] = blobs.map(lambda b: len(b) if b is not None else 0).astype("int64")
            pdf["sha256"] = blobs.map(
                lambda b: hashlib.sha256(b).hexdigest() if b is not None else ""
            )
            dims = blobs.map(lambda b: _decode(b or b""))
            pdf["width"] = dims.map(lambda d: d[0]).astype("int32")
            pdf["height"] = dims.map(lambda d: d[1]).astype("int32")
            pdf["channels"] = dims.map(lambda d: d[2]).astype("int32")
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def frame_offsets(df: DataFrame, binary_col: str = "content", n_frames: int = 4) -> DataFrame:
    """Frame sampling (video analogue): pick ``n_frames`` deterministic
    byte offsets per blob — pure column algebra, no UDF (the decode of
    each frame would then be a mapInPandas like decode_meta)."""
    size = F.length(F.col(binary_col))
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    offsets = F.transform(idx, lambda i: (size * i / n_frames).cast("long"))
    return df.withColumn("frame_offsets", F.when(size > 0, offsets).otherwise(F.array().cast("array<long>")))


def resize_media(
    df: DataFrame,
    binary_col: str = "content",
    width: int = 8,
    height: int = 8,
) -> DataFrame:
    """Image resize plumbing: blob → fixed ``width×height×channels`` raw
    buffer via nearest-neighbor index sampling (numpy, per Arrow batch).

    Real PNGs decode for real (:func:`decode_png_pixels` — pure-stdlib
    inflate + unfilter); unrecognized blobs use the deterministic fake
    plane (:func:`_fake_decode` dims, raw bytes cycled into the pixel
    grid) so the synthetic corpus stays oracle-reproducible.  Batch
    shape, binary output column, dimension metadata, and index math are
    identical across both paths.  Empty/NULL blobs yield empty output
    (fail-soft)."""
    import numpy as np

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("resized", T.BinaryType()),
            T.StructField("r_width", T.IntegerType()),
            T.StructField("r_height", T.IntegerType()),
            T.StructField("r_channels", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized: list[bytes] = []
            chans: list[int] = []
            for b in pdf[binary_col]:
                if not b:
                    resized.append(b"")
                    chans.append(0)
                    continue
                # fail-soft: a blob outside the supported profile
                # (16-bit/Adam7 PNG, progressive JPEG, RLE BMP,
                # truncated stream) falls back to the fake plane like
                # any other blob — one bad byte stream must never abort
                # the whole resize job
                try:
                    px = decode_pixels(bytes(b))
                    h, w, c = px.shape
                except Exception:
                    px = None
                if px is None:
                    w, h, c = _fake_decode(b)
                    # cycle the raw bytes into the fake W×H×C pixel plane
                    px = np.resize(np.frombuffer(b, dtype=np.uint8), w * h * c).reshape(h, w, c)
                yi = np.arange(height) * h // height  # nearest-neighbor rows
                xi = np.arange(width) * w // width  # nearest-neighbor cols
                resized.append(px[yi][:, xi].tobytes())
                chans.append(c)
            pdf = pdf.copy()
            pdf["resized"] = resized
            pdf["r_width"] = pd.array([width] * len(pdf), dtype="int32")
            pdf["r_height"] = pd.array([height] * len(pdf), dtype="int32")
            pdf["r_channels"] = pd.array(chans, dtype="int32")
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)


def byte_histogram_features(
    df: DataFrame, binary_col: str = "content", n_bins: int = 8, normalize: bool = True
) -> DataFrame:
    """Feature extraction stand-in: ``n_bins``-bin byte histogram as an
    ``array<double>`` feature vector via mapInPandas (numpy bincount per
    Arrow batch) — the shape a real CLIP/audio-embedding UDF would have.

    ``normalize=False`` emits raw counts (exact integers) — the
    oracle-comparable form, since count ratios are non-terminating
    doubles whose string forms differ across engines."""
    import numpy as np

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )
    shift = 8 - (n_bins.bit_length() - 1)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf[binary_col]:
                if not b:
                    feats.append([0.0] * n_bins)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr >> shift, minlength=n_bins)[:n_bins]
                if normalize:
                    hist = hist / max(len(arr), 1)
                feats.append(hist.astype("float64").tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(batches, schema=out_schema)
