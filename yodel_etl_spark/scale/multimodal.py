"""Multimodal (image/audio/video) column plumbing.

Posture: media are opaque ``BINARY`` columns + typed metadata structs;
decode / feature-extraction / resize / frame-sampling run as
Arrow-batched Pandas UDFs over ``mapInPandas`` so bytes never cross a
row-at-a-time Python boundary.  The real codecs (PIL/libav/…) are NOT
in this container, so the decode kernels are deterministic fakes behind
``try``-imports with clearly-marked stubs — the Spark-side plumbing
(schema, batching, partitioning, UDF signature) is real and tested.

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
    """Deterministic stand-in for an image-header parse: dimensions
    derived from the first bytes.  STUB — replace with PIL/pyav when the
    codec libraries exist in the runtime."""
    if not blob:
        return (0, 0, 0)
    b0 = blob[0]
    b1 = blob[1] if len(blob) > 1 else 0
    return (b0 % 64 + 1, b1 % 64 + 1, 3)


def try_real_decode(blob: bytes):  # pragma: no cover - container lacks codecs
    """The real decode path, gated on the codec library being present."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL, which is not in this runtime; "
            "use the deterministic fake (decode_meta) for plumbing tests"
        ) from exc
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(blob))
    return img


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
            dims = blobs.map(lambda b: _fake_decode(b or b""))
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

    The "decode" uses the same deterministic fake header parse as
    :func:`decode_meta` (real codec honestly stubbed in
    :func:`try_real_decode`); everything else — batch shape, binary
    output column, dimension metadata, index math — is exactly what a
    PIL/libav-backed resize would run, so swapping the codec in touches
    one line.  Empty/NULL blobs yield empty output (fail-soft)."""
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
