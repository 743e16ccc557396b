"""Audio (WAV/PCM) column support — the audio half of the multimodal
posture (see ``scale/multimodal.py``): opaque BINARY blobs + typed
metadata, decoded pure-stdlib (RIFF/WAVE container; PCM 8/16/32-bit,
IEEE float32, G.711 µ-law/A-law [format tags 7/6 — the telephony/ASR
codecs, 256-entry table decode per the classic G.711 reference
formulas], and IMA-ADPCM [tag 0x11 — block-structured 4-bit DVI/IMA];
MP3/AAC/Opus stay honestly gated exactly like progressive JPEG does on
the image side).

Feature extraction is Arrow-batched ``mapInPandas`` and emits EXACT
INTEGER aggregates (peak |sample|, Σ|sample|, Σ sample² as BIGINT), so
a SQL oracle can reproduce the numbers bit-for-bit — RMS/loudness are
one deterministic division away downstream.

At 100 TB the same partition-sizing note as images applies: audio blobs
dominate partition bytes, so shrink ``spark.sql.files.maxPartitionBytes``
and keep the metadata in separate pruned columns.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: metadata + exact-integer features attached by audio_features
AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_samples", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits", T.IntegerType()),
        T.StructField("peak_abs", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
    ]
)


def parse_wav_header(blob: bytes) -> dict | None:
    """RIFF/WAVE container parse: returns ``{format, channels,
    sample_rate, bits, data_offset, data_len}`` or None when the blob
    is not a WAV.  Walks chunks (fmt may not be first — LIST/INFO
    chunks precede it in the wild); raises ValueError on a recognized
    but truncated/contradictory container — never a silent fake."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    fact_samples = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", blob, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if clen < 16 or body + 16 > len(blob):
                raise ValueError("truncated fmt chunk")
            audio_fmt, ch, rate, _, block_align, bits = struct.unpack_from(
                "<HHIIHH", blob, body
            )
            fmt = {
                "format": audio_fmt,
                "channels": ch,
                "sample_rate": rate,
                "block_align": block_align,
                "bits": bits,
            }
        elif cid == b"fact" and clen >= 4:
            # exact frame count for block codecs (the last ADPCM block
            # may be partial-filled); PCM readers ignore it
            (fact_samples,) = struct.unpack_from("<I", blob, body)
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt")
            if body + clen > len(blob):
                raise ValueError("truncated data chunk")
            return {
                **fmt,
                "fact_samples": fact_samples,
                "data_offset": body,
                "data_len": clen,
            }
        pos = body + clen + (clen & 1)  # chunks are word-aligned
    if fmt is not None:
        raise ValueError("WAV without data chunk")
    return None


def _g711_mulaw_table():
    """256-entry µ-law → linear int16 table (classic G.711 reference
    decode: invert, bias-expand the segment/mantissa — output range
    ±32124)."""
    import numpy as np

    u = ~np.arange(256, dtype=np.int64) & 0xFF
    t = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, 0x84 - t, t - 0x84).astype(np.int16)


def _g711_alaw_table():
    """256-entry A-law → linear int16 table (classic G.711 reference
    decode: xor 0x55, segment expand — output range ±32256)."""
    import numpy as np

    a = np.arange(256, dtype=np.int64) ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


#: IMA-ADPCM step-size and index-adjust tables (IMA ADPCM reference
#: algorithm — public spec constants)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_decode_nibbles(nibbles, predictor: int, index: int):
    """Reference IMA-ADPCM inner loop: one channel's nibble stream from
    a block header state → list of int16 samples (the per-nibble
    feedback makes this inherently sequential; blocks are independent,
    which is where the parallelism lives)."""
    out = []
    for nib in nibbles:
        step = _IMA_STEPS[index]
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            diff = -diff
        predictor = max(-32768, min(32767, predictor + diff))
        index = max(0, min(88, index + _IMA_INDEX_ADJ[nib & 0x07]))
        out.append(predictor)
    return out


def _decode_ima_adpcm(data: bytes, channels: int, block_align: int):
    """IMA-ADPCM (WAV format 0x11) → ``(n, ch)`` int16.  Per block and
    channel: 4-byte header (predictor int16, step index, reserved),
    then nibble data in 4-byte per-channel groups (low nibble first).
    The block header predictor IS the block's first output sample (DVI
    convention — matches the samples-per-block formula
    ``(block_align - 4·ch)·2/ch + 1``)."""
    import numpy as np

    ch = max(channels, 1)
    if block_align < 4 * ch + 4 * ch or block_align % 4:
        raise ValueError(f"bad IMA-ADPCM block_align {block_align}")
    tail = len(data) % block_align
    if tail and tail < 4 * ch:
        # a non-empty tail too short to hold the per-channel headers
        # carries no decodable sample — corrupt container, honest gate
        raise ValueError(
            f"IMA-ADPCM trailing fragment of {tail} bytes is shorter "
            f"than the {4 * ch}-byte block header"
        )
    frames: list[list[int]] = [[] for _ in range(ch)]
    # range over len(data) (not len-block_align+1): real IMA WAVs often
    # end with a SHORT final block (the fact chunk carries the true
    # frame count) — decode its header + whatever nibble groups are
    # present instead of silently dropping those samples
    for base in range(0, len(data), block_align):
        block = data[base : base + block_align]
        states = []
        for c in range(ch):
            pred, idx = struct.unpack_from("<hB", block, 4 * c)
            if idx > 88:
                raise ValueError(f"IMA-ADPCM step index {idx} > 88")
            states.append((pred, idx))
            frames[c].append(pred)  # header predictor = first sample
        # nibble payload: alternating 4-byte groups per channel
        payload = block[4 * ch :]
        per_ch_bytes: list[bytearray] = [bytearray() for _ in range(ch)]
        for g in range(0, len(payload), 4):
            per_ch_bytes[(g // 4) % ch] += payload[g : g + 4]
        for c in range(ch):
            bs = per_ch_bytes[c]
            nibs = []
            for b in bs:
                nibs.append(b & 0x0F)
                nibs.append(b >> 4)
            frames[c].extend(_ima_decode_nibbles(nibs, *states[c]))
    n = min(len(f) for f in frames) if frames else 0
    return np.array([f[:n] for f in frames], dtype=np.int16).T


def decode_wav_samples(blob: bytes, header: dict | None = None):
    """Decode to an ``(n_frames, channels)`` numpy array.  PCM 8-bit
    (unsigned → centered int), 16/32-bit (signed little-endian), IEEE
    float32, G.711 µ-law/A-law (tags 7/6 → int16 via the classic
    table expand), and IMA-ADPCM (tag 0x11 → int16 block decode);
    anything else (format 85 = MP3-in-WAV, …) raises
    NotImplementedError — the honest gate.  Pass a pre-parsed
    ``header`` to skip the chunk walk (audio_features already has one;
    re-parsing per blob doubled the container work in the hot path)."""
    import numpy as np

    h = header if header is not None else parse_wav_header(blob)
    if h is None:
        raise NotImplementedError("not a RIFF/WAVE container")
    data = blob[h["data_offset"] : h["data_offset"] + h["data_len"]]
    if h["format"] == 1:  # PCM
        if h["bits"] == 8:
            arr = np.frombuffer(data, dtype=np.uint8).astype(np.int16) - 128
        elif h["bits"] == 16:
            arr = np.frombuffer(data, dtype="<i2")
        elif h["bits"] == 32:
            arr = np.frombuffer(data, dtype="<i4")
        else:
            raise NotImplementedError(f"PCM bits={h['bits']}")
    elif h["format"] == 3 and h["bits"] == 32:  # IEEE float
        arr = np.frombuffer(data, dtype="<f4")
    elif h["format"] in (6, 7):  # G.711 A-law / µ-law
        table = _g711_alaw_table() if h["format"] == 6 else _g711_mulaw_table()
        arr = table[np.frombuffer(data, dtype=np.uint8)]
    elif h["format"] == 0x11:  # IMA-ADPCM
        out = _decode_ima_adpcm(
            data, h["channels"], h.get("block_align") or 0
        )
        fact = h.get("fact_samples")
        return out[:fact] if fact else out
    else:
        raise NotImplementedError(
            f"WAV format {h['format']} (MP3/AAC-class compressed audio "
            "needs a codec library absent from this runtime)"
        )
    ch = max(h["channels"], 1)
    n = len(arr) // ch
    return arr[: n * ch].reshape(n, ch)


def _decoded_frames(b: bytes, decoder):
    """``(samples (n, ch), sample_rate, channels, bits)`` via the
    container decode, falling through to the optional EXTERNAL
    ``decoder`` on exactly the honest gates (not-a-RIFF container,
    unsupported format tag) — the pluggable-codec hook for MP3/AAC-class
    audio without touching the default raise.  Decoder contract:
    ``(blob) -> (samples, sample_rate)`` with samples ``(n,)`` or
    ``(n, ch)``; ``bits`` reports 0 for externally-decoded blobs (the
    container never told us).  A decoder failure propagates — a silent
    fake is the forbidden mode."""
    import numpy as np

    h = parse_wav_header(b)
    try:
        arr = decode_wav_samples(b, header=h)
        return arr, h["sample_rate"], h["channels"], h["bits"]
    except NotImplementedError:
        if decoder is None:
            raise
    arr, rate = decoder(b)
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    return arr, int(rate), int(arr.shape[1]), 0


def wav_pack(samples, sample_rate: int = 8000, bits: int = 16) -> bytes:
    """Build a canonical PCM WAV blob from an ``(n, ch)`` int array —
    the synth side of the roundtrip (tests and the planted query blobs
    go through the REAL container, not a shortcut)."""
    import numpy as np

    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    ch = arr.shape[1]
    if bits == 16:
        payload = arr.astype("<i2").tobytes()
    elif bits == 8:
        payload = (arr.astype(np.int16) + 128).astype(np.uint8).tobytes()
    elif bits == 32:
        payload = arr.astype("<i4").tobytes()
    else:
        raise ValueError(f"bits={bits}")
    block = ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, bits
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def audio_features(
    df: DataFrame, binary_col: str = "content", decoder=None
) -> DataFrame:
    """Attach AUDIO_FEATURES_SCHEMA columns from a WAV binary column via
    ``mapInPandas`` — exact integer aggregates over the decoded samples
    (int64 accumulation: 32-bit samples × realistic lengths stay far
    from overflow; float32 WAVs quantize to micro-units first so the
    sums remain exact integers).  ``decoder`` (opt-in) plugs an external
    codec into the honest MP3/AAC gates — see :func:`_decoded_frames`
    for the contract; by default those blobs still raise."""
    import numpy as np

    out_schema = T.StructType(df.schema.fields + list(AUDIO_FEATURES_SCHEMA))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob in pdf[binary_col]:
                b = bytes(blob)
                arr, rate, ch, bits = _decoded_frames(b, decoder)
                if arr.dtype.kind == "f":
                    arr = np.round(arr.astype(np.float64) * 1e6).astype(np.int64)
                else:
                    arr = arr.astype(np.int64)
                rows.append(
                    (
                        int(arr.shape[0]),
                        int(rate),
                        int(ch),
                        int(bits),
                        int(np.abs(arr).max()) if arr.size else 0,
                        int(np.abs(arr).sum()),
                        int((arr * arr).sum()),
                    )
                )
            feat = pd.DataFrame(
                rows,
                columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields],
                index=pdf.index,
            )
            yield pd.concat([pdf, feat], axis=1)

    return df.mapInPandas(batches, out_schema)


# ------------------------------------------------------------ video (MP4)
def parse_mp4_boxes(blob: bytes) -> dict | None:
    """ISO-BMFF (MP4/MOV) metadata parse — the video half of the
    container story: walks the top-level box tree, returns
    ``{brand, duration_s, timescale, n_tracks, track_types}`` from
    ftyp/moov/mvhd/trak/hdlr, or None when the blob is not ISO-BMFF.
    FRAME decode stays honestly gated (H.264/H.265/AV1 need codec
    libraries absent from this runtime) — exactly the
    progressive-JPEG / MP3 posture: metadata real, payload gated.
    Raises ValueError on a recognized but truncated/contradictory
    container."""
    if len(blob) < 12 or blob[4:8] != b"ftyp":
        return None
    out: dict = {
        "brand": blob[8:12].decode("latin-1"),
        "duration_s": None,
        "timescale": None,
        "n_tracks": 0,
        "track_types": [],
    }

    def walk(lo: int, hi: int, depth: int = 0) -> None:
        pos = lo
        while pos + 8 <= hi:
            (size,) = struct.unpack_from(">I", blob, pos)
            box = blob[pos + 4 : pos + 8]
            body = pos + 8
            if size == 1:  # 64-bit largesize
                if body + 8 > hi:
                    raise ValueError("truncated largesize box")
                (size,) = struct.unpack_from(">Q", blob, body)
                body += 8
            elif size == 0:  # box extends to end of enclosing scope
                size = hi - pos
            end = pos + size
            if size < 8 or end > hi:
                raise ValueError(f"truncated {box!r} box")
            if box == b"moov":
                walk(body, end, depth + 1)
            elif box == b"trak":
                out["n_tracks"] += 1
                walk(body, end, depth + 1)
            elif box in (b"mdia", b"minf"):
                walk(body, end, depth + 1)
            elif box == b"mvhd":
                ver = blob[body]
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", blob, body + 20)
                else:
                    ts, dur = struct.unpack_from(">II", blob, body + 12)
                out["timescale"] = ts
                out["duration_s"] = dur / ts if ts else None
            elif box == b"hdlr":
                out["track_types"].append(
                    blob[body + 8 : body + 12].decode("latin-1")
                )
            pos = end

    walk(0, len(blob))
    return out


# ------------------------------------------------- spectral (log-mel) features

#: schema attached by audio_spectral — the ASR-pipeline front-end shape
#: (a log-mel frame stack is what an audio encoder actually consumes);
#: arrays are fine here because this is a feature column for downstream
#: models, not a driver-hashed query output
SPECTRAL_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("zero_crossings", T.LongType()),
        T.StructField("log_mel_mean", T.ArrayType(T.DoubleType())),
        T.StructField("centroid_hz", T.DoubleType()),
    ]
)


def _mel_filterbank(n_mels: int, n_fft: int, sr: int):
    """Triangular mel filterbank (HTK scale, m = 2595·log10(1+f/700))
    over the rfft bin grid — the textbook construction, numpy-exact."""
    import numpy as np

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)

    n_bins = n_fft // 2 + 1
    freqs = np.arange(n_bins, dtype=np.float64) * (sr / n_fft)
    pts = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))
    fb = np.zeros((n_mels, n_bins), dtype=np.float64)
    for i in range(n_mels):
        lo, ctr, hi = pts[i], pts[i + 1], pts[i + 2]
        up = (freqs - lo) / max(ctr - lo, 1e-12)
        down = (hi - freqs) / max(hi - ctr, 1e-12)
        fb[i] = np.clip(np.minimum(up, down), 0.0, None)
    return fb


def spectral_features_of(
    samples, sr: int, channels: int, n_mels: int = 16,
    frame: int = 256, hop: int = 128,
):
    """Per-blob spectral summary from decoded samples: Hann-windowed
    rfft power frames → mel filterbank → time-mean log-mel vector,
    plus the exact zero-crossing count and the power-weighted mean
    spectral centroid.  Pure numpy; the single-process twin the
    executor kernel is pinned against IS this function (the Spark op
    calls it per row, so the test twin recomputes it with an
    independent naive DFT instead)."""
    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if x.ndim == 2:
        # decode_wav_samples hands frames as (n_samples, channels)
        x = x.mean(axis=1)
    elif channels > 1:
        # interleaved 1-D layout
        n = (x.shape[0] // channels) * channels
        x = x[:n].reshape(-1, channels).mean(axis=1)
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    n_frames = 0 if x.shape[0] < frame else 1 + (x.shape[0] - frame) // hop
    if n_frames == 0:
        return 0, zc, [0.0] * n_mels, 0.0
    idx = np.arange(frame)[None, :] + hop * np.arange(n_frames)[:, None]
    win = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(frame) / frame)
    frames = x[idx] * win
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2
    fb = _mel_filterbank(n_mels, frame, sr)
    mel = spec @ fb.T
    log_mel = np.log(mel + 1e-10).mean(axis=0)
    freqs = np.arange(spec.shape[1], dtype=np.float64) * (sr / frame)
    total = spec.sum()
    centroid = float((spec * freqs[None, :]).sum() / total) if total > 0 else 0.0
    return int(n_frames), zc, [float(v) for v in log_mel], centroid


def audio_spectral(
    df: DataFrame,
    binary_col: str = "content",
    n_mels: int = 16,
    frame: int = 256,
    hop: int = 128,
    decoder=None,
) -> DataFrame:
    """Attach SPECTRAL_SCHEMA columns from a WAV binary column — the
    log-mel front-end an audio-model training pipeline runs after
    decode (frame → window → rfft → mel → log), Arrow-batched like
    :func:`audio_features`; blobs never leave their decode partition.
    Same honest gate as decode: non-PCM codecs raise upstream, unless
    an external ``decoder`` is plugged in (:func:`_decoded_frames`)."""
    import numpy as np

    out_schema = T.StructType(df.schema.fields + list(SPECTRAL_SCHEMA))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for blob in pdf[binary_col]:
                b = bytes(blob)
                arr, rate, ch, _bits = _decoded_frames(b, decoder)
                arr = arr.astype(np.float64)
                rows.append(
                    spectral_features_of(
                        arr, rate, ch,
                        n_mels=n_mels, frame=frame, hop=hop,
                    )
                )
            feat = pd.DataFrame(
                rows,
                columns=[f.name for f in SPECTRAL_SCHEMA.fields],
                index=pdf.index,
            )
            yield pd.concat([pdf, feat], axis=1)

    return df.mapInPandas(batches, out_schema)


def audio_fingerprint(
    df: DataFrame,
    binary_col: str = "content",
    frame: int = 256,
    hop: int = 128,
    decoder=None,
) -> DataFrame:
    """Attach a 64-bit perceptual fingerprint (``fp`` LongType) per WAV
    blob — the audio member of the near-dup sketch family (text SimHash,
    image dHash): bit b is the SIGN of the adjacent-mel-band energy
    delta ``E[b] − E[b+1]`` over 65 time-averaged log-mel bands
    (Haitsma–Kalker 2002's band-delta core, collapsed to clip grain).

    Two invariances the tests pin, because they are what make it a
    *perceptual* hash: a uniform GAIN change shifts every log-mel band
    by the same constant, so band DELTAS — and the fingerprint — are
    bit-identical; small additive noise flips only the bits whose
    deltas sit near zero, so near-dup clips land within a small Hamming
    distance while different content diverges to ~32.

    Pair finding is the shared banding join
    (``scale.dedup.hamming_pairs``): only ``(id, fp)`` longs shuffle —
    audio blobs never leave their decode partition, the same posture as
    the image path."""
    import numpy as np

    out_schema = T.StructType(df.schema.fields + [T.StructField("fp", T.LongType())])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            fps = []
            for blob in pdf[binary_col]:
                b = bytes(blob)
                arr, rate, ch, _bits = _decoded_frames(b, decoder)
                arr = arr.astype(np.float64)
                _nf, _zc, log_mel, _c = spectral_features_of(
                    arr, rate, ch,
                    n_mels=65, frame=frame, hop=hop,
                )
                fps.append(_fp_of_log_mel(log_mel))
            feat = pd.DataFrame({"fp": pd.array(fps, dtype="int64")}, index=pdf.index)
            yield pd.concat([pdf, feat], axis=1)

    return df.mapInPandas(batches, out_schema)


def _fp_of_log_mel(log_mel) -> int:
    """Band-delta sign bits → signed 64-bit fingerprint (the
    Haitsma–Kalker packing) — single-sourced so the chained and fused
    fingerprint paths are byte-identical by construction."""
    import numpy as np

    lm = np.asarray(log_mel)
    bits = (lm[:-1] - lm[1:]) > 0
    fp = 0
    for i, bit in enumerate(bits):
        if bit:
            fp |= 1 << i
    # two's-complement into a signed 64-bit long
    if fp >= 1 << 63:
        fp -= 1 << 64
    return fp


def audio_spectral_fingerprint(
    df: DataFrame,
    binary_col: str = "content",
    n_mels: int = 16,
    frame: int = 256,
    hop: int = 128,
    decoder=None,
) -> DataFrame:
    """SPECTRAL_SCHEMA columns PLUS the 64-bit fingerprint in ONE
    Arrow-batched pass — the fused form of
    ``audio_fingerprint(audio_spectral(df))`` (r15): the chained form
    decodes every blob twice and pays a second JVM↔Python round trip
    of the blob column purely to re-derive the samples the first pass
    already had.  Fused, each blob is decoded once and crosses the
    boundary once; both feature sets are computed from the identical
    float64 sample array by the same kernels
    (:func:`spectral_features_of` at ``n_mels`` and at the
    fingerprint's fixed 65 bands, :func:`_fp_of_log_mel`), so outputs
    are bit-identical to the chain — pinned in tests/test_audio.py."""
    import numpy as np

    out_schema = T.StructType(
        df.schema.fields
        + list(SPECTRAL_SCHEMA)
        + [T.StructField("fp", T.LongType())]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            fps = []
            for blob in pdf[binary_col]:
                b = bytes(blob)
                arr, rate, ch, _bits = _decoded_frames(b, decoder)
                arr = arr.astype(np.float64)
                rows.append(
                    spectral_features_of(
                        arr, rate, ch,
                        n_mels=n_mels, frame=frame, hop=hop,
                    )
                )
                _nf, _zc, log_mel, _c = spectral_features_of(
                    arr, rate, ch,
                    n_mels=65, frame=frame, hop=hop,
                )
                fps.append(_fp_of_log_mel(log_mel))
            feat = pd.DataFrame(
                rows,
                columns=[f.name for f in SPECTRAL_SCHEMA.fields],
                index=pdf.index,
            )
            feat["fp"] = pd.array(fps, dtype="int64")
            yield pd.concat([pdf, feat], axis=1)

    return df.mapInPandas(batches, out_schema)
