"""Pure-stdlib baseline-sequential JPEG decoder (ITU-T T.81 / JFIF).

Closes the dominant gap in the dependency-free pixel path
(``scale/multimodal.py``): PNG already decodes via zlib+unfilter; this
module decodes the baseline-sequential profile that covers the vast
majority of web-corpus JPEGs — SOF0, Huffman entropy coding, 8-bit
samples, grayscale or YCbCr with any 1/2× sampling factors (4:4:4,
4:2:2, 4:2:0), restart intervals.  Everything else (progressive SOF2,
arithmetic coding, 12-bit, hierarchical) raises ``ValueError`` — the
caller falls back or fails loudly, never silently mis-decodes.

numpy is used for the block math (dequant + IDCT as two 8×8 matmuls per
block, plane assembly); the bitstream walk is plain Python.  That makes
this decoder correctness-grade, not throughput-grade — at 100 TB the
decode stage would swap in a codec library behind the same
``try_real_decode`` seam, exactly like the PNG path documents.
"""

from __future__ import annotations

import struct

import numpy as np

#: zigzag scan order: zigzag index -> raster index within the 8x8 block
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-II basis: C[u, x] = c(u)/2 * cos((2x+1) u pi / 16); the
# inverse transform of coefficient block K is C.T @ K @ C
_C = np.zeros((8, 8))
for _u in range(8):
    _cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = _cu / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)


class _Huff:
    """Canonical Huffman table from a DHT segment: 16 length counts +
    symbols in code order."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with JPEG byte
    unstuffing (0xFF 0x00 -> literal 0xFF) and restart-marker breaks."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bits = 0
        self.nbits = 0
        self.marker: int | None = None  # pending RST/EOI marker code

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("read past restart marker")
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded data")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt is None:
                # blob ends on a lone 0xFF: there is no marker byte, so
                # this is truncation — raising here (not fabricating a
                # 1-fill byte with marker=None) keeps a decode from
                # silently completing on a cut-off stream
                raise ValueError("truncated entropy-coded data")
            if nxt == 0x00:
                self.pos += 1  # stuffed byte: literal 0xFF
            else:
                # a real marker terminates the entropy segment; feed 1-fill
                # padding (spec B.2.5) until the caller consumes the marker
                self.marker = nxt
                self.pos += 1
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                return
        self.bits = (self.bits << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")

    def sync_restart(self, expect: int) -> None:
        """Byte-align and consume the pending RSTn marker."""
        self.bits = 0
        self.nbits = 0
        if self.marker is None:
            # marker not yet hit while bits remained — scan forward
            while self.pos + 1 < len(self.data):
                if self.data[self.pos] == 0xFF and self.data[self.pos + 1] != 0x00:
                    self.marker = self.data[self.pos + 1]
                    self.pos += 2
                    break
                self.pos += 1
        if self.marker != 0xD0 + expect:
            raise ValueError(
                f"expected RST{expect}, found {self.marker!r}"
            )
        self.marker = None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map t read bits to the signed coefficient."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(blob: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG to an ``(h, w, channels)`` uint8
    array (channels 1 = grayscale, 3 = RGB via JFIF YCbCr).  Raises
    ValueError for any non-baseline profile."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (h, w, [(comp_id, hi, vi, tq)])
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = blob[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", blob[pos + 2 : pos + 4])
        seg = blob[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT: one or more tables per segment
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if prec == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                qt[tid] = tbl  # stored in zigzag order
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                syms = seg[i + 17 : i + 17 + n]
                (huff_dc if cls == 0 else huff_ac)[tid] = _Huff(counts, syms)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported sample precision {prec}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"non-baseline JPEG (SOF{marker - 0xC0}) — only "
                "baseline-sequential (SOF0) is supported without a codec lib"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tables = {}
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables[cs] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                blob, pos, frame, scan_tables, qt, huff_dc, huff_ac, restart_interval
            )
        # other markers (APPn, COM) are skipped
    raise ValueError("no SOS marker found")


def _decode_scan(blob, start, frame, scan_tables, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    if not comps or len(comps) not in (1, 3):
        raise ValueError(f"unsupported component count {len(comps)}")
    if len(scan_tables) != len(comps):
        # T.81 allows a baseline frame split into sequential Ns=1 scans
        # (one per component); supporting it needs multi-scan plumbing —
        # raise the documented ValueError, never a KeyError mid-decode
        raise ValueError(
            "sequential (multi-scan) baseline JPEG not supported — "
            f"scan covers {len(scan_tables)} of {len(comps)} components"
        )
    if len(comps) == 1:
        # T.81 A.2.3: a single-component scan is NON-interleaved — the
        # MCU is ONE data unit and blocks cover ceil(w/8) x ceil(h/8)
        # raster-wise, regardless of the declared sampling factors
        # (decoding hi x vi > 1 as interleaved would silently scramble
        # block positions)
        hmax = vmax = 1
        comps = [(comps[0][0], 1, 1, comps[0][3])]
    else:
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
    # validate the whole table/sampling surface BEFORE decoding: a scan
    # referencing an undefined quant/Huffman table id would otherwise
    # KeyError mid-decode, and non-dyadic sampling ratios (legal per
    # T.81, e.g. 3:2) would surface as numpy shape errors from the
    # repeat-upsample — both contradict the module's "everything else
    # raises ValueError" contract
    for cid, hi, vi, tq in comps:
        if cid not in scan_tables:
            raise ValueError(f"scan references unknown component id {cid}")
        if tq not in qt:
            raise ValueError(f"undefined quantization table {tq} (component {cid})")
        dc_t, ac_t = scan_tables[cid]
        if dc_t not in huff_dc:
            raise ValueError(f"undefined DC Huffman table {dc_t} (component {cid})")
        if ac_t not in huff_ac:
            raise ValueError(f"undefined AC Huffman table {ac_t} (component {cid})")
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            raise ValueError(
                f"non-dyadic sampling factors {hi}x{vi} vs max {hmax}x{vmax} "
                "— only integer-ratio subsampling is supported"
            )
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    planes = []
    for _cid, hi, vi, _tq in comps:
        planes.append(np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64))

    reader = _BitReader(blob, start)
    pred = [0] * len(comps)
    rst = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.sync_restart(rst)
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                dc_t, ac_t = scan_tables[cid]
                qtbl = qt[tq]
                for by in range(vi):
                    for bx in range(hi):
                        zz = np.zeros(64, dtype=np.int32)
                        t = reader.decode_symbol(huff_dc[dc_t])
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(huff_ac[ac_t])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * qtbl
                        px = _C.T @ block.reshape(8, 8) @ _C + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            n_mcu += 1

    # upsample subsampled planes to full resolution (nearest) and crop
    full = []
    for ci, (_cid, hi, vi, _tq) in enumerate(comps):
        p = planes[ci]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    else:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
