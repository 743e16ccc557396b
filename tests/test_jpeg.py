"""Baseline-JPEG decoder tests.

No codec library exists in this runtime, so the fixtures are built by a
minimal baseline encoder defined HERE, with custom canonical Huffman
tables (all codes at one length, so code == symbol index) — every
expected pixel value is computable by hand from the DCT math.  The
encoder exercises the real container format: DQT/DHT/SOF0/DRI/SOS
segments, byte stuffing, restart markers, canonical code assignment.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from yodel_etl_spark.scale.jpeg import _C, decode_jpeg_pixels
from yodel_etl_spark.scale.multimodal import parse_image_header, try_real_decode


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def pad(self) -> None:
        while self.n:
            self.write(1, 1)  # 1-fill (spec B.2.5)


# custom tables: 12 DC symbols (categories 0-11) all at code length 8,
# and the needed AC run/size symbols all at length 8 — canonical
# assignment makes code == symbol index at 8 bits for both.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0x01, 0x07, 0x11, 0x16, 0xF0]


def _dht(cls: int, tid: int, syms: list[int]) -> bytes:
    counts = [0] * 16
    counts[7] = len(syms)  # all codes at length 8
    body = bytes([cls << 4 | tid]) + bytes(counts) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _encode_coef(wtr: _BitWriter, table: list[int], sym: int, value: int) -> None:
    wtr.write(table.index(sym), 8)
    size = sym & 0xF
    if size:
        bits = value if value > 0 else value + (1 << size) - 1
        wtr.write(bits, size)


def _category(v: int) -> int:
    return abs(v).bit_length()


def build_jpeg(
    h: int,
    w: int,
    comp_blocks: list[list[list[tuple[int, int]]]],
    sampling: list[tuple[int, int]],
    dri: int = 0,
) -> bytes:
    """Assemble a baseline JPEG.  ``comp_blocks[ci][mcu]`` is the list of
    8x8 blocks for component ci in that MCU, each block a list of
    (zigzag_index, coefficient) pairs (quant table is all-ones, so the
    coefficient IS the dequantized value).  Supported zigzag indices
    here: 0 (DC), 1 and 3 via AC symbols 0x01/0x11."""
    ncomp = len(comp_blocks)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + b"\x00" + b"\x01" * 64
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = sampling[ci]
        sof += bytes([ci + 1, hi << 4 | vi, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht(0, 0, _DC_SYMS) + _dht(1, 0, _AC_SYMS)
    if dri:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", dri)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wtr = _BitWriter()
    pred = [0] * ncomp
    n_mcus = len(comp_blocks[0])
    rst = 0
    for m in range(n_mcus):
        if dri and m and m % dri == 0:
            wtr.pad()
            out += wtr.out
            wtr = _BitWriter()
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            pred = [0] * ncomp
        for ci in range(ncomp):
            for block in comp_blocks[ci][m]:
                coefs = dict(block)
                dc = coefs.pop(0, 0)
                diff = dc - pred[ci]
                pred[ci] = dc
                t = _category(diff)
                _encode_coef(wtr, _DC_SYMS, t, diff)
                # AC: only zigzag 1 (run 0) and zigzag 3 (run 1 after
                # zz1... careful: encode in zigzag order with run counts
                last = 0
                for zz in sorted(coefs):
                    v = coefs[zz]
                    run = zz - last - 1
                    assert run in (0, 1), "test encoder supports runs 0/1"
                    sym = (run << 4) | _category(v)
                    assert sym in _AC_SYMS, f"add symbol {sym:#x} to _AC_SYMS"
                    _encode_coef(wtr, _AC_SYMS, sym, v)
                    last = zz
                _encode_coef(wtr, _AC_SYMS, 0x00, 0)  # EOB
    wtr.pad()
    out += wtr.out + b"\xff\xd9"
    return bytes(out)


def _idct_ref(coef_pairs: list[tuple[int, int]]) -> np.ndarray:
    """Independent IDCT reference: fill zigzag coefficients into the
    raster block via the spec's zigzag walk, apply C.T @ K @ C + 128."""
    from yodel_etl_spark.scale.jpeg import ZIGZAG

    block = np.zeros(64)
    for zz, v in coef_pairs:
        block[ZIGZAG[zz]] = v
    return np.clip(np.round(_C.T @ block.reshape(8, 8) @ _C + 128.0), 0, 255)


def test_uniform_gray_block():
    # uniform value 160: DC = (160-128)*8 = 256
    blob = build_jpeg(8, 8, [[[[(0, 256)]]]], [(1, 1)])
    assert parse_image_header(blob) == (8, 8, 1)
    px = decode_jpeg_pixels(blob)
    assert px.shape == (8, 8, 1)
    assert (px == 160).all()


def test_dc_prediction_across_blocks():
    # two horizontal blocks: values 160 then 96 (DC 256 then -256; the
    # second block's encoded DIFF is -512 — category 10)
    blocks = [[[(0, 256)]], [[(0, -256)]]]
    blob = build_jpeg(8, 16, [blocks], [(1, 1)])
    px = decode_jpeg_pixels(blob)
    assert px.shape == (8, 16, 1)
    assert (px[:, :8, 0] == 160).all()
    assert (px[:, 8:, 0] == 96).all()


def test_ac_coefficient_matches_reference_idct():
    coefs = [(0, 80), (1, 120), (3, -60)]  # DC + two ACs (runs 0 and 1)
    blob = build_jpeg(8, 8, [[[coefs]]], [(1, 1)])
    px = decode_jpeg_pixels(blob)
    assert (px[:, :, 0] == _idct_ref(coefs).astype(np.uint8)).all()


def test_color_420_uniform():
    # 16x16, 4:2:0: one MCU = 4 Y blocks + 1 Cb + 1 Cr.  Uniform
    # Y=120, Cb=100, Cr=140 -> one exact RGB everywhere.
    y_dc = (120 - 128) * 8
    cb_dc = (100 - 128) * 8
    cr_dc = (140 - 128) * 8
    comp_blocks = [
        [[[(0, y_dc)]] * 4],
        [[[(0, cb_dc)]]],
        [[[(0, cr_dc)]]],
    ]
    blob = build_jpeg(16, 16, comp_blocks, [(2, 2), (1, 1), (1, 1)])
    assert parse_image_header(blob) == (16, 16, 3)
    px = decode_jpeg_pixels(blob)
    assert px.shape == (16, 16, 3)
    r = np.clip(round(120 + 1.402 * (140 - 128)), 0, 255)
    g = np.clip(round(120 - 0.344136 * (100 - 128) - 0.714136 * (140 - 128)), 0, 255)
    b = np.clip(round(120 + 1.772 * (100 - 128)), 0, 255)
    assert (px == np.array([r, g, b], dtype=np.uint8)).all()


def test_restart_markers_reset_prediction():
    # three MCUs, DRI=1: predictors reset at each RST, so each block's
    # encoded DIFF equals its absolute DC
    blocks = [[[(0, 256)]], [[(0, 256)]], [[(0, -256)]]]
    blob = build_jpeg(8, 24, [blocks], [(1, 1)], dri=1)
    px = decode_jpeg_pixels(blob)
    assert (px[:, :16, 0] == 160).all()
    assert (px[:, 16:, 0] == 96).all()


def test_progressive_raises():
    blob = build_jpeg(8, 8, [[[[(0, 0)]]]], [(1, 1)])
    progressive = blob.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_pixels(progressive)


def test_try_real_decode_routes_jpeg():
    blob = build_jpeg(8, 8, [[[[(0, 256)]]]], [(1, 1)])
    px = try_real_decode(blob)
    assert px.shape == (8, 8, 1) and (px == 160).all()
    with pytest.raises(NotImplementedError):  # non-image stays gated
        try_real_decode(b"\x00\x01\x02video-ish" + b"\x00" * 16)


def test_resize_media_decodes_jpeg(spark):
    blob = build_jpeg(8, 16, [[[[(0, 256)]], [[(0, -256)]]]], [(1, 1)])
    from yodel_etl_spark.scale.multimodal import resize_media

    df = spark.createDataFrame([(1, bytearray(blob))], "id long, content binary")
    row = resize_media(df, width=4, height=4).collect()[0]
    arr = np.frombuffer(row["resized"], dtype=np.uint8).reshape(4, 4, row["r_channels"])
    # nearest-neighbor over a left=160/right=96 image: cols 0-1 from the
    # left half, cols 2-3 from the right half
    assert (arr[:, :2, 0] == 160).all() and (arr[:, 2:, 0] == 96).all()


def test_gray_nonstandard_sampling_decodes_raster():
    """T.81 A.2.3: a single-component scan is NON-interleaved — one
    block per MCU in raster order over ceil(w/8) x ceil(h/8) blocks,
    regardless of declared sampling factors.  A 32x16 grayscale with
    declared 2x2 sampling must decode identically to the same blocks
    declared 1x1 (the old interleaved reading regrouped the 8 blocks
    into two 2x2-block MCUs and scrambled their positions)."""
    from yodel_etl_spark.scale.jpeg import decode_jpeg_pixels

    # distinct DC per raster block position: values 0,16,...,112
    dcs = [16 * i for i in range(8)]
    raster_blocks = [[[(0, dc)]] for dc in dcs]  # 8 MCUs x 1 block
    j22 = build_jpeg(16, 32, [raster_blocks], [(2, 2)])
    j11 = build_jpeg(16, 32, [raster_blocks], [(1, 1)])
    px22 = decode_jpeg_pixels(j22)
    px11 = decode_jpeg_pixels(j11)
    assert (px22 == px11).all()
    # and the raster placement is right: block (row r, col c) tile value
    for i, dc in enumerate(dcs):
        r, c = divmod(i, 4)
        tile = px22[r * 8 : r * 8 + 8, c * 8 : c * 8 + 8]
        want = min(max(dc / 8.0 + 128.0, 0), 255)  # DC scaling + level shift
        assert (abs(tile.astype(float) - round(want)) <= 1).all(), (i, dc)


def test_multiscan_baseline_raises_valueerror():
    """A baseline color JPEG split into sequential Ns=1 scans must
    raise the documented ValueError, not a KeyError mid-decode."""
    from yodel_etl_spark.scale.jpeg import decode_jpeg_pixels

    blocks = [[[[(0, 10)]]], [[[(0, 20)]]], [[[(0, 30)]]]]
    blob = build_jpeg(8, 8, blocks, [(1, 1)] * 3)
    i = blob.index(b"\xff\xda")
    seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
    new_sos = b"\xff\xda" + struct.pack(">H", 2 + 1 + 2 + 3) + bytes(
        [1, 1, 0x00, 0, 63, 0]
    )
    patched = blob[:i] + new_sos + blob[i + 2 + seg_len :]
    with pytest.raises(ValueError, match="multi-scan"):
        decode_jpeg_pixels(patched)


def test_bitreader_lone_trailing_ff_raises():
    """A stream cut at a lone 0xFF has no marker byte: the reader must
    raise truncation instead of fabricating a 1-fill byte and letting a
    decode silently complete on a cut-off blob."""
    from yodel_etl_spark.scale.jpeg import _BitReader

    rdr = _BitReader(b"\x5a\xff", 0)
    for _ in range(8):
        rdr.read_bit()
    with pytest.raises(ValueError, match="truncated entropy-coded"):
        rdr.read_bit()


def test_undefined_quant_table_raises_valueerror():
    """SOF pointing a component at a quant table no DQT defined must
    raise ValueError up front, not KeyError mid-decode."""
    blob = build_jpeg(8, 8, [[[[(0, 256)]]]], [(1, 1)])
    i = blob.index(b"\xff\xc0")
    # SOF body: prec(1) h(2) w(2) ncomp(1) then (cid, hv, tq) — tq of
    # component 0 sits at segment offset 8 (blob offset i+4+8)
    patched = bytearray(blob)
    patched[i + 12] = 5
    with pytest.raises(ValueError, match="undefined quantization table"):
        decode_jpeg_pixels(bytes(patched))


def test_undefined_huffman_table_raises_valueerror():
    """SOS selecting a Huffman table id no DHT defined must raise
    ValueError up front, not KeyError mid-decode."""
    blob = build_jpeg(8, 8, [[[[(0, 256)]]]], [(1, 1)])
    i = blob.index(b"\xff\xda")
    # SOS body: ns(1) then (cs, tt) — tt of component 0 at blob i+6
    patched = bytearray(blob)
    patched[i + 6] = 0x23  # DC table 2 / AC table 3: neither defined
    with pytest.raises(ValueError, match="undefined DC Huffman table"):
        decode_jpeg_pixels(bytes(patched))


def test_non_dyadic_sampling_raises_valueerror():
    """Legal-per-T.81 but unsupported 3:2 sampling ratios must raise
    the documented ValueError, not a numpy shape error from the
    repeat-upsample."""
    blocks = [[[[(0, 10)]] * 6], [[[(0, 20)]] * 2], [[[(0, 30)]]]]
    blob = build_jpeg(16, 24, blocks, [(3, 2), (2, 1), (1, 1)])
    with pytest.raises(ValueError, match="non-dyadic sampling"):
        decode_jpeg_pixels(blob)
