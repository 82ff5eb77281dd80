"""Minimal numpy-only baseline JPEG (JFIF) codec, vendored so the REAL
image-decode path covers the format a mixed corpus hits first.

Why this exists: the multimodal decode stage
(operators/multimodal.py:_decode_real) adapts to whatever codec stack
the cluster ships. PIL is not installable in this environment; PNG got
a real decoder in functions/png.py, which left JPEG as the documented
gap — a mixed-format corpus fails on its first .jpg. This module gives
the engine a genuine baseline-JFIF decoder (and a matching encoder so
tests are grounded in real encoded bytes, not decode(encode(x))
tautologies alone — the flat-gray golden bitstream below is verifiable
against the spec by hand). PIL, when importable, still takes priority.

Scope (deliberately the baseline subset a training-data fixture needs):
baseline sequential DCT (SOF0), 8-bit samples, grayscale or YCbCr with
1x1 (4:4:4) or 2x2-luma (4:2:0) sampling, restart intervals, standard
Huffman/quantization table syntax. Progressive (SOF2), arithmetic
coding, 12-bit, and exotic samplings raise ValueError — an honest
per-payload failure, never a silent wrong answer.

Decode pipeline per the spec: marker parse → entropy-coded segment
byte-unstuffing (FF 00 → FF) → Huffman DC/AC decode per MCU →
dequantize → inverse zigzag → 8x8 IDCT (exact float64 DCT-III basis
matmul) → +128 level shift → chroma upsample (sample replication) →
YCbCr→RGB (JFIF full-range matrix).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8"

# zigzag order: index i of this array holds the (row-major) position of
# the i-th coefficient in scan order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8x8 DCT-II basis: C[u, x] = a(u) cos((2x+1)uπ/16); IDCT is C.T @ X @ C
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _C.T @ block @ _C


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


class _BitReader:
    """MSB-first bit reader over an already-unstuffed byte string."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("truncated entropy-coded segment")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _build_huffman(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """{(code_length, code): symbol} per the canonical JPEG assignment
    (Annex C): codes of each length are consecutive, starting from
    (previous_start + previous_count) << 1."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude per spec F.2.2.1 (EXTEND)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, uint8 array [h, w, channels]) — RGB for
    color JPEGs, single-channel for grayscale."""
    if data[:2] != JPEG_MAGIC:
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None  # (h, w, [(cid, hs, vs, tq)])
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before a
        # marker — consume them so 0xFF 0xFF <marker> parses as <marker>,
        # not as a bogus 0xFF "marker" with a garbage segment length
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no payload
            continue
        (seg_len,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    seg[p : p + 64], dtype=np.uint8
                ).astype(np.float64)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                bits = list(seg[p : p + 16])
                p += 16
                nvals = sum(bits)
                values = list(seg[p : p + nvals])
                p += nvals
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(
                    bits, values
                )
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit samples supported")
            comps = []
            for i in range(nc):
                cid, hv, tq_i = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0x0F, tq_i))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline SOF0 supported (got SOF marker "
                f"0x{marker:02x})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i : 3 + 2 * i]
                scan_comps.append((cs, tdta >> 4, tdta & 0x0F))
            ec_start = pos + seg_len
            return _decode_scan(
                data, ec_start, frame, scan_comps, qt,
                huff_dc, huff_ac, restart_interval,
            )
        pos += seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(
    data, ec_start, frame, scan_comps, qt, huff_dc, huff_ac, restart_interval
):
    h, w, comps = frame
    by_id = {cid: (hs, vs, tq_i) for cid, hs, vs, tq_i in comps}
    hmax = max(hs for _, hs, _, _ in comps)
    vmax = max(vs for _, _, vs, _ in comps)
    if not all(
        (hs, vs) in ((1, 1), (2, 2)) for _, hs, vs, _ in comps
    ) or (hmax, vmax) not in ((1, 1), (2, 2)):
        raise ValueError("only 4:4:4 and 2x2-luma 4:2:0 sampling supported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    # unstuff the entropy-coded segment up to EOI, tracking RST markers:
    # FF00 -> FF; RSTn markers are byte-aligned resets between intervals
    segments: list[bytes] = []
    cur = bytearray()
    p = ec_start
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            m = data[p + 1] if p + 1 < len(data) else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        p += 1
    segments.append(bytes(cur))

    planes = {
        cid: np.zeros((mcus_y * 8 * vs, mcus_x * 8 * hs))
        for cid, hs, vs, _ in comps
    }
    pred = {cid: 0 for cid, _, _, _ in comps}
    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                pred = {cid: 0 for cid in pred}
            for cs, td, ta in scan_comps:
                hs, vs, tq_i = by_id[cs]
                for by in range(vs):
                    for bx in range(hs):
                        block = _decode_block(
                            reader, huff_dc[td], huff_ac[ta], qt[tq_i], pred, cs
                        )
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[cs][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

    # upsample to full MCU-grid resolution, then crop to (h, w)
    full = []
    for cid, hs, vs, _ in comps:
        plane = planes[cid]
        if hs < hmax or vs < vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        full.append(plane[:h, :w])
    if len(full) == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, 1, out[:, :, None]
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_tab, ac_tab, quant, pred, cid) -> np.ndarray:
    coeffs = np.zeros(64)
    t = _huff_decode(reader, dc_tab)
    diff = _extend(reader.read_bits(t), t) if t else 0
    pred[cid] += diff
    coeffs[0] = pred[cid]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL: 16 zeros
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past end of block")
        coeffs[k] = _extend(reader.read_bits(s), s)
        k += 1
    block = np.zeros(64)
    block[ZIGZAG] = coeffs * quant[np.arange(64)]
    return _idct2(block.reshape(8, 8)) + 128.0


# ---------------------------------------------------------------------------
# Encoder (tests + fixtures): baseline, standard Annex K tables.

# Annex K.1 luminance quant table (quality ~50), zigzag order applied at
# encode time; K.2 chroma table for color.
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K.3 standard Huffman tables: (bits[16], values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self) -> bytes:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s per spec
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc, self.nbits = 0, 0
        return bytes(self.buf)


def _encode_codes(bits, values):
    """symbol -> (code, length), canonical assignment (inverse of
    _build_huffman)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(writer, block, quant, dc_codes, ac_codes, pred_key, pred):
    """DCT → quantize (scan order: coefficient k reads row-major
    position ZIGZAG[k]) → DC-diff + run-length AC Huffman write."""
    flat = _dct2(block).reshape(64)
    cz = np.array(
        [round(flat[ZIGZAG[k]] / quant[k]) for k in range(64)],
        dtype=np.int64,
    )
    diff = int(cz[0]) - pred[pred_key]
    pred[pred_key] = int(cz[0])
    t = _category(diff)
    code, length = dc_codes[t]
    writer.write(code, length)
    if t:
        writer.write(diff if diff > 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = max((k for k in range(1, 64) if cz[k]), default=0)
    for k in range(1, 64):
        if k > last_nz:
            break
        v = int(cz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)


def _seg(marker: int, payload: bytes) -> bytes:
    return (
        bytes([0xFF, marker])
        + struct.pack(">H", len(payload) + 2)
        + payload
    )


def _pad8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return np.pad(
        plane, ((0, ((h + 7) & ~7) - h), (0, ((w + 7) & ~7) - w)),
        mode="edge",
    )


def encode_jpeg_gray(
    img: np.ndarray,
    quant: np.ndarray | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 grayscale [h, w] image as baseline JFIF with the
    standard luminance tables (or a caller-supplied zigzag-order quant
    table — all-ones makes the codec near-lossless for tests).
    ``restart_interval`` > 0 emits DRI + byte-aligned RSTn markers every
    N MCUs, exercising the decoder's restart path."""
    img = np.asarray(img, dtype=np.float64)
    h, w = img.shape
    quant = QUANT_LUMA if quant is None else np.asarray(quant, np.float64)
    dc_codes = _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    padded = _pad8(img)
    ph, pw = padded.shape

    ec = bytearray()
    writer = _BitWriter()
    pred = {"y": 0}
    mcu = 0
    rst = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and mcu and mcu % restart_interval == 0:
                ec += writer.flush()
                ec += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                writer = _BitWriter()
                pred = {"y": 0}
            _encode_block(
                writer,
                padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0,
                quant, dc_codes, ac_codes, "y", pred,
            )
            mcu += 1
    ec += writer.flush()

    out = bytearray(JPEG_MAGIC)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(q) & 0xFF for q in quant))
    out += _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]),
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bytes(ec)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_rgb(
    img: np.ndarray,
    subsample_420: bool = False,
    luma_quant: np.ndarray | None = None,
    chroma_quant: np.ndarray | None = None,
) -> bytes:
    """Encode a uint8 RGB [h, w, 3] image as baseline JFIF YCbCr —
    4:4:4 by default, 2x2-luma 4:2:0 with ``subsample_420`` (chroma
    planes are 2x2 box-averaged). Both components share the standard
    luminance Huffman tables (legal: SOS declares the table per
    component), so the decoder's table-id indirection is exercised with
    one table pair."""
    img = np.asarray(img, dtype=np.float64)
    h, w, _ = img.shape
    lq = QUANT_LUMA if luma_quant is None else np.asarray(luma_quant, np.float64)
    cq = (
        QUANT_CHROMA
        if chroma_quant is None
        else np.asarray(chroma_quant, np.float64)
    )
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    if subsample_420:
        hs_v = (2, 2)
        # pad to MCU (16px) multiples BEFORE subsampling so chroma
        # blocks tile exactly
        ph, pw = (h + 15) & ~15, (w + 15) & ~15
        pad = ((0, ph - h), (0, pw - w))
        y = np.pad(y, pad, mode="edge")
        cb = np.pad(cb, pad, mode="edge")
        cr = np.pad(cr, pad, mode="edge")
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    else:
        hs_v = (1, 1)
        y, cb, cr = _pad8(y), _pad8(cb), _pad8(cr)
        ph, pw = y.shape

    dc_codes = _encode_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_codes = _encode_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    writer = _BitWriter()
    pred = {"y": 0, "cb": 0, "cr": 0}
    hsamp, vsamp = hs_v
    mcu_h, mcu_w = 8 * vsamp, 8 * hsamp
    for my in range(ph // mcu_h):
        for mx in range(pw // mcu_w):
            for by in range(vsamp):
                for bx in range(hsamp):
                    y0 = my * mcu_h + by * 8
                    x0 = mx * mcu_w + bx * 8
                    _encode_block(
                        writer, y[y0 : y0 + 8, x0 : x0 + 8] - 128.0,
                        lq, dc_codes, ac_codes, "y", pred,
                    )
            for key, plane in (("cb", cb), ("cr", cr)):
                _encode_block(
                    writer,
                    plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - 128.0,
                    cq, dc_codes, ac_codes, key, pred,
                )
    ec = writer.flush()

    out = bytearray(JPEG_MAGIC)
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(q) & 0xFF for q in lq))
    out += _seg(0xDB, bytes([0x01]) + bytes(int(q) & 0xFF for q in cq))
    samp = (hsamp << 4) | vsamp
    out += _seg(
        0xC0,
        bytes([8]) + struct.pack(">HH", h, w)
        + bytes([3, 1, samp, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
    out += _seg(0xC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    out += bytes(ec)
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_features(payload: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_frames=1, mean luminance / 255) — the
    multimodal decode feature tuple from real pixels (the JPEG twin of
    functions/png.png_features)."""
    w, h, channels, arr = decode_jpeg(payload)
    a = arr.astype(np.float64)
    if channels == 3:
        # ITU-R BT.601 luma, same weights PIL's convert("L") uses
        lum = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    else:
        lum = a[..., 0]
    return w, h, 1, round(float(lum.mean()) / 255.0, 6)
