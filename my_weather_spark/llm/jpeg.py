"""Baseline JPEG (ITU-T T.81) codec — pure numpy/python, no external
library. The compressed-format tier of the multimodal column: where
the netpbm/WAV/ppm-seq codecs cover the uncompressed paths, this
covers an actual entropy-coded DCT format end-to-end (marker parse,
canonical Huffman, dequantize, IDCT, color transform).

Scope (documented, not hidden): baseline sequential DCT (SOF0) only;
grayscale (1 component) and YCbCr 4:4:4 (3 components, no chroma
subsampling); restart markers accepted on decode, never emitted on
encode. Progressive (SOF2), arithmetic coding, and subsampled chroma
raise NotImplementedError at the exact unsupported feature — the same
honesty contract as the former Pillow stub, but the supported subset
is REAL and self-contained.

Determinism/rounding contract (the part a SQL oracle can replay):
- quantization: floor(coef / q + 0.5)  (half toward +inf)
- pixel reconstruction: clip(floor(idct + 0.5) + 128, 0, 255)
For a UNIFORM 8x8 block (value v) the full pipeline collapses to
  dc   = 8 * (v - 128)                     (all AC coefficients 0)
  Q    = floor(dc / q00 + 0.5)
  pix  = clip(floor(Q * q00 / 8 + 0.5) + 128, 0, 255)
which is exact in float64 whenever q00 is a multiple of 8 (Q*q00/8
is then an integer, so the +0.5 never lands on a representability
edge) — quality 50 gives q00 = 16. mm_jpeg_image_stats builds on
exactly this identity.

Tables are the T.81 Annex K typical tables (quant + Huffman); the
encoder and decoder share them, so round-trips are self-consistent by
construction and byte streams are valid baseline JFIF.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# Annex K tables

# natural (row-major) order
QUANT_LUM = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROM = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# zigzag position -> natural index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# (BITS[1..16], HUFFVAL) per Annex K
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
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
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def scaled_quant_tables(quality: int):
    """libjpeg-convention quality scaling of the Annex K tables:
    scale = 5000/q (q < 50) else 200 - 2q; q' = clip((base*scale+50)
    // 100, 1, 255). quality 50 returns the base tables unchanged."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def s(base):
        q = (base * scale + 50) // 100
        return np.clip(q, 1, 255).astype(np.int64)
    return s(QUANT_LUM), s(QUANT_CHROM)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: FDCT(B) = C @ B @ C.T,
    IDCT(F) = C.T @ F @ C. With this normalization a level-shifted
    uniform block of value d yields DC coefficient 8*d."""
    x = np.arange(8)
    u = x[:, None]
    C = np.sqrt(2.0 / 8.0) * np.cos((2 * x[None, :] + 1) * u * np.pi / 16.0)
    C[0, :] = np.sqrt(1.0 / 8.0)
    return C

_C = _dct_matrix()


def _half_up(x: np.ndarray) -> np.ndarray:
    """floor(x + 0.5) — the codec's single rounding convention (SQL-
    replayable; numpy round() is banker's and is never used here)."""
    return np.floor(x + 0.5)


# --------------------------------------------------------------------------
# Huffman (canonical, from BITS/HUFFVAL)

def _huff_encode_table(bits, vals):
    """symbol -> (code, length) per the T.81 canonical code ordering."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode_table(bits, vals):
    """(length, code) -> symbol map for bit-serial decode. Memoized on
    the raw table bytes — real decoders precompute per-table state
    once, and a stream of small same-table files (the usual corpus
    shape) would otherwise rebuild four tables per payload."""
    return _huff_decode_table_cached(bytes(bits), bytes(vals))


from functools import lru_cache


@lru_cache(maxsize=64)
def _huff_decode_table_cached(bits: bytes, vals: bytes):
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    """Bit-serial reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker (leaves position on the 0xFF)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG (entropy data)")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG (entropy data)")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn — consumed by caller
                raise _RestartMarker(nxt)
            else:
                raise EOFError("hit marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8
        # truncate to the live bits: without this the accumulator is an
        # ever-growing bignum and every shift is O(bytes-read-so-far) —
        # decode goes quadratic in payload size (measured 13x per 4x
        # pixels before the mask)
        self.acc &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0

    def skip_restart(self) -> None:
        """Consume an RSTn marker at the current byte position,
        tolerating optional 0xFF fill bytes before it (T.81 B.1.1.2
        allows any number of fill bytes ahead of any marker — the
        header marker loop accepts them too)."""
        p = self.pos
        while p + 1 < len(self.data) and self.data[p] == 0xFF and self.data[p + 1] == 0xFF:
            p += 1
        if (
            p + 1 >= len(self.data)
            or self.data[p] != 0xFF
            or not (0xD0 <= self.data[p + 1] <= 0xD7)
        ):
            raise ValueError("expected restart marker")
        self.pos = p + 2


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


def _read_huff_symbol(br: _BitReader, table) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in entropy stream")


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size category, extra bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    """(extra bits, size) -> signed value (T.81 F.2.2.1 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --------------------------------------------------------------------------
# Encoder

def encode_jpeg(arr, quality: int = 50) -> bytes:
    """(h, w) uint8 grayscale or (h, w, 3) uint8 RGB -> baseline JFIF
    bytes (SOF0; 4:4:4 for color, no restart markers)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        comps = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        comps = [
            np.clip(_half_up(p), 0, 255) for p in (y, cb, cr)
        ]
    else:
        raise ValueError("expected (h,w) or (h,w,3) uint8 array")
    h, w = a.shape[:2]
    qt_lum, qt_chrom = scaled_quant_tables(quality)
    n_comp = len(comps)

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    # JFIF APP0
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)  # 2 (len) + 14 payload bytes
        + b"JFIF\x00\x01\x01\x00"  # id, version 1.1, units 0
        + struct.pack(">HHBB", 1, 1, 0, 0)  # density 1x1, no thumbnail
    )
    # DQT (table 0 = lum; table 1 = chrom when color)
    for tid, qt in ([(0, qt_lum)] if n_comp == 1 else [(0, qt_lum), (1, qt_chrom)]):
        zz = qt.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([tid]) + bytes(
            int(v) for v in zz
        )
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w, n_comp)
    for ci in range(n_comp):
        out += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # 1x1 sampling
    # DHT
    def dht(tc, th, bits, vals):
        return (
            b"\xff\xc4"
            + struct.pack(">H", 2 + 1 + 16 + len(vals))
            + bytes([(tc << 4) | th])
            + bytes(bits)
            + bytes(vals)
        )

    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if n_comp == 3:
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp)
    for ci in range(n_comp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += bytes([0, 63, 0])

    # entropy-coded data: MCU = one 8x8 block per component (4:4:4)
    dc_enc = [
        _huff_encode_table(DC_LUM_BITS, DC_LUM_VALS),
        _huff_encode_table(DC_CHROM_BITS, DC_CHROM_VALS),
    ]
    ac_enc = [
        _huff_encode_table(AC_LUM_BITS, AC_LUM_VALS),
        _huff_encode_table(AC_CHROM_BITS, AC_CHROM_VALS),
    ]
    bh = -(-h // 8)
    bw = -(-w // 8)
    # edge-replicate pad
    padded = [
        np.pad(p, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge") for p in comps
    ]
    qts = [qt_lum] + [qt_chrom] * (n_comp - 1)
    bwri = _BitWriter()
    pred = [0] * n_comp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(n_comp):
                block = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                # de-noise to the 1e-6 grid before quantizing: the
                # float DCT leaves ~1e-13 residue on exact-integer
                # coefficients, which flips the floor(x/q + 0.5)
                # tie-break (x/q exactly k.5 is a REAL case — uniform
                # blocks hit it) and would break the documented
                # SQL-replayable rounding contract
                coef = np.round(_C @ block @ _C.T, 6)
                q = _half_up(coef / qts[ci]).astype(np.int64)
                zz = q.reshape(-1)[ZIGZAG]
                tsel = 0 if ci == 0 else 1
                # DC
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, bits_v = _magnitude(diff)
                code, length = dc_enc[tsel][size]
                bwri.write(code, length)
                if size:
                    bwri.write(bits_v, size)
                # AC
                run = 0
                last_nz = 0
                nz = np.nonzero(zz[1:])[0]
                last_nz = (nz[-1] + 1) if len(nz) else 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = ac_enc[tsel][0xF0]  # ZRL
                        bwri.write(code, length)
                        run -= 16
                    size, bits_v = _magnitude(v)
                    code, length = ac_enc[tsel][(run << 4) | size]
                    bwri.write(code, length)
                    bwri.write(bits_v, size)
                    run = 0
                if last_nz < 63:
                    code, length = ac_enc[tsel][0x00]  # EOB
                    bwri.write(code, length)
    out += bwri.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder

def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w) uint8 (grayscale) or (h, w, 3)
    uint8 (RGB). Supports SOF0 with 1 or 3 components at 1x1 sampling
    (4:4:4); DRI/RSTn handled; other SOF types / subsampling raise
    NotImplementedError naming the unsupported feature."""
    data = bytes(b)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while True:
        # a marker is one-or-more 0xFF fill bytes followed by the
        # marker id (T.81 B.1.1.2 allows optional fill) — and arbitrary
        # input can truncate anywhere, so every read is bounds-checked
        # to fail as ValueError, never bare IndexError/struct.error.
        if pos >= len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        while pos < len(data) and data[pos] == 0xFF:
            pos += 1
        if pos >= len(data):
            raise ValueError("truncated JPEG (fill bytes at end)")
        marker = data[pos]
        pos += 1
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (segment length)")
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        if seglen < 2 or pos + seglen > len(data):
            raise ValueError("truncated JPEG (segment body)")
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                if p + 64 > len(seg):
                    raise ValueError("truncated JPEG (DQT)")
                zz = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                if p + 17 > len(seg):
                    raise ValueError("truncated JPEG (DHT)")
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                if p + 17 + n > len(seg):
                    raise ValueError("truncated JPEG (DHT values)")
                vals = list(seg[p + 17 : p + 17 + n])
                (ac_tabs if tc else dc_tabs)[th] = _huff_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                raise ValueError("truncated JPEG (SOF0)")
            precision, h, w, n_comp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if len(seg) < 6 + 3 * n_comp:
                raise ValueError("truncated JPEG (SOF0 components)")
            if precision != 8:
                raise NotImplementedError("only 8-bit precision supported")
            comps = []
            for ci in range(n_comp):
                cid, sampling, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                if sampling != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            frame = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"SOF marker 0xFF{marker:02X}: only baseline SOF0 supported"
            )
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("truncated JPEG (DRI)")
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF0")
            if len(seg) < 1:
                raise ValueError("truncated JPEG (SOS)")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns:
                raise ValueError("truncated JPEG (SOS components)")
            scan_sel = []
            for ci in range(ns):
                cs, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scan_sel.append((cs, tt >> 4, tt & 0xF))
            pos += seglen
            break
        pos += seglen

    h, w, comps = frame
    n_comp = len(comps)
    if n_comp not in (1, 3):
        raise NotImplementedError("1 or 3 components only")
    bh = -(-h // 8)
    bw = -(-w // 8)
    planes = [np.zeros((bh * 8, bw * 8), dtype=np.float64) for _ in range(n_comp)]
    cid_to_qt = dict(comps)
    br = _BitReader(data, pos)
    pred = [0] * n_comp
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.byte_align()
                br.skip_restart()
                pred = [0] * n_comp
            for ci in range(n_comp):
                cs, td, ta = scan_sel[ci]
                qt = qtables[cid_to_qt[cs]]
                zz = np.zeros(64, dtype=np.int64)
                try:
                    size = _read_huff_symbol(br, dc_tabs[td])
                    diff = _extend(br.read_bits(size), size) if size else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _read_huff_symbol(br, ac_tabs[ta])
                        run, size = rs >> 4, rs & 0xF
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += run
                        if k > 63:
                            raise ValueError("AC run past end of block")
                        zz[k] = _extend(br.read_bits(size), size)
                        k += 1
                except _RestartMarker:
                    raise ValueError("unexpected restart marker mid-MCU")
                nat = np.zeros(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                coef = (nat.reshape(8, 8) * qt).astype(np.float64)
                block = _C.T @ coef @ _C
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            mcu += 1

    pix = [np.clip(_half_up(p) + 128, 0, 255)[:h, :w] for p in planes]
    if n_comp == 1:
        return pix[0].astype(np.uint8)
    y, cb, cr = pix
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(_half_up(c), 0, 255) for c in (r, g, b_)], axis=2
    )
    return rgb.astype(np.uint8)
