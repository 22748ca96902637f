"""Baseline JPEG codec — pure numpy + stdlib, no codec library.

Implements the sequential baseline process of ITU-T T.81 for 8-bit
4:4:4 (and grayscale) images: level shift, 8x8 forward/inverse DCT,
uniform quantization, zigzag, DPCM-coded DC + run/size-coded AC with
canonical Huffman entropy coding, JFIF container (SOI / APP0 / DQT /
SOF0 / DHT / SOS / EOI) with 0xFF byte stuffing.

Two deliberate simplifications, both spec-compliant because the
tables travel INSIDE the file (DQT/DHT segments), so any conforming
decoder — this one, libjpeg, a browser — reads the stream:

- Huffman tables are flat canonical tables (every DC symbol 4 bits,
  every AC symbol 8 bits) rather than Annex K's frequency-tuned
  ones. Kraft-valid, all-ones code unused as required; compression
  ratio is worse, correctness is identical.
- No chroma subsampling (all sampling factors 1x1) and no restart
  markers — the encoder never emits them and the decoder rejects
  streams it could not round-trip rather than guessing.

The lossy contract (what tests can pin): dimensions round-trip
exactly; a constant-color image round-trips within quantization of
the DC coefficient (±2 per channel); channel means of arbitrary
images survive within a few units. Bit-exact pixel equality is NOT a
JPEG property and is not promised.

Reference parity note: the reference pipeline treats media as opaque
payload + metadata (pac_data_processor.py document payloads); the
decode tier itself is an extension this engine adds for
training-data pipelines (multimodal feature extraction).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: Standard-style luminance/chrominance quantization tables (the
#: widely published JPEG example tables). Exact values are not
#: load-bearing: whatever is here is emitted in DQT and read back.
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)


def _zigzag_indices() -> np.ndarray:
    """(64, 2) row/col pairs in JPEG zigzag scan order, generated
    from the anti-diagonal walk rather than hand-typed."""
    out = []
    for s in range(15):
        if s % 2 == 0:  # walking up-right: row decreases
            for r in range(min(s, 7), max(0, s - 7) - 1, -1):
                out.append((r, s - r))
        else:  # walking down-left: row increases
            for r in range(max(0, s - 7), min(s, 7) + 1):
                out.append((r, s - r))
    return np.array(out, dtype=np.int64)

ZIGZAG = _zigzag_indices()
#: flat index into a row-major 64-vector for each zigzag position
ZIGZAG_FLAT = ZIGZAG[:, 0] * 8 + ZIGZAG[:, 1]


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis M with M @ block @ M.T = 2-D DCT
    (orthonormal: M.T @ coeff @ M inverts it exactly)."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)
    return m

DCT_M = _dct_matrix()

#: DC symbols: magnitude size 0..11, all 4-bit codes (12/16 Kraft).
DC_SYMBOLS = list(range(12))
#: AC symbols: EOB, ZRL, and (run << 4 | size) for run 0..15 /
#: size 1..10 — 162 symbols, all 8-bit codes (162/256 Kraft).
AC_SYMBOLS = sorted(
    {0x00, 0xF0} | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """JPEG canonical Huffman assignment: codes of increasing length
    in symbol listing order. Returns {symbol: (code, n_bits)}."""
    out: dict[int, tuple[int, int]] = {}
    code, idx = 0, 0
    for n_bits, count in enumerate(bits, start=1):
        for _ in range(count):
            out[symbols[idx]] = (code, n_bits)
            code += 1
            idx += 1
        code <<= 1
    return out

DC_CODES = _canonical_codes(_DC_BITS, DC_SYMBOLS)
AC_CODES = _canonical_codes(_AC_BITS, AC_SYMBOLS)


# ------------------------------------------------------------- bit I/O


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, n_bits: int) -> None:
        if n_bits == 0:
            return
        self._acc = (self._acc << n_bits) | (value & ((1 << n_bits) - 1))
        self._n += n_bits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # stuff so entropy data never fakes a marker
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.out)


class _BitReader:
    """MSB-first reader over entropy data with 0xFF00 unstuffing;
    raises ValueError on markers inside the scan or exhaustion."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy data exhausted")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data truncated at 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        self._acc = (self._acc << 8) | byte
        self._n += 8

    def get(self, n_bits: int) -> int:
        while self._n < n_bits:
            self._fill()
        self._n -= n_bits
        val = (self._acc >> self._n) & ((1 << n_bits) - 1)
        self._acc &= (1 << self._n) - 1
        return val


# ------------------------------------------------------ color transforms


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


# ------------------------------------------------------------- encoder


def _magnitude(v: int) -> tuple[int, int]:
    """(size, raw bits) of a DC diff / AC coefficient: negative
    values are stored as value - 1 in `size` bits per spec."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _dct_quantize_blocks(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Vectorized forward path for one component plane: split an
    (8k, 8m) plane into raster-order 8x8 blocks, level-shift, 2-D
    DCT, quantize, zigzag — one einsum over every block instead of a
    Python loop. Returns (n_blocks, 64) int64 zigzag coefficients."""
    ph, pw = plane.shape
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
        .astype(np.float64)
        - 128.0
    )
    coeff = np.einsum("ux,nxy,vy->nuv", DCT_M, blocks, DCT_M)
    q = np.round(coeff / quant).astype(np.int64)
    return q.reshape(-1, 64)[:, ZIGZAG_FLAT]


def _encode_block_zz(writer: _BitWriter, zz: np.ndarray, pred_dc: int) -> int:
    """Huffman-encode one pre-quantized zigzag block; iterates only
    the NONZERO AC positions (np.nonzero) — the dominant cost at
    typical quantization is skipping zeros, not coding values.
    Returns the new DC predictor."""
    dc = int(zz[0])
    size, bits = _magnitude(dc - pred_dc)
    code, n = DC_CODES[size]
    writer.put(code, n)
    writer.put(bits, size)
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for k in nz:
        k = int(k) + 1
        run = k - prev - 1
        while run > 15:
            code, n = AC_CODES[0xF0]  # ZRL: 16 zeros
            writer.put(code, n)
            run -= 16
        size, bits = _magnitude(int(zz[k]))
        code, n = AC_CODES[(run << 4) | size]
        writer.put(code, n)
        writer.put(bits, size)
        prev = k
    if prev < 63:
        code, n = AC_CODES[0x00]  # EOB
        writer.put(code, n)
    return dc


def _dht_segment(cls: int, table_id: int, bits: list[int], symbols: list[int]) -> bytes:
    payload = bytes([cls << 4 | table_id]) + bytes(bits) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _dqt_segment(table_id: int, table: np.ndarray) -> bytes:
    zz = table.reshape(64)[ZIGZAG_FLAT]
    payload = bytes([table_id]) + bytes(int(v) for v in zz)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg_pixels(rgb: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB matrix as baseline JFIF."""
    if rgb.ndim != 3 or rgb.shape[2] != 3:
        raise ValueError("encode_jpeg_pixels expects (h, w, 3) RGB")
    height, width = rgb.shape[:2]
    if height == 0 or width == 0:
        raise ValueError("width/height must be positive")
    ycc = _rgb_to_ycbcr(rgb)
    # pad to 8x8 multiples by edge replication (standard practice:
    # keeps padded-block gradients, and thus AC energy, small)
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    padded = np.empty((ph, pw, 3), dtype=np.float64)
    padded[:height, :width] = ycc
    padded[height:, :width] = ycc[height - 1 : height, :]
    padded[:, width:] = padded[:, width - 1 : width]

    writer = _BitWriter()
    preds = [0, 0, 0]
    quants = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    # forward transform all blocks of each component at once; the
    # sequential part (DPCM + Huffman bit packing) walks the
    # precomputed zigzag rows in interleaved MCU order
    zz_planes = [
        _dct_quantize_blocks(padded[:, :, c], quants[c]) for c in range(3)
    ]
    for i in range(zz_planes[0].shape[0]):  # MCU = Y, Cb, Cr blocks
        for c in range(3):
            preds[c] = _encode_block_zz(writer, zz_planes[c][i], preds[c])
    scan = writer.flush()

    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    sof = b"\xff\xc0" + struct.pack(">HBHH", 17, 8, height, width) + bytes(
        [3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    sos = b"\xff\xda" + struct.pack(">H", 12) + bytes(
        [3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]
    )
    return (
        b"\xff\xd8"
        + app0
        + _dqt_segment(0, QUANT_LUMA)
        + _dqt_segment(1, QUANT_CHROMA)
        + sof
        + _dht_segment(0, 0, _DC_BITS, DC_SYMBOLS)
        + _dht_segment(1, 0, _AC_BITS, AC_SYMBOLS)
        + _dht_segment(0, 1, _DC_BITS, DC_SYMBOLS)
        + _dht_segment(1, 1, _AC_BITS, AC_SYMBOLS)
        + sos
        + scan
        + b"\xff\xd9"
    )


def encode_jpeg(width: int, height: int, pixel_seed: bytes) -> bytes:
    """Deterministic JPEG from the same tiled-seed generative formula
    as ``encode_bmp``/``encode_png`` (RGB top-down)."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    seed = np.frombuffer(pixel_seed or b"\x00", dtype=np.uint8)
    n = height * width * 3
    flat = np.tile(seed, n // len(seed) + 1)[:n]
    return encode_jpeg_pixels(flat.reshape(height, width, 3))


# ------------------------------------------------------------- decoder


def _build_decode_table(bits: list[int], symbols: list[int]):
    """({(n_bits, code): symbol}, uniform_len) for canonical tables
    read from DHT. ``uniform_len`` is the code length when every
    code in the table shares one length (our own flat tables; lets
    the reader grab all bits of a symbol at once), else None."""
    table: dict[tuple[int, int], int] = {}
    code, idx = 0, 0
    lengths = set()
    for n_bits, count in enumerate(bits, start=1):
        if count:
            lengths.add(n_bits)
        for _ in range(count):
            table[(n_bits, code)] = symbols[idx]
            code += 1
            idx += 1
        code <<= 1
    uniform = lengths.pop() if len(lengths) == 1 else None
    return table, uniform


def _read_symbol(reader: _BitReader, table) -> int:
    codes, uniform = table
    if uniform is not None:  # flat table: one read, one lookup
        sym = codes.get((uniform, reader.get(uniform)))
        if sym is None:
            raise ValueError("invalid JPEG Huffman code")
        return sym
    code, n = 0, 0
    while n <= 16:
        code = (code << 1) | reader.get(1)
        n += 1
        sym = codes.get((n, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):  # negative branch
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a baseline JFIF stream (8-bit, 1 or 3 components, all
    sampling factors 1x1, no progressive/restart/arithmetic coding —
    exactly the profile ``encode_jpeg_pixels`` emits, rejected
    loudly otherwise). Returns (width, height, pixels[h, w, 3] RGB
    top-down; grayscale replicates into 3 channels)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    scan_comps = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seg_len,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(
                    seg[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int32)
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG_FLAT] = zz
                quant[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                cls, tid = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n_sym = sum(bits)
                syms = list(seg[off + 17 : off + 17 + n_sym])
                huff[(cls, tid)] = _build_decode_table(bits, syms)
                off += 17 + n_sym
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i : 9 + 3 * i]
                if samp != 0x11:
                    raise ValueError(
                        "chroma subsampling unsupported (4:4:4 only)"
                    )
                comps.append((cid, tq))
            sof = (w, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise ValueError("non-baseline JPEG process unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_comps = [
                (seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0xF)
                for i in range(ns)
            ]
            pos = pos + 2 + seg_len
            break
        pos = pos + 2 + seg_len
    if sof is None or scan_comps is None:
        raise ValueError("JPEG missing SOF0/SOS")
    width, height, comps = sof
    if len(scan_comps) != len(comps) or len(comps) not in (1, 3):
        raise ValueError("unsupported component layout")

    reader = _BitReader(payload, pos)
    ph = (height + 7) // 8 * 8
    pw = (width + 7) // 8 * 8
    n_blocks = (ph // 8) * (pw // 8)
    # entropy decode is inherently sequential — collect each
    # component's zigzag rows, then do every IDCT in one einsum
    zz_planes = [
        np.zeros((n_blocks, 64), dtype=np.float64) for _ in comps
    ]
    preds = [0] * len(comps)
    comp_q = {cid: tq for cid, tq in comps}
    tables = []
    for cid, dc_t, ac_t in scan_comps:
        dc_table = huff.get((0, dc_t))
        ac_table = huff.get((1, ac_t))
        qt = quant.get(comp_q[cid])
        if dc_table is None or ac_table is None or qt is None:
            raise ValueError("JPEG references undefined table")
        tables.append((dc_table, ac_table, qt))
    for i in range(n_blocks):
        for ci, (dc_table, ac_table, _qt) in enumerate(tables):
            zz = zz_planes[ci][i]
            size = _read_symbol(reader, dc_table)
            diff = _extend(reader.get(size), size)
            preds[ci] += diff
            zz[0] = preds[ci]
            k = 1
            while k < 64:
                sym = _read_symbol(reader, ac_table)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = sym >> 4, sym & 0xF
                k += run
                if k > 63:
                    raise ValueError("AC run past end of block")
                zz[k] = _extend(reader.get(size), size)
                k += 1
    planes = []
    for ci, (_dc, _ac, qt) in enumerate(tables):
        coeff = np.zeros((n_blocks, 64), dtype=np.float64)
        coeff[:, ZIGZAG_FLAT] = zz_planes[ci]
        coeff = coeff.reshape(-1, 8, 8) * qt
        blocks = np.einsum("ux,nuv,vy->nxy", DCT_M, coeff, DCT_M) + 128.0
        planes.append(
            blocks.reshape(ph // 8, pw // 8, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(ph, pw)
        )
    if len(planes) == 1:
        gray = np.clip(np.round(planes[0][:height, :width]), 0, 255)
        return width, height, np.repeat(
            gray.astype(np.uint8)[:, :, None], 3, axis=2
        )
    ycc = np.stack([p[:height, :width] for p in planes], axis=-1)
    return width, height, _ycbcr_to_rgb(ycc)
