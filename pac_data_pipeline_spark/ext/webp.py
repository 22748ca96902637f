"""WebP lossless (VP8L) codec — pure stdlib + numpy, no libwebp.

The lossless half of WebP is an entropy-coded ARGB format (canonical
prefix codes + LZ77 + color cache + four reversible transforms) and
is therefore implementable exactly, like this package's PNG/GIF/TIFF
codecs. The lossy half (``VP8 `` chunks — DCT + bool-coder + loop
filter) genuinely needs a DSP codec library and stays behind
``multimodal._decode_real``; :func:`decode_webp` refuses it loudly.

Decoder coverage (the full VP8L feature set):

- simple (1–2 symbol) and normal code-length-coded prefix codes,
  including 16/17/18 repeat codes and the optional max-symbol field
- meta prefix codes (entropy image) selecting per-tile code groups
- color cache (hash ``0x1e35a7bd``) interleaved with literals/copies
- LZ77 backward references with the 120-entry 2D distance map
- all four transforms, inverted in reverse stream order: predictor
  (14 modes, tile-coded), color (per-tile signed multipliers),
  subtract-green, color-indexing (palette + sub-byte pixel bundling)

The encoder emits a deliberately small, always-valid subset — one
prefix-code group, literal-only (no LZ77/cache), optional
subtract-green and whole-image predictor transforms — enough to
synthesize genuine .webp files any browser opens, and to round-trip
the decoder's transform paths in tests.

Bit conventions (shared by encoder and decoder, DEFLATE-style):
the byte stream is LSB-first; prefix codes are canonical (codes
assigned in (length, symbol) order) and their bits appear
most-significant-first. LZ77 copies are inherently serial, so decode
runs per-pixel in Python — media batches parallelize across
documents via ``mapInPandas`` fan-out, not within one image, same as
the JPEG/GIF codecs.

Reference parity: the reference pipeline has no media path; this is
the beyond-reference multimodal tier (SURVEY.md §2 extensions),
following the public "WebP Lossless Bitstream Specification".
"""

from __future__ import annotations

import struct

import numpy as np

# transform types, in spec order
_PREDICTOR, _COLOR, _SUBTRACT_GREEN, _COLOR_INDEXING = 0, 1, 2, 3

#: order in which code-length-code lengths are transmitted
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: distance codes 1..120 map to this (dx, dy) pixel neighborhood
#: (spec table); codes beyond 120 are linear distances minus 120.
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


class _BitReader:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read_bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("truncated VP8L bitstream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v

    def read_bit(self) -> int:
        return self.read_bits(1)


class _PrefixCode:
    """Canonical prefix code decoded bit-serially: codes are assigned
    in (length, symbol) order and read MSB-first off the LSB-first
    byte stream (the DEFLATE convention, mirrored by the encoder)."""

    def __init__(self, lengths: list[int]) -> None:
        self.single = None
        nonzero = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nonzero:
            raise ValueError("prefix code with no symbols")
        if len(nonzero) == 1:
            self.single = nonzero[0][1]
            return
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = 0
        kraft = 0
        for length, sym in sorted(nonzero):
            code <<= length - prev_len
            self.table[(length, code)] = sym
            code += 1
            prev_len = length
            kraft += 1 << (15 - length)
        if kraft != 1 << 15:
            raise ValueError("prefix code lengths are not complete")

    @classmethod
    def simple(cls, symbols: list[int]) -> "_PrefixCode":
        pc = cls.__new__(cls)
        if len(symbols) == 1:
            pc.single = symbols[0]
        else:
            pc.single = None
            pc.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return pc

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | br.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code: 1 or 2 symbols
        num_symbols = br.read_bit() + 1
        first_bits = 8 if br.read_bit() else 1
        symbols = [br.read_bits(first_bits)]
        if num_symbols == 2:
            symbols.append(br.read_bits(8))
        if any(s >= alphabet_size for s in symbols):
            raise ValueError("simple prefix symbol out of range")
        return _PrefixCode.simple(symbols)

    clc_lengths = [0] * 19
    num_codes = 4 + br.read_bits(4)
    for i in range(num_codes):
        clc_lengths[_CLC_ORDER[i]] = br.read_bits(3)
    clc = _PrefixCode(clc_lengths)

    max_symbol = alphabet_size
    if br.read_bit():  # optional cap on transmitted symbols
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("max_symbol exceeds alphabet")

    lengths = [0] * alphabet_size
    prev = 8
    n = 0
    while n < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = clc.read(br)
        if sym < 16:
            lengths[n] = sym
            n += 1
            if sym:
                prev = sym
        elif sym == 16:
            rep = 3 + br.read_bits(2)
            lengths[n : n + rep] = [prev] * min(rep, alphabet_size - n)
            n += rep
        elif sym == 17:
            n += 3 + br.read_bits(3)
        else:  # 18
            n += 11 + br.read_bits(7)
    if n > alphabet_size:
        raise ValueError("code length repeats overflow the alphabet")
    return _PrefixCode(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length / distance-code decoding: 24 (or 40) prefix slots
    with spec extra-bit expansion."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read_bits(extra) + 1


def _cache_hash(pixel: int, bits: int) -> int:
    return ((0x1E35A7BD * pixel) & 0xFFFFFFFF) >> (32 - bits)


def _decode_image_stream(
    br: _BitReader, width: int, height: int, is_level0: bool
):
    """Decode one VP8L image stream into a flat uint32 ARGB array.
    Sub-resolution images (entropy/predictor/color/palette) use the
    same routine with ``is_level0=False`` (no transforms, no meta
    prefix). Returns (pixels, transforms) — transforms non-empty only
    at level 0, already in stream order."""
    transforms = []
    if is_level0:
        seen = set()
        while br.read_bit():
            ttype = br.read_bits(2)
            if ttype in seen:
                raise ValueError("duplicate VP8L transform")
            seen.add(ttype)
            if ttype in (_PREDICTOR, _COLOR):
                size_bits = br.read_bits(3) + 2
                bw = _div_round_up(width, 1 << size_bits)
                bh = _div_round_up(height, 1 << size_bits)
                sub, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == _SUBTRACT_GREEN:
                transforms.append((ttype, None, None))
            else:  # _COLOR_INDEXING
                n_colors = br.read_bits(8) + 1
                pal, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are delta-coded componentwise
                out = np.zeros(n_colors, dtype=np.uint32)
                prev = 0
                for i, p in enumerate(pal):
                    s = (
                        ((prev >> 24) + (int(p) >> 24) & 0xFF) << 24
                        | ((prev >> 16) + (int(p) >> 16) & 0xFF) << 16
                        | ((prev >> 8) + (int(p) >> 8) & 0xFF) << 8
                        | ((prev + int(p)) & 0xFF)
                    )
                    out[i] = s
                    prev = s
                transforms.append((ttype, n_colors, out))
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms[-1] = (ttype, (n_colors, width_bits, width), out)
                width = _div_round_up(width, 1 << width_bits)

    cache_bits = 0
    if br.read_bit():
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"invalid color cache bits: {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta = None
    meta_bits = 0
    num_groups = 1
    if is_level0 and br.read_bit():
        meta_bits = br.read_bits(3) + 2
        mw = _div_round_up(width, 1 << meta_bits)
        mh = _div_round_up(height, 1 << meta_bits)
        meta_img, _ = _decode_image_stream(br, mw, mh, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1

    alphabet_g = 256 + 24 + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, alphabet_g),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 40),
            )
        )

    n_pixels = width * height
    pixels = np.zeros(n_pixels, dtype=np.uint32)
    pos = 0
    mw = _div_round_up(width, 1 << meta_bits) if meta is not None else 0
    group = groups[0]
    while pos < n_pixels:
        if meta is not None:
            x, y = pos % width, pos // width
            group = groups[meta[(y >> meta_bits) * mw + (x >> meta_bits)]]
        g_code, r_code, b_code, a_code, d_code = group
        code = g_code.read(br)
        if code < 256:  # literal
            g = code
            r = r_code.read(br)
            b = b_code.read(br)
            a = a_code.read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            pixels[pos] = px
            pos += 1
            if cache_size:
                cache[_cache_hash(px, cache_bits)] = px
        elif code < 280:  # LZ77 backward reference
            length = _prefix_value(code - 256, br)
            dist_code = _prefix_value(d_code.read(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = max(1, dy * width + dx)
            if dist > pos or pos + length > n_pixels:
                raise ValueError("LZ77 reference outside the image")
            for _ in range(length):
                px = int(pixels[pos - dist])
                pixels[pos] = px
                pos += 1
                if cache_size:
                    cache[_cache_hash(px, cache_bits)] = px
        else:  # color cache hit
            if code - 280 >= cache_size:
                raise ValueError("color cache index out of range")
            pixels[pos] = cache[code - 280]
            pos += 1
    return pixels, transforms


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) // 2) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8
        | ((a & 0xFF) + (b & 0xFF)) // 2
    )


def _select(l: int, t: int, tl: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        cl = (l >> sh) & 0xFF
        ct = (t >> sh) & 0xFF
        ctl = (tl >> sh) & 0xFF
        p = cl + ct - ctl
        p_l += abs(p - cl)
        p_t += abs(p - ct)
    return l if p_l < p_t else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= max(0, min(255, v)) << sh
    return out


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:
    ave = _avg2(l, t)
    out = 0
    for sh in (24, 16, 8, 0):
        a = (ave >> sh) & 0xFF
        v = a + (a - ((tl >> sh) & 0xFF)) // 2
        out |= max(0, min(255, v)) << sh
    return out


def _predict(mode: int, l: int, t: int, tr: int, tl: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(l, t, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"invalid predictor mode {mode}")


def _add_pixels(residual: int, pred: int) -> int:
    return (
        (((residual >> 24) + (pred >> 24)) & 0xFF) << 24
        | ((((residual >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((residual >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((residual & 0xFF) + (pred & 0xFF)) & 0xFF)
    )


def _inverse_predictor(
    pixels: np.ndarray, width: int, height: int, size_bits: int,
    modes: np.ndarray,
) -> None:
    bw = _div_round_up(width, 1 << size_bits)
    for y in range(height):
        for x in range(width):
            i = y * width + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(pixels[i - 1])  # first row: left
            elif x == 0:
                pred = int(pixels[i - width])  # first column: top
            else:
                mode = (int(modes[(y >> size_bits) * bw + (x >> size_bits)])
                        >> 8) & 0xFF
                l = int(pixels[i - 1])
                t = int(pixels[i - width])
                tl = int(pixels[i - width - 1])
                # rightmost column: TR wraps to the current row's
                # leftmost reconstructed pixel (flat-buffer semantics)
                tr = int(pixels[i - width + 1])
                pred = _predict(mode, l, t, tr, tl)
            pixels[i] = _add_pixels(int(pixels[i]), pred)


def _int8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _inverse_color(
    pixels: np.ndarray, width: int, height: int, size_bits: int,
    elements: np.ndarray,
) -> None:
    bw = _div_round_up(width, 1 << size_bits)
    for y in range(height):
        for x in range(width):
            i = y * width + x
            cte = int(elements[(y >> size_bits) * bw + (x >> size_bits)])
            g2r = _int8(cte & 0xFF)
            g2b = _int8((cte >> 8) & 0xFF)
            r2b = _int8((cte >> 16) & 0xFF)
            px = int(pixels[i])
            g = _int8((px >> 8) & 0xFF)
            red = ((px >> 16) & 0xFF) + ((g2r * g) >> 5)
            blue = (px & 0xFF) + ((g2b * g) >> 5)
            blue += (r2b * _int8(red & 0xFF)) >> 5
            pixels[i] = (
                (px & 0xFF00FF00)
                | ((red & 0xFF) << 16)
                | (blue & 0xFF)
            )


def _inverse_subtract_green(pixels: np.ndarray) -> None:
    g = (pixels >> 8) & 0xFF
    r = ((pixels >> 16) + g) & 0xFF
    b = (pixels + g) & 0xFF
    pixels[:] = (pixels & 0xFF00FF00) | (r << 16) | b


def _inverse_color_indexing(
    pixels: np.ndarray, spec, palette: np.ndarray, height: int
) -> np.ndarray:
    n_colors, width_bits, orig_width = spec
    if width_bits == 0:
        idx = (pixels >> 8) & 0xFF
        out = np.where(idx < n_colors, palette[np.minimum(idx, n_colors - 1)], 0)
        return out.astype(np.uint32)
    packed_w = _div_round_up(orig_width, 1 << width_bits)
    bits_per_px = 8 >> width_bits
    mask = (1 << bits_per_px) - 1
    grid = pixels.reshape(height, packed_w)
    out = np.zeros(height * orig_width, dtype=np.uint32)
    for y in range(height):
        for x in range(orig_width):
            packed = int(grid[y, x >> width_bits])
            idx = ((packed >> 8) >> (bits_per_px * (x & ((1 << width_bits) - 1)))) & mask
            out[y * orig_width + x] = palette[idx] if idx < n_colors else 0
    return out


def decode_vp8l(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a raw VP8L payload (the chunk body, starting with the
    0x2F signature) into (width, height, RGBA uint8 array)."""
    if not data or data[0] != 0x2F:
        raise ValueError("not a VP8L payload (bad signature)")
    br = _BitReader(data)
    br.pos = 8
    width = br.read_bits(14) + 1
    height = br.read_bits(14) + 1
    br.read_bit()  # alpha_is_used hint
    version = br.read_bits(3)
    if version != 0:
        raise ValueError(f"unsupported VP8L version {version}")

    pixels, transforms = _decode_image_stream(br, width, height, True)
    # spatial transforms reading a post-palette (packed-width) image
    # would need the packed geometry; refuse rather than mis-apply
    types = [t for t, _, _ in transforms]
    if _COLOR_INDEXING in types and types.index(_COLOR_INDEXING) < len(types) - 1:
        raise ValueError("transforms after color-indexing are unsupported")
    for ttype, arg, sub in reversed(transforms):
        if ttype == _COLOR_INDEXING:
            pixels = _inverse_color_indexing(pixels, arg, sub, height)
        elif ttype == _SUBTRACT_GREEN:
            _inverse_subtract_green(pixels)
        elif ttype == _COLOR:
            _inverse_color(pixels, width, height, arg, sub)
        else:  # _PREDICTOR
            _inverse_predictor(pixels, width, height, arg, sub)

    argb = pixels.reshape(height, width)
    rgba = np.zeros((height, width, 4), dtype=np.uint8)
    rgba[..., 0] = (argb >> 16) & 0xFF
    rgba[..., 1] = (argb >> 8) & 0xFF
    rgba[..., 2] = argb & 0xFF
    rgba[..., 3] = (argb >> 24) & 0xFF
    return width, height, rgba


def decode_webp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a .webp file. Lossless (VP8L) decodes fully — directly
    or inside a VP8X extended container; lossy (VP8) is refused
    loudly: it needs a native DSP codec (``multimodal._decode_real``)."""
    if (
        len(payload) < 12
        or payload[:4] != b"RIFF"
        or payload[8:12] != b"WEBP"
    ):
        raise ValueError("not a WEBP payload")
    off = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    while off + 8 <= end:
        fourcc = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body = off + 8
        if fourcc == b"VP8L":
            return decode_vp8l(payload[body : body + size])
        if fourcc == b"VP8 ":
            raise ValueError(
                "lossy WebP (VP8) needs a native DSP codec — see "
                "multimodal._decode_real; only lossless VP8L decodes here"
            )
        off = body + size + (size % 2)
    raise ValueError("WEBP container without a VP8L chunk")


# ---------------------------------------------------------------------------
# encoder: literal-only VP8L subset (optionally subtract-green and a
# whole-image predictor), one prefix-code group, no LZ77/cache.
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int) -> None:
        # prefix codes go MSB-first (mirrors _PrefixCode.read)
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _huffman_lengths(counts: dict[int, int], max_len: int = 15) -> dict[int, int]:
    """Code lengths from symbol counts: true Huffman via pairwise
    merge; if the tree exceeds ``max_len`` (pathological skew), fall
    back to the flat complete code (2^L - n short codes of L-1)."""
    import heapq

    syms = sorted(counts)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(c, i, (s,)) for i, (s, c) in enumerate(sorted(counts.items()))]
    heapq.heapify(heap)
    lengths = dict.fromkeys(syms, 0)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, i2, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (c1 + c2, i2, s1 + s2))
    if max(lengths.values()) > max_len:
        n = len(syms)
        level = max(1, (n - 1).bit_length())
        n_short = (1 << level) - n
        lengths = {
            s: level - 1 if i < n_short else level
            for i, s in enumerate(syms)
        }
        if n_short == 0 and (1 << level) == n:
            lengths = dict.fromkeys(syms, level)
    return lengths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    prev = 0
    for length, sym in sorted((l, s) for s, l in lengths.items() if l):
        code <<= length - prev
        codes[sym] = (code, length)
        code += 1
        prev = length
    return codes


def _write_prefix_code(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
) -> dict[int, tuple[int, int]]:
    """Transmit a prefix code (simple form when ≤2 symbols, else
    code-length-coded, written naively symbol by symbol) and return
    its canonical (code, length) table."""
    syms = sorted(s for s, l in lengths.items() if l)
    if len(syms) <= 2:
        bw.write_bits(1, 1)  # simple
        bw.write_bits(len(syms) - 1, 1)
        first_8bit = syms[0] > 1
        bw.write_bits(1 if first_8bit else 0, 1)
        bw.write_bits(syms[0], 8 if first_8bit else 1)
        if len(syms) == 2:
            bw.write_bits(syms[1], 8)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        return {syms[0]: (0, 1), syms[1]: (1, 1)}

    bw.write_bits(0, 1)  # normal
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    clc_counts: dict[int, int] = {}
    for l in full:
        clc_counts[l] = clc_counts.get(l, 0) + 1
    clc_lengths = _huffman_lengths(clc_counts, max_len=7)
    num_codes = max(
        i + 1
        for i, sym in enumerate(_CLC_ORDER)
        if clc_lengths.get(sym, 0) > 0
    )
    num_codes = max(num_codes, 4)
    bw.write_bits(num_codes - 4, 4)
    for i in range(num_codes):
        bw.write_bits(clc_lengths.get(_CLC_ORDER[i], 0), 3)
    bw.write_bits(0, 1)  # no max_symbol cap: all lengths transmitted
    if len(clc_lengths) == 1:
        # single-symbol code-length code: the decoder reads zero bits
        # per length, so transmit nothing
        return _canonical_codes(lengths)
    clc_codes = _canonical_codes(clc_lengths)
    for l in full:
        c, n = clc_codes[l]
        bw.write_code(c, n)
    return _canonical_codes(lengths)


def encode_vp8l(rgba: np.ndarray, *, subtract_green: bool = False,
                predictor: bool = False) -> bytes:
    """Encode an (h, w, 4) uint8 RGBA array as a valid VP8L payload:
    literal-only, one prefix-code group; optional subtract-green and
    whole-image horizontal predictor (mode 1) exercise the decoder's
    transform paths on genuine bitstreams."""
    h, w = rgba.shape[:2]
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError("VP8L dimensions must be in 1..16384")
    argb = (
        rgba[..., 3].astype(np.uint32) << 24
        | rgba[..., 0].astype(np.uint32) << 16
        | rgba[..., 1].astype(np.uint32) << 8
        | rgba[..., 2].astype(np.uint32)
    ).reshape(-1)

    bw = _BitWriter()
    bw.write_bits(0x2F, 8)
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(1 if (rgba[..., 3] != 255).any() else 0, 1)
    bw.write_bits(0, 3)  # version

    if predictor:
        # residuals first (mode 1 = left; row starts predict from
        # top / 0xff000000 exactly as the decoder reconstructs)
        res = argb.copy()
        for i in range(len(argb) - 1, -1, -1):
            x, y = i % w, i // w
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif x == 0:
                pred = int(argb[i - w])  # first column: top
            else:
                pred = int(argb[i - 1])  # mode 1 = left (also row 0)
            res[i] = _sub_pixels(int(argb[i]), pred)
        argb = res
        bw.write_bits(1, 1)  # transform present
        bw.write_bits(_PREDICTOR, 2)
        size_bits = 9  # 512-px tiles: a single tile up to 512×512
        bw.write_bits(size_bits - 2, 3)
        bwid = _div_round_up(w, 1 << size_bits)
        bhei = _div_round_up(h, 1 << size_bits)
        _encode_sub_image(
            bw, np.full(bwid * bhei, 0xFF000100, dtype=np.uint32)
        )  # green channel = mode 1
    if subtract_green:
        g = (argb >> 8) & 0xFF
        argb = (
            (argb & 0xFF00FF00)
            | ((((argb >> 16) & 0xFF) - g) & 0xFF) << 16
            | (((argb & 0xFF) - g) & 0xFF)
        )
        bw.write_bits(1, 1)
        bw.write_bits(_SUBTRACT_GREEN, 2)
    bw.write_bits(0, 1)  # end of transforms
    _encode_sub_image(bw, argb, top_level=True)
    return bw.tobytes()


def _sub_pixels(px: int, pred: int) -> int:
    return (
        (((px >> 24) - (pred >> 24)) & 0xFF) << 24
        | ((((px >> 16) & 0xFF) - ((pred >> 16) & 0xFF)) & 0xFF) << 16
        | ((((px >> 8) & 0xFF) - ((pred >> 8) & 0xFF)) & 0xFF) << 8
        | (((px & 0xFF) - (pred & 0xFF)) & 0xFF)
    )


def _encode_sub_image(
    bw: _BitWriter, argb: np.ndarray, top_level: bool = False
) -> None:
    """Entropy-code a flat ARGB array literal-only: no color cache,
    no meta prefix, five per-channel prefix codes, G alphabet 280."""
    bw.write_bits(0, 1)  # no color cache
    if top_level:
        bw.write_bits(0, 1)  # no meta prefix codes

    chans = {
        "g": ((argb >> 8) & 0xFF).astype(np.int64),
        "r": ((argb >> 16) & 0xFF).astype(np.int64),
        "b": (argb & 0xFF).astype(np.int64),
        "a": ((argb >> 24) & 0xFF).astype(np.int64),
    }
    tables = {}
    for name, alphabet in (("g", 280), ("r", 256), ("b", 256), ("a", 256)):
        vals, counts = np.unique(chans[name], return_counts=True)
        lengths = _huffman_lengths(
            {int(v): int(c) for v, c in zip(vals, counts)}
        )
        tables[name] = _write_prefix_code(bw, lengths, alphabet)
    _write_prefix_code(bw, {0: 1}, 40)  # distance code: unused

    for px in argb:
        px = int(px)
        for name, sh in (("g", 8), ("r", 16), ("b", 0), ("a", 24)):
            code, n = tables[name][(px >> sh) & 0xFF]
            bw.write_code(code, n)


def encode_webp(rgba: np.ndarray, **kwargs) -> bytes:
    """Wrap :func:`encode_vp8l` in the RIFF/WEBP container — the
    result is a genuine .webp file any browser opens."""
    vp8l = encode_vp8l(rgba, **kwargs)
    chunk = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) % 2:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
