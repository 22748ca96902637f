"""GIF87a/89a codec — pure stdlib+numpy, no codec library.

Implements the still-image subset of the GIF specification: logical
screen descriptor, global color table, image descriptor, and the
variable-width LSB-first LZW entropy coding (clear/end codes,
dictionary growth to 12 bits, 255-byte sub-block packaging). GIF is
LOSSLESS over its palette, so unlike JPEG the decode contract is
bit-exact pixel equality — tests pin it.

Deliberately out of scope, rejected loudly rather than guessed at:
interlaced images, animation (multiple image descriptors — only the
first frame is decoded), local color tables, and transparency
compositing (the graphic-control extension is skipped as an
extension block per spec).

The synthetic encoder uses a fixed deterministic 256-entry palette
(``_PALETTE``) and tiles the seed bytes as palette indices — the
same generative shape as the BMP/PNG/JPEG encoders in this package,
so a decoded image's pixels are exactly ``_PALETTE[seed tile]``.
"""

from __future__ import annotations

import struct

import numpy as np

#: Deterministic 256-entry RGB palette: index i → (i, 2i mod 256,
#: 3i mod 256). Covers every byte value so seed tiling needs no
#: quantization step.
_PALETTE = np.stack(
    [
        np.arange(256, dtype=np.uint8),
        (np.arange(256) * 2 % 256).astype(np.uint8),
        (np.arange(256) * 3 % 256).astype(np.uint8),
    ],
    axis=1,
)

_MAX_CODE_WIDTH = 12


# ------------------------------------------------------------------ LZW


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: LSB-first variable-width codes, clear code
    emitted up front and on dictionary overflow at 4096 entries."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    n_bits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    def fresh_dict():
        return {bytes([i]): i for i in range(clear)}

    table = fresh_dict()
    next_code = end + 1
    width = min_code_size + 1
    put(clear, width)
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        put(table[prefix], width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < _MAX_CODE_WIDTH:
                width += 1
        else:  # dictionary full: reset per spec
            put(clear, width)
            table = fresh_dict()
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        put(table[prefix], width)
    put(end, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytes:
    """Inverse of :func:`_lzw_encode`; raises ValueError on invalid
    codes, missing end code, or output-length mismatch."""
    clear = 1 << min_code_size
    end = clear + 1
    pos = 0
    acc = 0
    n_bits = 0

    def get(width: int) -> int:
        nonlocal pos, acc, n_bits
        while n_bits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream exhausted")
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        val = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        return val

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = get(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if not table:
            raise ValueError("GIF LZW data before clear code")
        if code < len(table) and code not in (clear, end):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError(f"invalid GIF LZW code {code}")
        out.extend(entry)
        if prev is not None and len(table) < (1 << _MAX_CODE_WIDTH):
            table.append(prev + entry[:1])
            # widen when the NEXT code could overflow current width
            if len(table) == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = entry
        if len(out) > expected:
            raise ValueError("GIF LZW output exceeds image size")
    if len(out) != expected:
        raise ValueError(
            f"GIF pixel count mismatch: {len(out)} != {expected}"
        )
    return bytes(out)


# ------------------------------------------------------------- container


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)  # block terminator
    return bytes(out)


def encode_gif(width: int, height: int, pixel_seed: bytes) -> bytes:
    """Deterministic GIF89a from the shared tiled-seed formula: seed
    bytes tile the index raster; pixels are ``_PALETTE[index]``."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    seed = np.frombuffer(pixel_seed or b"\x00", dtype=np.uint8)
    n = width * height
    indices = np.tile(seed, n // len(seed) + 1)[:n]
    header = b"GIF89a"
    # logical screen: global color table flag, 8 bits/channel, 256
    # entries (packed field 0xF7), background 0, no aspect ratio
    screen = struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    gct = _PALETTE.tobytes()
    # image descriptor at (0,0), no local table, not interlaced
    img_desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    lzw = _lzw_encode(indices.tobytes(), 8)
    return (
        header
        + screen
        + gct
        + img_desc
        + bytes([8])  # LZW minimum code size
        + _sub_blocks(lzw)
        + b"\x3b"  # trailer
    )


def decode_gif(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Decode the first (only) frame of a non-interlaced GIF87a/89a
    with a global color table. Returns (width, height,
    pixels[h, w, 3] RGB top-down) — exact, GIF is lossless. Raises
    ValueError on anything outside that profile."""
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = None
    if packed & 0x80:  # global color table present
        n_colors = 2 << (packed & 0x07)
        end = pos + 3 * n_colors
        if end > len(payload):
            raise ValueError("truncated GIF color table")
        palette = np.frombuffer(payload[pos:end], dtype=np.uint8).reshape(
            n_colors, 3
        )
        pos = end
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: skip label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(payload):
                raise ValueError("truncated GIF image descriptor")
            _ix, _iy, iw, ih, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if ipacked & 0x80:
                raise ValueError("local color tables unsupported")
            if palette is None:
                raise ValueError("GIF missing color table")
            if iw == 0 or ih == 0:
                raise ValueError("empty GIF frame")
            if pos >= len(payload):
                raise ValueError("truncated GIF before LZW data")
            mcs = payload[pos]
            if not 2 <= mcs <= 8:
                raise ValueError(f"bad GIF LZW min code size {mcs}")
            pos += 1
            lzw = bytearray()
            while True:
                if pos >= len(payload):
                    raise ValueError("truncated GIF sub-blocks")
                n = payload[pos]
                pos += 1
                if n == 0:
                    break
                if pos + n > len(payload):
                    raise ValueError("truncated GIF sub-block")
                lzw.extend(payload[pos : pos + n])
                pos += n
            indices = np.frombuffer(
                _lzw_decode(bytes(lzw), mcs, iw * ih), dtype=np.uint8
            )
            if int(indices.max(initial=0)) >= palette.shape[0]:
                raise ValueError("GIF index outside color table")
            return iw, ih, palette[indices].reshape(ih, iw, 3)
        elif block == 0x3B:  # trailer before any image
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    raise ValueError("GIF contains no image data")
