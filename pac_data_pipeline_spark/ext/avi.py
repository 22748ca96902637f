"""Uncompressed AVI (RIFF) mux/demux — pure stdlib ``struct`` + numpy.

AVI is the one video container fully expressible without a native
codec library: a ``'DIB '``/BI_RGB video stream carries raw bottom-up
BGR frames, so mux and demux are RIFF chunk accounting — the same
machinery as this package's PCM/G.711 WAV support (RIFF is RIFF).
Compressed video (H.264/VP9/MJPEG) stays honestly behind
``multimodal._decode_real``: :func:`parse_avi` refuses it loudly
rather than faking pixels.

Layout written (and accepted) here, per the canonical AVI RIFF form:

.. code-block:: text

    RIFF('AVI '
      LIST('hdrl'
        'avih'(<MainAVIHeader, 56 bytes>)
        LIST('strl'
          'strh'(<AVIStreamHeader 'vids'/'DIB ', 56 bytes>)
          'strf'(<BITMAPINFOHEADER, 24 bpp, BI_RGB>)))
      LIST('movi'
        '00db'(<raw bottom-up DIB frame>) ...)
      'idx1'(<AVIOLDINDEX>))

A real AVI video stream has ONE frame size (declared in ``strf``);
per-frame dimensions do not vary inside a stream. Anything claiming
otherwise is not an AVI — the synthetic generators upstream honour
that (dimensions vary per document, not per frame).

Reference parity: the reference pipeline (pandas + Firebase scripts)
has no video path at all — this module belongs to the beyond-reference
multimodal tier (SURVEY.md §2 extension operators). Scale note: demux
is header arithmetic (O(n_frames) chunk walk, no pixel copies); only
:func:`decode_avi_frame` touches pixel bytes, so frame *sampling*
reads just the sampled frames' spans.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

#: fourcc flags
_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    """A RIFF chunk: fourcc + u32 size + data, padded to even size
    (the pad byte is not counted in the size field)."""
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _dib_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Mux top-down ``(h, w, 3)`` uint8 BGR frames into a real
    uncompressed AVI ('DIB ' stream, BI_RGB, 24 bpp) with an idx1
    index. All frames must share one shape — that is what an AVI
    stream *is*. The result opens in any standard player."""
    if not frames:
        raise ValueError("an AVI stream needs at least one frame")
    h, w = frames[0].shape[:2]
    if w <= 0 or h <= 0:
        raise ValueError("frame dimensions must be positive")
    for fr in frames:
        if fr.shape != (h, w, 3):
            raise ValueError(
                f"AVI streams have one frame size: {fr.shape} != {(h, w, 3)}"
            )
    stride = _dib_stride(w)
    img_size = stride * h

    # raw DIB frame bytes: bottom-up rows padded to 4-byte stride
    frame_blobs = []
    for fr in frames:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = fr[::-1].reshape(h, w * 3)
        frame_blobs.append(rows.tobytes())

    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ",
        0, 0, 0, 0,
        1, fps,                      # scale / rate → fps frames per second
        0, len(frames),              # start / length (in frames)
        img_size, 0, 0,
        0, 0, w, h,                  # rcFrame
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,            # microseconds per frame
        img_size * fps,              # max bytes/sec (uncompressed worst case)
        0,
        _AVIF_HASINDEX,
        len(frames), 0, 1, img_size,
        w, h,
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl", _chunk(b"avih", avih) + _list(
            b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)
        )
    )

    movi_body = b""
    idx_entries = []
    for blob in frame_blobs:
        # idx1 offsets point at the chunk fourcc, relative to the
        # 'movi' list-type fourcc (the common convention)
        idx_entries.append((4 + len(movi_body), len(blob)))
        movi_body += _chunk(b"00db", blob)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00db" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


@dataclass(frozen=True)
class AviStream:
    """Demuxed geometry of an uncompressed AVI: stream-level frame
    size plus the byte span of every frame's raw DIB data inside the
    payload. Holding spans (not pixels) keeps demux O(header) — only
    :func:`decode_avi_frame` reads pixel bytes."""

    width: int
    height: int
    n_frames: int
    frame_spans: tuple[tuple[int, int], ...]  # (offset, size) per frame


def parse_avi(payload: bytes) -> AviStream:
    """Demux an uncompressed AVI: validate the RIFF/'AVI ' envelope,
    read the stream geometry from ``strf`` (the authoritative
    BITMAPINFOHEADER), refuse compressed streams, and walk the
    ``movi`` list collecting every video frame's byte span. The
    ``idx1`` index, when present, is cross-checked against the walk
    (a lying index is corruption, not a fallback)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = None
    spans: list[tuple[int, int]] = []
    idx_count = None

    off = 12
    end = min(len(payload), 8 + struct.unpack_from("<I", payload, 4)[0])
    while off + 8 <= end:
        fourcc = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body_off = off + 8
        if fourcc == b"LIST":
            list_type = payload[body_off : body_off + 4]
            if list_type == b"hdrl":
                width, height = _parse_hdrl(
                    payload, body_off + 4, body_off + size
                )
            elif list_type == b"movi":
                spans = _walk_movi(payload, body_off + 4, body_off + size)
        elif fourcc == b"idx1":
            idx_count = sum(
                1
                for i in range(body_off, body_off + size - 15, 16)
                if payload[i : i + 2] == b"00"
            )
        off = body_off + size + (size % 2)

    if width is None or height is None:
        raise ValueError("AVI without a vids strf header")
    if not spans:
        raise ValueError("AVI without a movi frame list")
    if idx_count is not None and idx_count != len(spans):
        raise ValueError(
            f"idx1 disagrees with movi: {idx_count} != {len(spans)} frames"
        )
    return AviStream(width, height, len(spans), tuple(spans))


def _parse_hdrl(payload: bytes, off: int, end: int) -> tuple[int, int]:
    """Find the first 'vids' stream's strf inside hdrl and return its
    (width, height); raise on compressed or non-24bpp streams."""
    while off + 8 <= end:
        fourcc = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body = off + 8
        if fourcc == b"LIST" and payload[body : body + 4] == b"strl":
            sub, sub_end = body + 4, body + size
            is_vids = False
            while sub + 8 <= sub_end:
                sf = payload[sub : sub + 4]
                (ss,) = struct.unpack_from("<I", payload, sub + 4)
                sb = sub + 8
                if sf == b"strh":
                    fcc_type, handler = struct.unpack_from("<4s4s", payload, sb)
                    is_vids = fcc_type == b"vids"
                    if is_vids and handler not in (b"DIB ", b"\x00" * 4):
                        raise ValueError(
                            f"compressed AVI stream ({handler!r}) needs a "
                            "native codec — see multimodal._decode_real"
                        )
                elif sf == b"strf" and is_vids:
                    w, h = struct.unpack_from("<ii", payload, sb + 4)
                    (bpp,) = struct.unpack_from("<H", payload, sb + 14)
                    (comp,) = struct.unpack_from("<I", payload, sb + 16)
                    if comp != 0 or bpp != 24 or w <= 0 or h <= 0:
                        raise ValueError(
                            f"unsupported AVI vids strf: bpp={bpp} comp={comp}"
                        )
                    return w, h
                sub = sb + ss + (ss % 2)
        off = body + size + (size % 2)
    raise ValueError("AVI hdrl without a vids strf header")


def _walk_movi(payload: bytes, off: int, end: int) -> list[tuple[int, int]]:
    """Collect (offset, size) spans of video frame chunks ('##db'
    uncompressed / '##dc' would be compressed and is refused upstream
    by strf). 'rec ' sub-lists are descended into."""
    spans: list[tuple[int, int]] = []
    while off + 8 <= end:
        fourcc = payload[off : off + 4]
        (size,) = struct.unpack_from("<I", payload, off + 4)
        body = off + 8
        if fourcc == b"LIST" and payload[body : body + 4] == b"rec ":
            spans.extend(_walk_movi(payload, body + 4, body + size))
        elif fourcc[2:4] in (b"db", b"dc"):
            spans.append((body, size))
        off = body + size + (size % 2)
    return spans


def decode_avi_frame(
    payload: bytes, stream: AviStream, frame_idx: int
) -> np.ndarray:
    """Decode one frame's raw DIB span into a top-down ``(h, w, 3)``
    uint8 BGR array — the ONLY function here that touches pixel
    bytes. The span length is verified against the stream geometry,
    so a sampled frame's dimensions are proven by its bytes, not
    trusted from metadata."""
    off, size = stream.frame_spans[frame_idx]
    stride = _dib_stride(stream.width)
    if size != stride * stream.height:
        raise ValueError(
            f"frame {frame_idx}: {size} bytes != stride {stride} × "
            f"height {stream.height}"
        )
    rows = np.frombuffer(payload, dtype=np.uint8, count=size, offset=off)
    rows = rows.reshape(stream.height, stride)[:, : stream.width * 3]
    return rows.reshape(stream.height, stream.width, 3)[::-1]
