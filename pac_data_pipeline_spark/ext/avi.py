"""AVI (RIFF) mux/demux — pure stdlib ``struct`` + numpy.

Two video codecs are fully expressible without a native codec
library, and both live here:

* ``'DIB '``/BI_RGB — raw bottom-up BGR frames; mux and demux are
  RIFF chunk accounting, the same machinery as this package's
  PCM/G.711 WAV support (RIFF is RIFF).
* ``'MJPG'`` — Motion-JPEG, the compressed-video format whose every
  frame is an independent baseline JPEG: demux is the same chunk
  walk, per-frame decode composes the package's own pure-numpy
  baseline JPEG codec (:mod:`pac_data_pipeline_spark.ext.jpeg`).
  No inter-frame state, which is exactly why it is reachable
  without ffmpeg.

Inter-frame codecs (H.264/VP8/VP9) stay honestly behind
``multimodal._decode_real``: :func:`parse_avi` refuses them loudly
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
#: BITMAPINFOHEADER biCompression value for Motion-JPEG: the fourcc
#: bytes b"MJPG" read as a little-endian u32
_BI_MJPG = struct.unpack("<I", b"MJPG")[0]


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    """A RIFF chunk: fourcc + u32 size + data, padded to even size
    (the pad byte is not counted in the size field)."""
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def _dib_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def _check_one_shape(frames: list[np.ndarray]) -> tuple[int, int]:
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
    return h, w


def _mux_avi(
    frame_blobs: list[bytes],
    w: int,
    h: int,
    fps: int,
    handler: bytes,
    compression: int,
    chunk_id: bytes,
    suggested_size: int,
) -> bytes:
    """Shared RIFF mux skeleton for both codecs: the container is
    identical chunk accounting whether the frame blobs are raw DIB
    rows or per-frame JPEG bitstreams — only the strh handler, the
    strf biCompression, and the '##db'/'##dc' chunk id differ."""
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, compression, suggested_size, 2835, 2835, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", handler,
        0, 0, 0, 0,
        1, fps,                      # scale / rate → fps frames per second
        0, len(frame_blobs),         # start / length (in frames)
        suggested_size, 0, 0,
        0, 0, w, h,                  # rcFrame
    )
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,            # microseconds per frame
        suggested_size * fps,        # max bytes/sec (worst case)
        0,
        _AVIF_HASINDEX,
        len(frame_blobs), 0, 1, suggested_size,
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
        movi_body += _chunk(chunk_id, blob)
    movi = _list(b"movi", movi_body)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            chunk_id + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def encode_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Mux top-down ``(h, w, 3)`` uint8 BGR frames into a real
    uncompressed AVI ('DIB ' stream, BI_RGB, 24 bpp) with an idx1
    index. All frames must share one shape — that is what an AVI
    stream *is*. The result opens in any standard player."""
    h, w = _check_one_shape(frames)
    stride = _dib_stride(w)
    img_size = stride * h

    # raw DIB frame bytes: bottom-up rows padded to 4-byte stride
    frame_blobs = []
    for fr in frames:
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = fr[::-1].reshape(h, w * 3)
        frame_blobs.append(rows.tobytes())
    return _mux_avi(
        frame_blobs, w, h, fps,
        handler=b"DIB ", compression=0, chunk_id=b"00db",
        suggested_size=img_size,
    )


def encode_mjpeg_avi(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """Mux top-down ``(h, w, 3)`` uint8 RGB frames into a real
    Motion-JPEG AVI: each frame is independently encoded as a
    baseline JFIF bitstream (:func:`ext.jpeg.encode_jpeg_pixels`)
    and carried in a '00dc' (compressed) chunk under an 'MJPG'
    stream header. Standard players and ffmpeg demux/decode the
    result; so does :func:`parse_avi` + :func:`decode_avi_frame`
    with zero native dependencies, because MJPEG has no inter-frame
    state. Note the channel-order asymmetry inherent to the codecs:
    DIB frames are BGR (bitmap convention), MJPEG frames RGB (JFIF
    convention) — mirrored exactly on decode."""
    from pac_data_pipeline_spark.ext.jpeg import encode_jpeg_pixels

    h, w = _check_one_shape(frames)
    frame_blobs = [encode_jpeg_pixels(fr) for fr in frames]
    return _mux_avi(
        frame_blobs, w, h, fps,
        handler=b"MJPG", compression=_BI_MJPG, chunk_id=b"00dc",
        suggested_size=max(len(b) for b in frame_blobs),
    )


@dataclass(frozen=True)
class AviStream:
    """Demuxed geometry of an AVI: stream-level frame size, codec
    (``'dib'`` raw / ``'mjpg'`` Motion-JPEG), and the byte span of
    every frame's data inside the payload. Holding spans (not
    pixels) keeps demux O(header) — only :func:`decode_avi_frame`
    reads (and for MJPEG, entropy-decodes) frame bytes."""

    width: int
    height: int
    n_frames: int
    frame_spans: tuple[tuple[int, int], ...]  # (offset, size) per frame
    codec: str = "dib"


def parse_avi(payload: bytes) -> AviStream:
    """Demux an AVI: validate the RIFF/'AVI ' envelope, read the
    stream geometry and codec from ``strf`` (the authoritative
    BITMAPINFOHEADER — 'DIB ' raw and 'MJPG' Motion-JPEG are
    decodable; inter-frame codecs are refused loudly), and walk the
    ``movi`` list collecting every video frame's byte span. The
    ``idx1`` index, when present, is cross-checked against the walk
    (a lying index is corruption, not a fallback)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    geom = None
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
                geom = _parse_hdrl(payload, body_off + 4, body_off + size)
            elif list_type == b"movi":
                spans = _walk_movi(payload, body_off + 4, body_off + size)
        elif fourcc == b"idx1":
            idx_count = sum(
                1
                for i in range(body_off, body_off + size - 15, 16)
                if payload[i : i + 2] == b"00"
            )
        off = body_off + size + (size % 2)

    if geom is None:
        raise ValueError("AVI without a vids strf header")
    width, height, codec = geom
    if not spans:
        raise ValueError("AVI without a movi frame list")
    if idx_count is not None and idx_count != len(spans):
        raise ValueError(
            f"idx1 disagrees with movi: {idx_count} != {len(spans)} frames"
        )
    return AviStream(width, height, len(spans), tuple(spans), codec)


def _parse_hdrl(payload: bytes, off: int, end: int) -> tuple[int, int, str]:
    """Find the first 'vids' stream's strf inside hdrl and return its
    (width, height, codec); raise on codecs this module cannot decode
    (anything with inter-frame state) and on non-24bpp streams."""
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
                    if is_vids and handler not in (
                        b"DIB ", b"MJPG", b"\x00" * 4
                    ):
                        raise ValueError(
                            f"inter-frame AVI codec ({handler!r}) needs a "
                            "native library — see multimodal._decode_real"
                        )
                elif sf == b"strf" and is_vids:
                    w, h = struct.unpack_from("<ii", payload, sb + 4)
                    (bpp,) = struct.unpack_from("<H", payload, sb + 14)
                    (comp,) = struct.unpack_from("<I", payload, sb + 16)
                    # biCompression is authoritative (the handler is
                    # advisory); BI_RGB=0 raw and 'MJPG' decode here
                    if comp == 0:
                        codec = "dib"
                    elif comp == _BI_MJPG:
                        codec = "mjpg"
                    else:
                        raise ValueError(
                            f"unsupported AVI biCompression {comp:#x}"
                        )
                    if bpp != 24 or w <= 0 or h <= 0:
                        raise ValueError(
                            f"unsupported AVI vids strf: bpp={bpp} comp={comp}"
                        )
                    return w, h, codec
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
    """Decode one frame's span into a top-down ``(h, w, 3)`` uint8
    array — the ONLY function here that touches pixel bytes. DIB
    frames come back BGR (bitmap convention), MJPEG frames RGB (JFIF
    convention). Either way the frame's dimensions are PROVEN by its
    bytes, not trusted from metadata: the DIB span length must equal
    stride × height, and an MJPEG frame's SOF dimensions must match
    the stream geometry (a stream whose frames disagree with its
    strf is corruption, same contract as the lying-idx1 check)."""
    off, size = stream.frame_spans[frame_idx]
    if stream.codec == "mjpg":
        from pac_data_pipeline_spark.ext.jpeg import decode_jpeg

        w, h, px = decode_jpeg(bytes(payload[off : off + size]))
        if (w, h) != (stream.width, stream.height):
            raise ValueError(
                f"frame {frame_idx}: JPEG {w}×{h} != stream "
                f"{stream.width}×{stream.height}"
            )
        return px
    stride = _dib_stride(stream.width)
    if size != stride * stream.height:
        raise ValueError(
            f"frame {frame_idx}: {size} bytes != stride {stride} × "
            f"height {stream.height}"
        )
    rows = np.frombuffer(payload, dtype=np.uint8, count=size, offset=off)
    rows = rows.reshape(stream.height, stride)[:, : stream.width * 3]
    return rows.reshape(stream.height, stream.width, 3)[::-1]
