"""Multimodal columns: binary payloads + typed metadata.

Media (image/audio/video) travel as opaque ``binary`` columns with a
typed metadata struct; decode/feature steps are Arrow-batched
``mapInPandas`` operators so each Python batch amortizes serde over
thousands of rows.

The decode path is REAL for BMP: ``bmp_media_from_documents``
synthesizes genuine 24-bpp bitmaps (valid BITMAPFILEHEADER +
BITMAPINFOHEADER + padded pixel rows) and ``extract_features``
parses the headers and pixel matrix headerwise — width/height and
channel statistics are computed from the bytes, not passed through.
Formats needing a codec library (JPEG/PNG via Pillow, video via
ffmpeg) stay behind ``_decode_real`` which raises
``NotImplementedError`` in this container; non-BMP payloads fall
back to a deterministic byte-hash feature so the distributed
plumbing still runs end-to-end.

Scale notes: binary payloads inflate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of
decoded frames fits executor memory, and never collect() media rows.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried beside every media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("decoded", T.BooleanType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_BMP_HEADER_SIZE = 14 + 40  # BITMAPFILEHEADER + BITMAPINFOHEADER


def encode_bmp(width: int, height: int, pixel_seed: bytes) -> bytes:
    """Build a real 24-bpp bottom-up BMP. Pixel bytes are the seed
    tiled over the image — deterministic, codec-free, and decodable
    by any BMP reader (this module's, PIL's, or an OS viewer)."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    stride = row_raw + pad
    img_size = stride * height
    seed = np.frombuffer(pixel_seed or b"\x00", dtype=np.uint8)
    rows = np.zeros((height, stride), dtype=np.uint8)
    flat = np.tile(seed, (height * row_raw) // len(seed) + 1)[: height * row_raw]
    rows[:, :row_raw] = flat.reshape(height, row_raw)
    file_header = struct.pack(
        "<2sIHHI", b"BM", _BMP_HEADER_SIZE + img_size, 0, 0, _BMP_HEADER_SIZE
    )
    info_header = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    return file_header + info_header + rows.tobytes()


def decode_bmp(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Parse a 24-bpp uncompressed BMP headerwise: returns (width,
    height, pixels[height, width, 3] BGR). Raises ValueError on
    anything that is not a decodable BMP."""
    if len(payload) < _BMP_HEADER_SIZE or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0 or width <= 0 or height <= 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} comp={compression}")
    stride = (width * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, offset=pixel_off)
    if len(data) < stride * height:
        raise ValueError("truncated BMP pixel data")
    rows = data[: stride * height].reshape(height, stride)[:, : width * 3]
    # bottom-up storage order → flip to top-down
    return width, height, rows.reshape(height, width, 3)[::-1]


def media_table_from_documents(documents: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: the UTF-8
    bytes of ``text`` stand in for an encoded payload; metadata is
    derived deterministically (hash-based fake dimensions). Used
    for the video/frame-sampling plumbing where no codec exists."""
    content = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id"),
        F.lit("image").alias("media_type"),
        content.alias("content"),
        F.struct(
            F.length(content).cast("long").alias("n_bytes"),
            F.lit("fake/raw").alias("format"),
            (F.pmod(F.xxhash64("doc_id"), F.lit(1024)) + 32)
            .cast("int")
            .alias("width"),
            (F.pmod(F.xxhash64("doc_id", "text"), F.lit(1024)) + 32)
            .cast("int")
            .alias("height"),
        ).alias("meta"),
    )


def bmp_media_from_documents(documents: DataFrame, max_side: int = 24) -> DataFrame:
    """Synthesize REAL BMP payloads from the documents fixture via
    an Arrow-batched encode: dimensions are deterministic per
    doc_id, pixels are the document's UTF-8 bytes tiled over the
    image. The declared ``meta`` dimensions intentionally come from
    the same formula so a header decode can be verified against
    them."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                w = 4 + int(doc_id) % (max_side - 3)
                h = 4 + (int(doc_id) * 7) % (max_side - 3)
                payload = encode_bmp(w, h, str(text).encode("utf-8"))
                out.append(
                    {
                        "doc_id": int(doc_id),
                        "media_type": "image",
                        "content": payload,
                        "meta": {
                            "n_bytes": len(payload),
                            "format": "image/bmp",
                            "width": w,
                            "height": h,
                        },
                    }
                )
            yield pd.DataFrame(out)

    return documents.select("doc_id", "text").mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


#: magic prefix for the deterministic multi-frame test container:
#: b"VID0" + u32 frame count + per frame (u32 length + BMP bytes)
_VID_MAGIC = b"VID0"

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def video_media_from_documents(documents: DataFrame) -> DataFrame:
    """Synthesize multi-frame video-like payloads: a length-prefixed
    container of REAL BMP frames (2 + doc_id % 4 frames, dimensions
    deterministic per doc and frame). A real demuxer (ffmpeg) would
    replace the container parse; the per-frame decode path is the
    same BMP machinery."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                d = int(doc_id)
                n_frames = 2 + d % 4
                frames = []
                for f in range(n_frames):
                    w = 4 + (d + f) % 5
                    h = 4 + (d * 3 + f) % 5
                    frames.append(
                        encode_bmp(w, h, str(text).encode("utf-8") or b"x")
                    )
                payload = _VID_MAGIC + struct.pack("<I", n_frames)
                for fr in frames:
                    payload += struct.pack("<I", len(fr)) + fr
                out.append(
                    {
                        "doc_id": d,
                        "media_type": "video",
                        "content": payload,
                        "meta": {
                            "n_bytes": len(payload),
                            "format": "video/x-bmp-stack",
                            "width": 0,
                            "height": 0,
                        },
                    }
                )
            yield pd.DataFrame(out)

    return documents.select("doc_id", "text").mapInPandas(
        batches, schema=MEDIA_SCHEMA
    )


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: parse the container header, walk the
    length-prefixed frame table, and decode the BMP header of every
    ``every_n``-th frame — widths/heights come from the sampled
    frame's bytes, not metadata. Arrow-batched; one output row per
    sampled frame."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                b = bytes(payload)
                if b[:4] != _VID_MAGIC:
                    continue  # not a frame container
                (n_frames,) = struct.unpack_from("<I", b, 4)
                off = 8
                for idx in range(n_frames):
                    (flen,) = struct.unpack_from("<I", b, off)
                    off += 4
                    if idx % every_n == 0:
                        w, h, _ = decode_bmp(b[off : off + flen])
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "n_frames": n_frames,
                                "frame_idx": idx,
                                "width": w,
                                "height": h,
                            }
                        )
                    off += flen
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "frame_idx", "width", "height",
                ],
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


def _decode_real(payload: bytes):  # pragma: no cover - env has no PIL
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "JPEG/PNG decode requires Pillow, not present in this "
            "environment — BMP decodes natively, other formats fall "
            "back to deterministic byte-hash features"
        ) from exc
    raise NotImplementedError("wire PIL.Image.open(BytesIO(payload)) here")


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.random(dim, dtype=np.float32)


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction over media payloads via ``mapInPandas``.

    BMP payloads are REALLY decoded (header parse + pixel matrix):
    the feature vector is [width, height, mean B, mean G, mean R,
    std, min, max] computed from the pixels, and ``decoded=true``.
    Non-BMP payloads get a deterministic byte-hash feature with
    ``decoded=false`` (codec formats need PIL/ffmpeg — see
    ``_decode_real``). Arrow batches in, Arrow batches out; no
    driver involvement."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            widths, heights, decoded, feats = [], [], [], []
            for payload in pdf["content"]:
                b = bytes(payload)
                try:
                    w, h, px = decode_bmp(b)
                    pxf = px.astype(np.float64)
                    feats.append(
                        np.array(
                            [
                                w,
                                h,
                                pxf[:, :, 0].mean(),
                                pxf[:, :, 1].mean(),
                                pxf[:, :, 2].mean(),
                                pxf.std(),
                                pxf.min(),
                                pxf.max(),
                            ][:dim],
                            dtype=np.float32,
                        )
                    )
                    widths.append(w)
                    heights.append(h)
                    decoded.append(True)
                except ValueError:
                    feats.append(_fake_feature(b, dim))
                    widths.append(None)
                    heights.append(None)
                    decoded.append(False)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "decoded": decoded,
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_bmp(arr, width: int, height: int):
    """Nearest-neighbor resample of an (h, w, 3) pixel matrix —
    index arithmetic only, no codec library."""
    h0, w0 = arr.shape[:2]
    rows = (np.arange(height) * h0) // height
    cols = (np.arange(width) * w0) // width
    return arr[rows][:, cols]


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize via ``mapInPandas``: BMP payloads are REALLY resized —
    decode, nearest-neighbor resample, re-encode — so the output
    payload is a valid BMP at the target dimensions. Codec formats
    (JPEG/PNG) pass through with rewritten metadata only (see
    ``_decode_real`` for the honest stub boundary)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents, metas = [], []
            for payload, m in zip(pdf["content"], pdf["meta"]):
                b = bytes(payload)
                try:
                    _, _, px = decode_bmp(b)
                    resized = resize_bmp(px, width, height)
                    # encode expects bottom-up rows; flip back and
                    # rebuild via the tiling encoder's fast path
                    flat = resized[::-1].reshape(-1).tobytes()
                    out = encode_bmp(width, height, flat)
                except ValueError:
                    out = b  # non-BMP: metadata-only rewrite
                contents.append(out)
                metas.append(
                    {
                        "n_bytes": len(out),
                        "format": m["format"],
                        "width": width,
                        "height": height,
                    }
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "content": contents,
                    "meta": metas,
                }
            )

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame index (deterministic count derived from payload
    size — a real decoder would read container metadata)."""
    n_frames = (F.col("meta.n_bytes") / F.lit(64)).cast("int") + 1
    return (
        media.withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))),
        )
        .select("doc_id", "media_type", "frame_idx", "meta")
    )


# -- audio (WAV/PCM) ---------------------------------------------------------

_WAV_HEADER_SIZE = 44  # RIFF + fmt + data chunk headers


def encode_wav(sample_rate: int, samples: "np.ndarray") -> bytes:
    """Build a real 16-bit mono PCM WAV (RIFF) — stdlib struct only,
    playable by any audio stack. The audio sibling of encode_bmp."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    return (
        struct.pack("<4sI4s", b"RIFF", 36 + len(pcm), b"WAVE")
        + struct.pack(
            "<4sIHHIIHH",
            b"fmt ",
            16,
            1,  # PCM
            1,  # mono
            sample_rate,
            sample_rate * 2,
            2,
            16,
        )
        + struct.pack("<4sI", b"data", len(pcm))
        + pcm
    )


def decode_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Parse a 16-bit mono PCM WAV headerwise: (sample_rate,
    samples int16). Raises ValueError on anything else."""
    if len(payload) < _WAV_HEADER_SIZE or payload[:4] != b"RIFF":
        raise ValueError("not a WAV payload")
    if payload[8:12] != b"WAVE" or payload[12:16] != b"fmt ":
        raise ValueError("not a WAVE/fmt stream")
    fmt, channels, sr = struct.unpack_from("<HHI", payload, 20)
    (bits,) = struct.unpack_from("<H", payload, 34)
    if fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(f"unsupported WAV: fmt={fmt} ch={channels} bits={bits}")
    (n_bytes,) = struct.unpack_from("<I", payload, 40)
    data = payload[_WAV_HEADER_SIZE : _WAV_HEADER_SIZE + n_bytes]
    return sr, np.frombuffer(data, dtype="<i2")


def audio_media_from_documents(
    documents: DataFrame, sample_rate: int = 8000
) -> DataFrame:
    """Synthesize a REAL audio table from the documents fixture:
    per doc, a short sine burst whose frequency/duration derive from
    the doc id — deterministic bytes, decodable by any WAV reader.
    Arrow-batched mapInPandas, scan-shaped."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("audio", T.BinaryType()),
            T.StructField("sample_rate", T.IntegerType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                freq = 200 + (d % 200)
                n = sample_rate // 10 + (d % 5) * sample_rate // 20
                t = np.arange(n, dtype="float64") / sample_rate
                wave = (np.sin(2 * np.pi * freq * t) * 12000).astype("<i2")
                rows.append((d, encode_wav(sample_rate, wave), sample_rate))
        yield pd.DataFrame(rows, columns=["doc_id", "audio", "sample_rate"])

    return documents.select("doc_id").mapInPandas(batches, out_schema)


def audio_features(media: DataFrame) -> DataFrame:
    """Decode WAV payloads and compute real signal features:
    duration, RMS amplitude, zero-crossing rate — numpy over Arrow
    batches, the audio analogue of extract_features' BMP path."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("duration_s", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("zero_cross_rate", T.DoubleType()),
            T.StructField("decoded", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows = []
        for pdf in it:
            for doc_id, payload in zip(pdf["doc_id"], pdf["audio"]):
                try:
                    sr, x = decode_wav(bytes(payload))
                    xf = x.astype("float64") / 32768.0
                    zc = (
                        float(np.mean(np.diff(np.signbit(xf)) != 0))
                        if len(xf) > 1
                        else 0.0
                    )
                    rows.append(
                        (
                            int(doc_id),
                            sr,
                            len(x),
                            round(len(x) / sr, 6),
                            round(float(np.sqrt(np.mean(xf**2))), 6),
                            round(zc, 6),
                            True,
                        )
                    )
                except ValueError:
                    rows.append(
                        (int(doc_id), None, None, None, None, None, False)
                    )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "sample_rate",
                "n_samples",
                "duration_s",
                "rms",
                "zero_cross_rate",
                "decoded",
            ],
        )

    return media.mapInPandas(batches, out_schema)
