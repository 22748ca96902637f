"""Multimodal columns: binary payloads + typed metadata.

Media (image/audio/video) travel as opaque ``binary`` columns with a
typed metadata struct; decode/feature steps are Arrow-batched
``mapInPandas`` operators so each Python batch amortizes serde over
thousands of rows. The decode itself is STUBBED — the runtime image
/audio libraries are not in this environment — behind
``try: import PIL`` with a deterministic fake, so the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested.

Scale notes: binary payloads inflate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of
decoded frames fits executor memory, and never collect() media rows.
"""

from __future__ import annotations

from collections.abc import Iterator

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
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def media_table_from_documents(documents: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: the UTF-8
    bytes of ``text`` stand in for an encoded payload; metadata is
    derived deterministically (hash-based fake dimensions)."""
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


def _decode_real(payload: bytes):  # pragma: no cover - env has no PIL
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires Pillow, not present in this "
            "environment — deterministic fake features are used instead"
        ) from exc
    raise NotImplementedError("wire PIL.Image.open(BytesIO(payload)) here")


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction over media payloads via ``mapInPandas``.

    Real decode is stubbed (no PIL/ffmpeg in this container); the
    deterministic fake hashes payload bytes into ``dim`` floats so
    the full distributed path — Arrow batches in, Arrow batches out,
    schema enforcement — is exercised end-to-end."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            feats = []
            for payload in pdf["content"]:
                b = bytes(payload)
                # deterministic fake: stable per payload, cheap, no deps
                seed = int.from_bytes(b[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
                rng = np.random.default_rng(seed)
                feats.append(rng.random(dim, dtype=np.float32))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through ``mapInPandas``
    batch-wise and rewrites metadata; the pixel work is a stub
    (payload returned unchanged) pending a real codec."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            meta = pd.DataFrame(
                {
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"]),
                    "format": pdf["meta"].map(lambda m: m["format"]),
                    "width": width,
                    "height": height,
                }
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "content": pdf["content"],
                    "meta": meta.to_dict("records"),
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
