"""Embedding-vector transforms: per-key average pooling, L2
normalization, symmetric int8 quantization.

The similarity module (`ext/similarity.py`) consumes embeddings;
this module produces and conditions them — the ops a training-data
pipeline runs between "embed" and "index": pool chunk vectors into
document vectors, normalize so dot product = cosine, quantize for a
4× smaller ANN index.

Everything is JVM-side array-HOF arithmetic (``aggregate`` /
``transform`` / ``zip_with``) — no Python UDF, no explosion of the
corpus into (row × dim) shuffle rows except where the semantics ARE
per-dimension (pooling), and there the explode feeds a map-side-
combined hash aggregate so the shuffle carries |keys × dim| rows,
not |rows × dim|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def avg_pool_by_key(
    df: DataFrame,
    key_col: str,
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Element-wise mean vector per key, in long form
    (``key, pos, mean_val``) — pos is 0-based.

    posexplode → hash aggregate on (key, pos): partial aggregation
    combines map-side, so the shuffle is |keys × dim| rows no matter
    how many input vectors. The long form is deliberate — it re-
    assembles to an array with one more (key)-grouped sort when a
    vector column is needed, and hash-compares across engines
    without array-typed output.
    """
    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(F.col(key_col), F.posexplode(vec_col).alias("pos", "x"))
        .groupBy(key_col, "pos")
        .agg(
            F.round(F.avg(F.col("x").cast("double")), digits).alias(
                "mean_val"
            )
        )
    )


def _l2(vec_col: str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def l2_normalize(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "unit_vec",
    norm_col: str = "l2_norm",
) -> DataFrame:
    """Append the L2 norm and the unit-normalized vector (null for
    zero/empty vectors rather than a division blowup).

    Pure scan-stage array folds — zero shuffle, survives any input
    partitioning. Normalizing up front is what lets every downstream
    cosine become a plain dot product (one fold instead of three per
    candidate pair in the ANN join)."""
    norm = _l2(vec_col)
    return df.withColumn(norm_col, norm).withColumn(
        out_col,
        F.when(
            F.col(norm_col) > 0,
            F.transform(
                F.col(vec_col),
                lambda x: x.cast("double") / F.col(norm_col),
            ),
        ),
    )


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    qvec_col: str = "qvec",
    scale_col: str = "scale",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127 /
    max(|x|), q_i = floor(x_i * scale + 0.5) — floor(+0.5) instead
    of round() because banker's-vs-half-up conventions differ across
    engines and this formula is bit-identical everywhere.

    Zero-shuffle scan-stage transform. The int8 payload is 4×
    smaller than float32 — at 100 TB of embeddings that is the
    difference between an ANN index that fits executor memory and
    one that spills; dequantization is q/scale with ≤0.4% max error
    at int8. Zero vectors quantize to null (nullif guards the
    division)."""
    absmax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0).cast("double"),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.lit(127.0) / F.nullif(absmax, F.lit(0.0))
    return df.withColumn(scale_col, scale).withColumn(
        qvec_col,
        F.when(
            F.col(scale_col).isNotNull(),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(
                    x.cast("double") * F.col(scale_col) + F.lit(0.5)
                ).cast("int"),
            ),
        ),
    )
