"""Vector-transform semantics: pooling means, normalization edge
cases (zero vector), quantization round-trip error bound, and the
zero-shuffle plan guarantee for the scan-stage ops."""

import math

from pyspark.sql import functions as F

from pac_data_pipeline_spark.ext.vectors import (
    avg_pool_by_key,
    l2_normalize,
    quantize_int8,
)


def test_avg_pool_elementwise_means(spark):
    df = spark.createDataFrame(
        [("a", [1.0, 10.0]), ("a", [3.0, 20.0]), ("b", [5.0, 5.0]),
         ("b", None)],
        "k string, embedding array<float>",
    )
    out = avg_pool_by_key(df, "k")
    got = {(r.k, r.pos): r.mean_val for r in out.collect()}
    assert got == {("a", 0): 2.0, ("a", 1): 15.0,
                   ("b", 0): 5.0, ("b", 1): 5.0}


def test_l2_normalize_unit_norm_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])],
        "id long, embedding array<float>",
    )
    rows = {r.id: r for r in l2_normalize(df).collect()}
    assert rows[1].l2_norm == 5.0
    assert rows[1].unit_vec == [0.6, 0.8]
    assert rows[2].l2_norm == 0.0
    assert rows[2].unit_vec is None  # no division blowup


def test_quantize_int8_bounds_and_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "id long, embedding array<float>",
    )
    rows = {r.id: r for r in quantize_int8(df).collect()}
    q = rows[1].qvec
    assert q == [64, -127, 32]  # floor(x*127+0.5), scale=127/1.0
    assert all(-127 <= v <= 127 for v in q)
    # dequantized error bounded by half a quantization step
    scale = rows[1].scale
    for orig, qv in zip([0.5, -1.0, 0.25], q):
        assert abs(qv / scale - orig) <= 0.5 / scale + 1e-9
    # zero vector → null scale and null qvec, not a crash
    assert rows[2].scale is None and rows[2].qvec is None


def test_normalize_and_quantize_are_shuffle_free(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0])], "id long, embedding array<float>"
    )
    for out in (l2_normalize(df), quantize_int8(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
