"""Edge-case semantics of the scalar layer (SURVEY §7.4):
pd.cut boundaries, coerce-casts, keyword branch order, composite
keys. Fixtures mirror the reference's 3-row PAC sample
(test_snowflake_pipeline.py:160-167)."""

import pandas as pd
from pyspark.sql import functions as F

from pac_data_pipeline_spark.functions.scalar import (
    bin_amount,
    classify_membership,
    composite_key,
    party_label,
    to_double_coerce,
    to_double_coerce_zero,
)


def _vals(spark, col, rows, schema="v double"):
    df = spark.createDataFrame(rows, schema)
    return [r[0] for r in df.select(col).collect()]


def test_bin_amount_boundaries(spark):
    """pd.cut parity: left-open/right-closed; 0 and null → null;
    exactly 10000 → Small; exactly 10000.01 → Medium."""
    rows = [(None,), (0.0,), (0.01,), (10000.0,), (10000.01,),
            (100000.0,), (500000.0,), (500000.01,), (-5.0,)]
    out = _vals(spark, bin_amount("v"), rows)
    assert out == [
        None,
        None,
        "Small (<$10K)",
        "Small (<$10K)",
        "Medium ($10K-$100K)",
        "Medium ($10K-$100K)",
        "Large ($100K-$500K)",
        "Very Large (>$500K)",
        None,
    ]


def test_party_label_branch_order(spark):
    """A name matching BOTH keyword sets must classify republican
    (reference tests republican keywords first)."""
    rows = [
        ("Republican Democrats United",),
        ("Progressive Alliance",),
        ("GOP Fund",),
        ("Neutral PAC",),
        ("CONSERVATIVE liberal mix",),
    ]
    out = _vals(spark, party_label("v"), rows, schema="v string")
    assert out == ["republican", "democrat", "republican", None, "republican"]


def test_coerce_casts(spark):
    rows = [("12.5",), ("garbage",), ("",), (None,), ("  7 ",)]
    coerced = _vals(spark, to_double_coerce(F.trim(F.col("v"))), rows, "v string")
    assert coerced == [12.5, None, None, None, 7.0]
    zeroed = _vals(spark, to_double_coerce_zero(F.trim(F.col("v"))), rows, "v string")
    assert zeroed == [12.5, 0.0, 0.0, 0.0, 7.0]


def test_classify_membership(spark):
    rows = [("MSFT",), ("XOM",), (None,)]
    out = _vals(
        spark,
        classify_membership("v", ["MSFT", "NVDA", "TSLA"], "Tech", "Other"),
        rows,
        "v string",
    )
    assert out == ["Tech", "Other", "Other"]


def test_composite_key_skips_nulls_like_concat_ws(spark):
    df = spark.createDataFrame(
        [("AAPL", 2024, None)], "t string, c long, m string"
    )
    out = df.select(composite_key("t", "c", "m").alias("k")).collect()[0].k
    # concat_ws drops nulls — documented engine semantics
    assert out == "AAPL_2024"


def test_clean_schema_driven(spark):
    """clean(): name-pattern casts + trim + all-null-row drop."""
    from pac_data_pipeline_spark.functions.cleaning import clean

    pdf = pd.DataFrame(
        {
            "Receipt Amount": ["100.5", "bad", None],
            " Committee Name ": ["  Acme PAC  ", "B", None],
            "contribution_date": ["2024-01-02 03:04:05", "garbage", None],
        }
    )
    df = spark.createDataFrame(pdf)
    out = clean(df)
    assert out.columns == ["receipt_amount", "committee_name", "contribution_date"]
    rows = sorted(out.collect(), key=lambda r: (r.committee_name is None,
                                                r.committee_name or ""))
    # all-null input row SURVIVES as (0.0, None, None): the reference
    # fills numeric nulls with 0 before dropna(how='all'), so the row
    # is no longer all-null (pac_snowflake_pipeline.py:95 before :116)
    assert len(rows) == 3
    assert rows[0].receipt_amount == 100.5
    assert rows[0].committee_name == "Acme PAC"
    assert rows[0].contribution_date is not None
    assert rows[1].receipt_amount == 0.0  # coerce+fill0
    assert rows[1].contribution_date is None  # coerce → null
    assert rows[2].receipt_amount == 0.0 and rows[2].committee_name is None


def test_drop_all_null_rows(spark):
    from pac_data_pipeline_spark.functions.cleaning import drop_all_null_rows

    df = spark.createDataFrame(
        [(None, None), ("a", None), (None, 1.0)], "s string, v double"
    )
    assert drop_all_null_rows(df).count() == 2


def test_format_currency_rendering(spark):
    from pac_data_pipeline_spark.functions.scalar import format_currency

    df = spark.createDataFrame(
        [(1234567.891,), (0.4,), (None,)], "x double"
    ).select(format_currency("x").alias("s"))
    assert [r.s for r in df.collect()] == ["$1,234,568", "$0", None]
