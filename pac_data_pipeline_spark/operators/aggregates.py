"""Aggregation operators (SURVEY §2.6).

All of these compile to Spark's partial+final hash aggregation —
map-side combine shrinks the shuffle to ~|groups| rows per partition
before any network transfer, which is what makes single-shuffle
group-bys viable at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def groupby_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    sum_alias: str = "total",
    count_alias: str | None = None,
) -> DataFrame:
    """A1-A3: group-by sum (single or composite key), optional
    per-group count (reference pac_data_processor.py:69, :347,
    :357-360)."""
    aggs: list[Column] = [F.sum(value_col).alias(sum_alias)]
    if count_alias:
        aggs.append(F.count(F.lit(1)).alias(count_alias))
    return df.groupBy(*keys).agg(*aggs)


def conditional_party_rollup(
    df: DataFrame,
    group_keys: Sequence[str],
    party_col: Column | str,
    amount_col: str,
    democrat_value: str = "democrat",
    republican_value: str = "republican",
    having_positive: bool = True,
) -> DataFrame:
    """A4 + F7 (the reference's flagship, pac_snowflake_realtime.py:
    90-126): per group, sum amounts where the party classification
    matches each side; keep groups with at least one positive total.

    The reference iterates rows per group in Python; here it is a
    single ``groupBy().agg(sum(when(...)))`` — one shuffle, partial
    aggregation before it, whole-stage codegen around it.
    """
    party = F.col(party_col) if isinstance(party_col, str) else party_col
    amt = F.col(amount_col)
    out = df.groupBy(*group_keys).agg(
        F.coalesce(F.sum(F.when(party == democrat_value, amt)), F.lit(0.0)).alias(
            "democrat_total"
        ),
        F.coalesce(F.sum(F.when(party == republican_value, amt)), F.lit(0.0)).alias(
            "republican_total"
        ),
    )
    if having_positive:
        out = out.filter(
            (F.col("democrat_total") > 0) | (F.col("republican_total") > 0)
        )
    return out


def distinct_values(df: DataFrame, col: str) -> DataFrame:
    """A6: sorted distinct values (pac_data_processor.py:343)."""
    return df.select(col).distinct().orderBy(col)


def distinct_count(df: DataFrame, col: str, approx: bool = False) -> DataFrame:
    """A5: ``nunique()``. Exact by default; ``approx=True`` switches
    to HyperLogLog (`approx_count_distinct`) — the right call at
    100 TB where exact distinct forces a full shuffle of the key."""
    agg = (
        F.approx_count_distinct(col) if approx else F.countDistinct(col)
    ).alias(f"n_{col}")
    return df.agg(agg)


def global_summary(df: DataFrame, value_col: str) -> DataFrame:
    """A7: global sum + count in one pass."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(value_col).alias("total"),
    )


def frequency_table(df: DataFrame, col: str) -> DataFrame:
    """A8: ``value_counts()`` (pac_data_processor.py:352-354) —
    count per value, most frequent first (value as tiebreak so the
    order is deterministic)."""
    return (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.col(col))
    )
