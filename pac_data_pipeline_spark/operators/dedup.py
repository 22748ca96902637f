"""Deduplication & reconciliation (SURVEY §2.8 J2/J3).

The reference dedups by building a Python dict keyed on a composite
business key, first-in wins (pac_data_processor.py:151-197;
pac_snowflake_pipeline.py:209-250). Insertion order has no
distributed analogue, so we make "first" explicit: a row_number
window over user-named order columns — deterministic under any
partitioning (SURVEY §7.4 #5).

Scale: one shuffle on the key columns; with a skewed key AQE's skew
handling applies because the window partitions by the same key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """J2: keep the first row per composite key, "first" defined by
    ``order_cols`` ascending. Equivalent oracle SQL::

        SELECT * EXCLUDE rn FROM (
          SELECT *, row_number() OVER (
            PARTITION BY <keys> ORDER BY <order>) AS rn ...) WHERE rn = 1
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_any(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """J2 relaxed: when "which duplicate survives" doesn't matter,
    ``dropDuplicates`` lets Spark keep an arbitrary row — cheaper
    (hash-agg, no sort within groups)."""
    return df.dropDuplicates(list(key_cols))


def reconcile_counts(
    incoming: DataFrame, existing: DataFrame, label_in: str = "incoming",
    label_ex: str = "existing"
) -> DataFrame:
    """J3: upload-vs-existing reconciliation (check_duplicates.py:
    124-172) — counts of incoming, existing, and incoming rows not
    present in existing (left-anti join on all common columns)."""
    common = [c for c in incoming.columns if c in set(existing.columns)]
    new_rows = incoming.join(existing, on=common, how="left_anti")
    return (
        incoming.agg(F.count(F.lit(1)).alias("n")).withColumn("side", F.lit(label_in))
        .unionByName(
            existing.agg(F.count(F.lit(1)).alias("n")).withColumn("side", F.lit(label_ex))
        )
        .unionByName(
            new_rows.agg(F.count(F.lit(1)).alias("n")).withColumn("side", F.lit("new"))
        )
        .select("side", "n")
    )
