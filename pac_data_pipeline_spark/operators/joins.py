"""Join operators (SURVEY §2.8 J1/J3).

The reference does per-row KV lookups against a remote store
(pac_snowflake_realtime.py:135-148) — N network round-trips. The
distributed expression is a broadcast hash join: ship the small
dimension to every executor once, stream the fact side through it
with zero shuffle. At 100 TB the fact side never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dim_lookup(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    broadcast: bool = True,
    how: str = "inner",
) -> DataFrame:
    """J1: dimension lookup join; unmatched fact rows are dropped
    (the reference skips and counts them — see
    :func:`lookup_misses`). ``broadcast=True`` for true dimensions;
    set False to let AQE decide for borderline sizes."""
    right = F.broadcast(dim) if broadcast else dim
    return fact.join(right, on=on, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by_cols: tuple[str, ...] = ("user_id",),
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_matched",
) -> DataFrame:
    """Backward as-of join: each left row picks the LATEST right row
    with ``right.time <= left.time`` within the same ``by`` group —
    the trades⋈quotes pattern Spark has no built-in operator for.

    Distributed expression: union both sides tagged, ONE window per
    by-group ordered by (time, right-before-left-on-ties), and a
    ``last(..., ignorenulls)`` carry-forward of the right columns;
    then keep only left rows. Cost = one shuffle on the by-key +
    one sort — identical to what a native as-of merge would pay, and
    no range-join row explosion. Ties (equal timestamps) match, like
    SQL ASOF ``>=``.

    ``right`` must be unique per (by, time) — pre-aggregate it
    otherwise, or which duplicate wins is undefined."""
    r = right.select(
        *by_cols,
        F.col(time_col),
        F.col(time_col).alias(f"{time_col}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    ).withColumn("__side", F.lit(1))
    l = left.withColumn("__side", F.lit(0))
    merged = l.unionByName(r, allowMissingColumns=True)

    from pyspark.sql import Window

    w = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(time_col).asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = [f"{time_col}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
    out = merged
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out.filter(F.col("__side") == 0).drop("__side")


def lookup_misses(
    fact: DataFrame, dim: DataFrame, on: str | list[str], broadcast: bool = True
) -> DataFrame:
    """J1 miss path: fact rows with no dimension match
    (skipped_count at pac_snowflake_realtime.py:190-194) — a
    broadcast left-anti join, so the miss count costs no shuffle."""
    right = F.broadcast(dim) if broadcast else dim
    return fact.join(right, on=on, how="left_anti")
