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


def lookup_misses(
    fact: DataFrame, dim: DataFrame, on: str | list[str], broadcast: bool = True
) -> DataFrame:
    """J1 miss path: fact rows with no dimension match
    (skipped_count at pac_snowflake_realtime.py:190-194) — a
    broadcast left-anti join, so the miss count costs no shuffle."""
    right = F.broadcast(dim) if broadcast else dim
    return fact.join(right, on=on, how="left_anti")
