"""Sorts / limits / top-k (SURVEY §2.7).

``orderBy(...).limit(k)`` compiles to TakeOrderedAndProject: each
partition keeps a k-row heap, the driver merges |partitions|·k rows
— no global sort, no full shuffle. That's the property that makes
top-k free at 100 TB, and why every top-k here goes through limit()
rather than a window + filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top_k(
    df: DataFrame,
    order_col: str,
    k: int,
    tiebreak: Sequence[str] = (),
    ascending: bool = False,
) -> DataFrame:
    """O1: ``nlargest(k, col)`` (pac_data_processor.py:64). Pass
    ``tiebreak`` columns to pin a deterministic order for equal
    values (pandas nlargest keeps first-seen; distributed engines
    need an explicit rule)."""
    main = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    return df.orderBy(main, *[F.col(c).asc() for c in tiebreak]).limit(k)


def top_k_groups(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    k: int,
    agg: str = "sum",
) -> DataFrame:
    """O2: top-k groups by aggregate (pac_data_processor.py:69) —
    partial+final hash agg, then TakeOrderedAndProject over the
    (small) aggregated set."""
    agg_col = getattr(F, agg)(value_col).alias(f"{agg}_{value_col}")
    out = df.groupBy(*keys).agg(agg_col)
    return out.orderBy(
        F.col(f"{agg}_{value_col}").desc(), *[F.col(c).asc() for c in keys]
    ).limit(k)
