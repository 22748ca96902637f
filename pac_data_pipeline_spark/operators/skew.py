"""Skew-resistant aggregation patterns.

For algebraic aggregates (sum/count/min/max) Spark's map-side
partial aggregation already collapses a hot key to one row per
partition before the shuffle, so plain ``groupBy`` is skew-safe.
These helpers cover the cases partial aggregation cannot save:

* exact DISTINCT per key — the naive plan shuffles every (key,
  value) occurrence to ONE reducer per key;
* holistic aggregates (collect_list/median) over hot keys;
* joins against a skewed key distribution (AQE's skew-join split
  handles those at runtime; enabled in session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_count_per_key(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    alias: str = "n_distinct",
) -> DataFrame:
    """Exact per-key distinct count via two-phase aggregation.

    Phase 1 groups on (keys, value): the shuffle is keyed by the
    PAIR, so a hot key's values spread over the whole cluster and
    duplicates collapse map-side. Phase 2 counts the now-unique
    pairs per key — each phase-1 output row is one unit, so the
    second shuffle carries |distinct pairs|, not |rows|. This is
    how `count(DISTINCT x) GROUP BY k` survives a key with 10^9
    rows; the single-phase formulation funnels them to one task."""
    pairs = df.select(*keys, distinct_col).groupBy(*keys, distinct_col).agg(
        F.lit(1).alias("__one")
    )
    return pairs.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def salted_groupby_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    n_salts: int = 16,
    sum_alias: str = "total",
    count_alias: str = "n",
) -> DataFrame:
    """Two-phase salted sum/count — the explicit-salt pattern for
    engines or aggregates without map-side combine. Phase 1 spreads
    each key over ``n_salts`` reducers via a deterministic salt
    (hash of the value column, so re-runs partition identically);
    phase 2 merges the ≤``n_salts`` partials per key.

    With Spark's own hash aggregate this is usually redundant (the
    partial agg IS the salt); it exists for holistic extensions and
    as the documented pattern for skew beyond what AQE splits."""
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(n_salts))
    phase1 = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.sum(value_col).alias("__psum"),
            F.count(value_col).alias("__pcnt"),
        )
    )
    return phase1.groupBy(*keys).agg(
        F.sum("__psum").alias(sum_alias),
        F.sum("__pcnt").cast("bigint").alias(count_alias),
    )
