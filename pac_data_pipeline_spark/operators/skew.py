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


def key_skew_profile(
    df: DataFrame,
    cols: Sequence[str],
    top_n: int = 10,
    digits: int = 6,
) -> DataFrame:
    """Key-distribution skew diagnostic per column: row/key counts,
    heavy-hitter shares (top-1 / top-``top_n``), and the Gini
    coefficient of the key-count distribution — the numbers that
    decide whether a join/groupBy on that key needs salting, AQE
    skew hints, or a broadcast redesign BEFORE the 100 TB run burns
    a night on one straggler task.

    Scale shape: ONE corpus pass for every profiled column — the
    columns melt into (column, key) pairs at the scan (keys cast to
    string; counting only needs group identity), so the fact table
    is read once and shuffles once on
    the pair key instead of once per column (the pre-r8 per-column
    loop cost |cols| full scans — 6 FileScans of lineitem at three
    columns, each a full pass at 100 TB). Everything downstream
    derives from the per-column COUNT-OF-COUNTS aggregate — at most
    O(√n_rows) rows per column (k distinct counts require
    ≥ k(k+1)/2 rows) — which localCheckpoints because the null
    report and the distribution stats both consume it (inlining
    would re-derive the corpus-wide counts per consumer). Gini and
    the top-n share come from column-partitioned window sums via
    the tied-block rank identity (Σ ranks over a tied block =
    k·K_prev + k(k+1)/2), so every intermediate is an exact integer
    and the final divisions are the only inexact steps
    (round-``digits``). NULL keys are reported separately
    (``null_rows``) and excluded from the distribution (a NULL join
    key never co-locates anyway).

    CONTRACT: profiled columns must have a type whose
    cast-to-string is injective over distinct values — integral,
    string, boolean, decimal (fixed scale per column), date,
    timestamp, float/double (shortest-round-trip rendering). The
    melt REJECTS binary and nested (array/map/struct) columns with
    a TypeError instead of silently merging distinct keys whose
    string rendering collides (a binary column's invalid-UTF-8
    bytes all render alike, deflating n_keys and gini); pre-hash
    such a key (``xxhash64``/``md5``) into a column and profile
    that instead.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    _melt_safe = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.StringType, T.BooleanType, T.DecimalType, T.DateType,
        T.TimestampType, T.TimestampNTZType, T.FloatType,
        T.DoubleType,
    )
    for c in cols:
        dt = df.schema[c].dataType
        if not isinstance(dt, _melt_safe):
            raise TypeError(
                f"key_skew_profile: column {c!r} has type "
                f"{dt.simpleString()}, whose string rendering is not "
                "injective over distinct values — pre-hash it "
                "(xxhash64/md5) and profile the hash column instead"
            )

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("k"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.k")
    counts = pairs.groupBy("column", "k").agg(
        F.count(F.lit(1)).alias("c")
    )
    coc_all = (
        counts.groupBy(
            "column", F.col("k").isNull().alias("is_null"), "c"
        )
        .agg(F.count(F.lit(1)).alias("kc"))
        .localCheckpoint()  # O(|cols|·√n) rows; 2 consumers below
    )
    nulls = (
        coc_all.filter(F.col("is_null"))
        .groupBy("column")
        .agg(F.sum(F.col("c") * F.col("kc")).alias("null_rows"))
    )
    coc = coc_all.filter(~F.col("is_null")).select("column", "c", "kc")
    w_desc = (
        Window.partitionBy("column")
        .orderBy(F.desc("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_asc = (
        Window.partitionBy("column")
        .orderBy(F.asc("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = coc.select(
        "column",
        "c",
        "kc",
        (F.sum("kc").over(w_desc) - F.col("kc")).alias("prev_desc"),
        (F.sum("kc").over(w_asc) - F.col("kc")).alias("prev_asc"),
    )
    agg = stepped.groupBy("column").agg(
        F.sum(F.col("c") * F.col("kc")).alias("rows_nn"),
        F.sum("kc").alias("n_keys"),
        F.max("c").alias("top1"),
        F.sum(
            F.col("c")
            * F.greatest(
                F.lit(0),
                F.least(
                    F.col("kc"), F.lit(top_n) - F.col("prev_desc")
                ),
            )
        ).alias("topn_sum"),
        F.sum(
            F.col("c")
            * (
                F.col("kc") * F.col("prev_asc")
                + F.expr("(kc * (kc + 1)) div 2")
            )
        ).alias("rank_sum"),
    )
    rows = F.col("rows_nn").cast("double")
    keys = F.col("n_keys").cast("double")
    gini = (
        2.0 * F.col("rank_sum").cast("double")
        / F.nullif(keys * rows, F.lit(0.0))
        - (keys + 1.0) / F.nullif(keys, F.lit(0.0))
    )
    # one row per profiled column ALWAYS — a column with zero
    # non-null keys (or an empty table: the --empty fuzz clone) has
    # no agg row, but the report contract (and the SQL oracle's
    # scalar aggregates) emit it with NULL stats and null_rows 0
    seed = df.sparkSession.range(1).select(
        F.explode(
            F.array(*[F.lit(c) for c in cols])
        ).alias("column")
    )
    return seed.join(agg, "column", "left").join(
        nulls, "column", "left"
    ).select(
        "column",
        (
            F.col("rows_nn")
            + F.coalesce(F.col("null_rows"), F.lit(0))
        ).alias("n_rows"),
        F.coalesce(F.col("null_rows"), F.lit(0)).alias("null_rows"),
        "n_keys",
        F.round(
            F.col("top1").cast("double") / F.nullif(rows, F.lit(0.0)),
            digits,
        ).alias("top1_share"),
        F.round(
            F.col("topn_sum").cast("double")
            / F.nullif(rows, F.lit(0.0)),
            digits,
        ).alias("topn_share"),
        F.round(gini, digits).alias("gini"),
    )


def key_skew_profile_sql(
    table: str,
    cols: Sequence[str],
    top_n: int = 10,
    digits: int = 6,
) -> str:
    """The same diagnostic as DuckDB SQL — identical count-of-counts
    derivation, tied-block rank identity, and divisions."""
    parts = []
    for col in cols:
        parts.append(f"""
        SELECT '{col}' AS column,
               CAST(rows_nn + null_rows AS BIGINT) AS n_rows,
               CAST(null_rows AS BIGINT) AS null_rows,
               CAST(n_keys AS BIGINT) AS n_keys,
               round(CAST(top1 AS DOUBLE)
                   / nullif(CAST(rows_nn AS DOUBLE), 0.0), {digits})
                   AS top1_share,
               round(CAST(topn_sum AS DOUBLE)
                   / nullif(CAST(rows_nn AS DOUBLE), 0.0), {digits})
                   AS topn_share,
               round(2.0 * CAST(rank_sum AS DOUBLE)
                     / nullif(CAST(n_keys AS DOUBLE)
                              * CAST(rows_nn AS DOUBLE), 0.0)
                     - (CAST(n_keys AS DOUBLE) + 1.0)
                       / nullif(CAST(n_keys AS DOUBLE), 0.0), {digits})
                   AS gini
        FROM (
            SELECT SUM(c * kc) AS rows_nn,
                   SUM(kc) AS n_keys,
                   MAX(c) AS top1,
                   SUM(c * greatest(0, least(kc, {top_n} - prev_desc)))
                       AS topn_sum,
                   SUM(c * (kc * prev_asc + (kc * (kc + 1)) // 2))
                       AS rank_sum
            FROM (
                SELECT c, kc,
                       SUM(kc) OVER (ORDER BY c DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) - kc AS prev_desc,
                       SUM(kc) OVER (ORDER BY c ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) - kc AS prev_asc
                FROM (
                    SELECT c, count(*) AS kc FROM (
                        SELECT {col} AS k, count(*) AS c
                        FROM {table}
                        WHERE {col} IS NOT NULL
                        GROUP BY {col}
                    ) GROUP BY c
                )
            )
        ) CROSS JOIN (
            SELECT count(*) AS null_rows FROM {table}
            WHERE {col} IS NULL
        )""")
    return " UNION ALL ".join(parts)
