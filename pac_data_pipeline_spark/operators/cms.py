"""Count-Min sketch — bounded-memory frequency estimation, the
heavy-hitters member of the sketch tier next to KMV (distinct), HLL
(distinct, engine-native) and the HDR quantile sketch: "how often
does each hot token/URL/user appear in 100 TB" without aggregating
the full distinct domain.

Public basis: Cormode & Muthukrishnan, J. Algorithms 2005 — a d × w
counter matrix; each item increments one counter per row at column
``h_i(item)``; the estimate is the MIN over rows. Guarantees:
``est ≥ true`` always (counters only over-count on collisions), and
``est ≤ true + εN`` with probability ≥ 1−δ at w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Determinism contract: the row hashes are md5-derived
(``md5(i || ':' || token)`` first 8 hex chars → BIGINT → mod w) —
the same portable-hash discipline as the sampling/ab-test tiers
(engine-native hash functions never agree across engines; md5
does), so the full counter matrix and every estimate are
hash-exactly reproducible by the DuckDB mirror.

Scale shape (what makes CMS the 100 TB answer):
- the sketch build is ONE aggregation of (row, col) cells with
  map-side partials: each partition collapses to ≤ d·w cells before
  the shuffle, so shuffle volume is O(d·w · partitions) — NEVER
  O(distinct items). That is the whole point: exact top-k
  (``x_top_tokens``) shuffles the distinct vocabulary; CMS shuffles
  a constant-size matrix no matter how large the domain grows.
- sketches are EXACTLY mergeable (merge = add matrices,
  unit-pinned), so per-shard sketches combine associatively.
- querying k candidates is a broadcast join of the d·w-cell matrix
  (a few thousand rows) against the candidate set — scan-side.

The registry query scores the exact top-k tokens against the sketch
so the one-sided error (``est ≥ true``, small overshoot) is visible
and oracle-checked; at true scale the candidate set comes from a
cheap pre-filter (sampled counts, prior round's hitters) instead of
the exact aggregate.

Reference scope: the reference counts frequencies with pandas
``value_counts`` on one node (``pac_data_processor.py:352``); a
sublinear-memory sketch is engine infrastructure for the 100 TB
target, same rationale as the HDR quantile sketch beside it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default geometry: 4 rows × 1024 columns → ε ≈ e/1024 ≈ 0.27 % of
#: the stream length, δ ≈ e^-4 ≈ 1.8 %.
DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 1024


def _col_expr(item: str, row: str, width: int) -> str:
    """Portable row-hash column index: md5-derived, engine-exact."""
    return (
        f"CAST(conv(substring(md5(concat(CAST({row} AS STRING), ':', "
        f"{item})), 1, 8), 16, 10) AS BIGINT) % {width}"
    )


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch over an item stream (one input row = one
    occurrence): returns the (row, col, cnt) counter matrix,
    ≤ depth·width rows. NULL items drop. Merge two sketches by
    unioning and summing ``cnt`` per (row, col) — exact."""
    rows = items.filter(F.col(item_col).isNotNull()).select(
        F.col(item_col).alias("item"),
        F.explode(
            F.array(*[F.lit(i) for i in range(depth)])
        ).alias("row"),
    )
    return (
        rows.select(
            "row",
            F.expr(_col_expr("item", "row", width)).alias("col"),
        )
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str = "item",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Estimate each candidate's frequency: min over the ``depth``
    counters the item hashes to. The d·w-cell sketch aggregates into
    ONE row (map of 'row:col' → cnt) and rides a broadcast; the
    min-fold is a scan-side HOF — candidates never shuffle."""
    packed = F.broadcast(
        sketch.agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        F.concat_ws(
                            ":",
                            F.col("row").cast("string"),
                            F.col("col").cast("string"),
                        ).alias("key"),
                        F.col("cnt").alias("value"),
                    )
                )
            ).alias("cm")
        )
    )
    keys = ", ".join(
        "concat('{i}:', CAST(".format(i=i)
        + _col_expr(f"`{item_col}`", str(i), width)
        + " AS STRING))"
        for i in range(depth)
    )
    return candidates.crossJoin(packed).select(
        "*",
        F.expr(
            # try_element_at: ANSI mode makes bare map[key] access
            # throw on a missing key; an untouched counter is 0
            f"aggregate(transform(array({keys}), k -> "
            "coalesce(try_element_at(cm, k), 0L)), "
            "CAST(NULL AS BIGINT), "
            "(acc, c) -> CASE WHEN acc IS NULL OR c < acc "
            "THEN c ELSE acc END)"
        ).alias("est_cnt"),
    ).drop("cm")


def cms_heavy_hitters_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = 20,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> str:
    """DuckDB mirror of the registry query: identical tokenization
    (the x_top_tokens trim+split contract), identical md5 column
    hashes, identical min-fold — the counter matrix and every
    estimate replay hash-exactly."""
    col_of = (
        "CAST(CAST(concat('0x', substr(md5(concat(CAST({i} AS VARCHAR), "
        "':', token)), 1, 8)) AS BIGINT) % {w} AS BIGINT)"
    )
    # coalesce-to-0 mirrors the Spark side's missing-counter
    # fallback (unreachable for candidates drawn from the build
    # stream — their counters are >= 1 — but the contract must not
    # depend on that)
    mins = ", ".join(
        f"""coalesce((SELECT cnt FROM cms
             WHERE cms.row = {i}
               AND cms.col = {col_of.format(i=i, w=width)}), 0)"""
        for i in range(depth)
    )
    rows_union = " UNION ALL ".join(f"SELECT {i} AS r" for i in range(depth))
    return f"""
        WITH toks AS MATERIALIZED (
            SELECT unnest(string_split_regex(trim({text_col}, ' '),
                          '[ \\t\\n\\f\\r]+')) AS token
            FROM {table}
            WHERE {text_col} IS NOT NULL
        ),
        cms AS MATERIALIZED (
            SELECT r.r AS row,
                   CAST(CAST(concat('0x', substr(md5(concat(
                       CAST(r.r AS VARCHAR), ':', token)), 1, 8))
                       AS BIGINT) % {width} AS BIGINT) AS col,
                   count(*) AS cnt
            FROM toks, ({rows_union}) r
            GROUP BY 1, 2
        ),
        top AS MATERIALIZED (
            SELECT token, count(*) AS true_cnt
            FROM toks GROUP BY token
            ORDER BY true_cnt DESC, token LIMIT {k}
        )
        SELECT token,
               CAST(true_cnt AS BIGINT) AS true_cnt,
               CAST(least({mins}) AS BIGINT) AS est_cnt
        FROM top
    """
