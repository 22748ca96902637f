"""Market-basket co-occurrence mining — frequent item PAIRS with
support and confidence, the first rung of association-rule mining
(Agrawal & Srikant's Apriori, VLDB'94) and the recommender /
"frequently bought together" primitive a retail-scale pipeline runs.

The reference has no basket surface (its analytics stop at per-key
sums and top-k, ``pac_data_processor.py:69``, ``:347``); this module
extends the engine the same way the other `ext`/operator tiers do:
a deterministic, oracle-mirrorable formulation of a public
algorithm with an explicitly scale-first plan.

Scale shape (the part that matters at 100 TB):

1. ``distinct(order, item)`` FIRST — pair fan-out is quadratic in
   basket size, so duplicate line items (same part twice in one
   order) must collapse before pairing, not after.
2. Apriori prune: an item pair can only reach ``min_support`` if
   BOTH items individually do (downward closure). Item frequencies
   are one map-side-combinable agg; the surviving item list is
   small by construction (it is the support-filtered head of a
   Zipf-ish distribution), so it rides a BROADCAST semi-join and
   the quadratic pair stage only ever sees frequent items.
3. Pair generation is a self-join on the basket key with an
   ``item_a < item_b`` guard — both sides hash-partition on the
   same key, so Spark plans ONE exchange reused by both inputs
   (visible as ReusedExchange), and AQE splits skewed mega-baskets.
4. Top-k by (support desc, item_a, item_b) — a strict total order,
   so the result set is deterministic — plans as
   TakeOrderedAndProject: per-partition heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pac_data_pipeline_spark.functions.rounding import (
    floor_round,
    floor_round_sql,
)


def frequent_pairs(
    lines: DataFrame,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` co-occurring item pairs with support >=
    ``min_support``, plus per-direction confidence
    (``support(a,b) / support(a)``, pinned with the shared IEEE
    floor-round at 6 digits — count/count ratios land on exact .xx5
    boundaries, where engine ``round()`` is one-ulp divergent).

    Returns columns ``item_a < item_b``, ``support``, ``conf_a_b``,
    ``conf_b_a``. Ties broken by (item_a, item_b) so the top-k cut
    is reproducible on any engine.
    """
    # The basket table feeds four consumers (item-frequency agg and
    # both self-join sides, plus the prune) — without materialization
    # Spark re-runs the scan + distinct shuffle for each. Cut the
    # plan at the distinct with localCheckpoint (the same pattern as
    # ext/classify.py's count stream: executor-local blocks, no
    # CacheManager entry to leak, lineage truncated so every
    # downstream branch reads the one materialized copy).
    baskets = (
        lines.select(
            F.col(basket_col).alias("bk"), F.col(item_col).alias("item")
        )
        .distinct()
        .localCheckpoint()
    )
    frequent = (
        baskets.groupBy("item")
        .agg(F.count(F.lit(1)).alias("item_n"))
        .filter(F.col("item_n") >= min_support)
        .localCheckpoint()
    )
    pruned = baskets.join(
        F.broadcast(frequent.select("item")), "item", "leftsemi"
    )
    a = pruned.select("bk", F.col("item").alias("item_a"))
    b = pruned.select("bk", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    with_conf = (
        pairs.join(
            F.broadcast(
                frequent.select(
                    F.col("item").alias("item_a"),
                    F.col("item_n").alias("n_a"),
                )
            ),
            "item_a",
        )
        .join(
            F.broadcast(
                frequent.select(
                    F.col("item").alias("item_b"),
                    F.col("item_n").alias("n_b"),
                )
            ),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "support",
            floor_round(F.col("support") / F.col("n_a"), 6).alias(
                "conf_a_b"
            ),
            floor_round(F.col("support") / F.col("n_b"), 6).alias(
                "conf_b_a"
            ),
        )
    )
    return with_conf.orderBy(
        F.desc("support"), F.asc("item_a"), F.asc("item_b")
    ).limit(k)


def frequent_pairs_sql(
    table: str = "lineitem",
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_support: int = 2,
    k: int = 50,
) -> str:
    """The same mining as DuckDB SQL. The apriori prune is a no-op
    for CORRECTNESS (a pair with support >= s implies both items
    have support >= s), so the oracle skips it and still names the
    identical pair set — the prune exists purely to keep the
    quadratic stage small at scale. Divisions are cast to DOUBLE to
    match Spark's float domain before the shared floor-round pin."""
    conf_a = floor_round_sql("CAST(p.support AS DOUBLE) / fa.item_n", 6)
    conf_b = floor_round_sql("CAST(p.support AS DOUBLE) / fb.item_n", 6)
    return f"""
        WITH baskets AS (
            SELECT DISTINCT {basket_col} AS bk, {item_col} AS item
            FROM {table}
        ),
        freq AS (
            SELECT item, count(*) AS item_n FROM baskets GROUP BY item
        ),
        pairs AS (
            SELECT a.item AS item_a, b.item AS item_b,
                   count(*) AS support
            FROM baskets a
            JOIN baskets b ON a.bk = b.bk AND a.item < b.item
            GROUP BY a.item, b.item
            HAVING count(*) >= {min_support}
        )
        SELECT p.item_a, p.item_b, p.support,
               {conf_a} AS conf_a_b,
               {conf_b} AS conf_b_a
        FROM pairs p
        JOIN freq fa ON p.item_a = fa.item
        JOIN freq fb ON p.item_b = fb.item
        ORDER BY p.support DESC, p.item_a, p.item_b
        LIMIT {k}
    """
