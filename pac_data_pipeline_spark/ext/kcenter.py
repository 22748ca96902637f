"""Greedy k-center coreset selection (farthest-point sampling).

The data-selection primitive the active-learning / coreset
literature builds on (Gonzalez 1985's 2-approximation for the
k-center objective; Sener & Savarese 2018 use exactly this greedy to
pick representative training subsets): start from a deterministic
seed, then repeatedly add the point FARTHEST from the current center
set.  The selected points cover the corpus with the smallest
worst-case radius any greedy can guarantee — the complement of
:func:`ext.kmeans.semantic_dedup`'s "drop redundant points": keep
the spanning skeleton instead.

Determinism contract — identical to :mod:`ext.kmeans`'s fixed-point
discipline so the two share one arithmetic story: embeddings
quantize once to the 1e-3 integer grid, squared-L2 distances are
exact BIGINT sums (order-free), the seed is the smallest ``vid``,
the per-round argmax breaks ties on the smaller ``vid``, and the
final assignment argmin breaks ties on the smaller center rank.
Every choice is replayed by the generated DuckDB mirror
(:func:`kcenter_fixture_sql`), so the whole selection sequence is
differentially verified — not just the final counts.

Scale shape (the pagerank/kmeans plan discipline):
- the quantized corpus frame materializes ONCE (localCheckpoint)
  and every round scans it;
- each round's min-distance is scan-side: the ≤k-row center table
  aggregates into ONE row (collect_list) and rides a 1-row
  broadcast; the fold is a whole-stage-codegen HOF — the corpus
  never shuffles;
- each round's new center is a ``TakeOrderedAndProject`` head
  (max-distance, vid tiebreak) — never a global window;
- the center table is re-materialized per round (≤k rows), so the
  lazy plan stays linear in k instead of doubling per round.

Total cost: k corpus scans, zero corpus shuffles until the final
per-center rollup (one |k|-group aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pac_data_pipeline_spark.ext.kmeans import KMEANS_SCALE, _quantize

#: The exact-integer squared-L2 fold shared with ext.kmeans: each
#: center's distance computed once, then a min-fold; ties keep the
#: SMALLEST rank (array is rank-sorted, strict <).
_BEST_EXPR = (
    "aggregate("
    "transform(cs, s -> struct("
    "aggregate(zip_with(q, s.c, (a, b) -> (a-b)*(a-b)), "
    "          0L, (x, y) -> x + y) AS d, s.rank AS r)), "
    "struct(CAST(NULL AS BIGINT) AS d, CAST(NULL AS INT) AS r), "
    "(acc, e) -> CASE WHEN acc.d IS NULL OR e.d < acc.d "
    "THEN e ELSE acc END)"
)


def _best_center(vecs: DataFrame, centers: DataFrame) -> DataFrame:
    """(vid, d, r): each point's exact squared distance to — and the
    rank of — its nearest center, via the 1-row broadcast fold."""
    one_row = F.broadcast(
        centers.agg(
            F.array_sort(
                F.collect_list(F.struct("rank", "c"))
            ).alias("cs")
        )
    )
    return vecs.crossJoin(one_row).select(
        "vid",
        "q",
        F.expr(_BEST_EXPR).alias("best"),
    ).select(
        "vid",
        "q",
        F.col("best.d").alias("d"),
        F.col("best.r").alias("r"),
    )


def kcenter_coreset(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> DataFrame:
    """Select a k-point greedy k-center coreset and report, per
    selection ``rank``: the chosen ``center_id``, how many corpus
    points it serves (``n_assigned``, nearest-center assignment with
    rank tiebreak), and its exact grid ``radius`` (max squared
    distance among its members).  Duplicate-vector corpora may leave
    a later center empty — it reports 0/0 rather than vanishing."""
    vecs = (
        embeddings.filter(
            F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
        )
        .select(F.col(id_col).alias("vid"), _quantize(vec_col).alias("q"))
        .localCheckpoint()  # k+1 consumers: every round + final
    )
    centers = (
        vecs.orderBy("vid")
        .limit(1)
        .select(
            F.lit(0).cast("int").alias("rank"),
            F.col("vid").alias("cvid"),
            F.col("q").alias("c"),
        )
        .localCheckpoint()
    )
    for r in range(1, k):
        new = (
            _best_center(vecs, centers)
            .orderBy(F.desc("d"), "vid")
            .limit(1)
            .select(
                F.lit(r).cast("int").alias("rank"),
                F.col("vid").alias("cvid"),
                F.col("q").alias("c"),
            )
        )
        # ≤k rows; re-materialize per round so the plan stays linear
        centers = centers.unionAll(new).localCheckpoint()
    assigned = _best_center(vecs, centers)
    rollup = assigned.groupBy("r").agg(
        F.count(F.lit(1)).cast("long").alias("n_assigned"),
        F.max("d").alias("radius"),
    )
    return (
        centers.join(rollup, centers.rank == rollup.r, "left")
        .select(
            "rank",
            F.col("cvid").alias("center_id"),
            F.coalesce("n_assigned", F.lit(0)).cast("long")
            .alias("n_assigned"),
            F.coalesce("radius", F.lit(0)).cast("long").alias("radius"),
        )
        .orderBy("rank")
    )


def _dist_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)"
    )


def kcenter_fixture_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
) -> str:
    """The full greedy unrolled as DuckDB SQL from the same
    constants as :func:`kcenter_coreset` — every round's argmax and
    the final assignment replayed with identical integer arithmetic
    and tie order.  CTEs are MATERIALIZED (each center table feeds
    the next round AND the union — the unrolled-greedy re-inlining
    lesson from ext/kmeans)."""
    s = KMEANS_SCALE
    cte = [
        f"""vecs AS MATERIALIZED (
            SELECT {id_col} AS vid,
                   list_transform({vec_col}, x -> CAST(floor(
                       CAST(x AS DOUBLE) * {s} + 0.5) AS BIGINT)) AS q
            FROM {table}
            WHERE {id_col} IS NOT NULL AND {vec_col} IS NOT NULL
        )""",
        """cs0 AS MATERIALIZED (
            SELECT 0 AS rank, vid AS cvid, q AS c
            FROM vecs ORDER BY vid LIMIT 1
        )""",
    ]
    for r in range(1, k):
        p = r - 1
        cte.append(
            f"""m{r} AS MATERIALIZED (
                SELECT v.vid, min({_dist_sql("v.q", "c.c")}) AS md
                FROM vecs v CROSS JOIN cs{p} c
                GROUP BY v.vid
            )"""
        )
        cte.append(
            f"""cs{r} AS MATERIALIZED (
                SELECT * FROM cs{p}
                UNION ALL
                SELECT {r} AS rank, s.vid AS cvid, s.q AS c FROM (
                    SELECT m.vid, v.q
                    FROM m{r} m JOIN vecs v ON v.vid = m.vid
                    ORDER BY m.md DESC, m.vid LIMIT 1) s
            )"""
        )
    last = k - 1
    cte.append(
        f"""fin AS MATERIALIZED (
            SELECT vid, r, d FROM (
                SELECT v.vid, c.rank AS r,
                       {_dist_sql("v.q", "c.c")} AS d,
                       row_number() OVER (
                           PARTITION BY v.vid
                           ORDER BY {_dist_sql("v.q", "c.c")}, c.rank
                       ) AS rk
                FROM vecs v CROSS JOIN cs{last} c)
            WHERE rk = 1
        )"""
    )
    return (
        "WITH " + ",\n".join(cte)
        + f"""
        SELECT c.rank, c.cvid AS center_id,
               CAST(coalesce(g.n_assigned, 0) AS BIGINT) AS n_assigned,
               CAST(coalesce(g.radius, 0) AS BIGINT) AS radius
        FROM cs{last} c LEFT JOIN (
            SELECT r, count(*) AS n_assigned, max(d) AS radius
            FROM fin GROUP BY r
        ) g ON g.r = c.rank
        ORDER BY c.rank"""
    )
