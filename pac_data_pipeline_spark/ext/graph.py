"""Link-graph algorithms over edge lists — the crawl-prioritization
step downstream of :mod:`pac_data_pipeline_spark.ext.html`'s link
harvest (a frontier scheduler fetches high-rank pages first; a
corpus curator up-weights documents central to the link graph).

The reference has no graph surface (its pipeline ends at keyed
document writes, ``pac_firebase_handler.py:24-78``); connected
components for dedup clustering live in ``ext/dedup_text.py:374``.
This module adds PageRank, the other graph primitive a web-corpus
pipeline runs, in the same style: a FIXED number of synchronous
iterations unrolled into one lazy plan (deterministic, oracle-
reproducible as chained CTEs) rather than driver-side convergence
loops with collect() probes.

Determinism contract: every iteration's rank is rounded to 12
decimals before it feeds the next — Spark does not pin the
accumulation order of a float sum over in-neighbor contributions,
so un-rounded ranks drift across engines (and across runs) by ulps
that compound through iterations. Round-12 is far below any
ranking-relevant signal and makes the fixed-point trajectory
byte-identical on both engines.

Scale shape per iteration: one shuffle join (edges ⋈ ranks on src —
both sides hash-partition on the same key, and AQE handles hub
skew) + one map-side-combinable sum by dst + a left join back to
the node list so sink nodes (no in-edges) keep their teleport mass.
The node count rides a 1-row broadcast. Nothing ever collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    n_iter: int = 3,
    damping: float = 0.85,
    digits: int = 8,
) -> DataFrame:
    """PageRank with ``n_iter`` unrolled synchronous iterations.

    ``nodes``: one row per vertex (column ``id_col``). ``edges``:
    columns ``src``/``dst``; callers should pre-deduplicate and
    drop self-loops (:func:`functional_edges` does both). Vertices
    with no out-edges contribute no mass (their rank leaks — the
    standard simplification when, as in our fixtures, every node
    has out-degree ≥ 1); vertices with no in-edges keep the
    teleport term (1−d)/N via the left join.
    """
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("__od"))
    ranks = nodes.crossJoin(n_row).select(
        id_col, F.round(F.lit(1.0) / F.col("__n"), 12).alias("rank")
    )
    for _ in range(n_iter):
        contrib = (
            edges.join(
                ranks.select(
                    F.col(id_col).alias("src"), F.col("rank").alias("__r")
                ),
                "src",
            )
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("__r") / F.col("__od")).alias("__in"))
        )
        ranks = (
            nodes.crossJoin(n_row)
            .join(contrib, F.col(id_col) == F.col("dst"), "left")
            .select(
                id_col,
                F.round(
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("__in"), F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
        )
    return ranks.select(id_col, F.round("rank", digits).alias("rank"))


def pagerank_fixture_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    n_iter: int = 3,
    damping: float = 0.85,
    multipliers: tuple[tuple[int, int], ...] = ((7, 1), (13, 5), (31, 11)),
    digits: int = 8,
) -> str:
    """The full functional-graph PageRank as ANSI/DuckDB SQL with the
    iterations unrolled into chained CTEs, generated from the SAME
    constants as the Spark path. ``CAST(0.85 AS DOUBLE)`` (not a bare
    decimal literal) so the damping arithmetic runs in the identical
    IEEE domain as Spark's Python-float literal — DuckDB types bare
    decimals as DECIMAL, which rounds differently before the
    round-12 synchronization could hide it."""
    d = f"CAST({damping} AS DOUBLE)"
    unions = " UNION ALL ".join(
        f"SELECT {id_col} AS src, ({id_col} * {a} + {b}) % "
        f"(SELECT c FROM n) AS dst FROM nodes"
        for a, b in multipliers
    )
    cte = [
        f"nodes AS (SELECT {id_col} FROM {table})",
        "n AS (SELECT count(*) AS c FROM nodes)",
        f"edges AS (SELECT DISTINCT src, dst FROM ({unions}) "
        "WHERE src <> dst)",
        "outdeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src)",
        f"r0 AS (SELECT {id_col}, round(1.0 / (SELECT c FROM n), 12) "
        "AS rank FROM nodes)",
    ]
    for k in range(1, n_iter + 1):
        cte.append(
            f"r{k} AS ("
            f"SELECT nodes.{id_col}, "
            f"round((1.0 - {d}) / (SELECT c FROM n) "
            f"+ {d} * coalesce(s.m, CAST(0 AS DOUBLE)), 12) AS rank "
            f"FROM nodes LEFT JOIN ("
            f"SELECT e.dst, sum(r.rank / o.od) AS m "
            f"FROM edges e "
            f"JOIN r{k-1} r ON e.src = r.{id_col} "
            f"JOIN outdeg o ON e.src = o.src "
            f"GROUP BY e.dst) s ON nodes.{id_col} = s.dst)"
        )
    return (
        "WITH " + ", ".join(cte)
        + f" SELECT {id_col}, round(rank, {digits}) AS rank FROM r{n_iter}"
    )


def functional_edges(
    nodes: DataFrame,
    id_col: str = "doc_id",
    multipliers: tuple[tuple[int, int], ...] = ((7, 1), (13, 5), (31, 11)),
) -> DataFrame:
    """Deterministic synthetic link graph: each vertex points at
    ``(id·a + b) mod N`` for each (a, b) — three out-links per node,
    self-loops dropped, duplicates merged. A functional graph is the
    standard reproducible fixture for iterative-algorithm tests: an
    external SQL engine rebuilds the identical edge set from the
    same arithmetic (no RNG, no engine hash)."""
    n_row = F.broadcast(nodes.agg(F.count(F.lit(1)).alias("__n")))
    base = nodes.crossJoin(n_row)
    parts = [
        base.select(
            F.col(id_col).alias("src"),
            ((F.col(id_col) * a + b) % F.col("__n")).alias("dst"),
        )
        for a, b in multipliers
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.filter(F.col("src") != F.col("dst")).distinct()
