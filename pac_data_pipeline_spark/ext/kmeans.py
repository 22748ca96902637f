"""Distributed fixed-point k-means over embedding columns — the
cluster-then-curate primitive of training-data pipelines (SemDeDup
semantic dedup, cluster-balanced sampling, DoReMi-style domain
discovery all start from "k-means the corpus embeddings").

Two clustering tiers live in this engine:

- :mod:`ext.similarity`'s IVF trains a quantizer on a bounded
  driver-side SAMPLE (numpy, kmeans++, rows-only check) — right for
  index building where the centroids are scaffolding.
- THIS module clusters the FULL corpus distributively, with the
  iterations UNROLLED into one lazy plan (the pagerank discipline:
  no driver loop, no collect) and a determinism contract strong
  enough for an external SQL engine to reproduce every assignment
  hash-exactly.

The determinism contract is FIXED-POINT arithmetic, one step
stronger than pagerank's per-iteration rounding: embeddings are
quantized once to an integer grid (``floor(x·1000 + 0.5)`` per
dimension), so squared-L2 distances are exact BIGINT sums —
associative, overflow-safe (64 dims · (4e6)² ≪ 2^63), and identical
under ANY summation order on ANY engine. Centroid updates
round-half-up back to the grid via the pure-integer-ratio form
``floor((2·Σ + n) / (2·n))`` evaluated as one IEEE double division
of two exact integers (both engines divide the same two integers →
identical double → identical floor; counts stay far below 2^52 so
the division inputs are exactly representable). Argmin ties break
on the smaller centroid id. Quantizing at 1e-3 moves each
coordinate by ≤5e-4 — far below any clustering-relevant signal for
unit-scale embeddings — and buys bit-identical clusters everywhere.

Scale shape per iteration:
- assignment is SCAN-SIDE: the k×dim centroid table aggregates into
  ONE row (collect_list) and rides a 1-row broadcast; the argmin is
  a whole-stage-codegen HOF fold — no shuffle of the corpus, ever.
- update is ONE shuffle of (cluster, dim, value) triples with
  map-side partial aggregation, so the exchange carries
  O(k · dim · partitions), not the corpus.
- empty clusters keep their previous centroid (left-join carry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Fixed-point grid: 1e-3 resolution. Shared by Spark and the SQL
#: generator so both engines quantize identically.
KMEANS_SCALE = 1000


def _quantize(col):
    return F.expr(
        f"transform({col}, x -> CAST(floor(CAST(x AS DOUBLE) "
        f"* {KMEANS_SCALE} + 0.5D) AS BIGINT))"
    )


def _centroid_frame(
    assigned: DataFrame,
    dim: int | None,
    out_col: str,
    keys: tuple[str, ...] = ("cluster",),
) -> DataFrame:
    """Per-cluster integer-ratio floor mean of the quantized member
    vectors — THE centroid formula of the fixed-point contract, in
    one of two physically different but value-identical forms:

    * ``dim=None`` (generic): posexplode to (cluster, pos, val)
      triples, aggregate per (cluster, pos), re-assemble per
      cluster — handles any vector length, but multiplies the agg
      input rows ×dim before the map-side combine and pays TWO
      exchanges per call.
    * ``dim=d`` (fixed-width fast path, r11): one wide aggregation —
      per-position ``sum(element_at(q, i))`` plus the positional row
      count ``count(size(q) >= i)`` as 2·d partial-agg columns, ONE
      exchange of k rows, array assembled by projection (guide
      §2.3/§2.4: aggregate before the shuffle, remove the second
      exchange outright). Bit-identical to the generic form for any
      corpus whose vectors are at most ``d`` long: per-position sums
      and counts are the same integers (positions a short vector
      lacks count via ``size(q) >= i`` exactly as posexplode rows
      do), and trailing all-absent positions drop out via the
      not-NULL filter just as they produce no (cluster, pos) row in
      the generic form. Callers pass ``dim`` only where the vector
      width is a table contract (embeddings are 64-wide; PQ
      subspaces are ``dim/m``); anything wider than ``dim`` must
      use the generic path. One theoretical-only divergence: a
      position where EVERY member with that position holds NULL
      (while a longer member exists) yields a NULL array ELEMENT in
      the generic form but is dropped by this path's not-NULL
      filter — not constructible from the quantized corpus (the
      quantizer maps non-null floats to non-null BIGINTs), and the
      fuzz clones are green; recorded for completeness.

    ``keys`` are the grouping columns — ``("cluster",)`` for a
    single Lloyd chain, ``("gid", "cluster")`` for the grouped
    per-subspace trainer (:func:`_pq_train_grouped`); the per-group
    arithmetic is identical either way.
    """
    ks = list(keys)
    if dim is None:
        sums = (
            assigned.select(
                *ks, F.posexplode("q").alias("pos", "val")
            )
            .groupBy(*ks, "pos")
            .agg(
                F.sum("val").alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                *ks,
                "pos",
                F.floor(
                    (2 * F.col("s") + F.col("n")).cast("double")
                    / (2 * F.col("n")).cast("double")
                ).alias("m"),
            )
        )
        return sums.groupBy(*ks).agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, m))), "
                "s -> s.m)"
            ).alias(out_col)
        )
    aggs = []
    for i in range(1, dim + 1):
        # try_element_at, NOT element_at: under Spark 4's default
        # ANSI mode element_at THROWS on out-of-bounds positions,
        # so a vector shorter than dim would fail the job instead
        # of degrading to NULL like the generic path; try_element_at
        # returns NULL out-of-bounds in both ANSI and non-ANSI modes
        aggs.append(
            F.sum(F.try_element_at("q", F.lit(i))).alias(f"__s{i}")
        )
        aggs.append(
            F.count(F.when(F.size("q") >= i, F.lit(1))).alias(f"__n{i}")
        )
    wide = assigned.groupBy(*ks).agg(*aggs)
    ms = [
        F.floor(
            (2 * F.col(f"__s{i}") + F.col(f"__n{i}")).cast("double")
            / (2 * F.col(f"__n{i}")).cast("double")
        )
        for i in range(1, dim + 1)
    ]
    return wide.select(
        *ks,
        F.filter(F.array(*ms), lambda x: x.isNotNull()).alias(out_col),
    )


def _argmin_assign(frame: DataFrame, cents: DataFrame) -> DataFrame:
    """Scan-side nearest-centroid assignment: ``frame``'s columns
    (which must include the quantized vector ``q``) plus
    ``(cluster, dist)`` from one argmin fold over the broadcast
    k-row centroid table. Each distance is computed ONCE
    (transform), then an argmin fold; strict ``<`` keeps the
    smallest cid on ties (the array is cid-sorted). Distances are
    exact BIGINTs — the assignment is a pure deterministic function
    of (q, centroid table), so any frame carrying the same ``q``
    recomputes the identical cluster with zero shuffle."""
    one_row = F.broadcast(
        cents.agg(
            F.array_sort(F.collect_list(F.struct("cid", "c"))).alias(
                "cs"
            )
        )
    )
    return (
        frame.crossJoin(one_row)
        .select(
            *[F.col(c) for c in frame.columns],
            F.expr(
                "aggregate("
                "transform(cs, s -> struct("
                "aggregate(zip_with(q, s.c, (a, b) -> (a-b)*(a-b)), "
                "          0L, (x, y) -> x + y) AS d, s.cid AS c)), "
                "struct(CAST(NULL AS BIGINT) AS d, CAST(NULL AS INT) AS c), "
                "(acc, e) -> CASE WHEN acc.d IS NULL OR e.d < acc.d "
                "THEN e ELSE acc END)"
            ).alias("best"),
        )
        .select(
            *[F.col(c) for c in frame.columns],
            F.col("best.c").alias("cluster"),
            F.col("best.d").alias("dist"),
        )
    )


def _lloyd_centroids(
    vecs: DataFrame, k: int, n_iter: int, dim: int | None
) -> DataFrame:
    """The unrolled Lloyd loop over a (vid, q) frame (checkpointed
    by the caller — it is consumed once per iteration plus the
    init): deterministic min-id init, ``n_iter - 1`` assign/update
    rounds, returns the FINAL k-row centroid table ``(cid, c)``.
    Exposed separately from :func:`_assignments` (r12) so callers
    that attach payload columns (IVF candidate scoring) can
    recompute the final assignment scan-side via
    :func:`_argmin_assign` instead of joining the corpus by vid."""
    centroids = (
        vecs.orderBy("vid")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("vid")) - 1).alias("cid"),
            F.col("q").alias("c"),
        )
    )
    for _ in range(n_iter - 1):
        assigned = _argmin_assign(vecs.select("vid", "q"), centroids)
        # round-half-up mean back to the grid: one IEEE division of
        # two exact integers, floored — both engines agree bit for
        # bit (formula in _centroid_frame, shared with kmeans_cells)
        updated = _centroid_frame(assigned, dim, "c_new")
        centroids = (
            centroids.join(
                updated,
                centroids.cid == updated.cluster,
                "left",
            )
            .select(
                "cid",
                F.coalesce("c_new", "c").alias("c"),
            )
            # centroids feed the next iteration twice (assignment
            # broadcast + empty-cluster carry join): materialize the
            # k-row table per iteration or the plan doubles per
            # Lloyd step.
            .localCheckpoint()
        )
    return centroids


def _assignments(
    embeddings: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_iter: int,
    dim: int | None = None,
) -> DataFrame:
    """Internal: the unrolled Lloyd loop; returns
    ``(vid, q, cluster, dist)`` — final assignments still carrying
    the quantized vector so downstream tiers (semantic dedup) can
    compute exact pair distances without re-quantizing."""
    vecs = (
        embeddings.filter(
            F.col(id_col).isNotNull() & F.col(vec_col).isNotNull()
        )
        .select(
            F.col(id_col).alias("vid"),
            _quantize(vec_col).alias("q"),
        )
        .localCheckpoint()  # 2 + n_iter consumers; cut the re-scan
    )
    return _argmin_assign(
        vecs, _lloyd_centroids(vecs, k, n_iter, dim)
    )


def kmeans_assign(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    dim: int | None = None,
) -> DataFrame:
    """Cluster the full corpus; return ``(id_col, cluster, dist)``
    — the final assignment and its exact integer squared-L2
    distance on the quantized grid.

    Init is the deterministic standard for reproducible runs: the
    ``k`` vectors with the smallest ids are centroids 0..k-1
    (kmeans++ would inject RNG the oracle cannot replay).
    ``dim`` opts into the one-exchange fixed-width Lloyd update
    (:func:`_centroid_frame`) where the vector width is a table
    contract."""
    return _assignments(
        embeddings, id_col, vec_col, k, n_iter, dim=dim
    ).select(F.col("vid").alias(id_col), "cluster", "dist")


def kmeans_cells(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Cluster the corpus and ALSO return the cell representatives —
    the pieces an IVF index needs: ``(assignments, cells)`` where
    assignments is ``(vid, cluster)`` and cells is ``(cluster, c)``
    with ``c`` the integer-grid centroid of the cell's MEMBERS
    (same round-half-up integer-ratio mean as the Lloyd update —
    shared :func:`_centroid_frame` — so an external engine
    reproduces it exactly). Assignments are localCheckpointed —
    both returned frames and any candidate join reuse the one
    clustering run."""
    assigned = _assignments(
        embeddings, id_col, vec_col, k, n_iter, dim=dim
    ).localCheckpoint()
    cells = _centroid_frame(assigned, dim, "c")
    return assigned.select("vid", "cluster"), cells


def _pq_train_grouped(
    vecs: DataFrame,
    m: int,
    sub_len: int,
    k: int,
    n_iter: int,
) -> tuple[DataFrame, DataFrame]:
    """All ``m`` per-subspace fixed-point codebooks trained as ONE
    ``(gid, cluster)``-keyed Lloyd chain over the full-width
    quantized corpus — value-identical to ``m`` independent
    :func:`kmeans_cells` runs over the subspace slices, at 1/m of
    the jobs, checkpoints, and corpus passes (guide §2.4: the m
    chains shared every scan and every exchange boundary; keying
    the aggregation by (subspace, cluster) lets one exchange carry
    them all, and the per-row argmin for every subspace rides one
    scan of the corpus instead of m).

    Value-identity, per subspace ``si``: quantization commutes with
    slicing (elementwise), so ``slice(q, lo, sub_len)`` equals the
    per-subspace frame's quantized vector; init is the k smallest
    vids (the same k rows for every subspace — the null filters are
    width-independent); each row's argmin folds over ONLY its
    subspace's centroids in cid order (array_sort on (gid, cid)
    keeps cid ascending within a gid, so strict-< tie-breaking is
    unchanged); the centroid update is the shared
    :func:`_centroid_frame` integer-ratio floor mean grouped by
    (gid, cluster); empty clusters carry the previous centroid via
    the same left join, per (gid, cid).

    ``vecs`` carries ``(vid, q [, carry-through cols])`` with ``q``
    the FULL-width quantized vector, already null-filtered and
    cheap to re-read (checkpointed, or a projection of a checkpoint)
    — it is consumed ``n_iter + 1`` times. Returns ``(codes,
    cells)``: codes = vecs' columns plus ``code_0..code_{m-1}``
    (localCheckpointed; one row per vid with every subspace's
    assignment — no per-subspace self-join), cells = (gid, cluster,
    c) integer member centroids."""
    if m * sub_len <= 0:
        raise ValueError(f"need positive m·sub_len, got {m}·{sub_len}")

    def _slice(si: int) -> str:
        return f"slice(q, {si * sub_len + 1}, {sub_len})"

    def _sub_rows(src: DataFrame, cluster_of) -> DataFrame:
        """(gid, cluster, q) rows for the update/cells aggregation —
        the explode feeds the keyed aggregate directly (map-side
        combine applies after the generate; nothing is
        materialized)."""
        return src.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(si).alias("gid"),
                            cluster_of(si).alias("cluster"),
                            F.expr(_slice(si)).alias("q"),
                        )
                        for si in range(m)
                    ]
                )
            ).alias("e")
        ).select("e.gid", "e.cluster", F.col("e.q").alias("q"))

    # deterministic init, shared across subspaces: the k smallest
    # vids' slices are every subspace's centroids 0..k-1 (identical
    # to each per-subspace chain's orderBy(vid).limit(k) — vid sets
    # match because the null filters don't depend on the slice)
    cents = (
        vecs.orderBy("vid")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("vid")) - 1).alias(
                "cid"
            ),
            "q",
        )
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(si).alias("gid"),
                            F.col("cid"),
                            F.expr(_slice(si)).alias("c"),
                        )
                        for si in range(m)
                    ]
                )
            ).alias("e")
        )
        .select("e.gid", "e.cid", F.col("e.c").alias("c"))
    )

    def _best(si: int) -> F.Column:
        # the _assignments argmin fold, over this subspace's slice
        # and ONLY this subspace's centroids (cid-ascending after
        # the (gid, cid) array_sort; strict < keeps the smaller cid)
        return F.expr(
            f"aggregate("
            f"transform(filter(cs, s -> s.gid = {si}), s -> struct("
            f"aggregate(zip_with({_slice(si)}, s.c, "
            f"(a, b) -> (a-b)*(a-b)), 0L, (x, y) -> x + y) AS d, "
            f"s.cid AS c)), "
            f"struct(CAST(NULL AS BIGINT) AS d, CAST(NULL AS INT) AS c), "
            f"(acc, e) -> CASE WHEN acc.d IS NULL OR e.d < acc.d "
            f"THEN e ELSE acc END)"
        )

    def _assigned(cs_frame: DataFrame) -> DataFrame:
        one_row = F.broadcast(
            cs_frame.agg(
                F.array_sort(
                    F.collect_list(F.struct("gid", "cid", "c"))
                ).alias("cs")
            )
        )
        return vecs.crossJoin(one_row).select(
            *[F.col(c) for c in vecs.columns],
            *[_best(si).alias(f"__b{si}") for si in range(m)],
        )

    for _ in range(n_iter - 1):
        assigned = _assigned(cents)
        updated = _centroid_frame(
            _sub_rows(assigned, lambda si: F.col(f"__b{si}.c")),
            sub_len,
            "c_new",
            keys=("gid", "cluster"),
        )
        cents = (
            cents.alias("o")
            .join(
                updated.alias("n"),
                (F.col("o.gid") == F.col("n.gid"))
                & (F.col("o.cid") == F.col("n.cluster")),
                "left",
            )
            .select(
                F.col("o.gid").alias("gid"),
                F.col("o.cid").alias("cid"),
                F.coalesce(F.col("n.c_new"), F.col("o.c")).alias("c"),
            )
            # m·k rows feed the next assignment broadcast AND the
            # carry join: materialize per iteration or the plan
            # doubles per Lloyd step (same discipline as
            # _assignments)
            .localCheckpoint()
        )
    codes = (
        _assigned(cents)
        .select(
            *[F.col(c) for c in vecs.columns],
            *[F.col(f"__b{si}.c").alias(f"code_{si}") for si in range(m)],
        )
        .localCheckpoint()  # cells aggregate + every downstream join
    )
    cells = _centroid_frame(
        _sub_rows(codes, lambda si: F.col(f"code_{si}")),
        sub_len,
        "c",
        keys=("gid", "cluster"),
    )
    return codes, cells


def semantic_dedup(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    threshold: int = 1000,
    dim: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al., 2023): cluster the corpus, then mark
    near-duplicates WITHIN each cluster — the clustering bounds the
    quadratic pair stage to cluster-sized blocks, which is the whole
    point of the algorithm at 100 TB (corpus×corpus never happens;
    k scales with corpus size to keep cluster populations bounded).

    Dedup contract is GREEDY-BY-ID, not transitive closure: a vector
    is a duplicate iff a SMALLER-id vector sits in the same cluster
    within ``threshold`` (exact integer squared-L2 on the quantized
    grid); ``dup_of`` is the smallest such id, NULL for keepers.
    Greedy-by-id is order-deterministic on any engine and is what
    production SemDeDup does within a cluster (keep one exemplar,
    drop the rest) — full transitive closure would need the CC
    machinery in ext/dedup_text and buys nothing at these radii.

    Returns one row per vector: ``(id_col, cluster, dup_of)``.
    """
    assigned = _assignments(
        embeddings, id_col, vec_col, k, n_iter, dim=dim
    ).localCheckpoint()  # 3 consumers (both pair sides + final join)
    # The pair self-join has only k distinct keys; with bench-scale
    # k=8 the whole quadratic distance stage lands on ≤8 tasks (AQE
    # then coalesces the few hundred KB to ONE — measured a single
    # 2.2 s task at local[32], guide §2.5). Salt the a-side and
    # replicate the b-side S ways so k·S ≳ the configured shuffle
    # parallelism, and PIN the exchange (user-specified repartition,
    # exempt from AQE byte-coalescing). S derives from the session,
    # not a constant: at production k (clusters ≫ cores, the
    # documented SemDeDup regime) S collapses to 1 and the salt is
    # a no-op — replication cost only exists in the small-k regime
    # that needs it. Pair set, filter, and min-aggregation are
    # unchanged: every cluster-mate pair still meets exactly once
    # (a lives in one salt bucket, b visits all S).
    n_part = int(
        embeddings.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # ceil(2·P / k), CAPPED at 64: the salt exists to widen the
    # pair stage past the k-key limit, and each unit of S replicates
    # the b-side once — at production partition counts with a
    # misconfigured small k, uncapped S reaches the hundreds and the
    # replication costs more than the width buys (64 × k tasks
    # already saturates any executor pool this stage can use; the
    # documented SemDeDup regime, k ≫ cores, drives S to 1 anyway).
    # Any S is result-identical: a lives in one salt bucket, b
    # visits all S, every cluster-mate pair meets exactly once.
    s_salt = min(max(1, -(-2 * n_part // max(k, 1))), 64)
    a = assigned.select(
        "cluster",
        F.pmod(F.xxhash64("vid"), F.lit(s_salt)).alias("__salt"),
        F.col("vid").alias("a_vid"),
        F.col("q").alias("a_q"),
    )
    b = assigned.select(
        "cluster",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.lit(s_salt - 1).cast("long")
            )
        ).alias("__salt"),
        F.col("vid").alias("b_vid"),
        F.col("q").alias("b_q"),
    )
    dups = (
        # pin BOTH sides: AQE may convert the salted join to
        # broadcast at runtime, and then it is the STREAMED side's
        # coalesced exchange that serializes the distance CPU —
        # with both inputs user-repartitioned, whichever side ends
        # up streamed keeps the configured width.
        a.repartition(n_part, "cluster", "__salt")
        .join(
            b.repartition(n_part, "cluster", "__salt"),
            ["cluster", "__salt"],
        )
        .filter(F.col("a_vid") < F.col("b_vid"))
        .withColumn(
            "d",
            F.expr(
                "aggregate(zip_with(a_q, b_q, (x, y) -> (x-y)*(x-y)), "
                "0L, (s, t) -> s + t)"
            ),
        )
        .filter(F.col("d") <= threshold)
        .groupBy("b_vid")
        .agg(F.min("a_vid").alias("dup_of"))
    )
    return assigned.join(
        dups, assigned.vid == dups.b_vid, "left"
    ).select(F.col("vid").alias(id_col), "cluster", "dup_of")


def _int_mean_sql(src: str) -> str:
    """(cluster, list c) — per-cluster, per-dimension integer-ratio
    floor mean of the quantized members in CTE ``src``: THE centroid
    formula of the fixed-point contract, shared by the Lloyd-update
    CTE and the IVF/PQ cell-representative CTEs so the three SQL
    mirrors cannot drift from each other (Spark twins:
    ``_assignments``' update stage and :func:`kmeans_cells`)."""
    return f"""SELECT cluster AS cid,
                       list(m ORDER BY pos) AS c
                FROM (
                    SELECT cluster, pos,
                           CAST(floor(CAST(2 * s + n AS DOUBLE)
                                / CAST(2 * n AS DOUBLE)) AS BIGINT) AS m
                    FROM (
                        SELECT cluster, t.pos, SUM(q[t.pos]) AS s,
                               count(*) AS n
                        FROM {src},
                             UNNEST(generate_series(1, len(q))) t(pos)
                        GROUP BY cluster, t.pos)
                ) GROUP BY cluster"""


def _cells_cte(name: str, src: str) -> str:
    """A ``{name}`` CTE holding each cluster's integer member
    centroid — the IVF/PQ cell representative, MATERIALIZED like
    every other multiply-referenced member of the chain."""
    return f"{name} AS MATERIALIZED ({_int_mean_sql(src)})"


def _kmeans_ctes(
    table: str,
    id_col: str,
    vec_col: str,
    k: int,
    n_iter: int,
    prefix: str = "",
) -> list[str]:
    """Shared CTE chain for the SQL mirrors: quantize → init →
    n_iter × (assign, update). The final CTE ``{prefix}a{n_iter}``
    carries (vid, q, cluster, dist) so callers can compose pair
    stages on top. ``table`` may be any table NAME or parenthesized
    subquery; ``prefix`` namespaces the CTE names so several chains
    coexist in one statement (the per-subspace PQ codebooks).

    Every CTE is ``AS MATERIALIZED``: each ``a{{i}}``/``c{{i}}`` is
    referenced twice (next assign + update / assign + carry join),
    and DuckDB re-inlines non-materialized CTEs into EVERY consumer
    — ~2^depth re-evaluations of the Lloyd chain (the round-6
    unrolled-greedy lesson, already applied in ext/mmr.py).

    Distances go through exact BIGINT list arithmetic (order-free
    by integrality); argmin is row_number ordered by (d, cid); the
    centroid update uses the identical integer-ratio floor
    (:func:`_int_mean_sql`); empty clusters carry the previous
    centroid via the left join."""
    s = KMEANS_SCALE
    x = prefix
    cte = [
        f"""{x}vecs AS MATERIALIZED (
            SELECT {id_col} AS vid,
                   list_transform({vec_col}, x -> CAST(floor(
                       CAST(x AS DOUBLE) * {s} + 0.5) AS BIGINT)) AS q
            FROM {table}
            WHERE {id_col} IS NOT NULL AND {vec_col} IS NOT NULL
        )""",
        f"""{x}c0 AS MATERIALIZED (
            SELECT row_number() OVER (ORDER BY vid) - 1 AS cid, q AS c
            FROM {x}vecs ORDER BY vid LIMIT {k}
        )""",
    ]

    def assign(i: int, p: int) -> str:
        return f"""{x}a{i} AS MATERIALIZED (
            SELECT vid, q, cid AS cluster, dist FROM (
                SELECT v.vid, v.q, c.cid,
                       CAST(list_sum(list_transform(list_zip(v.q, c.c),
                           p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)
                           AS dist,
                       row_number() OVER (
                           PARTITION BY v.vid
                           ORDER BY CAST(list_sum(list_transform(
                               list_zip(v.q, c.c),
                               p -> (p[1]-p[2])*(p[1]-p[2])))
                               AS BIGINT), c.cid) AS rk
                FROM {x}vecs v CROSS JOIN {x}c{p} c)
            WHERE rk = 1
        )"""

    def update(i: int, p: int) -> str:
        return f"""{x}c{i} AS MATERIALIZED (
            SELECT o.cid,
                   coalesce(n.c, o.c) AS c
            FROM {x}c{p} o LEFT JOIN (
                {_int_mean_sql(f"{x}a{i}")}
            ) n ON o.cid = n.cid
        )"""

    for i in range(1, n_iter):
        cte.append(assign(i, i - 1))
        cte.append(update(i, i - 1))
    cte.append(assign(n_iter, n_iter - 1))
    return cte


def kmeans_fixture_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
) -> str:
    """The full unrolled fixed-point k-means as DuckDB SQL generated
    from the same constants as :func:`kmeans_assign`."""
    cte = _kmeans_ctes(table, id_col, vec_col, k, n_iter)
    return (
        "WITH " + ",\n".join(cte)
        + f"\nSELECT vid AS {id_col}, cluster, dist FROM a{n_iter}"
    )


def ivf_grid_fixture_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    n_iter: int = 3,
    n_queries: int = 5,
) -> str:
    """The full fixed-point IVF path as DuckDB SQL — the unrolled
    k-means CTE chain (:func:`_kmeans_ctes`), per-cell integer-grid
    member centroids (same integer-ratio floor as the Lloyd
    update), BIGINT query→cell distances with cid-asc ties, and the
    in-cell sequential-fold cosine ranking. Hash-exact against
    :func:`~pac_data_pipeline_spark.ext.similarity.cosine_topk_ivf_grid`."""
    s = KMEANS_SCALE
    cte = _kmeans_ctes(table, id_col, vec_col, n_cells, n_iter)
    cte.append(_cells_cte("cells", f"a{n_iter}"))
    cte.append(
        f"""qset AS (
            SELECT {id_col} AS query_id,
                   CAST({vec_col} AS DOUBLE[]) AS qv,
                   list_transform({vec_col}, x -> CAST(floor(
                       CAST(x AS DOUBLE) * {s} + 0.5) AS BIGINT)) AS qq
            FROM {table}
            WHERE {id_col} < {n_queries} AND {vec_col} IS NOT NULL
        )"""
    )
    cte.append(
        f"""probes AS (
            SELECT query_id, qv, cid FROM (
                SELECT q.query_id, q.qv, c.cid,
                       row_number() OVER (PARTITION BY q.query_id
                           ORDER BY CAST(list_sum(list_transform(
                               list_zip(q.qq, c.c),
                               p -> (p[1]-p[2])*(p[1]-p[2])))
                               AS BIGINT), c.cid) AS rk
                FROM qset q CROSS JOIN cells c)
            WHERE rk <= {n_probe}
        )"""
    )
    cte.append(
        f"""members AS (
            SELECT a.vid, a.cluster,
                   CAST(e.{vec_col} AS DOUBLE[]) AS v
            FROM a{n_iter} a JOIN {table} e ON e.{id_col} = a.vid
        )"""
    )
    cte.append(
        """scored AS (
            SELECT p.query_id, m.vid,
                   list_cosine_similarity(m.v, p.qv) AS cosine,
                   row_number() OVER (PARTITION BY p.query_id
                       ORDER BY list_cosine_similarity(m.v, p.qv) DESC,
                                m.vid) AS rank
            FROM probes p JOIN members m ON m.cluster = p.cid
        )"""
    )
    return (
        "WITH " + ",\n".join(cte)
        + f"""
        SELECT query_id, vid AS {id_col},
               round(cosine, 6) AS cosine,
               CAST(rank AS BIGINT) AS rank
        FROM scored WHERE rank <= {k}"""
    )


def pq_grid_fixture_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    m: int = 2,
    n_codes: int = 8,
    n_iter: int = 2,
    shortlist: int = 30,
    n_queries: int = 5,
) -> str:
    """The full fixed-point PQ path as DuckDB SQL — ``m``
    prefix-namespaced unrolled k-means chains (one per subspace),
    per-code integer member centroids, per-query BIGINT LUTs, ADC
    sum with (distance, id) shortlist ties, exact cosine rerank.
    Hash-exact against
    :func:`~pac_data_pipeline_spark.ext.similarity.cosine_topk_pq_grid`."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    s = KMEANS_SCALE
    sub_len = dim // m
    cte: list[str] = []
    for si in range(m):
        lo, hi = si * sub_len + 1, (si + 1) * sub_len
        x = f"s{si}_"
        sub_t = (
            f"(SELECT {id_col}, {vec_col}[{lo}:{hi}] AS sub FROM {table})"
        )
        cte += _kmeans_ctes(sub_t, id_col, "sub", n_codes, n_iter, prefix=x)
        cte.append(_cells_cte(f"{x}cells", f"{x}a{n_iter}"))
        cte.append(
            f"""{x}lut AS (
                SELECT q.query_id, c.cid,
                       CAST(list_sum(list_transform(list_zip(q.qq, c.c),
                           p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT) AS d
                FROM (SELECT {id_col} AS query_id,
                             list_transform({vec_col}[{lo}:{hi}],
                                 x -> CAST(floor(CAST(x AS DOUBLE) * {s}
                                      + 0.5) AS BIGINT)) AS qq
                      FROM {table}
                      WHERE {id_col} < {n_queries}
                        AND {vec_col} IS NOT NULL) q
                CROSS JOIN {x}cells c
            )"""
        )
    code_cols = ", ".join(
        f"s{si}_a{n_iter}.cluster AS code_{si}" for si in range(m)
    )
    code_joins = f"s0_a{n_iter}" + "".join(
        f" JOIN s{si}_a{n_iter} USING (vid)" for si in range(1, m)
    )
    cte.append(
        f"codes AS (SELECT vid, {code_cols} FROM {code_joins})"
    )
    lut_joins = "codes JOIN s0_lut l0 ON l0.cid = codes.code_0" + "".join(
        f" JOIN s{si}_lut l{si} ON l{si}.cid = codes.code_{si}"
        f" AND l{si}.query_id = l0.query_id"
        for si in range(1, m)
    )
    d_sum = " + ".join(f"l{si}.d" for si in range(m))
    cte.append(
        f"""adc AS (
            SELECT l0.query_id, codes.vid, {d_sum} AS adc_d
            FROM {lut_joins}
        )"""
    )
    cte.append(
        f"""short AS (
            SELECT query_id, vid FROM (
                SELECT query_id, vid,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY adc_d ASC, vid ASC) AS rk
                FROM adc)
            WHERE rk <= {shortlist}
        )"""
    )
    cte.append(
        f"""reranked AS (
            SELECT sh.query_id, sh.vid,
                   list_cosine_similarity(
                       CAST(e.{vec_col} AS DOUBLE[]),
                       CAST(qe.{vec_col} AS DOUBLE[])) AS cosine,
                   row_number() OVER (PARTITION BY sh.query_id
                       ORDER BY list_cosine_similarity(
                           CAST(e.{vec_col} AS DOUBLE[]),
                           CAST(qe.{vec_col} AS DOUBLE[])) DESC,
                           sh.vid) AS rank
            FROM short sh
            JOIN {table} e ON e.{id_col} = sh.vid
            JOIN {table} qe ON qe.{id_col} = sh.query_id
        )"""
    )
    return (
        "WITH " + ",\n".join(cte)
        + f"""
        SELECT query_id, vid AS {id_col},
               round(cosine, 6) AS cosine,
               CAST(rank AS BIGINT) AS rank
        FROM reranked WHERE rank <= {k}"""
    )


def ivfadc_grid_fixture_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    m: int = 2,
    n_codes: int = 8,
    n_iter: int = 2,
    shortlist: int = 30,
    n_queries: int = 5,
) -> str:
    """The full fixed-point IVFADC path as DuckDB SQL — the coarse
    unrolled k-means chain, integer cell centroids, exact BIGINT
    residuals, ``m`` prefix-namespaced residual-codebook chains
    (each re-quantizing the integer residual ×SCALE exactly, the
    same double multiply Spark's ``_quantize`` performs on the
    integer input), per-(query, probed-cell) residual LUTs, ADC sum
    with (distance, id) shortlist ties, and the exact cosine
    rerank. Hash-exact against
    :func:`~pac_data_pipeline_spark.ext.similarity.cosine_topk_ivfadc_grid`."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    s = KMEANS_SCALE
    sub_len = dim // m
    cte = _kmeans_ctes(table, id_col, vec_col, n_cells, n_iter)
    cte.append(_cells_cte("cells", f"a{n_iter}"))
    cte.append(
        f"""resid AS MATERIALIZED (
            SELECT a.vid, a.cluster,
                   list_transform(list_zip(a.q, c.c),
                       p -> p[1] - p[2]) AS r
            FROM a{n_iter} a JOIN cells c ON a.cluster = c.cid
        )"""
    )
    for si in range(m):
        lo, hi = si * sub_len + 1, (si + 1) * sub_len
        x = f"s{si}_"
        sub_t = f"(SELECT vid, r[{lo}:{hi}] AS sub FROM resid)"
        cte += _kmeans_ctes(sub_t, "vid", "sub", n_codes, n_iter, prefix=x)
        cte.append(_cells_cte(f"{x}cells", f"{x}a{n_iter}"))
    cte.append(
        f"""qset AS (
            SELECT {id_col} AS query_id,
                   CAST({vec_col} AS DOUBLE[]) AS qv,
                   list_transform({vec_col}, x -> CAST(floor(
                       CAST(x AS DOUBLE) * {s} + 0.5) AS BIGINT)) AS qq
            FROM {table}
            WHERE {id_col} < {n_queries} AND {vec_col} IS NOT NULL
        )"""
    )
    cte.append(
        f"""probes AS MATERIALIZED (
            SELECT query_id, cid,
                   list_transform(list_zip(qq, c),
                       p -> (p[1] - p[2]) * {s}) AS qr
            FROM (
                SELECT q.query_id, q.qq, c.cid, c.c,
                       row_number() OVER (PARTITION BY q.query_id
                           ORDER BY CAST(list_sum(list_transform(
                               list_zip(q.qq, c.c),
                               p -> (p[1]-p[2])*(p[1]-p[2])))
                               AS BIGINT), c.cid) AS rk
                FROM qset q CROSS JOIN cells c)
            WHERE rk <= {n_probe}
        )"""
    )
    for si in range(m):
        lo, hi = si * sub_len + 1, (si + 1) * sub_len
        cte.append(
            f"""s{si}_lut AS (
                SELECT p.query_id, p.cid AS pcell, c.cid AS code,
                       CAST(list_sum(list_transform(
                           list_zip(p.qr[{lo}:{hi}], c.c),
                           u -> (u[1]-u[2])*(u[1]-u[2]))) AS BIGINT) AS d
                FROM probes p CROSS JOIN s{si}_cells c
            )"""
        )
    code_cols = ", ".join(
        f"s{si}_a{n_iter}.cluster AS code_{si}" for si in range(m)
    )
    code_joins = f"s0_a{n_iter}" + "".join(
        f" JOIN s{si}_a{n_iter} USING (vid)" for si in range(1, m)
    )
    cte.append(f"codes AS (SELECT vid, {code_cols} FROM {code_joins})")
    lut_joins = "".join(
        f" JOIN s{si}_lut l{si} ON l{si}.query_id = p.query_id"
        f" AND l{si}.pcell = p.cid AND l{si}.code = codes.code_{si}"
        for si in range(m)
    )
    d_sum = " + ".join(f"l{si}.d" for si in range(m))
    cte.append(
        f"""adc AS (
            SELECT p.query_id, r.vid, {d_sum} AS adc_d
            FROM probes p
            JOIN resid r ON r.cluster = p.cid
            JOIN codes ON codes.vid = r.vid{lut_joins}
        )"""
    )
    cte.append(
        f"""short AS (
            SELECT query_id, vid FROM (
                SELECT query_id, vid,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY adc_d ASC, vid ASC) AS rk
                FROM adc)
            WHERE rk <= {shortlist}
        )"""
    )
    cte.append(
        f"""reranked AS (
            SELECT sh.query_id, sh.vid,
                   list_cosine_similarity(
                       CAST(e.{vec_col} AS DOUBLE[]),
                       CAST(qe.{vec_col} AS DOUBLE[])) AS cosine,
                   row_number() OVER (PARTITION BY sh.query_id
                       ORDER BY list_cosine_similarity(
                           CAST(e.{vec_col} AS DOUBLE[]),
                           CAST(qe.{vec_col} AS DOUBLE[])) DESC,
                           sh.vid) AS rank
            FROM short sh
            JOIN {table} e ON e.{id_col} = sh.vid
            JOIN {table} qe ON qe.{id_col} = sh.query_id
        )"""
    )
    return (
        "WITH " + ",\n".join(cte)
        + f"""
        SELECT query_id, vid AS {id_col},
               round(cosine, 6) AS cosine,
               CAST(rank AS BIGINT) AS rank
        FROM reranked WHERE rank <= {k}"""
    )


#: Planted near-duplicate fixture constants, shared by the Spark
#: builder and the SQL source below: every (id % MOD == 0) vector is
#: cloned to id + OFFSET with +SHIFT (float32) on dimension
#: (id % dim). The float32 add is a single IEEE round-to-nearest op
#: — bit-identical on both engines — and quantizes to a 2-step grid
#: move, so clone distance is exactly 4 on the grid.
DUP_MOD = 10
DUP_OFFSET = 1_000_000
DUP_SHIFT = "0.002"


def planted_near_dups(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The corpus plus its deterministic near-dup clones — the
    semantic-dedup test fixture (the raw embeddings table has no
    natural near-dups: measured min pair distance ≈ 0.97 L2²)."""
    clones = embeddings.filter(
        F.col(id_col).isNotNull() & (F.col(id_col) % DUP_MOD == 0)
    ).select(
        (F.col(id_col) + DUP_OFFSET).alias(id_col),
        F.expr(
            f"transform({vec_col}, (x, i) -> CASE "
            f"WHEN i = CAST({id_col} % size({vec_col}) AS INT) "
            f"THEN x + CAST({DUP_SHIFT} AS FLOAT) ELSE x END)"
        ).alias(vec_col),
    )
    return embeddings.select(id_col, vec_col).unionAll(clones)


def planted_near_dups_source_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The same corpus-plus-clones as a parenthesized SQL source
    (DuckDB indexed lambdas are 1-based, hence the ``i - 1``)."""
    return f"""(
        SELECT {id_col}, {vec_col} FROM {table}
        UNION ALL
        SELECT {id_col} + {DUP_OFFSET} AS {id_col},
               list_transform({vec_col}, (x, i) -> CASE
                   WHEN i - 1 = {id_col} % len({vec_col})
                   THEN x + CAST({DUP_SHIFT} AS FLOAT) ELSE x END)
                   AS {vec_col}
        FROM {table}
        WHERE {id_col} IS NOT NULL AND {id_col} % {DUP_MOD} = 0
    )"""


def semantic_dedup_fixture_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    threshold: int = 1000,
) -> str:
    """SemDeDup over the planted-clone corpus as DuckDB SQL: the
    shared k-means CTE chain, then the same greedy-by-id pair stage
    (smallest qualifying smaller id wins; NULL marks keepers)."""
    cte = _kmeans_ctes(
        planted_near_dups_source_sql(table, id_col, vec_col),
        id_col,
        vec_col,
        k,
        n_iter,
    )
    cte.append(
        f"""dups AS (
            SELECT b.vid AS b_vid, min(a.vid) AS dup_of
            FROM a{n_iter} a JOIN a{n_iter} b
              ON a.cluster = b.cluster AND a.vid < b.vid
            WHERE CAST(list_sum(list_transform(list_zip(a.q, b.q),
                p -> (p[1]-p[2])*(p[1]-p[2]))) AS BIGINT)
                <= {threshold}
            GROUP BY b.vid
        )"""
    )
    return (
        "WITH " + ",\n".join(cte)
        + f"""
        SELECT t.vid AS {id_col}, t.cluster, d.dup_of
        FROM a{n_iter} t LEFT JOIN dups d ON t.vid = d.b_vid
        """
    )


def semantic_dedup_eval(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    threshold: int = 1000,
    dim: int | None = None,
) -> DataFrame:
    """Dedup-quality report against the planted ground truth — the
    evaluation harness a dedup pipeline ships with (a near-dup
    stage without measured precision/recall is a liability at
    100 TB: too loose and it deletes real data, too tight and the
    dups it missed poison training).

    Ground truth: every planted clone (id ≥ DUP_OFFSET) duplicates
    exactly its source (id − DUP_OFFSET). A detection is a TRUE
    positive only if ``dup_of`` names the true source; any other
    non-NULL ``dup_of`` is a false positive; an undetected clone is
    a false negative. One row: counts + precision/recall/F1
    (round-6 — the only inexact step)."""
    marked = semantic_dedup(
        planted_near_dups(embeddings, id_col, vec_col),
        id_col,
        vec_col,
        k,
        n_iter,
        threshold,
        dim=dim,
    )
    is_clone = F.col(id_col) >= DUP_OFFSET
    truth = F.col(id_col) - DUP_OFFSET
    agg = marked.agg(
        F.sum(
            F.when(is_clone & (F.col("dup_of") == truth), 1).otherwise(0)
        ).alias("tp"),
        F.sum(
            F.when(
                F.col("dup_of").isNotNull()
                & ~(is_clone & (F.col("dup_of") == truth)),
                1,
            ).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(is_clone & F.col("dup_of").isNull(), 1).otherwise(0)
        ).alias("fn"),
    )
    tp = F.col("tp").cast("double")
    prec = tp / F.nullif(tp + F.col("fp"), F.lit(0.0))
    rec = tp / F.nullif(tp + F.col("fn"), F.lit(0.0))
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            2.0 * prec * rec / F.nullif(prec + rec, F.lit(0.0)), 6
        ).alias("f1"),
    )


def semantic_dedup_eval_sql(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 3,
    threshold: int = 1000,
) -> str:
    """The same report as DuckDB SQL, composed over the dedup
    fixture query (nested WITH is legal inside a CTE body)."""
    inner = semantic_dedup_fixture_sql(
        table, id_col, vec_col, k, n_iter, threshold
    )
    return f"""
        WITH marked AS ({inner}),
        agg AS (
            SELECT
                SUM(CASE WHEN {id_col} >= {DUP_OFFSET}
                          AND dup_of = {id_col} - {DUP_OFFSET}
                         THEN 1 ELSE 0 END) AS tp,
                SUM(CASE WHEN dup_of IS NOT NULL
                          AND NOT ({id_col} >= {DUP_OFFSET}
                                   AND dup_of = {id_col} - {DUP_OFFSET})
                         THEN 1 ELSE 0 END) AS fp,
                SUM(CASE WHEN {id_col} >= {DUP_OFFSET}
                          AND dup_of IS NULL
                         THEN 1 ELSE 0 END) AS fn
            FROM marked
        )
        SELECT CAST(tp AS BIGINT) AS tp,
               CAST(fp AS BIGINT) AS fp,
               CAST(fn AS BIGINT) AS fn,
               round(CAST(tp AS DOUBLE)
                   / nullif(CAST(tp AS DOUBLE) + fp, 0.0), 6)
                   AS precision,
               round(CAST(tp AS DOUBLE)
                   / nullif(CAST(tp AS DOUBLE) + fn, 0.0), 6)
                   AS recall,
               round(2.0 * (CAST(tp AS DOUBLE)
                         / nullif(CAST(tp AS DOUBLE) + fp, 0.0))
                     * (CAST(tp AS DOUBLE)
                         / nullif(CAST(tp AS DOUBLE) + fn, 0.0))
                     / nullif((CAST(tp AS DOUBLE)
                         / nullif(CAST(tp AS DOUBLE) + fp, 0.0))
                       + (CAST(tp AS DOUBLE)
                         / nullif(CAST(tp AS DOUBLE) + fn, 0.0)), 0.0), 6)
                   AS f1
        FROM agg
    """
