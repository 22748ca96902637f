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
    direction: str = "backward",
) -> DataFrame:
    """As-of join — the trades⋈quotes pattern Spark has no built-in
    operator for. Per ``by`` group, each left row picks the

    * ``backward``: LATEST right row with ``right.time <= left.time``;
    * ``forward``: EARLIEST right row with ``right.time >= left.time``;
    * ``nearest``: whichever of the two is closer in time (ties →
      backward, matching pandas ``merge_asof``).

    Distributed expression: union both sides tagged, ONE window per
    by-group ordered by time, and a ``last``/``first`` carry of a
    SINGLE struct that is non-null only on right rows — so the
    matched row's columns always travel together even when some of
    its value columns are null (carrying each column through its own
    ``ignorenulls`` window would stitch columns from different right
    rows). Cost = one shuffle on the by-key + one sort — what a
    native as-of merge would pay, and no range-join row explosion.
    Ties (equal timestamps) match, like SQL ASOF ``>=``.

    ``right`` must be unique per (by, time) — pre-aggregate it
    otherwise, or which duplicate wins is undefined."""
    from pyspark.sql import Window

    matched = F.struct(
        F.col(time_col).alias(f"{time_col}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    r = right.select(*by_cols, F.col(time_col), matched.alias("__match")).withColumn(
        "__side", F.lit(1)
    )
    l = left.withColumn("__side", F.lit(0))
    merged = l.unionByName(r, allowMissingColumns=True)

    # backward: right rows sort BEFORE left at equal ts so the
    # trailing frame sees them; forward: right rows sort AFTER left
    # so the leading frame sees them.
    w_back = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(time_col).asc(), F.col("__side").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*by_cols)
        .orderBy(F.col(time_col).asc(), F.col("__side").asc())
        .rowsBetween(0, Window.unboundedFollowing)
    )
    back = F.last("__match", ignorenulls=True).over(w_back)
    fwd = F.first("__match", ignorenulls=True).over(w_fwd)
    if direction == "backward":
        picked = back
    elif direction == "forward":
        picked = fwd
    elif direction == "nearest":
        t = F.unix_micros(F.col(time_col).cast("timestamp"))
        back_d = t - F.unix_micros(back[f"{time_col}{suffix}"].cast("timestamp"))
        fwd_d = F.unix_micros(fwd[f"{time_col}{suffix}"].cast("timestamp")) - t
        picked = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(back_d <= fwd_d, back)
            .otherwise(fwd)
        )
    else:
        raise ValueError(f"direction must be backward|forward|nearest: {direction}")

    out = merged.withColumn("__picked", picked).filter(F.col("__side") == 0)
    carried = [f"{time_col}{suffix}"] + [f"{c}{suffix}" for c in value_cols]
    for c in carried:
        out = out.withColumn(c, F.col(f"__picked.{c}"))
    return out.drop("__side", "__match", "__picked")


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bin_seconds: int = 3600,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Point-in-interval join without an equality key — the case
    OSS Spark plans as a broadcast-nested-loop / cartesian product
    (every point × every interval). The scale expression: quantize
    time into ``bin_seconds`` bins, explode each interval over the
    bins it covers, equi-join points to interval copies on the bin
    (plus any ``extra_keys``), then apply the exact range filter.

    Cost model: points shuffle once; intervals replicate by
    ``ceil(len / bin_seconds) + 1`` copies. Pick ``bin_seconds``
    near the median interval length so the blow-up stays ~2×. A
    point lands in exactly ONE bin, so no dedup pass is needed —
    each (point, interval) match is produced once. Degenerate
    months-long intervals explode into many copies: split those
    into their own broadcast pass rather than lowering the bin
    width for everyone.

    Matches are inclusive on both endpoints, like SQL BETWEEN.
    Reference analogue: per-row time-window membership checks done
    in a Python loop (pac_snowflake_realtime.py batch windows);
    here the check is a distributed hash join on the quantized
    key."""
    p_bin = F.floor(F.unix_timestamp(F.col(point_ts)) / bin_seconds)
    i_bins = F.sequence(
        F.floor(F.unix_timestamp(F.col(start_col)) / bin_seconds),
        F.floor(F.unix_timestamp(F.col(end_col)) / bin_seconds),
    )
    pb = points.withColumn("__bin", p_bin)
    ib = intervals.withColumn("__bin", F.explode(i_bins))
    return (
        pb.join(ib, ["__bin", *extra_keys])
        .filter(
            (F.col(point_ts) >= F.col(start_col))
            & (F.col(point_ts) <= F.col(end_col))
        )
        .drop("__bin")
    )


def lookup_misses(
    fact: DataFrame, dim: DataFrame, on: str | list[str], broadcast: bool = True
) -> DataFrame:
    """J1 miss path: fact rows with no dimension match
    (skipped_count at pac_snowflake_realtime.py:190-194) — a
    broadcast left-anti join, so the miss count costs no shuffle."""
    right = F.broadcast(dim) if broadcast else dim
    return fact.join(right, on=on, how="left_anti")


def fuzzy_join_banded(
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    id_col: str,
    band_len: int = 16,
    max_distance: int = 1,
) -> DataFrame:
    """Fuzzy self/pair join on string similarity: candidate pairs
    share a fixed-length prefix band, survivors are verified with
    exact Levenshtein distance <= ``max_distance``.

    The reference matches entity names across systems by exact
    normalized keys (lowercase/trim, pac_to_firebase.py:60); this is
    the approximate-match generalization every entity-resolution
    pipeline eventually needs.

    Scale shape: banding turns the O(n^2) all-pairs product into an
    equi-join on the band key — only rows sharing a prefix meet, and
    `levenshtein()` (a JVM intrinsic) runs per candidate pair, never
    per cross-product pair. Recall is bounded by the band choice
    (edits inside the first ``band_len`` chars split a true pair
    into different bands); production stacks widen recall with
    multiple bands (prefix + suffix + length), exactly like MinHash
    LSH in `ext.dedup_text`. The id inequality keeps each unordered
    pair once.
    """
    # Pin the band join's width (both sides, user-specified
    # repartition AQE will not coalesce): the band frames are a few
    # MB of names but the join OUTPUT pays a Levenshtein DP per
    # candidate pair — the small-bytes/heavy-CPU corner AQE's
    # byte-driven coalescing serializes onto 1-2 tasks (measured
    # r12: the x_entity_resolution edge stage ran 2.4 s CPU on 2 of
    # 32 cores; guide §2.5). Same discipline as
    # ext.dedup_text.pin_join_parallelism, inlined to keep the
    # operators layer free of ext imports.
    n_part = int(
        left.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    lhs = left.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
        F.substring(text_col, 1, band_len).alias("__band"),
    ).repartition(n_part, "__band")
    rhs = right.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
        F.substring(text_col, 1, band_len).alias("__band"),
    ).repartition(n_part, "__band")
    return (
        lhs.join(rhs, "__band")
        .filter(F.col("id_a") < F.col("id_b"))
        # length pre-filter: edit distance ≥ |len(a) − len(b)|, so
        # length-incompatible candidates die before the O(len²) DP
        .filter(
            F.abs(F.length("text_a") - F.length("text_b"))
            <= max_distance
        )
        .withColumn(
            # thresholded form: the JVM DP early-exits (returns -1)
            # once the distance provably exceeds the bound — O(len·k)
            # instead of O(len²) per surviving pair
            "distance",
            F.levenshtein(
                F.col("text_a"), F.col("text_b"), max_distance
            ),
        )
        .filter(F.col("distance") >= 0)
        .drop("__band")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int = 86_400,
) -> DataFrame:
    """Interval × interval OVERLAP join (both sides are ranges) —
    the generalization of :func:`range_join_binned`'s
    point-in-interval shape.

    Naively this is a theta-join (``ls <= re AND rs <= le``) that
    Spark plans as a nested-loop product. The scale formulation:
    explode each interval into the time bins it covers, equi-join
    on the bin (candidates = pairs sharing a bin), then verify the
    exact predicate. A pair overlapping across k shared bins would
    surface k times, so the verify keeps only the FIRST shared bin
    (the bin of the later start) — each qualifying pair is emitted
    exactly once with no distinct pass, which also means
    legitimately duplicate input rows survive instead of being
    collapsed. ``bin_seconds`` should roughly match typical
    interval length: bins much smaller multiply candidates, bins
    much larger put non-overlapping pairs in one bucket. Inverted
    intervals (end < start) cover no bins and match nothing.
    """
    def bins(start: str, end: str):
        s = F.floor(F.col(start).cast("long") / F.lit(bin_seconds))
        e = F.floor(F.col(end).cast("long") / F.lit(bin_seconds))
        # when() guards inverted intervals: a descending range would
        # otherwise still emit (bogus) candidate bins; NULL explodes
        # to zero rows
        return F.explode(
            F.when(s <= e, F.sequence(s.cast("long"), e.cast("long")))
        )

    lb = left.withColumn("__bin", bins(l_start, l_end))
    rb = right.withColumn("__bin", bins(r_start, r_end))
    first_shared_bin = F.floor(
        F.greatest(
            F.col(l_start).cast("long"), F.col(r_start).cast("long")
        )
        / F.lit(bin_seconds)
    ).cast("long")
    return (
        lb.join(rb, "__bin")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            # exactly-once: of the k bins a pair shares, emit only
            # from the bin containing the later of the two starts
            & (F.col("__bin") == first_shared_bin)
        )
        .drop("__bin")
    )
