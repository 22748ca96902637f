"""Distribution statistics operators: quantile bucketing, grouped
correlation, fixed-width histograms, per-key mode, running totals.

The reference's statistical surface stops at sum/count rollups
(``pac_data_processor.py:347-360``); these are the descriptive-stats
operators an analytics warehouse grows next, each expressed as a
single aggregation or a key-partitioned window so the shuffle count
stays at one:

- ntile/mode/running-total windows always PARTITION BY a key — a
  global ORDER BY window funnels the table through one task, which
  is the known scale-killer this module refuses to ship;
- corr/covar and histograms are plain hash aggregations with
  map-side partials, so shuffle volume is |groups|, not |rows|.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pac_data_pipeline_spark.functions.rounding import (
    floor_round,
    floor_round_sql,
)


def ntile_buckets(
    df: DataFrame,
    partition_col: str,
    order_col: str,
    n: int = 4,
    tiebreak_cols: Sequence[str] = (),
    descending: bool = True,
    alias: str = "bucket",
) -> DataFrame:
    """Assign each row its n-tile bucket WITHIN its partition key
    (e.g. spend quartile per order priority).

    The window partitions by ``partition_col``, so each key sorts
    locally after one shuffle — never a global single-task sort. A
    truly global ntile needs a two-phase rank (partition-local sort
    + cumulative partition offsets); partition-scoped tiles are the
    form that both scales and is what segment-level analytics ask
    for. ``tiebreak_cols`` pins tie order, otherwise ntile over
    equal keys is partition-order-dependent.
    """
    first = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(partition_col).orderBy(
        first, *[F.col(c).asc() for c in tiebreak_cols]
    )
    return df.withColumn(alias, F.ntile(n).over(w))


def grouped_corr(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    digits: int = 4,
) -> DataFrame:
    """Per-group Pearson correlation + sample covariance + n.

    One partial+final hash aggregation: corr/covar are algebraic
    aggregates (running sums of x, y, x², y², xy), so map-side
    combine shrinks the shuffle to |groups| rows. Rounded so both
    engines' float accumulation orders agree.
    """
    return df.groupBy(*keys).agg(
        F.round(F.corr(x_col, y_col), digits).alias("corr"),
        F.round(F.covar_samp(x_col, y_col), digits).alias("covar"),
        F.count(F.lit(1)).alias("n"),
    )


def histogram_fixed_width(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    nbins: int,
) -> DataFrame:
    """Fixed-width histogram: bucket index (0..nbins-1, clamped) +
    row count + bucket bounds.

    The bucket index is a scan-stage arithmetic expression feeding
    one hash aggregation — the whole histogram costs a single
    |nbins|-row shuffle regardless of input size, which is why
    fixed-width beats exact quantile binning at 100 TB (no global
    sort, no holistic aggregate).
    """
    width = (hi - lo) / nbins
    bucket = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(nbins - 1),
    ).cast("int")
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(F.lit(lo) + F.col("bucket") * F.lit(width), 2).alias(
                "bucket_lo"
            ),
            F.round(F.lit(lo) + (F.col("bucket") + 1) * F.lit(width), 2).alias(
                "bucket_hi"
            ),
            "n",
        )
    )


def mode_per_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Most frequent value per key; ties resolve to the smallest
    value so the answer is deterministic on any engine.

    Two single-shuffle stages: count per (key, value) — skew-safe,
    a hot key spreads over its distinct values — then a window
    partitioned by key picks rank 1. No self-join against a max
    subquery (the textbook SQL form, which shuffles twice and
    rescans).
    """
    counts = df.groupBy(key_col, value_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col("n").desc(), F.col(value_col).asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            key_col,
            F.col(value_col).alias("mode_value"),
            F.col("n").alias("mode_count"),
        )
    )


def running_total(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    alias: str = "running_total",
    digits: int = 2,
) -> DataFrame:
    """Cumulative sum of ``value_col`` per key in ``order_col``
    order (e.g. revenue-to-date per segment).

    One key-partitioned window — the input should already be one
    row per (key, order) (pre-aggregate first); then the running
    frame is unambiguous and the rounding makes the prefix sums
    engine-comparable. Cost: one shuffle on the key.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        alias, F.round(F.sum(value_col).over(w), digits)
    )


def cumulative_distinct(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Running distinct count of ``value_col`` per key in
    ``order_col`` order (e.g. cumulative unique users per event
    type by day).

    Spark has no COUNT(DISTINCT) OVER — and the collect_set-over-
    window workaround holds every distinct value in every frame
    (state explodes with cardinality). The scalable rewrite: mark
    each value's FIRST occurrence (one min-aggregation on
    (key, value)), then the running distinct count is a plain
    cumulative SUM of first-occurrence markers per (key, order) —
    two single-key shuffles, window state is one long per row.
    """
    first_seen = df.groupBy(key_col, value_col).agg(
        F.min(order_col).alias("__first")
    )
    per_period = first_seen.groupBy(
        key_col, F.col("__first").alias(order_col)
    ).agg(F.count(F.lit(1)).alias("__new"))
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_period.select(
        key_col,
        order_col,
        F.col("__new").alias("n_new"),
        F.sum("__new").over(w).alias("n_distinct_cum"),
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al.) —
    the engine-portable member of the sketch tier: estimates come
    from the k smallest md5-derived hash fractions per group, so an
    external SQL engine reproduces every estimate bit-for-bit
    (unlike HLL, whose register layout is engine-specific).

    Estimator: with distinct-value hashes uniform on (0, 1], the
    k-th smallest hash h_(k) gives n̂ = (k−1)/h_(k); groups with
    fewer than k distinct values report the EXACT count (the sketch
    saw everything). Scale shape: one dedup shuffle on
    (group, hash), then a per-group window keeps k rows — sketch
    state is k values per group regardless of group size, and the
    two stages share the group partitioning."""
    u = (
        F.conv(
            F.substring(F.md5(F.col(value_col).cast("string")), 1, 15),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))
    d = (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(group_col), u.alias("__u"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("__u")
    kept = d.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return kept.groupBy(group_col).agg(
        F.max("__u").alias("__hk"),
        F.count(F.lit(1)).alias("__n"),
    ).select(
        group_col,
        F.round(
            F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
                F.lit(float(k - 1)) / F.col("__hk")
            ),
            4,
        ).alias("est_distinct"),
    )


def _md5_fraction(col: F.Column) -> F.Column:
    """The portable uniform-(0,1] hash fraction shared by the KMV
    and theta-sketch tiers: first 15 md5 hex chars as a 60-bit
    integer, +1, over 2^60 — reproducible bit-for-bit by any engine
    with md5 (the x_kmv_distinct contract)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10)
        .cast("double")
        + F.lit(1.0)
    ) / F.lit(float(1 << 60))


#: Exact-mode theta sentinel: a sketch that saw fewer than k
#: distinct values keeps EVERYTHING (retention threshold above any
#: possible u) and divides by 1.0 (the theta-sketch exact mode).
_THETA_EXACT = 2.0


def theta_sketch_setops(
    a: DataFrame,
    b: DataFrame,
    value_col: str = "text",
    k: int = 64,
) -> DataFrame:
    """Theta-sketch set operations over two KMV sketches (the
    Dasgupta/Lang/Rhodes theta-sketch framework: a KMV sketch IS a
    theta sketch with θ = h_(k)) — estimate |A|, |B|, |A∪B|, |A∩B|
    and |A∖B| from two k-value sketches, next to the exact answers
    so the estimator's error is part of the differential record
    (the repo's measure-before-committing convention).

    This is what mergeable-sketch set algebra buys at 100 TB: each
    side's sketch is its k smallest md5 fractions — computed by
    Spark's distributed top-k (``TakeOrderedAndProject``: partial
    per-partition heads, never a single-partition window) — and
    every set operation then runs on ≤ 2k rows. Union is the
    retained-hash union under θ = min(θ_A, θ_B); intersection and
    difference filter the same merged frame; estimates divide the
    retained count by θ (θ = 1 in exact mode, i.e. a side with
    < k distinct values reports exactly).

    Output: one row per op ∈ (a, b, union, intersect, a_not_b) with
    ``est`` (rounded 4) and ``exact`` (the true distinct counts from
    one full-frame merge — linear, one shuffle, kept so the sketch
    never ships unmeasured). NULL values are excluded on both
    sides, matching :func:`kmv_distinct`."""
    # distinct the raw VALUES before hashing, then distinct the
    # hashes: distinct(md5(distinct(v))) ≡ distinct(md5(v)) for any
    # collision behavior, but md5 now runs once per DISTINCT value
    # instead of once per occurrence — at sf0.1 that is ~70× fewer
    # md5 evaluations for the 3-gram corpus halves (~20 s of hash
    # CPU measured r11, guide §1.2 per-task work). Cost: the value
    # distinct and the hash distinct group on DIFFERENT keys, so
    # this pays one extra hash-keyed exchange (of already-distinct
    # 8-byte fractions) where one was paid before — accepted for
    # the md5 CPU saving; the hash distinct stays because dropping
    # it would change results under an md5 collision, which the
    # sketch contract treats as deduped.
    ua = (
        a.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("__v"))
        .distinct()
        .select(_md5_fraction(F.col("__v")).alias("__u"))
        .distinct()
    )
    ub = (
        b.filter(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("__v"))
        .distinct()
        .select(_md5_fraction(F.col("__v")).alias("__u"))
        .distinct()
    )
    # full-frame merge once: serves BOTH the exact counts and (via
    # the top-k heads below) the sketches — localCheckpoint so the
    # distinct shuffles run once per side
    ua = ua.localCheckpoint()
    ub = ub.localCheckpoint()

    def _tag(df: DataFrame, ia: int, ib: int) -> DataFrame:
        return df.select(
            "__u", F.lit(ia).alias("__ia"), F.lit(ib).alias("__ib")
        )

    full = (
        _tag(ua, 1, 0)
        .unionAll(_tag(ub, 0, 1))
        .groupBy("__u")
        .agg(F.max("__ia").alias("in_a"), F.max("__ib").alias("in_b"))
    )
    # coalesce: sum over an EMPTY frame is NULL in both engines, but
    # the exact counts should read 0 on the empty fuzz clone
    exact = full.agg(
        F.coalesce(F.sum("in_a"), F.lit(0)).cast("long").alias("ex_a"),
        F.coalesce(F.sum("in_b"), F.lit(0)).cast("long").alias("ex_b"),
        F.count(F.lit(1)).cast("long").alias("ex_u"),
        F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0))
        .cast("long")
        .alias("ex_i"),
    ).select(
        "ex_a", "ex_b", "ex_u", "ex_i",
        (F.col("ex_a") - F.col("ex_i")).alias("ex_d"),
    )

    ka = ua.orderBy("__u").limit(k).localCheckpoint()  # k-row sketch
    kb = ub.orderBy("__u").limit(k).localCheckpoint()

    def _theta(kdf: DataFrame, name: str) -> DataFrame:
        return kdf.agg(
            F.when(F.count(F.lit(1)) < k, F.lit(_THETA_EXACT))
            .otherwise(F.max("__u"))
            .alias(name)
        )

    thetas = (
        _theta(ka, "th_a")
        .crossJoin(_theta(kb, "th_b"))
        .withColumn("th", F.least("th_a", "th_b"))
    )
    merged = (
        _tag(ka, 1, 0)
        .unionAll(_tag(kb, 0, 1))
        .groupBy("__u")
        .agg(F.max("__ia").alias("in_a"), F.max("__ib").alias("in_b"))
        .crossJoin(F.broadcast(thetas))  # 1-row theta broadcast
    )
    u, th_a, th_b, th = (
        F.col("__u"), F.col("th_a"), F.col("th_b"), F.col("th")
    )
    def _cnt(cond: F.Column, name: str) -> F.Column:
        return F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(name)

    ret = merged.agg(
        _cnt((F.col("in_a") == 1) & (u < th_a), "ra"),
        _cnt((F.col("in_b") == 1) & (u < th_b), "rb"),
        _cnt(u < th, "ru"),
        _cnt((F.col("in_a") == 1) & (F.col("in_b") == 1) & (u < th), "ri"),
        _cnt((F.col("in_a") == 1) & (F.col("in_b") == 0) & (u < th), "rd"),
        F.max(th_a).alias("th_a"),
        F.max(th_b).alias("th_b"),
        F.max(th).alias("th"),
    )

    def _est(cnt: str, theta: F.Column) -> F.Column:
        return F.round(F.col(cnt) / F.least(theta, F.lit(1.0)), 4)

    row = ret.crossJoin(exact).select(
        _est("ra", th_a).alias("est_a"),
        _est("rb", th_b).alias("est_b"),
        _est("ru", th).alias("est_union"),
        _est("ri", th).alias("est_intersect"),
        _est("rd", th).alias("est_a_not_b"),
        "ex_a", "ex_b", "ex_u", "ex_i", "ex_d",
    )
    return row.selectExpr(
        "stack(5, 'a', est_a, ex_a,"
        " 'b', est_b, ex_b,"
        " 'union', est_union, ex_u,"
        " 'intersect', est_intersect, ex_i,"
        " 'a_not_b', est_a_not_b, ex_d) AS (op, est, exact)"
    )


def ks_drift(
    df: DataFrame,
    key_col: str,
    group_col: str,
    value_col: str,
    groups: tuple | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic per key — the
    distribution-drift monitor a production pipeline runs between
    snapshots (``group_col`` must hold exactly two values, e.g.
    before/after a cutover; rows with NULL value or group are
    ignored).

    D = max over observed values of |F̂₁(v) − F̂₂(v)|, computed
    exactly: per (key, value) counts for each sample, one ordered
    window per key for the running CDFs, one max. No sampling, no
    binning — and no cogrouped-pandas detour: the empirical CDFs
    are cumulative sums, which is window algebra Spark executes
    JVM-side.

    Scale shape: one (key, value) pre-aggregation (map-side
    combinable — the window then runs over |distinct values| rows,
    not raw rows), ONE window shuffle on the key, one final
    per-key max. Sample sizes ride the same aggregate; no
    collect(), no second scan.
    """
    two = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    if groups is None:
        # fallback discovery: a bounded 2-row distinct; pass explicit
        # groups to keep the plan fully lazy
        groups = [
            r[0]
            for r in two.select(group_col)
            .distinct()
            .orderBy(group_col)
            .collect()
        ]
    if len(groups) != 2:
        raise ValueError(
            f"ks_drift needs exactly 2 groups, got {groups!r}"
        )
    g0, g1 = groups
    per_value = two.groupBy(key_col, value_col).agg(
        F.sum((F.col(group_col) == g0).cast("bigint")).alias("c0"),
        F.sum((F.col(group_col) == g1).cast("bigint")).alias("c1"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = Window.partitionBy(key_col)
    stepped = per_value.select(
        key_col,
        F.sum("c0").over(w).alias("cum0"),
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c0").over(totals).alias("n0"),
        F.sum("c1").over(totals).alias("n1"),
    )
    # Keys present in only one sample have no defined D — drop them
    # BEFORE the division: under ANSI mode cum/0 raises
    # DIVIDE_BY_ZERO inside the aggregate, so the filter must sit
    # upstream of it (n0/n1 are per-key window constants, so this is
    # the same row set the old post-agg filter kept).
    stepped = stepped.filter((F.col("n0") > 0) & (F.col("n1") > 0))
    return stepped.groupBy(key_col).agg(
        F.max("n0").cast("bigint").alias("n0"),
        F.max("n1").cast("bigint").alias("n1"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum0") / F.col("n0")
                    - F.col("cum1") / F.col("n1")
                )
            ),
            6,
        ).alias("d_stat"),
    )


def psi_drift(
    df: DataFrame,
    key_col: str,
    group_col: str,
    value_col: str,
    groups: tuple,
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index per key — :func:`ks_drift`'s
    companion for the coarser "how much did the distribution move"
    question a model monitor asks between snapshots (rule of thumb:
    <0.1 stable, 0.1–0.25 drifting, >0.25 shifted).

    Values bin into ``n_bins`` equal-width buckets over the key's
    observed [min, max] (both samples pooled — bins must be shared
    or PSI is meaningless); per-bucket shares are Laplace-smoothed
    ((c + 0.5) / (n + 0.5·B)) so empty buckets neither divide by
    zero nor blow up the log; PSI = Σ (p−q)·ln(p/q), rounded to 4
    (the Σ runs over ≤ B doubles whose accumulation order Spark
    doesn't pin). Rows with NULL value/group are ignored; a key
    present in only one sample is dropped (same contract as
    ks_drift). ``groups`` is explicit — pass the two snapshot labels.

    Scale shape: per-key min/max ride ONE window over the same key
    partitioning the (key, bin) count aggregate reuses; shuffle
    volume is |keys| + |keys × bins|, never raw rows twice.
    """
    if len(groups) != 2:
        raise ValueError(f"psi_drift needs exactly 2 groups, got {groups!r}")
    g0, g1 = groups
    two = df.filter(
        F.col(value_col).isNotNull()
        & F.col(group_col).isNotNull()
        & F.col(group_col).isin(list(groups))
    )
    w = Window.partitionBy(key_col)
    v = F.col(value_col).cast("double")
    lo, hi = F.min(v).over(w), F.max(v).over(w)
    width = (hi - lo) / F.lit(float(n_bins))
    binned = two.select(
        key_col,
        F.col(group_col).alias("__g"),
        F.when(width == 0, F.lit(0))
        .otherwise(
            F.least(
                F.floor((v - lo) / width).cast("int"),
                F.lit(n_bins - 1),
            )
        )
        .alias("__bin"),
    )
    counts = binned.groupBy(key_col, "__bin").agg(
        F.sum((F.col("__g") == g0).cast("bigint")).alias("c0"),
        F.sum((F.col("__g") == g1).cast("bigint")).alias("c1"),
    )
    totals = Window.partitionBy(key_col)
    stepped = counts.select(
        key_col,
        "c0",
        "c1",
        F.sum("c0").over(totals).alias("n0"),
        F.sum("c1").over(totals).alias("n1"),
    ).filter((F.col("n0") > 0) & (F.col("n1") > 0))
    half_b = 0.5 * n_bins
    p = (F.col("c0") + 0.5) / (F.col("n0") + half_b)
    q = (F.col("c1") + 0.5) / (F.col("n1") + half_b)
    return stepped.groupBy(key_col).agg(
        F.max("n0").cast("bigint").alias("n0"),
        F.max("n1").cast("bigint").alias("n1"),
        F.round(F.sum((p - q) * F.log(p / q)), 4).alias("psi"),
    )


def iqr_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    whisker: float = 1.5,
) -> DataFrame:
    """Per-group Tukey-fence outlier profile: exact q1/q3, the IQR,
    and how many values fall outside ``[q1 - w*iqr, q3 + w*iqr]`` —
    the robust anomaly screen a data-quality tier runs before
    z-scores (which a heavy tail corrupts; the IQR does not).

    Exact holistic quantiles over low-cardinality groups funnel each
    group's values through one reducer — that is inherent to
    exactness (same trade as h_median/h_equidepth); the sketch tier
    (x_approx_stats) is the 100-TB path when error bounds are
    acceptable. Everything else is scale-clean: the fence table is
    |groups| rows and rides a broadcast join back onto the fact
    scan, and the outlier count is a map-side-combinable agg.

    Float contract: quantiles and fences go through the pure-IEEE
    floor-round (``floor(x*10^k + 0.5)/10^k`` — Spark's round() on
    doubles goes through the shortest-decimal string and disagrees
    with other engines exactly at .xx5 boundaries); values are cast
    to DOUBLE before comparison so both engines compare in the same
    domain. Fences are rounded to 4 decimals BEFORE the comparison,
    which absorbs cross-engine ulp drift in the interpolation
    arithmetic (a value can only flip sides if the two engines'
    unrounded fences straddle it, and rounding collapses any gap
    below 5e-5 long before that matters for 2-decimal money).
    """

    def _r4(c):
        return F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)

    v = F.col(value_col).cast("double")
    fences = df.groupBy(group_col).agg(
        F.expr(f"percentile(CAST({value_col} AS DOUBLE), 0.25)").alias("__q1"),
        F.expr(f"percentile(CAST({value_col} AS DOUBLE), 0.75)").alias("__q3"),
    )
    fences = fences.select(
        group_col,
        _r4(F.col("__q1")).alias("q1"),
        _r4(F.col("__q3")).alias("q3"),
        _r4(F.col("__q1") - whisker * (F.col("__q3") - F.col("__q1"))).alias(
            "lo_fence"
        ),
        _r4(F.col("__q3") + whisker * (F.col("__q3") - F.col("__q1"))).alias(
            "hi_fence"
        ),
    )
    return (
        df.join(F.broadcast(fences), group_col)
        .groupBy(group_col, "q1", "q3", "lo_fence", "hi_fence")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    (v < F.col("lo_fence")) | (v > F.col("hi_fence")),
                    F.lit(1),
                ).otherwise(F.lit(0))
            ).alias("n_outliers"),
        )
        .select(
            group_col, "n", "q1", "q3", "lo_fence", "hi_fence", "n_outliers"
        )
    )


def iqr_outliers_sql(
    table: str,
    group_col: str,
    value_col: str,
    whisker: float = 1.5,
) -> str:
    """The same profile as DuckDB SQL — quantile_cont matches
    Spark's percentile() interpolation; the identical floor-round
    pins the fence doubles; CAST(.. AS DOUBLE) keeps the whisker
    arithmetic and the comparison in Spark's IEEE domain (DuckDB
    types bare decimal literals as DECIMAL)."""
    w = f"CAST({whisker} AS DOUBLE)"
    return f"""
        WITH q AS (
            SELECT {group_col},
                   quantile_cont(CAST({value_col} AS DOUBLE), 0.25) AS q1r,
                   quantile_cont(CAST({value_col} AS DOUBLE), 0.75) AS q3r
            FROM {table} GROUP BY {group_col}
        ),
        fences AS (
            SELECT {group_col},
                   floor(q1r * 10000 + 0.5) / 10000.0 AS q1,
                   floor(q3r * 10000 + 0.5) / 10000.0 AS q3,
                   floor((q1r - {w} * (q3r - q1r)) * 10000 + 0.5)
                       / 10000.0 AS lo_fence,
                   floor((q3r + {w} * (q3r - q1r)) * 10000 + 0.5)
                       / 10000.0 AS hi_fence
            FROM q
        )
        SELECT t.{group_col}, count(*) AS n, f.q1, f.q3,
               f.lo_fence, f.hi_fence,
               CAST(SUM(CASE WHEN CAST(t.{value_col} AS DOUBLE) < f.lo_fence
                          OR CAST(t.{value_col} AS DOUBLE) > f.hi_fence
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM {table} t JOIN fences f USING ({group_col})
        GROUP BY t.{group_col}, f.q1, f.q3, f.lo_fence, f.hi_fence
    """


def ab_test(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    success: "F.Column",
    buckets: int = 2,
    digits: int = 6,
) -> DataFrame:
    """Per-group two-proportion z-test over a deterministic hash
    split of experiment units — the A/B readout an experimentation
    platform computes (pooled-variance z; |z| > 1.96 ≈ p < .05
    two-sided).

    The unit→arm assignment is ``md5(unit) % 2`` (the portable
    deterministic split used by the sampling tier — engine hash
    functions never match across engines, md5 does), so assignment
    is reproducible at any scale and on any engine, and units keep
    their arm across re-runs — the property a real experiment needs.

    Scale shape: ONE map-side-combinable aggregation (four
    conditional counts per group); the z arithmetic runs on the
    |groups|-row aggregate. sqrt is IEEE-correctly-rounded on every
    engine, so with a fixed operation order the statistic matches
    bit-for-bit before the final round. Groups missing an arm
    report NULL z (nullif guards — no ANSI divide-by-zero).
    """
    arm = (
        F.conv(
            F.substring(F.md5(F.col(unit_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % buckets
    )
    agg = df.groupBy(group_col).agg(
        F.sum(F.when(arm == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(arm == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when((arm == 0) & success, 1).otherwise(0)).alias("s_a"),
        F.sum(F.when((arm == 1) & success, 1).otherwise(0)).alias("s_b"),
    )
    p_a = F.col("s_a") / F.nullif(F.col("n_a"), F.lit(0))
    p_b = F.col("s_b") / F.nullif(F.col("n_b"), F.lit(0))
    pool = (F.col("s_a") + F.col("s_b")) / F.nullif(
        F.col("n_a") + F.col("n_b"), F.lit(0)
    )
    se = F.sqrt(
        pool
        * (1.0 - pool)
        * (
            1.0 / F.nullif(F.col("n_a"), F.lit(0))
            + 1.0 / F.nullif(F.col("n_b"), F.lit(0))
        )
    )
    z = (p_a - p_b) / F.nullif(se, F.lit(0.0))
    # Rational-ratio outputs pin with the shared IEEE floor-round —
    # engine round() is one-ulp divergent on exact .xx5 quotients
    # (the Benford/iqr_outliers divergence class).
    return agg.select(
        group_col,
        "n_a",
        "n_b",
        floor_round(p_a, digits).alias("rate_a"),
        floor_round(p_b, digits).alias("rate_b"),
        floor_round(z, digits).alias("z"),
        (F.abs(floor_round(z, digits)) > 1.96).alias("significant"),
    )


def ab_test_sql(
    table: str,
    group_col: str,
    unit_col: str,
    success_sql: str,
    buckets: int = 2,
    digits: int = 6,
) -> str:
    """The same test as DuckDB SQL: identical md5 arm assignment,
    identical conditional counts, identical operation order through
    the pooled-variance z (sqrt is correctly rounded on both
    engines, so the doubles agree bit-for-bit before the round)."""
    # NULL-unit guard: DuckDB concat() treats NULL as '' (so the
    # cast would see the bare string '0x' and throw); Spark's conv()
    # propagates the NULL. CASE keeps both engines at NULL arm.
    arm = (
        f"CASE WHEN {unit_col} IS NULL THEN NULL ELSE "
        f"CAST(concat('0x', substr(md5(CAST({unit_col} AS VARCHAR)), "
        f"1, 8)) AS BIGINT) % {buckets} END"
    )
    z_expr = (
        "(s_a / nullif(n_a, 0) - s_b / nullif(n_b, 0))"
        " / nullif(sqrt("
        "((s_a + s_b) / nullif(n_a + n_b, 0))"
        " * (1.0 - (s_a + s_b) / nullif(n_a + n_b, 0))"
        " * (1.0 / nullif(n_a, 0) + 1.0 / nullif(n_b, 0))"
        "), 0.0)"
    )
    rate_a = floor_round_sql("s_a / nullif(n_a, 0)", digits)
    rate_b = floor_round_sql("s_b / nullif(n_b, 0)", digits)
    z_rounded = floor_round_sql(z_expr, digits)
    return f"""
        WITH agg AS (
            SELECT {group_col},
                   SUM(CASE WHEN {arm} = 0 THEN 1 ELSE 0 END) AS n_a,
                   SUM(CASE WHEN {arm} = 1 THEN 1 ELSE 0 END) AS n_b,
                   SUM(CASE WHEN {arm} = 0 AND ({success_sql})
                       THEN 1 ELSE 0 END) AS s_a,
                   SUM(CASE WHEN {arm} = 1 AND ({success_sql})
                       THEN 1 ELSE 0 END) AS s_b
            FROM {table} GROUP BY {group_col}
        )
        SELECT {group_col},
               CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               {rate_a} AS rate_a,
               {rate_b} AS rate_b,
               {z_rounded} AS z,
               abs({z_rounded}) > 1.96 AS significant
        FROM agg
    """


def mutual_information(
    df: DataFrame,
    x_col,
    y_col,
    digits: int = 4,
) -> DataFrame:
    """Pointwise mutual information table for two categorical
    columns — the feature-selection / association primitive
    (MI = Σ p(x,y)·pmi(x,y) over the returned rows). ``x_col`` /
    ``y_col`` may be names or column expressions (e.g. a bucketed
    length).

    One (x, y) hash aggregation with map-side combine, then the
    marginals come from WINDOW SUMS OVER THE |X|·|Y|-ROW AGGREGATE —
    never a second scan of the input (the textbook three-scan
    formulation reads the table for p(x), p(y), p(x,y) separately).
    pmi = ln(n·n_xy / (n_x·n_y)) with the log argument formed as ONE
    integer-exact double ratio; round-4 absorbs libm ulp differences
    between engines (the psi_drift discipline). NULL categories are
    dropped (SQL GROUP BY would keep them but every downstream
    marginal join/window treats NULL as its own class inconsistently
    across engines — the contract here is explicit).
    """
    xc = F.col(x_col) if isinstance(x_col, str) else x_col
    yc = F.col(y_col) if isinstance(y_col, str) else y_col
    joint = (
        df.filter(xc.isNotNull() & yc.isNotNull())
        .groupBy(xc.alias("x"), yc.alias("y"))
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    wall = Window.partitionBy()
    out = joint.select(
        "x",
        "y",
        "n_xy",
        F.sum("n_xy").over(wx).alias("n_x"),
        F.sum("n_xy").over(wy).alias("n_y"),
        F.sum("n_xy").over(wall).alias("n"),
    )
    pmi = F.log(
        (F.col("n") * F.col("n_xy")).cast("double")
        / (F.col("n_x") * F.col("n_y")).cast("double")
    )
    return out.select(
        "x",
        "y",
        "n_xy",
        "n_x",
        "n_y",
        F.round(pmi, digits).alias("pmi"),
        F.round(
            (F.col("n_xy").cast("double") / F.col("n").cast("double")) * pmi,
            6,
        ).alias("mi_contrib"),
    )


def mutual_information_sql(
    table: str,
    x_sql: str,
    y_sql: str,
    digits: int = 4,
) -> str:
    """The same PMI table as DuckDB SQL — identical single-agg +
    window-marginal shape, identical integer-exact log argument."""
    return f"""
        WITH joint AS (
            SELECT {x_sql} AS x, {y_sql} AS y, count(*) AS n_xy
            FROM {table}
            WHERE ({x_sql}) IS NOT NULL AND ({y_sql}) IS NOT NULL
            GROUP BY 1, 2
        ),
        m AS (
            SELECT x, y, n_xy,
                   SUM(n_xy) OVER (PARTITION BY x) AS n_x,
                   SUM(n_xy) OVER (PARTITION BY y) AS n_y,
                   SUM(n_xy) OVER () AS n
            FROM joint
        )
        SELECT x, y,
               CAST(n_xy AS BIGINT) AS n_xy,
               CAST(n_x AS BIGINT) AS n_x,
               CAST(n_y AS BIGINT) AS n_y,
               round(ln(CAST(n * n_xy AS DOUBLE)
                     / CAST(n_x * n_y AS DOUBLE)), {digits}) AS pmi,
               round((CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(n * n_xy AS DOUBLE)
                       / CAST(n_x * n_y AS DOUBLE)), 6) AS mi_contrib
        FROM m
    """


def auc(
    df: DataFrame,
    score_col: str,
    label: "F.Column",
    digits: int = 6,
) -> DataFrame:
    """Exact ROC AUC via the Mann-Whitney U statistic — the
    score-quality metric (P(score_pos > score_neg) + ½·P(equal)).

    The textbook rank formulation globally sorts the input — the
    known scale-killer. The scalable identity: aggregate to ONE row
    per distinct score with positive/negative counts (map-side
    combinable; |distinct scores| ≪ |rows| for any quantized or
    bounded score), then

        U = Σ_s [ n_pos(s) · cum_neg(<s) + ½ · n_pos(s) · n_neg(s) ]

    where the running negative count is a window over the
    DISTINCT-SCORE AGGREGATE, not the input. All terms are integers
    and exact halves, so the single final division is the only
    inexact step and round-6 pins it cross-engine. NULL scores and
    NULL labels drop.

    Returns one row: (n_pos, n_neg, auc).
    """
    counted = (
        df.filter(F.col(score_col).isNotNull() & label.isNotNull())
        .groupBy(F.col(score_col).alias("s"))
        .agg(
            F.sum(F.when(label, 1).otherwise(0)).alias("np"),
            F.sum(F.when(label, 0).otherwise(1)).alias("nn"),
        )
    )
    w = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = counted.select(
        "np",
        "nn",
        (F.sum("nn").over(w) - F.col("nn")).alias("cum_nn"),
    )
    return stepped.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.round(
            F.sum(
                F.col("np") * F.col("cum_nn")
                + 0.5 * F.col("np") * F.col("nn")
            )
            / F.nullif(
                (F.sum("np") * F.sum("nn")).cast("double"), F.lit(0.0)
            ),
            digits,
        ).alias("auc"),
    )


def auc_sql(
    table: str,
    score_col: str,
    label_sql: str,
    digits: int = 6,
) -> str:
    """The same U-statistic as DuckDB SQL — identical distinct-score
    aggregation, running-negative window, and final division."""
    return f"""
        WITH counted AS (
            SELECT {score_col} AS s,
                   SUM(CASE WHEN ({label_sql}) THEN 1 ELSE 0 END) AS np,
                   SUM(CASE WHEN ({label_sql}) THEN 0 ELSE 1 END) AS nn
            FROM {table}
            WHERE {score_col} IS NOT NULL AND ({label_sql}) IS NOT NULL
            GROUP BY {score_col}
        ),
        stepped AS (
            SELECT np, nn,
                   SUM(nn) OVER (ORDER BY s
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) - nn AS cum_nn
            FROM counted
        )
        SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
               CAST(SUM(nn) AS BIGINT) AS n_neg,
               round(SUM(np * cum_nn + 0.5 * np * nn)
                   / nullif(CAST(SUM(np) * SUM(nn) AS DOUBLE), 0.0),
                   {digits}) AS auc
        FROM stepped
    """


def welch_t_test(
    df: DataFrame,
    group_col: str,
    unit_col: str,
    value_col: str,
    buckets: int = 2,
    digits: int = 4,
) -> DataFrame:
    """Per-group Welch two-sample t-test on a CONTINUOUS outcome
    over the same deterministic md5 unit split as :func:`ab_test` —
    together they complete the experiment readout (proportions AND
    means; Welch because arm variances are never equal in practice).

    Determinism contract: 2-decimal values scale to EXACT integer
    cents, so the per-arm sums and sums-of-squares are exact BIGINTs
    under ANY partitioning / summation order (the usual float-sum
    ulp drift cannot exist), and the t statistic is a fixed sequence
    of IEEE ops over exact integers — identical on every engine
    before the final round. Arms with n < 2 report NULL t (no ANSI
    division error). NULL units/values drop.
    """
    arm = (
        F.conv(
            F.substring(F.md5(F.col(unit_col).cast("string")), 1, 8), 16, 10
        ).cast("bigint")
        % buckets
    )
    cents = F.floor(F.col(value_col).cast("double") * 100 + F.lit(0.5)).cast(
        "bigint"
    )
    base = df.filter(
        F.col(unit_col).isNotNull() & F.col(value_col).isNotNull()
    )
    agg = base.groupBy(group_col).agg(
        *[
            agg_expr
            for b, tag in ((0, "a"), (1, "b"))
            for agg_expr in (
                F.sum(F.when(arm == b, 1).otherwise(0)).alias(f"n_{tag}"),
                F.sum(F.when(arm == b, cents).otherwise(0)).alias(
                    f"s_{tag}"
                ),
                F.sum(F.when(arm == b, cents * cents).otherwise(0)).alias(
                    f"ss_{tag}"
                ),
            )
        ]
    )

    def var(tag: str) -> "F.Column":
        n = F.col(f"n_{tag}").cast("double")
        s = F.col(f"s_{tag}").cast("double")
        ss = F.col(f"ss_{tag}").cast("double")
        return (ss - s * s / n) / F.nullif(n - 1.0, F.lit(0.0))

    def mean(tag: str) -> "F.Column":
        return F.col(f"s_{tag}").cast("double") / F.nullif(
            F.col(f"n_{tag}").cast("double"), F.lit(0.0)
        )

    se2 = var("a") / F.col("n_a").cast("double") + var("b") / F.col(
        "n_b"
    ).cast("double")
    t = (mean("a") - mean("b")) / F.nullif(F.sqrt(se2), F.lit(0.0))
    return agg.select(
        group_col,
        "n_a",
        "n_b",
        F.round(mean("a") / 100.0, digits).alias("mean_a"),
        F.round(mean("b") / 100.0, digits).alias("mean_b"),
        F.round(t, digits).alias("t_stat"),
    )


def welch_t_test_sql(
    table: str,
    group_col: str,
    unit_col: str,
    value_col: str,
    buckets: int = 2,
    digits: int = 4,
) -> str:
    """The same test as DuckDB SQL — identical md5 arm split,
    exact-integer cents sums, and operation order."""
    arm = (
        f"CASE WHEN {unit_col} IS NULL THEN NULL ELSE "
        f"CAST(concat('0x', substr(md5(CAST({unit_col} AS VARCHAR)), "
        f"1, 8)) AS BIGINT) % {buckets} END"
    )
    cents = f"CAST(floor(CAST({value_col} AS DOUBLE) * 100 + 0.5) AS BIGINT)"
    aggs = ", ".join(
        f"SUM(CASE WHEN {arm} = {b} THEN {expr} ELSE 0 END) AS {name}"
        for b, tag in ((0, "a"), (1, "b"))
        for expr, name in (
            ("1", f"n_{tag}"),
            (cents, f"s_{tag}"),
            (f"{cents} * {cents}", f"ss_{tag}"),
        )
    )

    def var(tag: str) -> str:
        return (
            f"((CAST(ss_{tag} AS DOUBLE) - CAST(s_{tag} AS DOUBLE) "
            f"* CAST(s_{tag} AS DOUBLE) / CAST(n_{tag} AS DOUBLE)) "
            f"/ nullif(CAST(n_{tag} AS DOUBLE) - 1.0, 0.0))"
        )

    def mean(tag: str) -> str:
        return (
            f"(CAST(s_{tag} AS DOUBLE) "
            f"/ nullif(CAST(n_{tag} AS DOUBLE), 0.0))"
        )

    se2 = (
        f"({var('a')} / CAST(n_a AS DOUBLE) "
        f"+ {var('b')} / CAST(n_b AS DOUBLE))"
    )
    return f"""
        WITH agg AS (
            SELECT {group_col}, {aggs}
            FROM {table}
            WHERE {unit_col} IS NOT NULL AND {value_col} IS NOT NULL
            GROUP BY {group_col}
        )
        SELECT {group_col},
               CAST(n_a AS BIGINT) AS n_a,
               CAST(n_b AS BIGINT) AS n_b,
               round({mean('a')} / 100.0, {digits}) AS mean_a,
               round({mean('b')} / 100.0, {digits}) AS mean_b,
               round(({mean('a')} - {mean('b')})
                   / nullif(sqrt({se2}), 0.0), {digits}) AS t_stat
        FROM agg
    """
