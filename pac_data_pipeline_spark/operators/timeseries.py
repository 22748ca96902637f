"""Time-series operators: calendar gap-fill, SCD Type-2 history,
per-key z-score anomaly flagging.

The reference pipeline reshapes cycle/date-keyed aggregates but has
no explicit time-series toolkit (closest: per-cycle rollups,
``pac_to_firebase.py:94``); these are the operators a warehouse
built on that data model grows next, expressed Spark-first:

- gap filling is `sequence()` + `explode` + one per-key window —
  never a driver-side calendar loop;
- SCD2 and z-score are single-window passes, so each costs exactly
  one shuffle on its partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pac_data_pipeline_spark.functions.rounding import floor_round


def gap_fill_daily(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Fill missing calendar days per key between each key's first
    and last observed day.

    Output columns: ``key_col``, ``day`` (every day in the key's
    span), ``value`` (observed or 0), ``last_known`` (forward-filled
    last observed value).

    Scale shape: the calendar is built per key with
    ``sequence(min_day, max_day)`` exploded on the executors — one
    array per key, no driver loop, no cross join against a global
    calendar (which would replicate every key across the full date
    range). Cost is two shuffles: the join back to observations on
    (key, day) and the per-key forward-fill window; both partition
    by the key so AQE coalesces them at runtime.
    """
    obs = df.select(
        F.col(key_col), F.col(day_col).alias("day"), F.col(value_col)
    )
    spans = obs.groupBy(key_col).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        key_col,
        F.explode(F.expr("sequence(d0, d1, INTERVAL 1 DAY)")).alias("day"),
    )
    filled = calendar.join(obs, [key_col, "day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        key_col,
        "day",
        F.coalesce(F.col(value_col), F.lit(0.0)).alias("value"),
        F.last(value_col, ignorenulls=True).over(w).alias("last_known"),
    )


def linear_interpolate(
    df: DataFrame,
    key_col: str,
    day_col: str,
    value_col: str,
) -> DataFrame:
    """Calendar-fill like :func:`gap_fill_daily`, but missing days
    get LINEAR interpolation between the surrounding observations
    instead of a zero + forward-fill:

    ``v = prev + (next − prev) · (day − prev_day)/(next_day − prev_day)``

    Output: ``key_col``, ``day``, ``value`` (observed or
    interpolated, rounded to 6), ``is_observed``. Days outside any
    observed pair (possible only when an observed day carries a NULL
    value) fall back flat to whichever side exists.

    Scale shape: identical budget to gap-fill — per-key
    ``sequence()`` calendar on the executors, one (key, day) join,
    then ONE window shuffle on the key serving both the backward
    (last-known) and forward (next-known) frames: same partitioning
    and ordering, so Spark plans a single exchange with two frame
    passes, never two shuffles.
    """
    obs = df.select(
        F.col(key_col), F.col(day_col).alias("day"), F.col(value_col)
    )
    spans = obs.groupBy(key_col).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        key_col,
        F.explode(F.expr("sequence(d0, d1, INTERVAL 1 DAY)")).alias("day"),
    )
    filled = calendar.join(obs, [key_col, "day"], "left")
    v = F.col(value_col)
    wb = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_val = F.last(v, ignorenulls=True).over(wb)
    prev_day = F.last(
        F.when(v.isNotNull(), F.col("day")), ignorenulls=True
    ).over(wb)
    next_val = F.first(v, ignorenulls=True).over(wf)
    next_day = F.first(
        F.when(v.isNotNull(), F.col("day")), ignorenulls=True
    ).over(wf)
    interp = (
        F.when(v.isNotNull(), v)
        .when(
            prev_val.isNotNull() & next_val.isNotNull(),
            F.round(
                prev_val
                + (next_val - prev_val)
                * F.datediff(F.col("day"), prev_day)
                / F.datediff(next_day, prev_day),
                6,
            ),
        )
        .otherwise(F.coalesce(prev_val, next_val))
    )
    return filled.select(
        key_col,
        "day",
        interp.alias("value"),
        v.isNotNull().alias("is_observed"),
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: tuple[str, ...],
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Build a Slowly-Changing-Dimension Type-2 history: each
    observation becomes a version row with ``valid_from`` /
    ``valid_to`` (null = current) and a per-key ``version`` number.

    One window over (key ORDER BY ts) produces both the version
    number and the closing timestamp via ``lead`` — a single shuffle
    on the key, no self-join (the textbook SQL formulation joins the
    table to itself on key + next-ts, which is a second shuffle and
    a skew hazard on hot keys). ``tiebreak_cols`` pins the version
    order when two changes share a timestamp — without it
    ``row_number`` over ties is partition-order-dependent.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, *tiebreak_cols)
    return df.select(
        key_col,
        *(tiebreak_cols + attr_cols),
        F.row_number().over(w).alias("version"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def zscore_anomalies(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 2.0,
) -> DataFrame:
    """Flag rows whose value deviates more than ``threshold`` sample
    standard deviations from their key's mean.

    The mean/stddev are whole-partition window aggregates (no ORDER
    BY → no running-frame sort, a single hash-style pass), so the
    operator costs one shuffle on the key. Keys with fewer than two
    rows have null stddev and are never flagged. ``z`` is rounded so
    the result is comparable across engines' float summation orders.
    """
    w = Window.partitionBy(key_col)
    mu = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    z = (F.col(value_col) - mu) / sd
    return (
        df.select(
            key_col,
            F.col(value_col),
            F.round(z, 3).alias("z"),
        )
        .filter(F.abs(F.col("z")) > threshold)
    )


def markov_transitions(
    df: DataFrame,
    key_col: str,
    order_col: str,
    state_col: str,
    tiebreak_col: str,
    digits: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-key state
    sequences (e.g. which event_type follows which, per user) — the
    empirical next-step model behind funnel diagnostics and
    next-action prediction. One row per observed (prev_state, state)
    with the transition count and row-conditional probability
    P(state | prev_state), rounded so cross-engine float division
    agrees.

    ``tiebreak_col`` pins the order of simultaneous events —
    lag() over an ambiguous sort is partition-order-dependent, the
    same nondeterminism contract as keep-first dedup. Rows with a
    NULL state, order, OR tiebreak are dropped: a NULL tiebreak
    tying on (key, order) sorts ASC NULLS FIRST on Spark but the
    oracle's plain ORDER BY places NULLS LAST, reordering the lag
    sequence on one engine only — the same reason the ewma/holt/
    streaks siblings drop every order key. Each key's first event
    has no predecessor and contributes nothing. ``p`` is pinned
    with the shared IEEE floor-round (count/count ratios land on
    exact .xx5 boundaries where engine round() is one-ulp
    divergent).

    Scale shape: ONE window shuffle on the key builds every lag
    pair, then a (prev, state) hash aggregation with map-side
    partials (shuffle volume = |state pairs|, not events); the
    per-prev totals ride a tiny window over the |states|²-row
    aggregate, not the event stream.
    """
    seq = df.filter(
        F.col(state_col).isNotNull()
        & F.col(order_col).isNotNull()
        & F.col(tiebreak_col).isNotNull()
    )
    w = Window.partitionBy(key_col).orderBy(order_col, tiebreak_col)
    pairs = seq.select(
        F.lag(state_col).over(w).alias("prev_state"),
        F.col(state_col).alias("state"),
    ).filter(F.col("prev_state").isNotNull())
    counts = pairs.groupBy("prev_state", "state").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("prev_state")
    return counts.select(
        "prev_state",
        "state",
        "n",
        floor_round(
            F.col("n") / F.sum("n").over(tot), digits
        ).alias("p"),
    )


def ewma_smooth(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    alpha: float = 0.3,
    digits: int = 10,
) -> DataFrame:
    """Per-key exponentially weighted moving average — the
    inherently RECURSIVE time-series smoother
    (``r_n = α·x_n + (1-α)·r_{n-1}``, seeded ``r_1 = x_1``) that a
    window frame cannot express (each output depends on ALL prior
    inputs with geometrically decaying weights; the closed-form
    ``Σ x_j (1-α)^(n-j)`` overflows ``(1-α)^-j`` long before real
    series lengths).

    Spark-first shape: ONE shuffle (groupBy key), the series folded
    entirely in whole-stage codegen — sort_array(collect_list) pins
    the order, `aggregate` runs the recursion, posexplode restores
    rows. No Python in the loop. The per-step accumulator append is
    O(n²) array copying within one group — fine for event-scale
    series (hundreds of points); for million-point series the same
    fold moves into one Arrow applyInPandas pass per key.

    Determinism contract: each step is pinned with the pure-IEEE
    floor-round (``floor(x·10^d + 0.5)/10^d``) so the float
    trajectory is byte-identical on any engine that mirrors the
    recursion (same literals, same operation order) — ulp drift
    otherwise compounds through the recursion. Rows with NULL value
    or NULL order keys are dropped (a NULL cannot enter a recursive
    smoother without poisoning the tail).

    Returns (key, last order col, value, ewma).
    """
    scale = float(10 ** digits)
    ordc = [F.col(c) for c in order_cols]
    # NULL key rows drop (SQL's NULL-hostile equi-join recursion
    # cannot chain a NULL partition past its anchor; a NULL series
    # key is meaningless anyway); NULL order keys drop too (engines
    # disagree on NULL sort placement inside struct comparison vs
    # ORDER BY); NULL values drop (they would poison the tail).
    notnull = F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    for c in ordc:
        notnull = notnull & c.isNotNull()
    clean = df.filter(notnull).select(
        F.col(key_col).alias("__k"),
        F.struct(
            *[c.alias(f"__o{i}") for i, c in enumerate(ordc)],
            F.col(value_col).cast("double").alias("__v"),
        ).alias("__s"),
    )
    grouped = clean.groupBy("__k").agg(
        F.sort_array(F.collect_list("__s")).alias("__arr")
    )
    step = (
        f"CAST(floor((CAST({alpha} AS DOUBLE) * x.__v "
        f"+ CAST({1 - alpha} AS DOUBLE) * acc.prev) * {scale} + 0.5D) "
        f"/ {scale} AS DOUBLE)"
    )
    folded = grouped.withColumn(
        "__ewma",
        F.expr(
            "aggregate(__arr, "
            "struct(CAST(NULL AS DOUBLE) AS prev, "
            "       CAST(array() AS array<double>) AS out), "
            "(acc, x) -> struct("
            f"  CASE WHEN acc.prev IS NULL THEN x.__v ELSE {step} END "
            "    AS prev, "
            "  concat(acc.out, array("
            f"  CASE WHEN acc.prev IS NULL THEN x.__v ELSE {step} END"
            "  )) AS out), "
            "acc -> acc.out)"
        ),
    )
    last_o = f"__o{len(order_cols) - 1}"
    exploded = folded.select(
        "__k",
        F.posexplode(F.arrays_zip("__arr", "__ewma")).alias("__i", "__z"),
    )
    return exploded.select(
        F.col("__k").alias(key_col),
        F.col(f"__z.__arr.{last_o}").alias(order_cols[-1]),
        F.col("__z.__arr.__v").alias(value_col),
        F.col("__z.__ewma").alias("ewma"),
    )


def ewma_smooth_sql(
    table: str,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    alpha: float = 0.3,
    digits: int = 10,
) -> str:
    """The same recursion as a DuckDB RECURSIVE CTE stepping one
    row-number per iteration — identical literals, identical
    operation order, identical floor-round, so the float trajectory
    matches Spark's fold step for step."""
    scale = float(10 ** digits)
    order_by = ", ".join(order_cols)
    step = (
        f"floor((CAST({alpha} AS DOUBLE) * s.v "
        f"+ CAST({1 - alpha} AS DOUBLE) * r.ewma) * {scale} + 0.5) "
        f"/ {scale}"
    )
    return f"""
        WITH RECURSIVE seq AS (
            SELECT {key_col} AS k, {order_cols[-1]} AS o,
                   CAST({value_col} AS DOUBLE) AS v,
                   row_number() OVER (
                       PARTITION BY {key_col} ORDER BY {order_by}
                   ) AS rn
            FROM {table}
            WHERE {value_col} IS NOT NULL
              AND {key_col} IS NOT NULL
              AND {" AND ".join(f"{c} IS NOT NULL" for c in order_cols)}
        ),
        r AS (
            SELECT k, o, v, rn, v AS ewma FROM seq WHERE rn = 1
            UNION ALL
            SELECT s.k, s.o, s.v, s.rn, {step} AS ewma
            FROM r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1
        )
        SELECT k AS {key_col}, o AS {order_cols[-1]},
               v AS {value_col}, ewma
        FROM r
    """


def longest_streaks(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
) -> DataFrame:
    """Longest consecutive run of the same value per key — the
    gaps-and-islands pattern (engagement streaks, repeated-failure
    runs, state persistence).

    One shuffle on the key, then three window passes over the same
    partitioning (Spark plans ONE exchange): lag marks value
    changes, a running sum of change markers numbers the islands,
    and a (key, island) aggregation measures them. Ties between
    equal-length streaks resolve to the EARLIEST island (min island
    id) so the answer is deterministic on any engine. NULL key /
    order / value rows drop (a NULL cannot extend or break a run
    portably — engines disagree on NULL equality in lag compares).

    Returns (key, streak_len, streak_value, n_islands).
    """
    notnull = F.col(key_col).isNotNull() & F.col(value_col).isNotNull()
    for c in order_cols:
        notnull = notnull & F.col(c).isNotNull()
    w = Window.partitionBy(key_col).orderBy(*order_cols)
    marked = df.filter(notnull).select(
        key_col,
        value_col,
        F.when(
            F.lag(value_col).over(w).isNull()
            | (F.lag(value_col).over(w) != F.col(value_col)),
            1,
        )
        .otherwise(0)
        .alias("__chg"),
        *[F.col(c) for c in order_cols],
    )
    islands = marked.select(
        key_col,
        value_col,
        F.sum("__chg")
        .over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        .alias("__island"),
    )
    per_island = islands.groupBy(key_col, "__island").agg(
        F.count(F.lit(1)).alias("__len"),
        F.min(value_col).alias("__val"),  # constant within island
    )
    wk = Window.partitionBy(key_col).orderBy(
        F.col("__len").desc(), F.col("__island").asc()
    )
    return (
        per_island.withColumn("__rk", F.row_number().over(wk))
        .withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy(key_col))
        )
        .filter(F.col("__rk") == 1)
        .select(
            key_col,
            F.col("__len").alias("streak_len"),
            F.col("__val").alias("streak_value"),
            F.col("__n").alias("n_islands"),
        )
    )


def longest_streaks_sql(
    table: str,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
) -> str:
    """The same islands as DuckDB SQL — identical change markers,
    island numbering, and earliest-island tiebreak."""
    order_by = ", ".join(order_cols)
    nn = " AND ".join(
        f"{c} IS NOT NULL" for c in (key_col, value_col, *order_cols)
    )
    return f"""
        WITH marked AS (
            SELECT {key_col} AS k, {value_col} AS v, {order_by},
                   CASE WHEN lag({value_col}) OVER w IS NULL
                          OR lag({value_col}) OVER w <> {value_col}
                        THEN 1 ELSE 0 END AS chg
            FROM {table}
            WHERE {nn}
            WINDOW w AS (PARTITION BY {key_col} ORDER BY {order_by})
        ),
        islands AS (
            SELECT k, v,
                   SUM(chg) OVER (PARTITION BY k ORDER BY {order_by}
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS island
            FROM marked
        ),
        per_island AS (
            SELECT k, island, count(*) AS len, min(v) AS val
            FROM islands GROUP BY k, island
        )
        SELECT k AS {key_col},
               CAST(len AS BIGINT) AS streak_len,
               val AS streak_value,
               CAST(n AS BIGINT) AS n_islands
        FROM (
            SELECT k, len, val,
                   row_number() OVER (PARTITION BY k
                       ORDER BY len DESC, island ASC) AS rk,
                   count(*) OVER (PARTITION BY k) AS n
            FROM per_island
        ) WHERE rk = 1
    """


def holt_smooth(
    df: DataFrame,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.2,
    digits: int = 10,
) -> DataFrame:
    """Per-key Holt double exponential smoothing — EWMA's
    trend-aware sibling (level l and trend b as COUPLED recursions:
    ``l_n = α·x_n + (1−α)(l_{n−1}+b_{n−1})``,
    ``b_n = β(l_n − l_{n−1}) + (1−β)b_{n−1}``; seeds l₁=x₁, b₁=0)
    plus the one-step forecast ``l+b`` — the smoother that tracks a
    drifting series instead of lagging it.

    Same execution and determinism contract as
    :func:`ewma_smooth`: ONE shuffle, the coupled recursion folds in
    whole-stage codegen over sort_array(collect_list), both state
    components floor-rounded per step so the trajectory is
    byte-identical on any engine (the oracle binds l_n once in a
    subquery; the fold spells it twice — the same deterministic
    expression either way). NULL key/order/value rows drop.

    Returns (key, last order col, value, level, trend, forecast).
    """
    scale = float(10 ** digits)
    ordc = [F.col(c) for c in order_cols]
    notnull = F.col(value_col).isNotNull() & F.col(key_col).isNotNull()
    for c in ordc:
        notnull = notnull & c.isNotNull()
    clean = df.filter(notnull).select(
        F.col(key_col).alias("__k"),
        F.struct(
            *[c.alias(f"__o{i}") for i, c in enumerate(ordc)],
            F.col(value_col).cast("double").alias("__v"),
        ).alias("__s"),
    )
    grouped = clean.groupBy("__k").agg(
        F.sort_array(F.collect_list("__s")).alias("__arr")
    )
    rnd = f"x -> CAST(floor(x * {scale} + 0.5D) / {scale} AS DOUBLE)"
    l_new = (
        f"CAST(floor((CAST({alpha} AS DOUBLE) * x.__v "
        f"+ CAST({1 - alpha} AS DOUBLE) * (acc.l + acc.b)) "
        f"* {scale} + 0.5D) / {scale} AS DOUBLE)"
    )
    b_new = (
        f"CAST(floor((CAST({beta} AS DOUBLE) * ({l_new} - acc.l) "
        f"+ CAST({1 - beta} AS DOUBLE) * acc.b) "
        f"* {scale} + 0.5D) / {scale} AS DOUBLE)"
    )
    folded = grouped.withColumn(
        "__hw",
        F.expr(
            "aggregate(__arr, "
            "struct(CAST(NULL AS DOUBLE) AS l, CAST(0.0D AS DOUBLE) AS b, "
            "       CAST(array() AS array<struct<l:double,b:double>>) "
            "       AS out), "
            "(acc, x) -> CASE WHEN acc.l IS NULL THEN "
            "  struct(x.__v AS l, 0.0D AS b, "
            "         array(struct(x.__v AS l, 0.0D AS b)) AS out) "
            "ELSE "
            f" struct({l_new} AS l, {b_new} AS b, "
            f"        concat(acc.out, array(struct({l_new} AS l, "
            f"        {b_new} AS b))) AS out) "
            "END, "
            "acc -> acc.out)"
        ),
    )
    last_o = f"__o{len(order_cols) - 1}"
    exploded = folded.select(
        "__k",
        F.posexplode(F.arrays_zip("__arr", "__hw")).alias("__i", "__z"),
    )
    return exploded.select(
        F.col("__k").alias(key_col),
        F.col(f"__z.__arr.{last_o}").alias(order_cols[-1]),
        F.col("__z.__arr.__v").alias(value_col),
        F.col("__z.__hw.l").alias("level"),
        F.col("__z.__hw.b").alias("trend"),
        F.round(F.col("__z.__hw.l") + F.col("__z.__hw.b"), 6).alias(
            "forecast"
        ),
    )


def holt_smooth_sql(
    table: str,
    key_col: str,
    order_cols: tuple[str, ...],
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.2,
    digits: int = 10,
) -> str:
    """The coupled recursion as a DuckDB RECURSIVE CTE; ``l_new``
    binds ONCE in the recursive term's subquery so the trend update
    reads the already-rounded level (mirroring the fold's repeated
    — but identical — expression)."""
    scale = float(10 ** digits)
    order_by = ", ".join(order_cols)
    nn = " AND ".join(
        f"{c} IS NOT NULL" for c in (value_col, key_col, *order_cols)
    )
    l_new = (
        f"floor((CAST({alpha} AS DOUBLE) * s.v "
        f"+ CAST({1 - alpha} AS DOUBLE) * (r.l + r.b)) "
        f"* {scale} + 0.5) / {scale}"
    )
    return f"""
        WITH RECURSIVE seq AS (
            SELECT {key_col} AS k, {order_cols[-1]} AS o,
                   CAST({value_col} AS DOUBLE) AS v,
                   row_number() OVER (
                       PARTITION BY {key_col} ORDER BY {order_by}
                   ) AS rn
            FROM {table}
            WHERE {nn}
        ),
        r AS (
            SELECT k, o, v, rn, v AS l, CAST(0.0 AS DOUBLE) AS b
            FROM seq WHERE rn = 1
            UNION ALL
            SELECT k, o, v, rn, l_new AS l,
                   floor((CAST({beta} AS DOUBLE) * (l_new - prev_l)
                       + CAST({1 - beta} AS DOUBLE) * prev_b)
                       * {scale} + 0.5) / {scale} AS b
            FROM (
                SELECT s.k, s.o, s.v, s.rn,
                       {l_new} AS l_new, r.l AS prev_l, r.b AS prev_b
                FROM r JOIN seq s ON s.k = r.k AND s.rn = r.rn + 1
            )
        )
        SELECT k AS {key_col}, o AS {order_cols[-1]},
               v AS {value_col}, l AS level, b AS trend,
               round(l + b, 6) AS forecast
        FROM r
    """
