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
    NULL state or order are dropped; each key's first event has no
    predecessor and contributes nothing.

    Scale shape: ONE window shuffle on the key builds every lag
    pair, then a (prev, state) hash aggregation with map-side
    partials (shuffle volume = |state pairs|, not events); the
    per-prev totals ride a tiny window over the |states|²-row
    aggregate, not the event stream.
    """
    seq = df.filter(
        F.col(state_col).isNotNull() & F.col(order_col).isNotNull()
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
        F.round(
            F.col("n") / F.sum("n").over(tot), digits
        ).alias("p"),
    )
