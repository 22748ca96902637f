"""Behavioral analytics plans: ordered event funnels and cohort
retention.

The reference aggregates contribution events per cycle/entity
(``pac_data_processor.py:347-360``) but never sequences them; funnel
and cohort analysis are the canonical next questions over the same
event stream, expressed here with the shuffle budget stated up
front:

- the funnel is |stages| small per-user aggregations chained by
  equi-joins on the user key — every shuffle is on ``user_id``, so
  the per-user frames stay co-partitioned and AQE collapses the
  exchanges between stages;
- cohort retention is two per-user aggregations joined on the user
  key and one final (cohort, offset) rollup — no window, no
  self-join of the raw stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Strictly-ordered funnel: a user converts stage *i* only with
    an event of that type at/after their stage *i-1* conversion
    time. Returns one row per stage: (``stage`` index+name,
    ``n_users``).

    ONE scan + ONE user-key shuffle for the whole funnel: the
    per-stage conversion times are chained conditional window
    minimums over the same ``partitionBy(user)`` — ``t_i = min(ts
    WHERE type = stage_i AND ts >= t_{i-1}) OVER user`` — so every
    Window operator shares one exchange and one sort. (The previous
    shape — per-stage filtered min-agg joined to the prior stage —
    scanned the stream once per stage and shuffled per stage:
    2·|stages| more passes with identical semantics.) The per-user
    times then collapse via a same-key groupBy (no new exchange)
    and one stack() into (stage, stage_name, n_users) rows.
    """
    from pyspark.sql import Window

    if not stages:
        raise ValueError("funnel needs at least one stage")
    ev = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    w = Window.partitionBy(user_col)
    prev = None
    for i, stage in enumerate(stages, start=1):
        hit = F.col(type_col) == stage
        if prev is not None:
            hit = hit & (F.col(ts_col) >= F.col(prev))
        cur = f"__t{i}"
        ev = ev.withColumn(
            cur, F.min(F.when(hit, F.col(ts_col))).over(w)
        )
        prev = cur
    per_user = ev.groupBy(user_col).agg(
        *[
            F.first(f"__t{i}").alias(f"__t{i}")
            for i in range(1, len(stages) + 1)
        ]
    )
    wide = per_user.agg(
        *[
            F.count(f"__t{i}").alias(f"__n{i}")
            for i in range(1, len(stages) + 1)
        ]
    )
    pairs = ", ".join(
        f"{i}, '{stage}', __n{i}" for i, stage in enumerate(stages, start=1)
    )
    return wide.selectExpr(
        f"stack({len(stages)}, {pairs}) AS (stage, stage_name, n_users)"
    ).select(
        "stage", "stage_name", F.col("n_users").cast("bigint").alias("n_users")
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    grain: str = "month",
) -> DataFrame:
    """Cohort retention: users grouped by first-activity period
    (``grain``: 'month' or 'week'); for each (cohort, period_offset)
    the number of distinct users active that many periods later.

    Period arithmetic is integer (year*12+month, or epoch-days // 7)
    so the offset is exact on any engine — no interval /
    months_between float edge cases. Two shuffles on the user key
    (first-period agg + distinct activity periods) and one on the
    small (cohort, offset) pair.
    """
    ev = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    if grain == "month":
        period = (F.year(ts_col) * 12 + F.month(ts_col) - 1).alias("p")
        label = F.concat_ws(
            "-",
            F.floor(F.col("p0") / 12).cast("string"),
            F.lpad((F.col("p0") % 12 + 1).cast("string"), 2, "0"),
        )
    elif grain == "week":
        period = F.floor(
            F.datediff(F.to_date(ts_col), F.lit("1970-01-01")) / 7
        ).alias("p")
        label = F.date_format(
            F.date_add(
                F.to_date(F.lit("1970-01-01")),
                (F.col("p0") * 7).cast("int"),
            ),
            "yyyy-MM-dd",
        )
    else:
        raise ValueError(f"unsupported grain: {grain!r}")
    first = ev.groupBy(user_col).agg(F.min(period).alias("p0"))
    active = ev.select(F.col(user_col), period).distinct()
    return (
        active.join(first, user_col)
        .groupBy(
            label.alias("cohort"),
            (F.col("p") - F.col("p0")).alias("period_offset"),
        )
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )
