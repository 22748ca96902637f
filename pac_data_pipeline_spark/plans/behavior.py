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

    Stage 1 is a filtered min-aggregation; each later stage filters
    its event type, joins the previous per-user conversion times
    (equi-join on the user key — per-user frames are tiny relative
    to the stream and stay co-partitioned), keeps events at/after
    the prior time, and min-aggregates again. Cost: |stages| single-
    key shuffles over progressively shrinking frames; the raw stream
    is scanned once per stage with the type filter pushed to the
    scan. The final counts are single-row aggregates unioned driver-
    free.
    """
    if not stages:
        raise ValueError("funnel needs at least one stage")
    ev = events.filter(
        F.col(user_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    converted = (
        ev.filter(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_prev"))
    )
    counts = [
        converted.agg(
            F.lit(1).alias("stage"),
            F.lit(stages[0]).alias("stage_name"),
            F.count(F.lit(1)).alias("n_users"),
        )
    ]
    for i, stage in enumerate(stages[1:], start=2):
        converted = (
            ev.filter(F.col(type_col) == stage)
            .join(converted, user_col)
            .filter(F.col(ts_col) >= F.col("t_prev"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t_prev"))
        )
        counts.append(
            converted.agg(
                F.lit(i).alias("stage"),
                F.lit(stage).alias("stage_name"),
                F.count(F.lit(1)).alias("n_users"),
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


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
