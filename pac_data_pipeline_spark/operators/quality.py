"""Declarative data-quality checks (deequ/dbt-test-style).

A pipeline that feeds a training run needs machine-checkable gates
between stages: key uniqueness, referential integrity, null rates,
value ranges. Each check compiles to a small aggregate; the report
is the union of one-row summaries, so the whole suite is a handful
of partial-aggregated scans — no check ever materializes the
violating rows unless explicitly asked.

Scale notes: every check is a map-side-combinable aggregate (count /
count-distinct / conditional count). The FK check is a broadcast
anti-join when the parent side is dimension-sized; Spark picks
shuffle-hash automatically past the broadcast threshold. Checks on
the same table share one scan when composed via ``dq_report`` since
each emits an independent 1-row aggregate — Catalyst can't fuse
across unions, but each branch reads only its needed columns
(column pruning keeps the I/O per check minimal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_unique(df: DataFrame, cols: tuple[str, ...], name: str) -> DataFrame:
    """Violations = total rows − distinct key rows (0 ⇒ the columns
    form a key)."""
    return df.agg(
        (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("bigint")
        .alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def check_not_null(df: DataFrame, col: str, name: str) -> DataFrame:
    """Violations = rows where ``col`` IS NULL."""
    return df.agg(
        F.sum(F.col(col).isNull().cast("int")).cast("bigint").alias(
            "n_violations"
        )
    ).select(F.lit(name).alias("check_name"), "n_violations")


def check_in_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str
) -> DataFrame:
    """Violations = non-null values outside [lo, hi]."""
    bad = F.col(col).isNotNull() & (
        (F.col(col) < lo) | (F.col(col) > hi)
    )
    return df.agg(
        F.sum(bad.cast("int")).cast("bigint").alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def check_accepted_values(
    df: DataFrame, col: str, allowed: tuple, name: str
) -> DataFrame:
    """Violations = non-null values outside the allowed set."""
    bad = F.col(col).isNotNull() & ~F.col(col).isin(list(allowed))
    return df.agg(
        F.sum(bad.cast("int")).cast("bigint").alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def check_referential(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str,
) -> DataFrame:
    """Violations = child rows whose non-null key has no parent row
    (anti-join; broadcast when the parent is dimension-sized)."""
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )
    return orphans.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def check_expression(df: DataFrame, bad: Column, name: str) -> DataFrame:
    """Generic check: violations = rows where ``bad`` is true."""
    return df.agg(
        F.sum(bad.cast("int")).cast("bigint").alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def dq_report(checks: list[DataFrame]) -> DataFrame:
    """Union the one-row check summaries into a (check_name,
    n_violations, passed) report."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.select(
        "check_name",
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
    )


# -- single-pass fusion -------------------------------------------------------


def viol_unique(*cols: str) -> Column:
    """Violation-count aggregate: rows − distinct keys."""
    return F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in cols])


def viol_not_null(col: str) -> Column:
    return F.sum(F.col(col).isNull().cast("int"))


def viol_in_range(col: str, lo: float, hi: float) -> Column:
    bad = F.col(col).isNotNull() & ((F.col(col) < lo) | (F.col(col) > hi))
    return F.sum(bad.cast("int"))


def viol_accepted_values(col: str, allowed: tuple) -> Column:
    bad = F.col(col).isNotNull() & ~F.col(col).isin(list(allowed))
    return F.sum(bad.cast("int"))


def viol_expression(bad: Column) -> Column:
    return F.sum(bad.cast("int"))


def fused_checks(df: DataFrame, specs: list[tuple[str, Column]]) -> DataFrame:
    """Every same-table check in ONE partial-aggregated scan.

    ``dq_report``'s union shape reads the table once per check
    (Catalyst cannot fuse aggregates across a union); at 100 TB
    that multiplies the I/O by the number of checks. Here each
    spec is (name, violation-count AGGREGATE expression — the
    ``viol_*`` builders), all evaluated in a single wide aggregate,
    then unpivoted with ``stack`` into the same (check_name,
    n_violations) rows ``dq_report`` consumes. Cross-table checks
    (referential integrity) stay separate by nature."""
    row = df.agg(
        *[
            expr.cast("bigint").alias(f"c{i}")
            for i, (_, expr) in enumerate(specs)
        ]
    )
    pairs = ", ".join(f"'{name}', c{i}" for i, (name, _) in enumerate(specs))
    return row.selectExpr(
        f"stack({len(specs)}, {pairs}) AS (check_name, n_violations)"
    )
