"""Multi-join analytic queries over the star schema (TPC-H-pattern
Q3/Q5/Q6/Q10/Q14 shapes adapted to the reduced testdata columns).

These exercise the join planner the way a reference user's ad-hoc
SQL would: selective dimension filters, multi-way fact joins,
conditional aggregation, top-k on an aggregate.

Scale notes (100 TB):
* nation/region are FIXED-SIZE dims (25/5 rows) → always
  `F.broadcast`; customer/supplier/part scale with the data → left
  to AQE, which broadcasts when the filtered side fits and
  shuffle-joins otherwise. Hard-coding broadcast there would OOM a
  1000-executor run.
* every pipeline filters and projects before its first join so the
  scan pushes predicates/columns down and the shuffles carry only
  the join keys + measures.
* top-k = orderBy(limit) → TakeOrderedAndProject: per-partition
  heaps, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pac_data_pipeline_spark.sources.readers import scan_parquet


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return scan_parquet(spark, f"{sf_dir}/{name}.parquet")


def shipping_priority(
    spark: SparkSession,
    sf_dir: str,
    segment: str = "BUILDING",
    cutoff: str = "1998-01-01",
    k: int = 10,
) -> DataFrame:
    """Q3 shape: revenue of not-yet-shipped lineitems for orders
    from one market segment, top-k orders. Orders/customer are
    filtered before the fact join; the limit runs as
    TakeOrderedAndProject on (rounded revenue, key) so ties are
    deterministic cross-engine."""
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == segment)
        .select("c_custkey")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(k)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").alias(
                "order_date"
            ),
        )
    )


def local_supplier_volume(
    spark: SparkSession,
    sf_dir: str,
    region: str = "ASIA",
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
) -> DataFrame:
    """Q5 shape: revenue by nation where customer and supplier share
    the nation, one region, one order year. The 5-row region and
    25-row nation dims collapse to ≤25 rows and broadcast into
    supplier; the customer⋈supplier co-nation constraint rides the
    fact join condition."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == region)
    n = _t(spark, sf_dir, "nation")
    nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= year_start) & (F.col("o_orderdate") < year_end)
        )
        .select("o_orderkey", "o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def revenue_forecast(
    spark: SparkSession,
    sf_dir: str,
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """Q6 shape: pure scan-filter-aggregate — every predicate pushes
    to the parquet scan, zero shuffles before the single-row final
    agg."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= year_start)
            & (F.col("l_shipdate") < year_end)
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def returned_items(
    spark: SparkSession,
    sf_dir: str,
    quarter_start: str = "1996-01-01",
    quarter_end: str = "1996-04-01",
    k: int = 20,
) -> DataFrame:
    """Q10 shape: revenue lost to returns per customer for one order
    quarter, top-k customers, nation name via fixed-dim broadcast."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= quarter_start)
            & (F.col("o_orderdate") < quarter_end)
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # per-term products are IEEE-identical across engines; summing
    # them as decimal(18,4) makes the aggregate exact, so a revenue
    # that lands on a .xx5 rounding boundary can't flip between
    # engines (plain double sums differ in the last bits with
    # summation order).
    rev_term = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(rev_term), 2).cast("double").alias("revenue"),
            F.round(F.max("c_acctbal"), 2).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(k)
    )


def promo_revenue_share(
    spark: SparkSession,
    sf_dir: str,
    month_start: str = "1997-03-01",
    month_end: str = "1997-04-01",
) -> DataFrame:
    """Q14 shape: % of revenue from promo parts in one ship month.
    The ratio is taken over per-side ROUNDED sums so both engines
    divide identical operands (distributed float summation order
    would otherwise jitter the last bits)."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= month_start) & (F.col("l_shipdate") < month_end)
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sums = (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0)), 2)
            .alias("promo_rev"),
            F.round(F.sum(rev), 2).alias("total_rev"),
        )
    )
    return sums.select(
        "promo_rev",
        "total_rev",
        F.round(100.0 * F.col("promo_rev") / F.col("total_rev"), 6).alias(
            "promo_share_pct"
        ),
    )
