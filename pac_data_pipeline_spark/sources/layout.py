"""Warehouse layout policy — the storage-side half of the 100 TB
design.

A table's physical layout decides which query costs disappear before
any optimizer runs: partition columns turn predicates into directory
pruning, bucketing turns repeated equi-joins/aggregations into
shuffle-free plans, and file sizing bounds scan-task skew. This
module makes the per-table policy explicit and executable instead of
folklore.

Policy rationale per table (star schema, TESTDATA.md):
* lineitem / orders — bucketed on the orderkey: the fact⋈fact join
  on orderkey is the single biggest shuffle in the workload (every
  §3.3-shaped rollup pays it); equal bucket counts delete it.
  Sorted within buckets for merge-join without an extra sort.
* events — partitioned by event date: every windowed/streaming query
  is time-bounded, so date predicates prune directories; within a
  day, rows cluster by arrival which matches the access pattern.
* documents / embeddings — plain columnar with bounded file size:
  dedup/similarity scans are full-corpus by nature, so partitioning
  buys nothing; what matters is parallelism (file count ≥ cores) and
  column pruning (never read `text`/`embedding` unless used).
* dims (region nation customer supplier part) — single files; they
  broadcast or AQE-broadcast anyway.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pac_data_pipeline_spark.sources.readers import (
    load_events,
    save_bucketed,
    scan_parquet,
)


@dataclass(frozen=True)
class TableLayout:
    partition_cols: tuple[str, ...] = ()
    bucket_cols: tuple[str, ...] = ()
    n_buckets: int = 0
    sort_cols: tuple[str, ...] = ()
    derive: dict = field(default_factory=dict)  # col -> Column builder


WAREHOUSE_LAYOUTS: dict[str, TableLayout] = {
    "lineitem": TableLayout(
        bucket_cols=("l_orderkey",), n_buckets=32, sort_cols=("l_orderkey",)
    ),
    "orders": TableLayout(
        bucket_cols=("o_orderkey",), n_buckets=32, sort_cols=("o_orderkey",)
    ),
    "events": TableLayout(
        partition_cols=("event_date",),
        derive={"event_date": lambda df: F.to_date("ts")},
    ),
    "documents": TableLayout(),
    "embeddings": TableLayout(),
}


def materialize_warehouse(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    tables: tuple[str, ...] = ("lineitem", "orders", "events"),
    bucket_scale: int = 1,
) -> dict[str, str]:
    """Write the given tables under their declared layouts.

    ``bucket_scale`` multiplies bucket counts (32 suits local tests;
    at 100 TB size buckets so one bucket ≈ a few GB — e.g. 4096 for
    a 10 TB fact). Returns table → path/name."""
    written: dict[str, str] = {}
    for name in tables:
        layout = WAREHOUSE_LAYOUTS.get(name, TableLayout())
        df = (
            load_events(spark, sf_dir)
            if name == "events"
            else scan_parquet(spark, f"{sf_dir}/{name}.parquet")
        )
        for col, builder in layout.derive.items():
            df = df.withColumn(col, builder(df))
        if layout.bucket_cols:
            table_name = f"{name}_w"
            save_bucketed(
                df,
                table_name,
                f"{out_dir}/{name}",
                layout.bucket_cols,
                layout.n_buckets * bucket_scale,
                sort_cols=layout.sort_cols,
            )
            written[name] = table_name
        else:
            writer = df.write.mode("overwrite")
            if layout.partition_cols:
                writer = writer.partitionBy(*layout.partition_cols)
            writer.parquet(f"{out_dir}/{name}")
            written[name] = f"{out_dir}/{name}"
    return written


def read_warehouse_table(
    spark: SparkSession, written: dict[str, str], name: str
) -> DataFrame:
    """Read a materialized table back (bucketed tables via catalog,
    partitioned/plain via path)."""
    ref = written[name]
    if ref.endswith("_w"):
        return spark.table(ref)
    return spark.read.parquet(ref)
