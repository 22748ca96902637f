"""Source/sink scale behavior: partitioned parquet layout enables
partition pruning on read-back (the K4 'nested path' tree as a
directory layout), CSV scan round-trips schema, and the dry-run
plan preview works without side effects."""

from __future__ import annotations

from pyspark.sql import functions as F

from pac_data_pipeline_spark.sinks.documents import dry_run, write_parquet
from pac_data_pipeline_spark.sources.readers import scan_csv, table_exists

SF = "/root/testdata/sf0.001"


def plan(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_partitioned_write_prunes_on_readback(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("cycle"),
    )
    out = str(tmp_path / "by_cycle")
    write_parquet(orders, out, partition_by=("cycle",))

    back = spark.read.parquet(out).filter(F.col("cycle") == 1996)
    p = plan(back)
    # the cycle predicate must prune directories, not scan+filter
    assert "PartitionFilters" in p, p
    pf_line = next(ln for ln in p.splitlines() if "PartitionFilters" in ln)
    assert "cycle" in pf_line, p
    assert back.count() == orders.filter(F.col("cycle") == 1996).count()


def test_csv_scan_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a b", 1.5), (2, " c ", None)],
        "id long, name string, amount double",
    )
    out = str(tmp_path / "csv")
    src.write.option("header", True).mode("overwrite").csv(out)
    back = scan_csv(spark, out)
    assert set(back.columns) == {"id", "name", "amount"}
    assert back.count() == 2
    # inferSchema recovers numeric types
    dtypes = dict(back.dtypes)
    assert dtypes["id"] in ("int", "bigint")
    assert dtypes["amount"] == "double"


def test_dry_run_no_side_effects(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    info = dry_run(df, n=3)
    assert len(info["sample"]) == 3
    assert info["count"] == df.count()
    assert "Physical Plan" in info["plan"]


def test_table_exists_probe(spark):
    spark.read.parquet(f"{SF}/region.parquet").createOrReplaceTempView(
        "probe_region"
    )
    assert table_exists(spark, "probe_region")
    assert not table_exists(spark, "no_such_table")


def test_verify_write_readback(spark, tmp_path):
    from pac_data_pipeline_spark.sinks.documents import verify_write

    df = spark.read.parquet(f"{SF}/region.parquet")
    out = str(tmp_path / "verify")
    write_parquet(df, out)
    res = verify_write(spark, out, df.count())
    assert res["ok"] and res["actual"] == res["expected"]
    assert not verify_write(spark, out, df.count() + 1)["ok"]
