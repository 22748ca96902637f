"""End-to-end pipeline compositions (SURVEY §3).

Each reference ``main()`` becomes one lazy DataFrame plan — scan →
clean → derive → aggregate → join → (sink), handed to Catalyst as a
whole so pushdown/pruning/broadcast decisions see every stage.

The synthetic star schema stands in for the PAC domain (FIXTURES.md
§4): lineitem = contributions detail, l_extendedprice =
receipt_amount, o_orderpriority = committee_name (keyword
classification target), year(o_orderdate) = election_cycle,
supplier = the brand-lookup dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pac_data_pipeline_spark.functions.cleaning import clean, with_metadata
from pac_data_pipeline_spark.functions.scalar import (
    bin_amount,
    composite_key,
    party_label,
)
from pac_data_pipeline_spark.operators.aggregates import conditional_party_rollup
from pac_data_pipeline_spark.operators.dedup import dedup_keep_first
from pac_data_pipeline_spark.operators.joins import dim_lookup
from pac_data_pipeline_spark.sources.readers import scan_parquet

#: Keyword sets for classifying o_orderpriority, exercising the
#: reference's ordered keyword matching (pac_snowflake_realtime.py:
#: 103-113): first branch tested first; no match → row skipped.
PRIORITY_REP = ("urgent", "high")
PRIORITY_DEM = ("medium", "low")


def party_rollup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (SURVEY §3.3): filtered scan → keyword classify →
    conditional pivot agg per (supplier, cycle) → HAVING → broadcast
    dim lookup.

    Physical shape: parquet scans with the amount filter pushed
    down; one shuffle for the lineitem⋈orders join (both sides
    hash-partitioned on orderkey); partial+final hash agg for the
    rollup (one more shuffle, on the group key); broadcast hash join
    for the 10-row supplier dim — the fact side never moves for it.
    """
    li = scan_parquet(spark, f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_extendedprice") > 0
    )
    orders = scan_parquet(spark, f"{sf_dir}/orders.parquet")
    supplier = scan_parquet(spark, f"{sf_dir}/supplier.parquet")

    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_suppkey",
        "l_extendedprice",
        party_label(
            "o_orderpriority",
            republican_keywords=PRIORITY_REP,
            democrat_keywords=PRIORITY_DEM,
        ).alias("party"),
        F.year("o_orderdate").cast("bigint").alias("cycle"),
    )
    rolled = conditional_party_rollup(
        joined.filter(F.col("party").isNotNull()),
        group_keys=("l_suppkey", "cycle"),
        party_col="party",
        amount_col="l_extendedprice",
    )
    return (
        dim_lookup(rolled, supplier, on=rolled.l_suppkey == supplier.s_suppkey)
        .select(
            F.col("s_name").alias("brand"),
            "cycle",
            F.round("democrat_total", 2).alias("democrat_total"),
            F.round("republican_total", 2).alias("republican_total"),
        )
    )


def csv_report_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§3.1 shape: scan → clean → derive (bin + composite key) →
    dedup keep-first. Returns the cleaned, deduplicated detail set
    the reference would upload; report aggregates run as separate
    actions over it (see __spark_entry__ queries)."""
    orders = scan_parquet(spark, f"{sf_dir}/orders.parquet")
    derived = (
        clean(orders)
        .withColumn("amount_category", bin_amount("o_totalprice"))
        .withColumn(
            "business_key",
            composite_key("o_custkey", "o_orderstatus", "o_totalprice"),
        )
    )
    return dedup_keep_first(
        derived, key_cols=("business_key",), order_cols=("o_orderkey",)
    )


def snowflake_batch_pipeline(
    spark: SparkSession, sf_dir: str, n_shards: int = 32
) -> DataFrame:
    """§3.2 shape: SQL scan through Catalyst → generic clean →
    dedup → shard assignment. The reference slices pandas frames
    into 1000-row upload batches (pac_snowflake_pipeline.py:163-207);
    distributed, rows get a deterministic hash shard (no global
    order, no single-partition window — the one shuffle in this plan
    is the dedup's, on the business key) and the sink enforces the
    per-request row cap by chunking inside
    ``foreach_partition_write``. The global-row_number variant lives
    on in ``with_batch_id`` for the K3 oracle query."""
    from pac_data_pipeline_spark.sinks.documents import with_upload_shard

    li = scan_parquet(spark, f"{sf_dir}/lineitem.parquet")
    cleaned = clean(li)
    # price + quantity as final tiebreaks: keep-first must totally
    # order every emitted column or the winner is engine-dependent
    # on payload-distinct ties (skew-clone find; both are the
    # CLEANED null→0.0 values, mirrored by the oracle)
    deduped = dedup_keep_first(
        cleaned,
        key_cols=("l_orderkey", "l_linenumber"),
        order_cols=(
            "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity",
        ),
    )
    sharded = with_upload_shard(
        deduped, key_cols=("l_orderkey", "l_linenumber"), n_shards=n_shards
    )
    return with_metadata(sharded, data_source="snowflake", record_type="pac_contribution")


def train_corpus_pipeline(
    spark: SparkSession,
    sf_dir: str,
    quality_min: float = 0.40,
    lang: str = "en",
    eval_mod: int = 20,
    ngram_n: int = 4,
) -> DataFrame:
    """The LLM-training-data prep chain as ONE lazy plan:
    quality filter → language filter → exact dedup → benchmark
    decontamination → training-ready manifest.

    Stage shapes (total: two shuffles touch the corpus):
    - quality + language are scan-stage column expressions
      (`ext.text.quality_parts` / `lang_parts`) — filters compose
      into the parquet scan, no joins against score frames;
    - exact dedup is one window on sha256(text) over the already-
      filtered survivors (filter-before-dedup: identical texts have
      identical scores, so the orders commute, and the shuffle
      carries only kept rows);
    - decontamination explodes survivors to ``ngram_n``-grams and probes the
      BROADCAST eval n-gram set (built from the full corpus, doc_id
      % eval_mod == 0 — the benchmark exists independently of the
      filters), then the flag frame joins back on doc_id.

    Returns (doc_id, lang_guess, quality_score, n_chars, n_hits) for
    the clean survivors — the manifest a downstream tokenizer run
    would consume.
    """
    from pac_data_pipeline_spark.ext.dedup_text import (
        decontaminate,
        exact_dedup,
    )
    from pac_data_pipeline_spark.ext.text import lang_parts, quality_parts

    docs = scan_parquet(spark, f"{sf_dir}/documents.parquet")
    _, score = quality_parts("text")
    _, guess = lang_parts("text")
    scored = docs.select(
        "doc_id",
        "text",
        "n_chars",
        F.round(score, 6).alias("quality_score"),
        guess.alias("lang_guess"),
    )
    kept = scored.filter(
        (F.col("quality_score") >= quality_min)
        & (F.col("lang_guess") == lang)
    )
    # stage boundary: the dedup survivors feed THREE consumers
    # (decontamination's gram explode, its doc-id spine, and the
    # final manifest join) — un-materialized, Catalyst re-ran the
    # full filter+sha256-window chain per consumer (4 corpus
    # FileScans). In production this boundary is a parquet write
    # between pipeline stages; in one-plan form it's a
    # localCheckpoint of the kept subset.
    deduped = exact_dedup(kept).localCheckpoint()
    eval_set = docs.filter(F.col("doc_id") % eval_mod == 0)
    flags = decontaminate(deduped, eval_set, n=ngram_n)
    return (
        deduped.join(flags, "doc_id")
        .filter(~F.col("contaminated"))
        .select(
            "doc_id", "lang_guess", "quality_score", "n_chars", "n_hits"
        )
    )


def partitioned_layout_pipeline(
    spark: SparkSession,
    sf_dir: str,
    year: int = 1997,
    base_dir: str | None = None,
) -> DataFrame:
    """Partitioned-warehouse round trip: write orders hive-
    partitioned by order year, read back with a partition-key
    filter, aggregate.

    This is the layout decision that matters most at 100 TB: a
    year-partitioned table turns the read-back's ``o_year = 1997``
    into PARTITION PRUNING — Spark lists only that year's directory
    and the other years are never opened (the plan shows it under
    PartitionFilters, pinned in tests/test_plans.py). The write side
    repartitions by the partition column first so each output
    directory is written by as few tasks as possible (small-file
    control: without it, every task writes a sliver of every year).
    """
    import tempfile

    out = base_dir or tempfile.mkdtemp(prefix="orders_by_year_")
    orders = scan_parquet(spark, f"{sf_dir}/orders.parquet")
    with_year = orders.withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    (
        with_year.repartition("o_year")
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(out)
    )
    # declared read-back schema: robust to an empty write (no data
    # files to infer from) and the right habit anyway — inference
    # costs a footer pass and can widen types
    back = (
        spark.read.schema(with_year.schema)
        .parquet(out)
        .filter(F.col("o_year") == year)
    )
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )
