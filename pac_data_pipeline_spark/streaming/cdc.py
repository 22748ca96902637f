"""Streaming CDC: foreachBatch + conditional MERGE.

The pattern every lakehouse ingestion job runs: a stream of change
events lands in micro-batches; each batch reduces to its latest row
per key and conditionally merges into the materialized state
(update only if newer). This is what `MERGE INTO` inside
``foreachBatch`` does against Delta/Iceberg — expressed here
against an in-session state table so the merge logic itself
(`operators.merge.merge_upsert_latest`) is the tested artifact.

Idempotence comes from the version guard, not the sink: replaying a
batch cannot regress state, so the pipeline tolerates at-least-once
delivery — the property that makes checkpoint recovery safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pac_data_pipeline_spark.operators.merge import merge_upsert_latest
from pac_data_pipeline_spark.streaming.windows import events_stream

STATE_SCHEMA = (
    "user_id long, value double, version_ts timestamp, event_id long"
)


def latest_per_user(batch: DataFrame) -> DataFrame:
    """Reduce a change batch to its newest row per user
    (ts, event_id tiebreak) — the per-batch dedup that keeps the
    merge's source key-unique."""
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "user_id",
            F.round("value", 2).alias("value"),
            F.col("ts").alias("version_ts"),
            "event_id",
        )
    )


def run_streaming_cdc_merge(
    spark: SparkSession,
    sf_dir: str,
    event_type: str = "purchase",
) -> DataFrame:
    """Drive the purchase-event stream through foreachBatch →
    latest-per-user → conditional merge, returning the final
    materialized state (latest value per user).

    State is carried across batches as a localCheckpoint-ed
    DataFrame (truncated lineage, reclaimed by the ContextCleaner);
    a production job would swap the state table for a Delta MERGE
    with the identical `merge_upsert_latest` semantics. The final
    state equals 'latest change per key' no matter how the stream
    was batched — hash-checked against that batch oracle.
    """
    raw = events_stream(spark, sf_dir)
    changes = (
        raw
        .filter(
            (F.col("event_type") == event_type)
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
    )
    state = {"df": spark.createDataFrame([], STATE_SCHEMA)}

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        incoming = latest_per_user(batch_df)
        merged = merge_upsert_latest(
            state["df"],
            incoming,
            key_cols=("user_id",),
            update_cols=("value", "event_id"),
            version_col="version_ts",
        ).drop("merge_action")
        state["df"] = merged.localCheckpoint()

    query = (
        changes.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return state["df"]
