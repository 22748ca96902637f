"""MERGE upsert semantics (null-valued updates, insert/keep/update
classification, key uniqueness hazard) and the training-corpus
pipeline's stage composition."""

import pytest
from pyspark.sql import functions as F

from pac_data_pipeline_spark.operators.merge import merge_upsert


def test_merge_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, name string, bal double"
    )
    source = spark.createDataFrame(
        [(2, 99.0), (3, 30.0)], "k long, bal double"
    )
    out = {r.k: r for r in merge_upsert(
        target, source, key_cols=("k",), update_cols=("bal",)
    ).collect()}
    assert (out[1].bal, out[1].merge_action) == (10.0, "keep")
    assert (out[2].bal, out[2].merge_action) == (99.0, "update")
    assert (out[3].bal, out[3].merge_action) == (30.0, "insert")
    # non-update target payload persists on update, is null on insert
    assert out[2].name == "b" and out[3].name is None


def test_merge_null_source_value_still_updates(spark):
    """A legitimately-null source value must overwrite (marker-based
    presence), not silently keep the target value."""
    target = spark.createDataFrame([(1, 10.0)], "k long, bal double")
    source = spark.createDataFrame([(1, None)], "k long, bal double")
    row = merge_upsert(
        target, source, key_cols=("k",), update_cols=("bal",)
    ).collect()[0]
    assert row.merge_action == "update"
    assert row.bal is None


def test_merge_rejects_unknown_update_col(spark):
    target = spark.createDataFrame([(1, 1.0)], "k long, bal double")
    with pytest.raises(ValueError, match="update col"):
        merge_upsert(target, target, ("k",), ("nope",))


def test_train_corpus_pipeline_stages_compose(spark):
    from pac_data_pipeline_spark.plans.pipelines import (
        train_corpus_pipeline,
    )

    out = train_corpus_pipeline(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert out.columns == [
        "doc_id", "lang_guess", "quality_score", "n_chars", "n_hits"
    ]
    # every survivor satisfies every stage's predicate
    assert all(r.lang_guess == "en" for r in rows)
    assert all(r.quality_score >= 0.40 for r in rows)
    assert all(r.n_hits == 0 for r in rows)
    # eval-set members (doc_id % 20 == 0) are self-contaminated by
    # construction and can never survive
    assert all(r.doc_id % 20 != 0 for r in rows)


def test_merge_upsert_latest_stale_rows_lose(spark):
    from pac_data_pipeline_spark.operators.merge import (
        merge_upsert_latest,
    )

    target = spark.createDataFrame(
        [(1, 10.0, 100), (2, 20.0, 200), (4, 40.0, None)],
        "k long, bal double, ver long",
    )
    source = spark.createDataFrame(
        [(1, 99.0, 150),   # newer → update
         (2, 88.0, 50),    # STALE → keep target values
         (3, 30.0, 300),   # new key → insert
         (4, 44.0, 400)],  # target has null version → update
        "k long, bal double, ver long",
    )
    out = {r.k: r for r in merge_upsert_latest(
        target, source, ("k",), ("bal",), "ver"
    ).collect()}
    assert (out[1].bal, out[1].ver, out[1].merge_action) == (99.0, 150, "update")
    assert (out[2].bal, out[2].ver, out[2].merge_action) == (20.0, 200, "keep")
    assert (out[3].bal, out[3].ver, out[3].merge_action) == (30.0, 300, "insert")
    assert (out[4].bal, out[4].ver, out[4].merge_action) == (44.0, 400, "update")


def test_merge_upsert_latest_replay_is_idempotent(spark):
    from pac_data_pipeline_spark.operators.merge import (
        merge_upsert_latest,
    )

    base = spark.createDataFrame(
        [(1, 1.0, 10), (2, 2.0, 20)], "k long, bal double, ver long"
    )
    wave = spark.createDataFrame(
        [(1, 5.0, 30)], "k long, bal double, ver long"
    )
    once = merge_upsert_latest(base, wave, ("k",), ("bal",), "ver") \
        .drop("merge_action")
    twice = merge_upsert_latest(once, wave, ("k",), ("bal",), "ver")
    got = {r.k: (r.bal, r.ver, r.merge_action) for r in twice.collect()}
    # replaying the same wave changes nothing: versions equal → keep
    assert got == {1: (5.0, 30, "keep"), 2: (2.0, 20, "keep")}


def test_streaming_cdc_merge_matches_batch_argmax(spark):
    import pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pac_data_pipeline_spark.sources.readers import load_events
    from pac_data_pipeline_spark.streaming.cdc import (
        run_streaming_cdc_merge,
    )

    sf_dir = "/root/testdata/sf0.001"
    try:
        state = run_streaming_cdc_merge(spark, sf_dir).collect()
    except Exception as exc:  # pragma: no cover
        pytest.skip(f"streaming unavailable: {exc}")
    e = load_events(spark, sf_dir).filter(
        (F.col("event_type") == "purchase")
        & F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    batch = (
        e.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", F.round("value", 2).alias("value"),
                F.col("ts").alias("version_ts"), "event_id")
        .collect()
    )
    assert sorted(map(tuple, state)) == sorted(map(tuple, batch))
