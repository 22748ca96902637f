"""Profiling operator semantics: null/distinct accounting, string-
cast ranges, the single-scan plan property, and the corpus report
card's aggregation."""

from pac_data_pipeline_spark.ext.text import corpus_report
from pac_data_pipeline_spark.operators.profile import profile_columns


def test_profile_counts_nulls_distinct_range(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (3, "a", 2.5), (None, "c", 2.5)],
        "id long, s string, v double",
    )
    prof = {r.column: r for r in profile_columns(df).collect()}
    assert set(prof) == {"id", "s", "v"}
    assert all(r.n_rows == 4 for r in prof.values())
    assert (prof["id"].n_null, prof["id"].n_distinct) == (1, 3)
    assert (prof["s"].n_null, prof["s"].n_distinct) == (0, 3)
    assert (prof["v"].n_null, prof["v"].n_distinct) == (1, 2)
    assert (prof["id"].min_value, prof["id"].max_value) == ("1", "3")
    assert (prof["v"].min_value, prof["v"].max_value) == ("1.5", "2.5")


def test_profile_is_single_scan(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    plan = profile_columns(df)._jdf.queryExecution() \
        .executedPlan().toString()
    # multi-distinct goes through ONE Expand over one scan, never a
    # per-column union of scans
    assert plan.count("Scan ExistingRDD") <= 1
    assert "Union" not in plan


def test_profile_approx_mode_still_covers_columns(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(100)],
                               "id long, m long")
    prof = {r.column: r for r in
            profile_columns(df, exact_distinct=False).collect()}
    # HLL at this cardinality is exact in practice; bound loosely
    assert abs(prof["id"].n_distinct - 100) <= 5
    assert prof["m"].n_distinct == 3


def test_corpus_report_per_source(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the hat", "web"),
         (2, "xyzzy!!!", "web"),
         (3, "der hund und die katze und", "books")],
        "doc_id long, text string, source string",
    )
    rep = {r.source: r for r in corpus_report(df).collect()}
    assert rep["web"].n_docs == 2 and rep["books"].n_docs == 1
    assert rep["web"].en_share == 0.5       # doc2 has zero stopword hits
    assert rep["books"].en_share == 0.0     # German beats English
    assert rep["web"].mean_chars == (19 + 8) / 2
