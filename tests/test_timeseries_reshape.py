"""Time-series, reshape, fuzzy-join, and entropy operator
semantics: calendar gap-fill boundaries, SCD2 tie determinism,
z-score flagging, unpivot shape, banded Levenshtein recall, and
entropy closed-form values."""

import math

from pyspark.sql import functions as F

from pac_data_pipeline_spark.ext.text import char_entropy
from pac_data_pipeline_spark.operators.joins import fuzzy_join_banded
from pac_data_pipeline_spark.operators.reshape import unpivot_long
from pac_data_pipeline_spark.operators.timeseries import (
    gap_fill_daily,
    scd2_history,
    zscore_anomalies,
)


def test_gap_fill_fills_and_forward_fills(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01", 1.0), ("a", "2024-01-04", 4.0),
         ("b", "2024-02-01", 5.0)],
        "k string, d string, v double",
    ).select("k", F.to_date("d").alias("d"), "v")
    out = gap_fill_daily(df, "k", "d", "v")
    rows = {(r.k, str(r.day)): (r.value, r.last_known)
            for r in out.collect()}
    # the two interior days exist, carry 0 value + last known 1.0
    assert rows[("a", "2024-01-02")] == (0.0, 1.0)
    assert rows[("a", "2024-01-03")] == (0.0, 1.0)
    assert rows[("a", "2024-01-04")] == (4.0, 4.0)
    # keys never cross-pollinate: b has exactly its single day
    assert [k for k in rows if k[0] == "b"] == [("b", "2024-02-01")]
    assert len(rows) == 5


def test_scd2_versions_and_tie_order(spark):
    df = spark.createDataFrame(
        # uid 1 has two changes at the SAME ts — event_id must break the tie
        [(1, "2024-01-01 00:00:00", 10, "x"),
         (1, "2024-01-01 00:00:00", 11, "y"),
         (1, "2024-01-02 00:00:00", 12, "z")],
        "uid long, ts string, eid long, attr string",
    ).select("uid", F.to_timestamp("ts").alias("ts"), "eid", "attr")
    out = scd2_history(df, "uid", "ts", ("attr",), tiebreak_cols=("eid",))
    got = {r.eid: (r.version, r.is_current, r.valid_to is None)
           for r in out.collect()}
    assert got[10] == (1, False, False)
    assert got[11] == (2, False, False)
    assert got[12] == (3, True, True)


def test_zscore_flags_only_outliers_and_skips_tiny_keys(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, 1.1), (1, 0.9), (1, 1.0), (1, 1.1), (1, 0.9),
         (1, 100.0),  # the outlier
         (2, 5.0)],   # single row → null stddev → never flagged
        "k long, v double",
    )
    out = zscore_anomalies(df, "k", "v").collect()
    assert [(r.k, r.v) for r in out] == [(1, 100.0)]
    assert out[0].z > 2


def test_unpivot_shape_and_no_shuffle(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0), (2, 4.0, 5.0)],
                               "id long, qty double, price double")
    out = unpivot_long(df, ("id",), ("qty", "price"))
    assert out.columns == ["id", "metric", "value"]
    assert out.count() == 4
    got = {(r.id, r.metric): r.value for r in out.collect()}
    assert got[(1, "qty")] == 2.0 and got[(2, "price")] == 5.0
    # Expand node, not Exchange: unpivot must stay scan-local
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fuzzy_join_banded_verifies_distance(spark):
    names = spark.createDataFrame(
        [(1, "Customer#000000001"), (2, "Customer#000000002"),
         (3, "Customer#000000091"),  # distance 2 from #..002 → dropped
         (4, "Different#00000001")],  # other band → never a candidate
        "id long, name string",
    )
    out = fuzzy_join_banded(names, names, "name", "id",
                            band_len=16, max_distance=1)
    pairs = {(r.id_a, r.id_b): r.distance for r in out.collect()}
    assert pairs == {(1, 2): 1, (1, 3): 1}


def test_char_entropy_closed_forms(spark):
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, ""), (4, "hello world")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.char_entropy for r in char_entropy(df).collect()}
    assert got[1] == 0.0                       # single symbol
    assert got[2] == round(math.log(4), 6)     # uniform over 4
    assert got[3] is None                      # empty → null
    expect = round(
        math.log(11) - (3 * math.log(3) + 2 * math.log(2)) / 11, 6
    )
    assert got[4] == expect


def test_linear_interpolate_values_and_edges(spark):
    """Hand-computed interpolation: interior gaps get prev +
    slope·Δdays; a NULL-valued observed edge day falls back flat;
    observed days pass through; single window shuffle."""
    import datetime as dt

    from pyspark.sql import functions as F

    from pac_data_pipeline_spark.operators.timeseries import (
        linear_interpolate,
    )

    d = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    rows = [
        ("k", d("2024-01-01"), 10.0),
        ("k", d("2024-01-04"), 40.0),   # gap 2 days: 20, 30
        ("k", d("2024-01-06"), None),   # observed day, null value
        ("q", d("2024-02-01"), 5.0),    # lone point: span of one day
    ]
    df = spark.createDataFrame(
        rows, "key string, day timestamp, v double"
    )
    out = linear_interpolate(df, "key", "day", "v")
    got = {
        (r.key, r.day.date().isoformat()): (r.value, r.is_observed)
        for r in out.collect()
    }
    assert got[("k", "2024-01-01")] == (10.0, True)
    assert got[("k", "2024-01-02")] == (20.0, False)
    assert got[("k", "2024-01-03")] == (30.0, False)
    assert got[("k", "2024-01-04")] == (40.0, True)
    # days past the last non-null observation: flat fallback
    assert got[("k", "2024-01-05")] == (40.0, False)
    # a NULL-valued day is "present" but carries no observation:
    # is_observed tracks the VALUE, matching the oracle's rev IS NOT NULL
    assert got[("k", "2024-01-06")] == (40.0, False)
    assert got[("q", "2024-02-01")] == (5.0, True)
    assert len(got) == 7
    # both window frames share partitioning AND ordering, so Spark
    # fuses them into ONE Window node over one sort+exchange (check
    # the executed final plan only — AQE appends the initial plan)
    p = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    ).split("Initial Plan")[0]
    assert p.count("Window [") == 1, p


def test_ewma_smooth_hand_computed(spark):
    """Series k1 = [10, 20, 30] at α=0.3: r1=10,
    r2=0.3*20+0.7*10=13, r3=0.3*30+0.7*13=18.1. Singleton series
    seeds to itself; NULL key / NULL value / NULL order rows drop."""
    from pac_data_pipeline_spark.operators.timeseries import ewma_smooth

    rows = [
        ("k1", 1, 10.0), ("k1", 2, 20.0), ("k1", 3, 30.0),
        ("k2", 1, 7.0),
        (None, 1, 99.0),       # NULL key drops
        ("k1", None, 99.0),    # NULL order drops
        ("k1", 4, None),       # NULL value drops
    ]
    df = spark.createDataFrame(rows, "k string, i long, value double")
    got = {(r.k, r.i): (r.value, r.ewma) for r in
           ewma_smooth(df, "k", ("i",), "value").collect()}
    assert got == {
        ("k1", 1): (10.0, 10.0),
        ("k1", 2): (20.0, 13.0),
        ("k1", 3): (30.0, 18.1),
        ("k2", 1): (7.0, 7.0),
    }


def test_longest_streaks_hand_computed(spark):
    """u1: a a b b b a -> longest run is b×3 (4 islands); tie case
    u2: a a b b -> both length 2, earliest island wins (a); u3
    singleton; NULL value rows drop and must not bridge a run."""
    from pac_data_pipeline_spark.operators.timeseries import (
        longest_streaks,
    )

    rows = (
        [("u1", i, v) for i, v in enumerate(["a", "a", "b", "b", "b", "a"])]
        + [("u2", i, v) for i, v in enumerate(["a", "a", "b", "b"])]
        + [("u3", 0, "z")]
        + [("u1", 99, None)]
    )
    df = spark.createDataFrame(rows, "k string, i long, v string")
    got = {r.k: (r.streak_len, r.streak_value, r.n_islands) for r in
           longest_streaks(df, "k", ("i",), "v").collect()}
    assert got == {"u1": (3, "b", 3), "u2": (2, "a", 2), "u3": (1, "z", 1)}


def test_holt_smooth_hand_computed(spark):
    """Series [10, 20, 30] at α=0.3, β=0.2: l1=10 b1=0;
    l2=0.3*20+0.7*10=13, b2=0.2*3+0=0.6; l3=0.3*30+0.7*13.6=18.52,
    b3=0.2*5.52+0.8*0.6=1.584; forecasts l+b. A perfectly linear
    series is tracked (forecast approaches the next value) where
    plain EWMA lags it."""
    from pac_data_pipeline_spark.operators.timeseries import holt_smooth

    rows = [("k", 1, 10.0), ("k", 2, 20.0), ("k", 3, 30.0)]
    df = spark.createDataFrame(rows, "k string, i long, value double")
    got = {r.i: (r.level, r.trend, r.forecast) for r in
           holt_smooth(df, "k", ("i",), "value").collect()}
    assert got[1] == (10.0, 0.0, 10.0)
    assert got[2] == (13.0, 0.6, 13.6)
    assert got[3] == (18.52, 1.584, 20.104)
