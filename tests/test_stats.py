"""Distribution-stats operator semantics: ntile partition scoping
and tie determinism, corr/covar values, histogram clamping, mode
tiebreak, running-total frames — plus the no-global-window plan
guarantee."""

from pyspark.sql import functions as F

from pac_data_pipeline_spark.operators.stats import (
    grouped_corr,
    histogram_fixed_width,
    mode_per_key,
    ntile_buckets,
    running_total,
)


def test_ntile_is_partition_scoped_and_deterministic(spark):
    df = spark.createDataFrame(
        # key a: 4 rows → one per quartile; the two 30.0 ties must
        # order by id. key b: 2 rows → buckets 1 and 2 only.
        [("a", 1, 40.0), ("a", 2, 30.0), ("a", 3, 30.0), ("a", 4, 10.0),
         ("b", 5, 9.0), ("b", 6, 8.0)],
        "k string, id long, v double",
    )
    out = ntile_buckets(df, "k", "v", n=4, tiebreak_cols=("id",))
    got = {r.id: r.bucket for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 1, 6: 2}


def test_ntile_plan_has_no_global_sort(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "k string, id long, v double")
    plan = ntile_buckets(df, "k", "v", tiebreak_cols=("id",))._jdf \
        .queryExecution().executedPlan().toString()
    # window exchange must be hash-partitioned on the key, never a
    # single-partition range sort
    assert "SinglePartition" not in plan


def test_grouped_corr_perfect_line(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0),
         ("h", 1.0, 5.0), ("h", 2.0, 3.0)],
        "k string, x double, y double",
    )
    got = {r.k: (r.corr, r.covar, r.n)
           for r in grouped_corr(df, ["k"], "x", "y").collect()}
    assert got["g"] == (1.0, 2.0, 3)      # y = 2x exactly
    assert got["h"] == (-1.0, -1.0, 2)    # perfectly anti-correlated


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(r,) for r in (-5.0, 0.0, 9.9, 10.0, 55.0, 99.9, 100.0, 250.0)]
        + [(None,)],
        "v double",
    )
    out = histogram_fixed_width(df, "v", lo=0.0, hi=100.0, nbins=10)
    got = {r.bucket: (r.bucket_lo, r.bucket_hi, r.n) for r in out.collect()}
    assert got[0] == (0.0, 10.0, 3)   # -5 clamps into bucket 0
    assert got[9] == (90.0, 100.0, 3)  # 100 and 250 clamp into bucket 9
    assert got[1] == (10.0, 20.0, 1)
    assert got[5] == (50.0, 60.0, 1)
    assert sum(v[2] for v in got.values()) == 8  # null dropped


def test_mode_tiebreak_smallest_value(spark):
    df = spark.createDataFrame(
        [("k", "b"), ("k", "b"), ("k", "a"), ("k", "a"), ("k", "c")],
        "k string, v string",
    )
    rows = mode_per_key(df, "k", "v").collect()
    assert len(rows) == 1
    assert (rows[0].mode_value, rows[0].mode_count) == ("a", 2)


def test_running_total_per_key_prefix_sums(spark):
    df = spark.createDataFrame(
        [("a", "d1", 1.0), ("a", "d2", 2.0), ("a", "d3", 4.0),
         ("b", "d1", 10.0)],
        "k string, d string, v double",
    )
    out = running_total(df, "k", "d", "v")
    got = {(r.k, r.d): r.running_total for r in out.collect()}
    assert got == {("a", "d1"): 1.0, ("a", "d2"): 3.0,
                   ("a", "d3"): 7.0, ("b", "d1"): 10.0}


def test_cumulative_distinct_counts_first_occurrences_only(spark):
    from pac_data_pipeline_spark.operators.stats import (
        cumulative_distinct,
    )

    df = spark.createDataFrame(
        [("t", "d1", 1), ("t", "d1", 2), ("t", "d2", 1),  # 1 repeats
         ("t", "d2", 3), ("t", "d3", 1), ("u", "d1", 9)],
        "k string, d string, v long",
    )
    out = {(r.k, r.d): (r.n_new, r.n_distinct_cum)
           for r in cumulative_distinct(df, "k", "d", "v").collect()}
    # d2: only v=3 is new (v=1 first seen d1); d3 adds nothing and
    # produces NO row (no first occurrence that day)
    assert out == {("t", "d1"): (2, 2), ("t", "d2"): (1, 3),
                   ("u", "d1"): (1, 1)}


def test_kmv_distinct_exact_below_k_and_bounded_error(spark):
    from pac_data_pipeline_spark.operators.stats import kmv_distinct

    rows = [("small", f"u{i % 20}") for i in range(200)] + [
        ("big", f"v{i}") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "grp string, val string")
    out = {r.grp: r.est_distinct for r in kmv_distinct(df, "grp", "val", k=64).collect()}
    # below k distinct -> the sketch saw everything -> exact
    assert out["small"] == 20.0
    # above k -> estimator with relative error ~1/sqrt(k) ≈ 12.5%;
    # allow 3 sigma
    assert abs(out["big"] - 2000) / 2000 < 0.375
    # nulls excluded
    withnull = spark.createDataFrame(
        [("g", None), ("g", "a"), ("g", "b")], "grp string, val string"
    )
    got = kmv_distinct(withnull, "grp", "val", k=8).collect()
    assert got[0].est_distinct == 2.0


def test_ks_drift_hand_computed(spark):
    """KS statistic against a hand-computed reference: D is the max
    CDF gap at observed values; identical samples give 0; a key
    missing one sample is dropped; a non-binary group column raises."""
    import pytest as _pytest

    from pac_data_pipeline_spark.operators.stats import ks_drift

    rows = (
        # key 'a': sample0 = {1,2,3}, sample1 = {3,4,5} → D = 2/3
        [("a", 0, v) for v in (1.0, 2.0, 3.0)]
        + [("a", 1, v) for v in (3.0, 4.0, 5.0)]
        # key 'b': identical samples → D = 0
        + [("b", 0, v) for v in (1.0, 2.0)]
        + [("b", 1, v) for v in (1.0, 2.0)]
        # key 'c': only group 0 → filtered out
        + [("c", 0, 9.0)]
        # null value ignored
        + [("a", 0, None)]
    )
    df = spark.createDataFrame(rows, "k string, g int, v double")
    got = {r.k: (r.n0, r.n1, r.d_stat) for r in
           ks_drift(df, "k", "g", "v", groups=(0, 1)).collect()}
    assert got == {"a": (3, 3, round(2 / 3, 6)), "b": (2, 2, 0.0)}
    with _pytest.raises(ValueError, match="exactly 2 groups"):
        ks_drift(df.filter("g = 0"), "k", "g", "v")


def test_psi_drift_hand_computed(spark):
    """Hand-checkable PSI: key 'a' identical halves (psi == 0 after
    smoothing, since p == q in every bin); key 'b' fully separated
    halves (large psi); key 'c' present in one sample only → dropped
    (same contract as ks_drift — and the division/log must not run
    on the one-sided key under ANSI mode)."""
    import math

    from pac_data_pipeline_spark.operators.stats import psi_drift

    rows = (
        [("a", g, float(v)) for g in (0, 1) for v in range(10)]
        + [("b", 0, float(v)) for v in range(10)]
        + [("b", 1, float(v + 100)) for v in range(10)]
        + [("c", 0, 1.0), ("c", 0, 2.0)]
    )
    df = spark.createDataFrame(rows, "k string, grp int, v double")
    got = {r.k: r for r in psi_drift(df, "k", "grp", "v", groups=(0, 1)).collect()}
    assert set(got) == {"a", "b"}  # 'c' dropped before any division
    assert got["a"].psi == 0.0
    assert got["a"].n0 == 10 and got["a"].n1 == 10
    # 'b': halves land in bins 0 and 9 of the pooled [0, 109] range —
    # p=(10.5/15, .5/15 ...) vs q mirrored; psi = 2*(10/15)*ln(21)
    expect = round(2 * (10 / 15) * math.log(10.5 / 0.5), 4)
    assert got["b"].psi == expect


def test_markov_transitions_hand_computed(spark):
    """u1: a->b->a->c; u2: a->b. Transitions: a->b ×2, b->a ×1,
    a->c ×1. P(b|a)=2/3, P(c|a)=1/3, P(a|b)=1.0. The tiebreak column
    pins simultaneous timestamps; NULL states drop."""
    from pac_data_pipeline_spark.operators.timeseries import (
        markov_transitions,
    )

    rows = [
        ("u1", 1, 1, "a"), ("u1", 2, 2, "b"),
        ("u1", 3, 3, "a"), ("u1", 3, 4, "c"),  # same ts: id pins order
        ("u2", 1, 5, "a"), ("u2", 2, 6, "b"),
        ("u2", 3, 7, None),  # dropped, not a transition end
    ]
    df = spark.createDataFrame(rows, "u string, t long, id long, s string")
    got = {
        (r.prev_state, r.state): (r.n, r.p)
        for r in markov_transitions(df, "u", "t", "s", "id").collect()
    }
    assert got == {
        ("a", "b"): (2, round(2 / 3, 6)),
        ("a", "c"): (1, round(1 / 3, 6)),
        ("b", "a"): (1, 1.0),
    }


def test_iqr_outliers_hand_computed(spark):
    """Group 'a' = [1..9, 100]: sorted n=10, type-7 interpolation
    h=(n-1)q -> q1 = x[2]+0.25*(x[3]-x[2]) = 3.25, q3 =
    x[6]+0.75*(x[7]-x[6]) = 7.75, iqr = 4.5 -> fences [-3.5, 14.5];
    only 100 falls outside. Group 'b' constant:
    iqr 0, fences collapse to the value, zero outliers. NULL values
    are ignored by the quantile and never counted as outliers."""
    from pac_data_pipeline_spark.operators.stats import iqr_outliers

    rows = [("a", float(v)) for v in range(1, 10)] + [
        ("a", 100.0),
        ("b", 5.0), ("b", 5.0), ("b", 5.0),
        ("b", None),
    ]
    df = spark.createDataFrame(rows, "g string, value double")
    got = {r.g: r for r in iqr_outliers(df, "g", "value").collect()}
    a = got["a"]
    assert (a.q1, a.q3, a.lo_fence, a.hi_fence) == (3.25, 7.75, -3.5, 14.5)
    assert (a.n, a.n_outliers) == (10, 1)
    b = got["b"]
    assert (b.q1, b.q3, b.n, b.n_outliers) == (5.0, 5.0, 4, 0)


def test_ab_test_hand_computed(spark):
    """Deterministic md5 arms; one group where both arms convert
    identically gives z = 0 exactly; a one-armed group reports NULL
    z without an ANSI divide-by-zero; NULL units join no arm."""
    from pac_data_pipeline_spark.operators.stats import ab_test

    # find unit ids for each arm under the md5 % 2 split
    import hashlib

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2

    a_ids = [u for u in range(40) if arm(u) == 0][:4]
    b_ids = [u for u in range(40) if arm(u) == 1][:4]
    rows = (
        # group 'even': both arms 2/4 successes -> identical rates
        [("even", u, 60.0) for u in a_ids[:2]]
        + [("even", u, 10.0) for u in a_ids[2:]]
        + [("even", u, 60.0) for u in b_ids[:2]]
        + [("even", u, 10.0) for u in b_ids[2:]]
        # group 'solo': only arm-a units -> NULL z, no crash
        + [("solo", u, 60.0) for u in a_ids]
        # NULL unit: joins no arm anywhere
        + [("even", None, 60.0)]
    )
    df = spark.createDataFrame(rows, "event_type string, user_id long, value double")
    from pyspark.sql import functions as F

    got = {r.event_type: r for r in
           ab_test(df, "event_type", "user_id", F.col("value") > 50).collect()}
    e = got["even"]
    assert (e.n_a, e.n_b, e.rate_a, e.rate_b, e.z) == (4, 4, 0.5, 0.5, 0.0)
    assert e.significant is False
    s = got["solo"]
    assert (s.n_a, s.n_b) == (4, 0) and s.z is None


def test_mutual_information_hand_computed(spark):
    """2x2 perfectly-dependent table: x==y always -> joint cells
    only on the diagonal; with 2+2 rows, pmi = ln(4*2/(2*2)) = ln 2;
    mi_contrib = 0.5*ln2 each; total MI = ln 2. NULLs drop."""
    import math

    from pac_data_pipeline_spark.operators.stats import mutual_information

    rows = [("a", 0), ("a", 0), ("b", 1), ("b", 1), (None, 0), ("a", None)]
    df = spark.createDataFrame(rows, "x string, y int")
    out = {(r.x, r.y): r for r in
           mutual_information(df, "x", "y").collect()}
    assert set(out) == {("a", 0), ("b", 1)}
    ln2 = round(math.log(2.0), 4)
    for k in out:
        assert out[k].pmi == ln2
        assert out[k].mi_contrib == round(0.5 * math.log(2.0), 6)
        assert (out[k].n_xy, out[k].n_x, out[k].n_y) == (2, 2, 2)


def test_auc_hand_computed(spark):
    """Perfect separation -> 1.0; reversed -> 0.0; all-tied scores
    -> 0.5 exactly (the ½·P(equal) term); a known mixed case checked
    against the rank formula by hand: scores pos={3,2}, neg={1,2} ->
    pairs: (3>1)+(3>2)+(2>1)+½(2=2) = 3.5/4 = 0.875."""
    from pyspark.sql import functions as F

    from pac_data_pipeline_spark.operators.stats import auc

    def run(rows):
        df = spark.createDataFrame(rows, "s double, y boolean")
        return auc(df, "s", F.col("y")).collect()[0]

    assert run([(2.0, True), (3.0, True), (0.0, False), (1.0, False)]
               ).auc == 1.0
    assert run([(0.0, True), (1.0, True), (2.0, False), (3.0, False)]
               ).auc == 0.0
    assert run([(5.0, True), (5.0, False), (5.0, True), (5.0, False)]
               ).auc == 0.5
    r = run([(3.0, True), (2.0, True), (1.0, False), (2.0, False)])
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 0.875)


def test_welch_t_hand_computed(spark):
    """Arms with identical per-arm values give t = 0 exactly; a
    known asymmetric case checks the Welch formula by hand: arm a =
    {10, 20} (mean 15, var 50), arm b = {30, 40} (mean 35, var 50)
    -> t = -20/sqrt(50/2 + 50/2) = -2.8284. Constant arms (var 0 on
    both sides) give NULL t via the se=0 guard."""
    import hashlib
    import math

    from pac_data_pipeline_spark.operators.stats import welch_t_test

    def arm(u):
        return int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2

    a_ids = [u for u in range(40) if arm(u) == 0][:2]
    b_ids = [u for u in range(40) if arm(u) == 1][:2]
    rows = (
        [("g", a_ids[0], 10.0), ("g", a_ids[1], 20.0),
         ("g", b_ids[0], 30.0), ("g", b_ids[1], 40.0)]
        + [("flat", u, 7.0) for u in a_ids + b_ids]
    )
    df = spark.createDataFrame(
        rows, "event_type string, user_id long, value double"
    )
    got = {r.event_type: r for r in
           welch_t_test(df, "event_type", "user_id", "value").collect()}
    g = got["g"]
    assert (g.mean_a, g.mean_b) == (15.0, 35.0)
    assert g.t_stat == round(-20.0 / math.sqrt(50.0), 4)
    f = got["flat"]
    assert f.t_stat is None and f.mean_a == 7.0 and f.mean_b == 7.0


def test_theta_setops_exact_mode_below_k(spark):
    """Both sides under k distinct values: theta = exact mode, every
    estimate equals the true count, and the set algebra is exact on
    a hand-built overlap: A = 0..29, B = 20..49 (|I| = 10)."""
    from pac_data_pipeline_spark.operators.stats import (
        theta_sketch_setops,
    )

    a = spark.createDataFrame([(str(i),) for i in range(30)], "v string")
    b = spark.createDataFrame(
        [(str(i),) for i in range(20, 50)], "v string"
    )
    got = {
        r.op: r for r in theta_sketch_setops(a, b, "v", k=64).collect()
    }
    for op, n in [
        ("a", 30), ("b", 30), ("union", 50),
        ("intersect", 10), ("a_not_b", 20),
    ]:
        assert got[op].exact == n
        assert got[op].est == float(n)  # exact mode: est == truth


def test_theta_setops_sketch_mode_estimates(spark):
    """Above k the estimates are approximate but consistent: union
    within a loose KMV error band, identical sets estimate equal,
    and disjoint sets intersect at ~0."""
    from pac_data_pipeline_spark.operators.stats import (
        theta_sketch_setops,
    )

    a = spark.createDataFrame([(f"x{i}",) for i in range(2000)], "v string")
    same = {r.op: r for r in theta_sketch_setops(a, a, "v", k=128).collect()}
    assert same["a"].est == same["b"].est == same["union"].est
    assert same["intersect"].exact == 2000
    # k=128 KMV: relative error ~ 1/sqrt(k) ≈ 9%; allow 4 sigma
    assert abs(same["a"].est - 2000) / 2000 < 0.36
    assert same["a_not_b"].est == 0.0

    b = spark.createDataFrame([(f"y{i}",) for i in range(2000)], "v string")
    disj = {r.op: r for r in theta_sketch_setops(a, b, "v", k=128).collect()}
    assert disj["intersect"].exact == 0
    # retained-intersection of disjoint uniform hashes is almost
    # surely empty under theta
    assert disj["intersect"].est == 0.0


def test_theta_setops_null_and_empty_sides(spark):
    """NULL members are excluded; an empty side yields exact zeros
    and never poisons the union with NULL arithmetic."""
    from pac_data_pipeline_spark.operators.stats import (
        theta_sketch_setops,
    )

    a = spark.createDataFrame(
        [("p",), (None,), ("q",)], "v string"
    )
    b = spark.createDataFrame([], "v string")
    got = {r.op: r for r in theta_sketch_setops(a, b, "v", k=8).collect()}
    assert got["a"].exact == 2 and got["a"].est == 2.0
    assert got["b"].exact == 0
    assert got["union"].exact == 2
    assert got["intersect"].exact == 0 and got["a_not_b"].exact == 2
