"""Greedy k-center coreset (ext/kcenter.py): selection order on a
hand-built geometry, duplicate handling, and the 2-approximation
coverage property."""

from pac_data_pipeline_spark.ext.kcenter import kcenter_coreset


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, [float(x), float(y)]) for i, (x, y) in enumerate(pts)],
        "vec_id long, embedding array<double>",
    )


def test_kcenter_picks_farthest_points_in_order(spark):
    # seed = smallest vid (origin); the far corner must be chosen
    # next, then the remaining extreme
    pts = [(0, 0), (0.1, 0), (10, 10), (0, 9), (0.2, 0.1)]
    out = kcenter_coreset(_df(spark, pts), k=3).collect()
    order = [r["center_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert order[0] == 0          # deterministic seed
    assert order[1] == 2          # (10,10) is farthest from origin
    assert order[2] == 3          # (0,9) farthest from {origin,(10,10)}


def test_kcenter_membership_and_radius(spark):
    # two tight clusters: k=2 puts one center in each; every point
    # is within its cluster's diameter. (10, 10.1) is the farthest
    # point from the origin seed, so it wins round 1.
    pts = [(0, 0), (0, 0.1), (0.1, 0), (10, 10), (10, 10.1)]
    out = {r["rank"]: r for r in kcenter_coreset(_df(spark, pts), k=2).collect()}
    assert out[0]["center_id"] == 0
    assert out[1]["center_id"] == 4
    assert out[0]["n_assigned"] == 3
    assert out[1]["n_assigned"] == 2
    # radius is exact grid arithmetic: 0.1 quantizes to 100 -> d=10000
    assert out[0]["radius"] == 10000
    assert out[1]["radius"] == 10000


def test_kcenter_duplicate_vectors_keep_empty_center_rows(spark):
    # fewer distinct vectors than k: later centers re-pick a
    # duplicate (max-min distance 0), report 0 members, 0 radius
    pts = [(0, 0), (0, 0), (1, 1)]
    out = {r["rank"]: r for r in kcenter_coreset(_df(spark, pts), k=3).collect()}
    assert len(out) == 3
    assert sum(r["n_assigned"] for r in out.values()) == 3
    assert any(r["n_assigned"] == 0 for r in out.values())


def test_kcenter_null_vectors_excluded(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, None), (2, [3.0, 4.0])],
        "vec_id long, embedding array<double>",
    )
    out = kcenter_coreset(df, k=2).collect()
    assert {r["center_id"] for r in out} == {0, 2}
    assert sum(r["n_assigned"] for r in out) == 2
