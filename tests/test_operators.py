"""Operator-level properties: dedup idempotence/keep-first ties,
rollup totals under repartitioning, top-k determinism, sink
record shaping."""

from pyspark.sql import functions as F

from pac_data_pipeline_spark.operators.aggregates import conditional_party_rollup
from pac_data_pipeline_spark.operators.dedup import dedup_keep_first
from pac_data_pipeline_spark.operators.topk import top_k
from pac_data_pipeline_spark.sinks.documents import (
    foreach_partition_write,
    to_doc_records,
    with_batch_id,
)


def _pac_df(spark):
    rows = [
        # (ticker, cycle, committee, amount) with a duplicate key and a tie
        ("AAPL", 2024, "Progressive Fund", 100.0),
        ("AAPL", 2024, "GOP Fund", 50.0),
        ("AAPL", 2024, "Progressive Fund", 100.0),  # exact dup
        ("MSFT", 2024, "Liberal PAC", 30.0),
        ("MSFT", 2026, "Conservative PAC", 70.0),
        ("TSLA", 2024, "Neutral PAC", 10.0),  # no party → dropped by rollup
    ]
    return spark.createDataFrame(
        rows, "ticker string, cycle long, committee string, amount double"
    )


def test_dedup_keep_first_deterministic_and_idempotent(spark):
    df = _pac_df(spark)
    once = dedup_keep_first(
        df, key_cols=("ticker", "cycle"), order_cols=("amount", "committee")
    )
    twice = dedup_keep_first(
        once, key_cols=("ticker", "cycle"), order_cols=("amount", "committee")
    )
    got = {(r.ticker, r.cycle): r.amount for r in once.collect()}
    # smallest amount wins per (ticker, cycle)
    assert got == {("AAPL", 2024): 50.0, ("MSFT", 2024): 30.0,
                   ("MSFT", 2026): 70.0, ("TSLA", 2024): 10.0}
    assert sorted(once.collect()) == sorted(twice.collect())


def test_rollup_totals_stable_under_repartition(spark):
    from pac_data_pipeline_spark.functions.scalar import party_label

    df = _pac_df(spark).withColumn("party", party_label("committee"))
    base = conditional_party_rollup(
        df.filter(F.col("party").isNotNull()),
        ("ticker", "cycle"), "party", "amount",
    )
    shuffled = conditional_party_rollup(
        df.filter(F.col("party").isNotNull()).repartition(7, "committee"),
        ("ticker", "cycle"), "party", "amount",
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, shuffled.collect()))
    row = {(r.ticker, r.cycle): (r.democrat_total, r.republican_total)
           for r in base.collect()}
    assert row[("AAPL", 2024)] == (200.0, 50.0)
    assert ("TSLA", 2024) not in row  # HAVING drops the no-party group


def test_top_k_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 4.0)], "id long, v double"
    )
    got = [r.id for r in top_k(df, "v", 2, tiebreak=("id",)).collect()]
    assert got == [1, 2]


def test_with_batch_id_sizes(spark):
    df = spark.range(2500).withColumnRenamed("id", "k")
    out = with_batch_id(df, batch_size=1000, order_cols=("k",))
    sizes = {r.batch_id: r.n for r in
             out.groupBy("batch_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {0: 1000, 1: 1000, 2: 500}


def test_with_partition_batch_id_bounds_and_coverage(spark):
    from pac_data_pipeline_spark.sinks.documents import with_partition_batch_id

    df = spark.range(5000).repartition(4)
    out = with_partition_batch_id(df, batch_size=300)
    sizes = out.groupBy("batch_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r.n for r in sizes) == 5000  # every row batched
    assert all(r.n <= 300 for r in sizes)  # request cap respected
    assert all(r.batch_id >= 0 for r in sizes)  # no sign overflow


def test_with_upload_shard_deterministic_and_orderless(spark):
    from pac_data_pipeline_spark.sinks.documents import with_upload_shard

    df = spark.range(1000).withColumnRenamed("id", "k")
    a = with_upload_shard(df, ("k",), n_shards=8)
    b = with_upload_shard(df.repartition(7).orderBy(F.rand(seed=1)), ("k",), 8)
    got_a = {r.k: r.upload_shard for r in a.collect()}
    got_b = {r.k: r.upload_shard for r in b.collect()}
    assert got_a == got_b  # partitioning/order independent
    assert set(got_a.values()) <= set(range(8))
    import hashlib

    h = int(hashlib.md5(b"7").hexdigest()[:15], 16) % 8
    assert got_a[7] == h  # matches the cross-engine md5 formula


def test_keyed_json_tree_guard(spark):
    import pytest

    from pac_data_pipeline_spark.sinks.documents import keyed_json_tree

    small = spark.createDataFrame([(1, "a")], "id long, v string")
    assert keyed_json_tree(small, "id").count() == 1
    big = spark.range(50).withColumnRenamed("id", "k")
    with pytest.raises(ValueError, match="max_rows"):
        keyed_json_tree(big, "k", max_rows=10)


def test_to_doc_records_shape(spark):
    df = spark.createDataFrame([(1, "x")], "id long, payload string")
    row = to_doc_records(df, collection="c", id_col="id").collect()[0]
    assert row.collection == "c"
    assert row.document_id == "1"
    assert '"payload":"x"' in row.data


def test_foreach_partition_write_gate(spark):
    df = spark.range(100).repartition(4)
    stats = foreach_partition_write(
        df, write_batch=lambda rows: len(rows), batch_size=30
    )
    assert stats["attempted"] == 100
    assert stats["written"] == 100
    assert stats["success"] is True

    flaky = foreach_partition_write(
        df, write_batch=lambda rows: 0, batch_size=30
    )
    assert flaky["written"] == 0
    assert flaky["success"] is False


def test_asof_join_ties_and_no_match(spark):
    from pac_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 205), (3, 10, 50), (4, 20, 300)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(10, 100, 1.0), (10, 200, 2.0), (20, 400, 9.0)],
        "user_id long, ts long, price double",
    )
    out = {
        r.event_id: (r.ts_matched, r.price_matched)
        for r in asof_join(
            left, right, time_col="ts", by_cols=("user_id",),
            value_cols=("price",),
        ).collect()
    }
    assert out[1] == (100, 1.0)   # tie: equal ts matches
    assert out[2] == (200, 2.0)   # latest prior
    assert out[3] == (None, None)  # before any right row
    assert out[4] == (None, None)  # right exists only later


def test_asof_join_forward_and_nearest(spark):
    from pac_data_pipeline_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, 10, 100), (2, 10, 140), (3, 10, 160), (4, 10, 250),
         (5, 20, 300)],
        "event_id long, user_id long, ts long",
    )
    right = spark.createDataFrame(
        [(10, 100, 1.0), (10, 200, 2.0), (20, 250, 9.0)],
        "user_id long, ts long, price double",
    )

    def run(direction):
        return {
            r.event_id: (r.ts_matched, r.price_matched)
            for r in asof_join(
                left, right, time_col="ts", by_cols=("user_id",),
                value_cols=("price",), direction=direction,
            ).collect()
        }

    fwd = run("forward")
    assert fwd[1] == (100, 1.0)   # tie: equal ts matches
    assert fwd[2] == (200, 2.0)   # earliest at-or-after
    assert fwd[4] == (None, None)  # nothing after
    assert fwd[5] == (None, None)  # right exists only earlier

    near = run("nearest")
    assert near[1] == (100, 1.0)   # exact hit
    assert near[2] == (100, 1.0)   # 40 back < 60 forward
    assert near[3] == (200, 2.0)   # 40 forward < 60 back
    assert near[4] == (200, 2.0)   # only backward exists
    assert near[5] == (250, 9.0)   # only backward exists (other key)

    # equidistant -> backward wins (pandas merge_asof semantics)
    mid = spark.createDataFrame(
        [(9, 10, 150)], "event_id long, user_id long, ts long"
    )
    tie = {
        r.event_id: (r.ts_matched, r.price_matched)
        for r in asof_join(
            mid, right, time_col="ts", by_cols=("user_id",),
            value_cols=("price",), direction="nearest",
        ).collect()
    }
    assert tie[9] == (100, 1.0)


def test_simhash_portable_banding_equals_exact(spark):
    """max_hamming <= n_chunks-1 -> the banded join must return
    exactly the pairs an all-pairs hamming filter would."""
    from pyspark.sql import functions as F

    from pac_data_pipeline_spark.ext.dedup_text import (
        simhash,
        simhash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox leaps over the lazy dog"),
            (4, "completely unrelated text about spark engines"),
        ],
        "doc_id long, text string",
    )
    banded = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(
            docs, max_hamming=3, bits=60, n_chunks=4, portable=True
        ).collect()
    }
    sigs = simhash(docs, bits=60, portable=True).collect()
    exact = set()
    for a in sigs:
        for b in sigs:
            if a.doc_id < b.doc_id:
                h = bin(a.simhash ^ b.simhash).count("1")
                if h <= 3:
                    exact.add((a.doc_id, b.doc_id, h))
    assert banded == exact
    assert (1, 2, 0) in banded  # identical docs -> hamming 0
    # portable hash must be md5-derived, engine-independent
    import hashlib

    tok_hash = int(hashlib.md5(b"the").hexdigest()[:15], 16)
    assert tok_hash == spark.range(1).select(
        F.conv(F.substring(F.md5(F.lit("the")), 1, 15), 16, 10)
        .cast("long")
        .alias("h")
    ).collect()[0].h


def test_range_join_binned_boundaries(spark):
    """Inclusive endpoints, cross-bin intervals, and exactly-once
    match production (no dedup pass needed)."""
    from pac_data_pipeline_spark.operators.joins import range_join_binned

    points = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 01:30:00"),
         (3, "2024-01-01 02:00:00"), (4, "2024-01-01 02:00:01")],
        "pid long, ts string",
    ).select("pid", F.col("ts").cast("timestamp").alias("ts"))
    intervals = spark.createDataFrame(
        [(100, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
         (200, "2024-01-01 01:00:00", "2024-01-01 01:59:59")],
        "iid long, start string, end string",
    ).select(
        "iid",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    out = range_join_binned(
        points, intervals, point_ts="ts", start_col="start",
        end_col="end", bin_seconds=1800,
    )
    pairs = sorted((r.pid, r.iid) for r in out.collect())
    # pid 1: start boundary inclusive; pid 3: end boundary inclusive;
    # pid 4: one second past the end -> excluded; each pair ONCE even
    # though interval 100 spans 5 bins
    assert pairs == [(1, 100), (2, 100), (2, 200), (3, 100)]


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized differential check: all three directions against
    pandas merge_asof on seeded data with duplicate timestamps,
    unmatched groups, and ties."""
    import numpy as np
    import pandas as pd

    from pac_data_pipeline_spark.operators.joins import asof_join

    rng = np.random.default_rng(7)
    left_pd = pd.DataFrame({
        "event_id": np.arange(120),
        "user_id": rng.integers(0, 6, 120),
        "ts": rng.integers(0, 1000, 120).astype("int64"),
    })
    right_pd = (
        pd.DataFrame({
            "user_id": rng.integers(0, 5, 40),
            "ts": rng.integers(0, 1000, 40).astype("int64"),
            "price": np.round(rng.random(40), 3),
        })
        .drop_duplicates(["user_id", "ts"])  # asof contract: unique (by, ts)
        .reset_index(drop=True)
    )
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    for direction in ("backward", "forward", "nearest"):
        got = (
            asof_join(
                left, right, time_col="ts", by_cols=("user_id",),
                value_cols=("price",), direction=direction,
            )
            .toPandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left_pd.sort_values("ts", kind="stable"),
            right_pd.sort_values("ts", kind="stable"),
            on="ts", by="user_id", direction=direction,
        ).sort_values("event_id").reset_index(drop=True)
        g = got["price_matched"].astype("float64")
        w = want["price"].astype("float64")
        ok = (g == w) | (g.isna() & w.isna())
        assert ok.all(), (
            direction,
            pd.concat(
                [got, want.add_suffix("_want")], axis=1
            )[~ok].head(),
        )


def test_range_join_binned_matches_naive(spark):
    """Randomized differential check against the naive (cartesian)
    BETWEEN join across bin widths that divide, exceed, and straddle
    the interval lengths."""
    import numpy as np

    from pac_data_pipeline_spark.operators.joins import range_join_binned

    rng = np.random.default_rng(11)
    points = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(rng.integers(0, 5000, 150))],
        "pid long, epoch long",
    ).select("pid", F.timestamp_seconds("epoch").alias("ts"))
    iv = []
    for j in range(40):
        s = int(rng.integers(0, 4800))
        iv.append((j, s, s + int(rng.integers(1, 600))))
    intervals = spark.createDataFrame(
        iv, "iid long, s long, e long"
    ).select(
        "iid",
        F.timestamp_seconds("s").alias("start"),
        F.timestamp_seconds("e").alias("end"),
    )
    naive = sorted(
        (r.pid, r.iid)
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("start")) & (F.col("ts") <= F.col("end")))
        .collect()
    )
    for bin_s in (60, 256, 1024):
        got = sorted(
            (r.pid, r.iid)
            for r in range_join_binned(
                points, intervals, point_ts="ts", start_col="start",
                end_col="end", bin_seconds=bin_s,
            ).collect()
        )
        assert got == naive, bin_s


def test_dq_checks_find_planted_violations(spark):
    from pac_data_pipeline_spark.operators.quality import (
        check_in_range,
        check_not_null,
        check_referential,
        check_unique,
        dq_report,
    )

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (2, 99), (3, None)], "id long, fk int"
    )
    parent = spark.createDataFrame([(10,)], "pk int")
    rep = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in dq_report(
            [
                check_unique(child, ("id",), "id_unique"),
                check_referential(child, "fk", parent, "pk", "fk_ok"),
                check_not_null(child, "fk", "fk_not_null"),
                check_in_range(child, "fk", 0, 50, "fk_range"),
            ]
        ).collect()
    }
    assert rep["id_unique"] == (1, False)   # id=2 duplicated
    assert rep["fk_ok"] == (1, False)       # fk=99 orphaned (null skipped)
    assert rep["fk_not_null"] == (1, False)
    assert rep["fk_range"] == (1, False)    # 99 out of [0, 50]


def test_fused_checks_single_scan_matches_per_check_results(spark):
    """fused_checks must (a) return the same violation counts as
    the one-frame-per-check shape and (b) compile to a single scan
    of the table instead of one per check."""
    from pac_data_pipeline_spark.operators.quality import (
        dq_report,
        fused_checks,
        viol_accepted_values,
        viol_expression,
        viol_in_range,
        viol_not_null,
        viol_unique,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 10, "A"), (2, 10, "B"), (2, 99, "Z"), (3, None, "A")],
        "id long, v int, s string",
    )
    rep = {
        r["check_name"]: (r["n_violations"], r["passed"])
        for r in dq_report(
            [
                fused_checks(
                    df,
                    [
                        ("id_unique", viol_unique("id")),
                        ("v_not_null", viol_not_null("v")),
                        ("v_range", viol_in_range("v", 0, 50)),
                        ("s_domain", viol_accepted_values("s", ("A", "B"))),
                        ("id_pos", viol_expression(F.col("id") <= 0)),
                    ],
                )
            ]
        ).collect()
    }
    assert rep["id_unique"] == (1, False)
    assert rep["v_not_null"] == (1, False)
    assert rep["v_range"] == (1, False)     # 99
    assert rep["s_domain"] == (1, False)    # 'Z'
    assert rep["id_pos"] == (0, True)
    # single scan: the registry query reads lineitem ONCE for its
    # two fused lineitem checks
    import re

    import __spark_entry__ as entry

    q = entry.queries()["x_dq_checks"](spark, "/root/testdata/sf0.001")
    p = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "simple"
    )
    assert len(re.findall(r"lineitem\.parquet", p)) == 1, p


def test_min_by_struct_tiebreak(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 5, 2.0), (1, 3, 2.0), (1, 9, 7.0)],
        "k long, supp long, price double",
    )
    row = df.groupBy("k").agg(
        F.expr("min_by(supp, struct(price, supp))").alias("lo"),
        F.expr("max_by(supp, struct(price, supp))").alias("hi"),
    ).collect()[0]
    assert row["lo"] == 3   # tie at price 2.0 broken by min supp
    assert row["hi"] == 9


def test_interval_overlap_join_edges(spark):
    import datetime

    from pac_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    def ts(h):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=h)

    left = spark.createDataFrame(
        [
            (1, ts(0), ts(2)),    # overlaps w1 (touches at end)
            (2, ts(5), ts(30)),   # spans multiple day-bins, hits both
            (3, ts(100), ts(101)),  # overlaps nothing
        ],
        "lid int, s_start timestamp, s_end timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts(2), ts(4)),   # touches left 1 exactly at ts(2)
            (20, ts(26), ts(28)),  # inside left 2's second day
        ],
        "rid int, p_start timestamp, p_end timestamp",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            left, right, "s_start", "s_end", "p_start", "p_end"
        ).collect()
    )
    # closed-interval semantics: touching endpoints match (1,10);
    # the bin-spanning interval matches only true overlaps (2,20),
    # and appears exactly ONCE despite candidate rows in 2 bins
    assert got == [(1, 10), (2, 20)]


def test_weighted_sample_properties(spark):
    from pyspark.sql import functions as F

    from pac_data_pipeline_spark.ext.sampling import weighted_sample

    rows = [(i, 1000.0 if i < 10 else 1.0) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    # determinism across partitionings
    a = sorted(r.doc_id for r in weighted_sample(df, 50, "w").collect())
    b = sorted(
        r.doc_id
        for r in weighted_sample(df.repartition(7), 50, "w").collect()
    )
    assert a == b and len(a) == 50
    # heavy weights dominate: all 10 thousand-x rows make the sample
    assert sum(1 for i in a if i < 10) == 10
    # zero/null weights and null ids are excluded
    bad = spark.createDataFrame(
        [(1, 0.0), (2, None), (None, 5.0), (3, 5.0)],
        "doc_id long, w double",
    )
    assert [r.doc_id for r in weighted_sample(bad, 10, "w").collect()] == [3]


def test_range_frame_vs_rows_frame(spark):
    """RANGE frames are defined by the time axis: two events 2h
    apart share no frame even though they're adjacent rows, and
    same-second events are mutual peers (both see both) — exactly
    what a ROWS frame cannot express."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "u", base, 10.0),
        (2, "u", base, 20.0),                      # same second: peer of 1
        (3, "u", base + dt.timedelta(minutes=30), 5.0),
        (4, "u", base + dt.timedelta(hours=2), 1.0),  # out of every frame
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id string, ts timestamp, value double")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    got = {
        r.event_id: (r.n, r.v)
        for r in df.select(
            "event_id",
            F.count(F.lit(1)).over(w).alias("n"),
            F.round(F.sum("value").over(w), 2).alias("v"),
        ).collect()
    }
    assert got[1] == (2, 30.0)  # same-second peer included BOTH ways
    assert got[2] == (2, 30.0)
    assert got[3] == (3, 35.0)  # 30 min later: sees 1, 2, itself
    assert got[4] == (1, 1.0)   # 2 h later: alone


def test_frequent_pairs_hand_computed(spark):
    """Baskets {1:(a,b,c), 2:(a,b), 3:(a,b), 4:(c,d), 5:(a)} with a
    duplicate line (item a twice in basket 1): pair (a,b) has
    support 3, (a,c)/(b,c) 1 each (below min_support=2), (c,d) 1.
    Confidence = support(pair)/support(item): a appears in 4
    baskets, b in 3 -> conf_a_b=0.75, conf_b_a=1.0. The duplicate
    line must NOT inflate support (distinct-first contract)."""
    from pac_data_pipeline_spark.operators.basket import frequent_pairs

    rows = [
        (1, 10), (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20),
        (4, 30), (4, 40),
        (5, 10),
    ]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = frequent_pairs(df, min_support=2, k=10).collect()
    assert [(r.item_a, r.item_b, r.support, r.conf_a_b, r.conf_b_a)
            for r in out] == [(10, 20, 3, 0.75, 1.0)]


def test_table_checksum_order_invariant(spark):
    """Same rows in different order/partitioning give the identical
    checksum; one mutated cell changes it; NULL vs the literal
    string 'NULL' do NOT collide (sentinel tagging); null_cells
    counts per-cell."""
    from pac_data_pipeline_spark.operators.quality import table_checksum

    rows = [(1, "a"), (2, None), (3, "NULL")]
    a = spark.createDataFrame(rows, "id long, v string")
    b = spark.createDataFrame(list(reversed(rows)), "id long, v string") \
        .repartition(7)
    ca = table_checksum(a, ("id", "v")).collect()[0]
    cb = table_checksum(b, ("id", "v")).collect()[0]
    assert (ca.n_rows, ca.checksum, ca.null_cells) == \
           (cb.n_rows, cb.checksum, cb.null_cells)
    assert ca.null_cells == 1
    mut = spark.createDataFrame([(1, "a"), (2, None), (3, "NULLx")],
                                "id long, v string")
    assert table_checksum(mut, ("id", "v")).collect()[0].checksum \
        != ca.checksum
    # NULL must hash differently from the 4-char string 'NULL'
    lit = spark.createDataFrame([(1, "a"), (2, "NULL"), (3, "NULL")],
                                "id long, v string")
    assert table_checksum(lit, ("id", "v")).collect()[0].checksum \
        != ca.checksum


def test_benford_audit_hand_computed(spark):
    """Digits extract from exact cents (12.34 -> 1234 -> '1');
    values below one cent and non-positive/NULL amounts drop;
    obs_share sums to 1 over returned digits."""
    from pac_data_pipeline_spark.operators.quality import benford_audit

    rows = [(12.34,), (1.01,), (950.0,), (9.5,), (0.0,), (None,),
            (-5.0,), (0.004,)]
    df = spark.createDataFrame(rows, "amt double")
    got = {r.digit: r for r in benford_audit(df, "amt").collect()}
    assert set(got) == {1, 9}
    assert got[1].n == 2 and got[9].n == 2
    assert got[1].obs_share == 0.5 and got[9].obs_share == 0.5
    import math
    assert got[1].benford_share == round(math.log10(2.0), 6)


def test_rfm_segments_hand_computed(spark):
    """Three archetype customers over a synthetic order log: the
    recent+frequent one lands 'champion', the stale+frequent one
    'at_risk', the recent one-timer 'new'; quintile boundaries come
    from exact percentiles, and scoring by comparison puts boundary
    values in the LOWER bucket deterministically."""
    import datetime as dt

    from pac_data_pipeline_spark.operators.aggregates import rfm_segments

    def t(day):
        return dt.datetime(2024, 1, day)

    rows = []
    # 5 filler customers with middling behavior spread the quintiles
    for cid in range(10, 15):
        rows += [(cid, t(5 + cid % 3), 100.0), (cid, t(8), 100.0)]
    rows += [(1, t(28), 500.0), (1, t(27), 500.0), (1, t(26), 500.0),
             (1, t(25), 500.0)]                      # champion
    rows += [(2, t(1), 500.0), (2, t(2), 500.0), (2, t(3), 500.0),
             (2, t(4), 500.0)]                       # at_risk
    rows += [(3, t(29), 50.0)]                       # new
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    got = {r.o_custkey: r for r in rfm_segments(df).collect()}
    assert got[1].segment == "champion"
    assert got[2].segment == "at_risk"
    assert got[3].segment == "new"
    assert got[1].r_score == 5 and got[2].r_score == 1
    assert got[3].f_score == 1


def test_key_skew_profile_hand_computed(spark):
    """Column with counts {a:4, b:1, c:1} (n=6, K=3): sorted counts
    [1,1,4] -> rank sum S = 1*1 + 1*2 + 4*3 = 15, gini =
    2*15/(3*6) - 4/3 = 30/18 - 4/3 = 1/3; top1 = 4/6; NULLs report
    separately and stay out of the distribution. A uniform column
    has gini exactly 0."""
    from pac_data_pipeline_spark.operators.skew import key_skew_profile

    rows = [("a",)] * 4 + [("b",)] * 1 + [("c",)] * 1 + [(None,)] * 2
    df = spark.createDataFrame(rows, "k string")
    p = {r.column: r for r in key_skew_profile(df, ("k",)).collect()}["k"]
    assert (p.n_rows, p.null_rows, p.n_keys) == (8, 2, 3)
    assert p.top1_share == round(4 / 6, 6)
    assert p.topn_share == 1.0  # top-10 covers all 3 keys
    assert p.gini == round(1 / 3, 6)

    uni = spark.createDataFrame(
        [(v,) for v in ("x", "y", "z")] * 5, "k string"
    )
    u = key_skew_profile(uni, ("k",)).collect()[0]
    assert u.gini == 0.0 and u.top1_share == round(1 / 3, 6)


def test_key_skew_profile_rejects_non_injective_types(spark):
    """The string-melt contract: binary and nested columns (whose
    cast-to-string merges distinct values) raise TypeError with
    pre-hash guidance instead of silently deflating n_keys/gini;
    injective types still profile."""
    import pytest

    from pac_data_pipeline_spark.operators.skew import key_skew_profile

    df = spark.createDataFrame(
        [(1, bytearray(b"\x00a"), [1])],
        "k int, b binary, arr array<int>",
    )
    with pytest.raises(TypeError, match="pre-hash"):
        key_skew_profile(df, ("b",))
    with pytest.raises(TypeError, match="arr"):
        key_skew_profile(df, ("k", "arr"))
    assert key_skew_profile(df, ("k",)).collect()[0].n_keys == 1


def _py_hdr_bucket(c: int, sig_bits: int = 7) -> int:
    if c < 1:
        return 0
    sh = max(c.bit_length() - 1 - sig_bits, 0)
    return (c >> sh) << sh


def test_hdr_quantiles_error_bound_and_edges(spark):
    """The documented sketch contract: estimates are one-sided
    (est <= exact) within relative error 2^-sig_bits of the exact
    rank-ceil(q*n/100) value; NULLs drop; zero/negative values land
    in the exact underflow bucket 0."""
    import random

    from pac_data_pipeline_spark.operators.quantile import hdr_quantiles

    rng = random.Random(11)
    vals = [round(rng.uniform(0.01, 50_000.0), 2) for _ in range(3_000)]
    rows = [("k", v) for v in vals] + [("k", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r.key, r.q): (r.est_cents, r.n)
        for r in hdr_quantiles(df, "g", "v").collect()
    }
    cents = sorted(int(v * 100 + 0.5) for v in vals)
    for q in (50, 90, 95, 99):
        exact = cents[(len(cents) * q + 99) // 100 - 1]
        est, n = got[("k", q)]
        assert n == len(cents)
        assert est <= exact
        assert (exact - est) / exact < 2**-7
        # per-key and merged rows agree on a single-key frame
        assert got[("__ALL__", q)] == got[("k", q)]

    edge = spark.createDataFrame(
        [("a", 0.0), ("a", -3.5), ("a", 0.004), ("a", 1.0)],
        "g string, v double",
    )
    from pac_data_pipeline_spark.operators.quantile import hdr_sketch

    sk = {
        r.bucket: r.cnt for r in hdr_sketch(edge, "g", "v").collect()
    }
    assert sk[0] == 3  # 0.0, -3.5 and 0.004 all round to cents < 1
    assert sk[100] == 1


def test_hdr_sketch_exactly_mergeable(spark):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) bit-exactly —
    the property t-digest lacks (its merge is order-dependent), and
    the bucket function matches the plain-Python reference."""
    import random

    from pac_data_pipeline_spark.operators.quantile import hdr_sketch

    rng = random.Random(23)
    a = [("x", round(rng.uniform(0.0, 9_000.0), 2)) for _ in range(800)]
    b = [("x", round(rng.uniform(0.0, 9_000.0), 2)) for _ in range(700)]
    df_a = spark.createDataFrame(a, "g string, v double")
    df_b = spark.createDataFrame(b, "g string, v double")
    df_ab = spark.createDataFrame(a + b, "g string, v double")

    def counts(df):
        return {
            (r.key, r.bucket): r.cnt
            for r in hdr_sketch(df, "g", "v").collect()
        }

    ca, cb, cab = counts(df_a), counts(df_b), counts(df_ab)
    merged: dict = {}
    for d in (ca, cb):
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == cab

    want: dict = {}
    for _, v in a + b:
        k = ("x", _py_hdr_bucket(int(v * 100 + 0.5)))
        want[k] = want.get(k, 0) + 1
    assert want == cab


def test_centroid_sketch_mergeable_and_dominates_hdr(spark):
    """Centroid-family operator contract on Spark itself (the
    pure-Python twin lives in test_properties): (count, sum) merge
    is bit-exact, the centroid estimate is always >= the HDR lower
    bound for the same (key, q), within the same 2^-7 relative
    error of the exact quantile, and the underflow bucket pins to
    0 even with negative sums."""
    import random

    from pac_data_pipeline_spark.operators.quantile import (
        centroid_quantiles,
        centroid_sketch,
        hdr_quantiles,
    )

    rng = random.Random(7)
    vals = [round(rng.uniform(0.01, 50_000.0), 2) for _ in range(2_000)]
    df = spark.createDataFrame([("k", v) for v in vals], "g string, v double")
    cen = {
        (r.key, r.q): r.est_cents
        for r in centroid_quantiles(df, "g", "v").collect()
    }
    hdr = {
        (r.key, r.q): r.est_cents
        for r in hdr_quantiles(df, "g", "v").collect()
    }
    cents = sorted(int(v * 100 + 0.5) for v in vals)
    for q in (50, 90, 95, 99):
        exact = cents[(len(cents) * q + 99) // 100 - 1]
        assert hdr[("k", q)] <= cen[("k", q)], q
        assert abs(exact - cen[("k", q)]) / exact < 2**-7, q
        assert cen[("__ALL__", q)] == cen[("k", q)]

    # merge = add both components, bit-exactly
    a = [("x", round(rng.uniform(0.0, 9_000.0), 2)) for _ in range(500)]
    b = [("x", round(rng.uniform(0.0, 9_000.0), 2)) for _ in range(400)]

    def pairs(rows):
        d = spark.createDataFrame(rows, "g string, v double")
        return {
            (r.key, r.bucket): (r.cnt, r.tot)
            for r in centroid_sketch(d, "g", "v").collect()
        }

    ca, cb, cab = pairs(a), pairs(b), pairs(a + b)
    merged: dict = {}
    for d in (ca, cb):
        for k, (c, t) in d.items():
            mc, mt = merged.get(k, (0, 0))
            merged[k] = (mc + c, mt + t)
    assert merged == cab

    # negative values: bucket 0 centroid pins to 0 on both engines
    # (truncating div vs flooring // would diverge on negative tot)
    neg = spark.createDataFrame(
        [("n", -12.5), ("n", -1.0), ("n", 0.002)], "g string, v double"
    )
    got = {
        r.q: r.est_cents
        for r in centroid_quantiles(neg, "g", "v").collect()
        if r.key == "n"
    }
    assert all(v == 0 for v in got.values()), got


def test_cms_overestimates_and_merges(spark):
    """Count-Min contract: est >= true for EVERY item (counters only
    over-count), overshoot stays far below the eN bound on a
    deterministic stream, and merge(sketch(A), sketch(B)) ==
    sketch(A+B) exactly — the counter matrix is a pure function of
    the multiset."""
    import random

    from pac_data_pipeline_spark.operators.cms import (
        cms_build,
        cms_estimate,
    )

    rng = random.Random(43)
    # zipf-ish stream: item f"t{j}" appears ~1000/j times
    stream = [f"t{j}" for j in range(1, 60) for _ in range(1000 // j)]
    rng.shuffle(stream)
    half = len(stream) // 2
    df_all = spark.createDataFrame([(s,) for s in stream], "item string")
    df_a = spark.createDataFrame([(s,) for s in stream[:half]], "item string")
    df_b = spark.createDataFrame([(s,) for s in stream[half:]], "item string")

    sk = cms_build(df_all)
    truth = {}
    for s in stream:
        truth[s] = truth.get(s, 0) + 1
    cand = spark.createDataFrame([(t,) for t in truth], "item string")
    est = {
        r.item: r.est_cnt for r in cms_estimate(sk, cand).collect()
    }
    n = len(stream)
    for t, true_cnt in truth.items():
        assert est[t] >= true_cnt, t
        # e/w * N ~ 0.27% of N; allow 2x slack on the fixed stream
        assert est[t] - true_cnt <= max(2, int(0.006 * n)), (
            t, est[t], true_cnt, n,
        )

    def cells(df):
        return {
            (r.row, r.col): r.cnt for r in cms_build(df).collect()
        }

    ca, cb, cab = cells(df_a), cells(df_b), cells(df_all)
    merged: dict = {}
    for d in (ca, cb):
        for k, v in d.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == cab


def test_k_anonymity_audit_hand_computed(spark):
    """Classes {(a,x):3, (a,y):1, (b,x):2} with sensitive values:
    at k=2 the singleton class re-identifies 1 row; at k=5 all 6
    rows sit below; min class size 1; l-diversity 1 (class (a,y)
    has one distinct secret; NULL secrets don't count). NULL quasi
    values group together."""
    from pac_data_pipeline_spark.operators.quality import (
        k_anonymity_audit,
    )

    rows = [
        ("a", "x", "s1"), ("a", "x", "s2"), ("a", "x", None),
        ("a", "y", "s1"),
        ("b", "x", "s1"), ("b", "x", "s1"),
    ]
    df = spark.createDataFrame(rows, "q1 string, q2 string, sec string")
    out = {r.k: r for r in k_anonymity_audit(
        df, ("q1", "q2"), sensitive_col="sec", k_thresholds=(2, 5)
    ).collect()}
    assert out[2].n_rows == 6 and out[2].n_classes == 3
    assert (out[2].classes_below_k, out[2].rows_below_k) == (1, 1)
    assert out[2].rows_below_ppm == (1_000_000 * 1) // 6
    assert out[2].min_class_size == 1
    assert out[2].min_l_diversity == 1  # (b,x) has {s1}; (a,y) {s1}
    assert (out[5].classes_below_k, out[5].rows_below_k) == (3, 6)
    assert out[5].rows_below_ppm == 1_000_000

    # NULL quasi values are one equivalence class
    nulls = spark.createDataFrame(
        [(None, "x", "s1"), (None, "x", "s2")],
        "q1 string, q2 string, sec string",
    )
    r = k_anonymity_audit(nulls, ("q1", "q2"), "sec", (2,)).collect()[0]
    assert (r.n_classes, r.classes_below_k, r.min_l_diversity) == (1, 0, 2)
