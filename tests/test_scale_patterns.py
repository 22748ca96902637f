"""Scale-pattern verification: bucketed co-located joins delete the
join shuffle; skew-resistant aggregations match their naive
formulations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pac_data_pipeline_spark.operators.skew import (
    distinct_count_per_key,
    salted_groupby_sum,
)
from pac_data_pipeline_spark.sources.readers import save_bucketed

SF = "/root/testdata/sf0.001"


def plan(df, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_bucketed_join_deletes_shuffle(spark, tmp_path):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    save_bucketed(
        li, "li_bucketed", str(tmp_path / "li"), ("l_orderkey",), 4,
        sort_cols=("l_orderkey",),
    )
    save_bucketed(
        o, "o_bucketed", str(tmp_path / "o"), ("o_orderkey",), 4,
        sort_cols=("o_orderkey",),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("li_bucketed").join(
            spark.table("o_bucketed"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        p = plan(j)
        assert "SortMergeJoin" in p, p
        # co-located buckets: no exchange on either join key
        assert "hashpartitioning(l_orderkey" not in p, p
        assert "hashpartitioning(o_orderkey" not in p, p
        # and the result is still correct
        n = j.count()
        expected = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).count()
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_distinct_count_per_key_matches_naive(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    fast = distinct_count_per_key(li, ["l_returnflag"], "l_partkey")
    naive = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_distinct")
    )
    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, naive.collect()))


def test_distinct_count_shuffles_on_pair_first(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = plan(distinct_count_per_key(li, ["l_returnflag"], "l_partkey"))
    # first exchange must be keyed by (key, value) — the skew spread
    assert "hashpartitioning(l_returnflag" in p, p
    first_ex = p.index("hashpartitioning(l_returnflag")
    assert "l_partkey" in p[first_ex : first_ex + 120], p


def test_salted_sum_matches_naive(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    fast = salted_groupby_sum(li, ["l_returnflag"], "l_quantity", n_salts=8)
    naive = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("total"),
        F.count("l_quantity").cast("bigint").alias("n"),
    )
    f = {r["l_returnflag"]: (round(r["total"], 4), r["n"]) for r in fast.collect()}
    g = {r["l_returnflag"]: (round(r["total"], 4), r["n"]) for r in naive.collect()}
    assert f == g


def test_salted_sum_null_values_counted_like_naive(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0)], "k string, v double"
    )
    out = {r["k"]: (r["total"], r["n"]) for r in
           salted_groupby_sum(df, ["k"], "v", n_salts=4).collect()}
    assert out == {"a": (1.0, 1), "b": (2.0, 1)}


def test_approx_stats_error_bounds(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    exact_parts = li.select("l_partkey").distinct().count()
    row = li.agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("p50"),
    ).collect()[0]
    assert abs(row["a"] - exact_parts) <= max(3, 0.05 * exact_parts)
    exact_p50 = li.approxQuantile("l_extendedprice", [0.5], 0.0)[0]
    assert abs(row["p50"] - exact_p50) / exact_p50 < 0.02


def test_ivf_recall_vs_bruteforce(spark):
    from pac_data_pipeline_spark.ext.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        queries_from_corpus,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = queries_from_corpus(emb, n=5)
    exact = {(r.query_id, r.vec_id) for r in cosine_topk_bruteforce(emb, q, k=10).collect()}
    approx = {(r.query_id, r.vec_id) for r in cosine_topk_ivf(emb, q, k=10).collect()}
    recall = len(exact & approx) / len(exact)
    # quasi-uniform synthetic embeddings are the worst case for IVF;
    # n_probe=6/16 must still recover the majority of true neighbors
    assert recall >= 0.5, recall


def test_reservoir_rank_gets_window_group_limit(spark):
    """x_reservoir_sample's per-stratum rank must plan as
    WindowGroupLimit (per-partition top-k heaps): the quota bound is
    a COLUMN the rank-limit pushdown cannot see, so the literal
    ``rank ≤ k`` pre-filter exists precisely to trigger it — without
    it a skewed stratum sorts itself end to end for 100 survivors."""
    import __spark_entry__ as entry

    p = plan(entry.queries()["x_reservoir_sample"](spark, SF), "simple")
    assert "WindowGroupLimit" in p, p


def test_ngram_novelty_single_scan(spark):
    """x_ngram_novelty must tokenize the corpus ONCE: the gram-
    partitioned window-min formulation keeps one FileScan and two
    hash exchanges (gram window + doc rollup). The rejected
    min-aggregate + join-back formulation re-evaluates the whole
    tokenize+explode subplan on the probe side (2 FileScans) —
    partial aggregation below the exchange defeats ReusedExchange."""
    import re

    import __spark_entry__ as entry

    p = plan(entry.queries()["x_ngram_novelty"](spark, SF), "simple")
    assert len(re.findall(r"FileScan", p)) == 1, p
    assert len(re.findall(r"Exchange hash", p)) == 2, p


def test_ivf_grid_recall_and_probe_containment(spark):
    """The fixed-point IVF (hash-exact tier): recall vs brute force
    holds on the same fixture, every query's self-match is rank 1
    with cosine 1.0 (the query is in the corpus, so its own cell is
    always the nearest probe), and every returned candidate really
    belongs to one of that query's n_probe nearest cells — the
    invariant that distinguishes IVF from a full scan."""
    from pac_data_pipeline_spark.ext.kmeans import kmeans_cells
    from pac_data_pipeline_spark.ext.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivf_grid,
        queries_from_corpus,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = queries_from_corpus(emb, n=5)
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk_bruteforce(emb, q, k=10).collect()
    }
    rows = cosine_topk_ivf_grid(emb, q, k=10, n_cells=8, n_probe=2).collect()
    approx = {(r.query_id, r.vec_id) for r in rows}
    assert len(exact & approx) / len(exact) >= 0.5
    # every query MUST return its own vector (its cell is always
    # probed) — presence first, so the rank-1 check can't pass
    # vacuously if a join bug drops the self pair
    self_rows = {r.query_id: r for r in rows if r.query_id == r.vec_id}
    assert set(self_rows) == {r.query_id for r in q.collect()}
    for r in self_rows.values():
        assert r.rank == 1 and r.cosine == 1.0, r
    # probe containment: candidates only from the probed cells
    assigned, _cells = kmeans_cells(emb, k=8, n_iter=3)
    cell_of = {r.vid: r.cluster for r in assigned.collect()}
    probed: dict[int, set[int]] = {}
    for r in rows:
        probed.setdefault(r.query_id, set()).add(cell_of[r.vec_id])
    for qid, cells_hit in probed.items():
        assert len(cells_hit) <= 2, (qid, cells_hit)


def test_pq_grid_recall_and_true_scores(spark):
    """The fixed-point PQ (hash-exact tier): recall vs brute force,
    self-match at rank 1 with cosine 1.0, and — the PQ contract —
    every emitted cosine equals the EXACT brute-force cosine for
    that (query, vector) pair (approximation may only affect which
    rows make the shortlist, never the reported score)."""
    from pac_data_pipeline_spark.ext.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_pq_grid,
        queries_from_corpus,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = queries_from_corpus(emb, n=5)
    exact_rows = cosine_topk_bruteforce(emb, q, k=50).collect()
    exact_cos = {(r.query_id, r.vec_id): r.cosine for r in exact_rows}
    exact_top10 = {
        (r.query_id, r.vec_id) for r in exact_rows if r.rank <= 10
    }
    rows = cosine_topk_pq_grid(
        emb, q, k=10, m=2, n_codes=8, n_iter=2
    ).collect()
    approx = {(r.query_id, r.vec_id) for r in rows}
    assert len(exact_top10 & approx) / len(exact_top10) >= 0.4
    # self-match: the query's own codes give ADC distance 0, which
    # is NOT guaranteed minimal — so the fixture-independent claims
    # are (a) at least one self pair survives the shortlist
    # (non-vacuous), and (b) every self pair that DOES survive is
    # re-scored to exact cosine 1.0 and, absent a duplicate-vector
    # tie, ranks 1 (exact re-scoring makes rank 1 a THEOREM for a
    # present untied self pair — a miss means the score path broke,
    # not the fixture)
    self_rows = {r.query_id: r for r in rows if r.query_id == r.vec_id}
    assert self_rows, "no self pair survived any shortlist"
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, r in self_rows.items():
        assert r.cosine == 1.0, r
        if sum(1 for x in by_query[qid] if x.cosine == 1.0) == 1:
            assert r.rank == 1, r
    for r in rows:
        if (r.query_id, r.vec_id) in exact_cos:
            assert r.cosine == exact_cos[(r.query_id, r.vec_id)], r


def test_ivfadc_grid_recall_containment_and_true_scores(spark):
    """The fixed-point IVFADC (hash-exact tier) composes the IVF and
    PQ invariants: recall vs brute force on the same fixture, probe
    containment (every candidate comes from one of the query's
    n_probe nearest cells — the inverted-list property), and the PQ
    score contract (every emitted cosine equals the exact
    brute-force cosine — residual quantization may only affect
    which rows make the shortlist, never a reported score).
    Self-match follows the PQ robustness pattern: the query's own
    residual codes need not minimize ADC, so assert presence of at
    least one self pair, then exactness/rank for those present."""
    from pac_data_pipeline_spark.ext.kmeans import kmeans_cells
    from pac_data_pipeline_spark.ext.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_ivfadc_grid,
        queries_from_corpus,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = queries_from_corpus(emb, n=5)
    exact_rows = cosine_topk_bruteforce(emb, q, k=50).collect()
    exact_cos = {(r.query_id, r.vec_id): r.cosine for r in exact_rows}
    exact_top10 = {
        (r.query_id, r.vec_id) for r in exact_rows if r.rank <= 10
    }
    rows = cosine_topk_ivfadc_grid(
        emb, q, k=10, n_cells=8, n_probe=2, m=2, n_codes=8, n_iter=2
    ).collect()
    approx = {(r.query_id, r.vec_id) for r in rows}
    # double approximation (IVF pruning × residual PQ shortlist):
    # expect less than either alone, but well above chance
    assert len(exact_top10 & approx) / len(exact_top10) >= 0.3
    self_rows = {r.query_id: r for r in rows if r.query_id == r.vec_id}
    assert self_rows, "no self pair survived any shortlist"
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, r in self_rows.items():
        assert r.cosine == 1.0, r
        if sum(1 for x in by_query[qid] if x.cosine == 1.0) == 1:
            assert r.rank == 1, r
    # every reported score is the TRUE cosine
    for r in rows:
        if (r.query_id, r.vec_id) in exact_cos:
            assert r.cosine == exact_cos[(r.query_id, r.vec_id)], r
    # probe containment: candidates only from probed cells
    assigned, _cells = kmeans_cells(emb, k=8, n_iter=2)
    cell_of = {r.vid: r.cluster for r in assigned.collect()}
    probed: dict[int, set[int]] = {}
    for r in rows:
        probed.setdefault(r.query_id, set()).add(cell_of[r.vec_id])
    for qid, cells_hit in probed.items():
        assert len(cells_hit) <= 2, (qid, cells_hit)


def test_warehouse_layout_end_to_end(spark, tmp_path):
    from pac_data_pipeline_spark.sources.layout import (
        materialize_warehouse,
        read_warehouse_table,
    )

    written = materialize_warehouse(spark, SF, str(tmp_path / "wh"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = read_warehouse_table(spark, written, "lineitem")
        o = read_warehouse_table(spark, written, "orders")
        j = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        p = plan(j)
        # the workload's dominant join is shuffle-free on this layout
        assert "hashpartitioning(l_orderkey" not in p, p
        assert "hashpartitioning(o_orderkey" not in p, p

        ev = read_warehouse_table(spark, written, "events")
        one_day = ev.filter(F.col("event_date") == "1995-06-01")
        pev = plan(one_day)
        pf_line = next(ln for ln in pev.splitlines() if "PartitionFilters" in ln)
        assert "event_date" in pf_line, pev
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS lineitem_w")
        spark.sql("DROP TABLE IF EXISTS orders_w")


def test_range_join_replication_bounded(spark):
    """Interval explode replicates each interval by exactly
    ceil(len/bin)+1 copies at most — the knob that keeps the binned
    range join's shuffle volume ~2x when bin ~= interval length."""
    from pyspark.sql import functions as F

    intervals = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-01-01 02:00:00")],
        "iid long, start string, end string",
    ).select(
        "iid",
        F.col("start").cast("timestamp").alias("start"),
        F.col("end").cast("timestamp").alias("end"),
    )
    bins = intervals.select(
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp("start") / 7200),
                F.floor(F.unix_timestamp("end") / 7200),
            )
        )
    ).count()
    assert bins == 2  # 2h interval, 2h bins -> at most len/bin + 1


def test_pack_sequences_is_shard_local(spark):
    """Sequence ids must depend only on rows WITHIN a shard: packing
    a corpus and packing one shard's slice give identical ids — the
    property that lets 1000 executors pack independently."""
    from pyspark.sql import functions as F

    from pac_data_pipeline_spark.ext.sampling import hash_bucket
    from pac_data_pipeline_spark.ext.text import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (50 + i % 97))) for i in range(200)],
        "doc_id long, text string",
    )
    full = {r.doc_id: r.seq_id for r in
            pack_sequences(docs, max_tokens=256, n_shards=4).collect()}
    one_shard = docs.filter(hash_bucket("doc_id", 4) == 2)
    alone = {r.doc_id: r.seq_id for r in
             pack_sequences(one_shard, max_tokens=256, n_shards=4).collect()}
    assert alone and all(full[k] == v for k, v in alone.items())


def test_z_order_tightens_file_bounds_in_both_dims(spark, tmp_path):
    """Objective data-skipping evidence: after Z-ordering lineitem on
    (l_orderkey, l_partkey), every file's min/max bounding box must
    be tight in BOTH dimensions — a plain sort would leave the
    second dimension spanning the full range in every file."""
    import glob

    import pyarrow.parquet as pq

    from pac_data_pipeline_spark.sources.layout import write_z_ordered

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    out = str(tmp_path / "li_z")
    write_z_ordered(li, out, ("l_orderkey", "l_partkey"), n_files=16)

    spans = {"l_orderkey": [], "l_partkey": []}
    glo = {c: [float("inf"), float("-inf")] for c in spans}
    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 8
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        for c in spans:
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(cols[c]).statistics
                mins.append(st.min)
                maxs.append(st.max)
            lo, hi = min(mins), max(maxs)
            spans[c].append(hi - lo)
            glo[c][0] = min(glo[c][0], lo)
            glo[c][1] = max(glo[c][1], hi)
    for c in spans:
        global_span = glo[c][1] - glo[c][0]
        mean_span = sum(spans[c]) / len(spans[c])
        # each file covers a small fraction of the range in BOTH
        # dims (16 files on a 2-d z-curve => ~1/4 per dim ideally)
        assert mean_span < 0.55 * global_span, (c, mean_span, global_span)


def test_compact_small_files_bounds_count(spark, tmp_path):
    import glob

    from pac_data_pipeline_spark.sources.layout import compact_small_files

    df = spark.range(10_000).withColumnRenamed("id", "k")
    # simulate sliver ingestion: 64 tiny input partitions
    df = df.repartition(64)
    out = str(tmp_path / "compacted")
    compact_small_files(df, out, target_rows_per_file=2_500, sort_cols=("k",))
    files = glob.glob(out + "/*.parquet")
    # ~10000/2500 = 4 files; the range sampler can wobble a file
    # either way under load — the property is "a handful, not 64"
    assert 2 <= len(files) <= 8
    back = spark.read.parquet(out)
    assert back.count() == 10_000


def test_z_order_value_interleaves_bijectively(spark):
    """De-interleaving the Z-value must recover both quantized
    coordinates exactly (the curve is a bijection on the grid)."""
    import numpy as np

    from pyspark.sql import functions as F

    from pac_data_pipeline_spark.sources.layout import z_order_value

    bits = 8
    rng = np.random.default_rng(3)
    xs = rng.integers(0, 1000, 200)
    ys = rng.integers(0, 1000, 200)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "x long, y long"
    )
    bounds = df.agg(
        F.min("x").alias("__b_x_min"), F.max("x").alias("__b_x_max"),
        F.min("y").alias("__b_y_min"), F.max("y").alias("__b_y_max"),
    )
    rows = (
        df.crossJoin(F.broadcast(bounds))
        .select(
            "x", "y", "__b_x_min", "__b_x_max", "__b_y_min", "__b_y_max",
            z_order_value(("x", "y"), bits=bits).alias("z"),
        )
        .collect()
    )
    for r in rows:
        qx = int(
            (r.x - r['__b_x_min'])
            / (r['__b_x_max'] - r['__b_x_min'])
            * ((1 << bits) - 1)
        )
        qy = int(
            (r.y - r['__b_y_min'])
            / (r['__b_y_max'] - r['__b_y_min'])
            * ((1 << bits) - 1)
        )
        dx = dy = 0
        for i in range(bits):
            dx |= ((r.z >> (2 * i)) & 1) << i
            dy |= ((r.z >> (2 * i + 1)) & 1) << i
        assert (dx, dy) == (qx, qy)


def test_aqe_splits_skewed_join_partitions(spark):
    """Runtime skew handling: a 95%-one-key join under AQE must come
    out of execution with the sort-merge join marked skew=true —
    the skewed partition was split into parallel subtasks instead of
    serializing on one reducer. (Thresholds lowered to make the
    local dataset 'big'; at production defaults the same mechanics
    trigger at 256 MB partitions.)"""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in overrides}
    for k, v in overrides.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(500_000).select(
            F.when(F.col("id") % 50 != 0, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("p" * 64), F.col("id").cast("string")).alias(
                "pad"
            ),
        )
        right = spark.range(10_000).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        j = left.join(right, "k").groupBy().count()
        j.collect()
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p
        assert "skew=true" in p, p
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_aqe_converts_shuffle_join_to_broadcast_at_runtime(spark, tmp_path):
    """When runtime shuffle stats reveal a small build side the
    static planner couldn't size, AQE must replace the sort-merge
    join with a broadcast join mid-query."""
    from pyspark.sql import functions as F

    small_path = str(tmp_path / "small_dim")
    spark.range(100).select(
        F.col("id").alias("k"), F.lit("d").alias("dv")
    ).write.parquet(small_path)
    small = spark.read.parquet(small_path)
    big = spark.range(300_000).select(
        F.pmod(F.col("id"), F.lit(100)).alias("k"), F.col("id").alias("v")
    )
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10KB")
    try:
        j = big.join(small, "k").groupBy().count()
        j.collect()
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in p
        assert "BroadcastHashJoin" in p, p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """A partitioned fact joined to a filtered dim must plan a
    dynamic-pruning subquery: only the dim-selected partitions of
    the fact are listed/read — the join-driven analogue of static
    partition pruning, essential when the partition filter is only
    known via the dimension."""
    from pyspark.sql import functions as F

    fact_path = str(tmp_path / "fact")
    spark.range(100_000).select(
        (F.col("id") % 10).alias("part_k"), F.col("id").alias("v")
    ).write.partitionBy("part_k").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = (
        spark.range(10)
        .select(F.col("id").alias("part_k"), F.lit("x").alias("attr"))
        .filter(F.col("part_k") == 3)
    )
    q = fact.join(dim, "part_k").groupBy().count()
    sc = spark.sparkContext
    p = sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in p.lower(), p


def test_jaccard_prefix_filter_prunes_candidates(spark):
    """The property that lets the exact set-similarity join survive
    corpus scale: prefix-filter candidates are a small fraction of
    the all-pairs product (and still a superset of the answer —
    completeness is proven separately by the brute-force oracle and
    the hypothesis test)."""
    from pac_data_pipeline_spark.ext.dedup_text import (
        jaccard_candidate_pairs,
        jaccard_similarity_join,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = docs.count()
    all_pairs = n * (n - 1) / 2
    cand = jaccard_candidate_pairs(docs, threshold=0.4).count()
    assert cand < 0.1 * all_pairs, (cand, all_pairs)
    # PPJoin asymmetric mid-prefix probe + positional row filter:
    # the symmetric-prefix AllPairs formulation produced 1,523
    # candidates on this fixture (444,508 at sf0.1); the r9
    # formulation produces 460 (314,5xx at sf0.1). Pin the
    # reduction with headroom for generator drift — a regression
    # to symmetric prefixes lands far above this line.
    assert cand < 800, cand
    # and the verified answer is a subset of the candidates
    matches = jaccard_similarity_join(docs, threshold=0.4).count()
    assert matches <= cand


def test_mixed_media_single_scan_single_shuffle(spark):
    """The mixed-format media query must build its table in ONE
    parquet scan, ONE fan-out repartition, and TWO Python stages
    (generate + featurize). The rejected alternative — a union of
    four per-format generators over per-branch filters — scans and
    shuffles the table four times, since differing filters defeat
    exchange reuse."""
    import re

    import __spark_entry__ as entry

    df = entry.queries()["x_multimodal_features"](
        spark, "/root/testdata/sf0.001"
    )
    p = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    assert len(re.findall(r"FileScan", p)) == 1, p
    assert len(re.findall(r"Exchange", p)) == 1, p
    assert len(re.findall(r"MapInPandas", p)) == 2, p
    # and every payload really decodes through the format dispatch
    rows = df.collect()
    assert rows and all(r.decoded for r in rows)


def test_dedup_cluster_family_scans_corpus_once(spark):
    """Regression pin for the multi-consumer corpus re-scan in the
    dedup-cluster family: before the localCheckpoint boundaries in
    `_jaccard_join_stages` (grams/ordered) and
    `connected_components` (sym/touched — a persist unpersisted
    before the returned lazy frame was consumed re-derived the full
    n-gram edge pipeline at consumption time), these plans carried
    6 / 9 / 10 FileScans of documents.parquet, EACH a full corpus
    re-tokenization — a genuine 100 TB scale-killer despite green
    correctness. Pinned: the verify join reads only checkpointed
    frames (0 scans), clustering re-reads the corpus once for the
    singleton union, representatives once more for the quality
    projection."""
    import re

    import __spark_entry__ as entry

    qs = entry.queries()

    def scans(name):
        p = plan(qs[name](spark, SF), "simple")
        return len(re.findall(r"FileScan", p))

    assert scans("x_jaccard_join") == 0
    assert scans("x_dedup_clusters") <= 1
    assert scans("x_dedup_representatives") <= 2


def test_iterative_graph_plans_have_bounded_scans(spark):
    """Regression pin for the plan-inlining explosion: an
    unmaterialized multi-consumer subplan (the 5-way-union edge
    fixture) inlines into EVERY consumer — the triangle plan hit
    110 FileScans / 9.5 s before the operators materialized their
    edge tables, and iterative dist/centroid chains double per
    hop/step (O(2^n) subplan copies). With the localCheckpoint
    boundaries in place, scan counts must stay small and CONSTANT
    in iteration depth."""
    import re as _re

    from pac_data_pipeline_spark.ext.graph import (
        TRIANGLE_MULTIPLIERS,
        functional_edges,
        khop_distances,
        pagerank,
        triangle_counts,
    )

    nodes = spark.range(200).select(F.col("id").alias("doc_id"))
    edges = functional_edges(nodes, multipliers=TRIANGLE_MULTIPLIERS)

    def scans(df):
        p = df._jdf.queryExecution().executedPlan().toString()
        return len(_re.findall(r"FileScan|Scan ExistingRDD", p))

    assert scans(triangle_counts(nodes, edges)) <= 12
    assert scans(pagerank(nodes, edges)) <= 16
    # constant in depth: 3 hops and 6 hops must cost the same scans
    s3 = scans(khop_distances(nodes, edges, n_hops=3))
    s6 = scans(khop_distances(nodes, edges, n_hops=6))
    assert s3 == s6, (s3, s6)


def test_selection_retrieval_family_scans_corpus_once(spark):
    """Scan-count pins for the r8 data-selection/retrieval family —
    the same multi-consumer discipline as the dedup-cluster pin
    above. bm25_rank pre-r8 derived dl/tf/stats/dfreq as four
    consumers of the lazy token stream: Catalyst inlined the
    tokenize subplan into each (5 corpus FileScans; x_rrf_fusion
    inherited 7). With the per-doc conditional aggregate
    localCheckpointed: one tokenize pass + one id-only N scan.
    x_dsir_weights checkpoints its (doc,bucket) frame for its three
    consumers (1 residual scan: the final doc-id list);
    x_bloom_decontaminate reads the corpus twice (probe grams +
    doc-id list) and the eval set once — all three scans narrow or
    gram-bearing exactly once."""
    import re

    import __spark_entry__ as entry

    qs = entry.queries()

    def scans(name):
        p = plan(qs[name](spark, SF), "simple")
        return len(re.findall(r"FileScan", p))

    assert scans("x_bm25") == 1
    assert scans("x_rrf_fusion") <= 3
    assert scans("x_dsir_weights") == 1
    assert scans("x_bloom_decontaminate") <= 3
    # the text-stats family, same fix (was 3/4/4/4/6 corpus scans):
    # checkpointed (doc,token) counts, one-aggregate bigram stats,
    # padded-pair LM counts, checkpointed gram frame, melted
    # one-pass skew profile
    assert scans("x_tfidf_terms") == 1
    assert scans("x_collocations") <= 2
    assert scans("x_lm_perplexity") == 1
    assert scans("x_ngram_jaccard") <= 2
    assert scans("x_skew_profile") == 0


def test_graph_pipeline_reconcile_scan_counts(spark):
    """Scan pins for the remaining r8 multi-consumer fixes:
    pagerank/ppr materialize the node list (was n_iter+2 corpus
    column scans — 8 FileScans at 3 iterations), the train-corpus
    pipeline checkpoints its dedup stage boundary (was 4: the
    survivors fed decontamination's gram explode, its doc-id spine,
    AND the manifest join), J3 reconciliation collapses two side
    counts + an anti join into one union-aggregate pass (2 scans =
    one per input frame), and logfreq's vocab table checkpoints."""
    import re

    import __spark_entry__ as entry

    qs = entry.queries()

    def scans(name):
        p = plan(qs[name](spark, SF), "simple")
        return len(re.findall(r"FileScan", p))

    assert scans("x_pagerank") == 0
    assert scans("x_ppr") == 0
    assert scans("pipe_train_corpus") <= 1
    assert scans("j3_reconcile_counts") <= 2
    assert scans("x_logfreq_score") == 1
