"""retrieval_eval (ext/similarity.py): exact-integer nDCG@k / RR
semantics pinned on hand-computed fixtures, and the fusion-wins
property on a complementary-legs fixture (the construction RRF
exists for: each leg sees half the relevant set; the fused list
covers both and must out-rank either leg)."""

from __future__ import annotations

from pac_data_pipeline_spark.ext.similarity import (
    ndcg_discount_micro,
    retrieval_eval,
)

RUN_SCHEMA = "system string, query_id int, doc_id long, rank int"
QREL_SCHEMA = "query_id int, doc_id long, rel int"


def test_discount_table_values():
    d = dict(ndcg_discount_micro(10))
    assert d[1] == 1_000_000  # 1/log2(2)
    assert d[3] == 500_000  # 1/log2(4)
    assert d[2] == 630_930  # round(1e6/log2(3))
    assert len(d) == 10


def test_ndcg_and_rr_hand_computed(spark):
    # one query, one graded doc: finding it at rank 1 is perfect;
    # at rank 2 it scores exactly disc(2)/disc(1) ppm
    runs = spark.createDataFrame(
        [("a", 0, 10, 1), ("b", 0, 99, 1), ("b", 0, 10, 2)], RUN_SCHEMA
    )
    qrels = spark.createDataFrame([(0, 10, 1)], QREL_SCHEMA)
    out = {
        (r["system"], r["query_id"]): (r["ndcg_ppm"], r["rr_micro"])
        for r in retrieval_eval(runs, qrels).collect()
    }
    assert out[("a", 0)] == (1_000_000, 1_000_000)
    assert out[("b", 0)] == (630_930, 500_000)


def test_ungraded_query_scores_zero(spark):
    runs = spark.createDataFrame([("a", 1, 5, 1)], RUN_SCHEMA)
    qrels = spark.createDataFrame([(0, 5, 2)], QREL_SCHEMA)
    (row,) = retrieval_eval(runs, qrels).collect()
    assert row["ndcg_ppm"] == 0 and row["rr_micro"] == 0


def test_fusion_beats_complementary_legs(spark):
    # relevant docs 1..6 (grades 3,3,2,2,1,1); bm25 sees the odd
    # half, dense the even half, each padded with noise; the fused
    # list interleaves both halves — strictly more of the ideal
    # prefix than either leg can reach
    qrels = spark.createDataFrame(
        [(0, 1, 3), (0, 2, 3), (0, 3, 2), (0, 4, 2), (0, 5, 1),
         (0, 6, 1)],
        QREL_SCHEMA,
    )
    bm25 = [(1, 1), (3, 2), (5, 3), (101, 4), (102, 5)]
    dense = [(2, 1), (4, 2), (6, 3), (103, 4), (104, 5)]
    rrf = [(1, 1), (2, 2), (3, 3), (4, 4), (5, 5), (6, 6),
           (101, 7), (103, 8)]
    rows = (
        [("bm25", 0, d, r) for d, r in bm25]
        + [("dense", 0, d, r) for d, r in dense]
        + [("rrf", 0, d, r) for d, r in rrf]
    )
    runs = spark.createDataFrame(rows, RUN_SCHEMA)
    out = {
        r["system"]: r["ndcg_ppm"]
        for r in retrieval_eval(runs, qrels).collect()
    }
    assert out["rrf"] > out["bm25"]
    assert out["rrf"] > out["dense"]
    # and the fused list that found everything in order is perfect
    assert out["rrf"] == 1_000_000
