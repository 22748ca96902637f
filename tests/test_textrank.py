"""TextRank (ext/textrank.py): co-occurrence graph construction and
the integer fixed-point ranking on hand-checkable fixtures."""

from pac_data_pipeline_spark.ext.textrank import (
    cooccurrence_edges,
    textrank_keywords,
)


def test_cooccurrence_edges_undirected_weighted_no_self_loops(spark):
    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "b b c")], "doc_id long, text string"
    )
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in cooccurrence_edges(df).collect()
    }
    # "a b a b": a-b, b-a, a-b  ->  w(a->b) = w(b->a) = 3
    # "b b c":   b-b dropped (self-loop), b-c once
    assert got[("a", "b")] == 3 and got[("b", "a")] == 3
    assert got[("b", "c")] == 1 and got[("c", "b")] == 1
    assert ("b", "b") not in got


def test_textrank_hub_outranks_leaves(spark):
    # star graph: "hub x" for many distinct x — the hub accumulates
    # every leaf's full push and must rank first
    rows = [(i, f"hub leaf{i}") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = textrank_keywords(df, top_k=7).collect()
    assert out[0]["token"] == "hub"
    assert out[0]["score"] > out[1]["score"]
    # leaves are symmetric: identical scores, ties broken by token
    leaves = [r["token"] for r in out[1:]]
    assert leaves == sorted(leaves)
    assert len({r["score"] for r in out[1:]}) == 1


def test_textrank_integer_scores_deterministic(spark):
    df = spark.createDataFrame(
        [(0, "x y z x y")], "doc_id long, text string"
    )
    a = [(r["token"], r["score"]) for r in textrank_keywords(df).collect()]
    b = [(r["token"], r["score"]) for r in textrank_keywords(df).collect()]
    assert a == b
    assert all(isinstance(s, int) and s > 0 for _, s in a)


def test_textrank_null_and_short_docs_contribute_nothing(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "solo"), (2, "p q")],
        "doc_id long, text string",
    )
    out = textrank_keywords(df).collect()
    # only the p-q edge exists; "solo" has no adjacency, null is out
    assert {r["token"] for r in out} == {"p", "q"}
