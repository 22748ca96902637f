"""Sorted-Neighborhood dedup (ext/snm.py): distributed global rank
exactness, window semantics, multi-pass union, and the null guard."""

import pytest

from pyspark.sql import functions as F

from pac_data_pipeline_spark.ext.snm import (
    global_rank,
    snm_dedup_pairs,
    snm_normalized_key_frame,
)


def test_global_rank_matches_total_order(spark):
    # ranks must equal position in ORDER BY (key, id) — exactly,
    # regardless of how the range partitioner splits the data
    rows = [(i, f"k{(i * 7) % 20:03d}") for i in range(100)]
    df = spark.createDataFrame(rows, "id long, key string").repartition(7)
    ranked = global_rank(df, ["key", "id"], rank_col="r")
    got = [
        (row["key"], row["id"])
        for row in ranked.orderBy("r").collect()
    ]
    assert got == sorted(got)
    rs = sorted(row["r"] for row in ranked.collect())
    assert rs == list(range(100))


def test_snm_finds_prefix_clustered_pair(spark):
    # two docs sharing a long prefix sort adjacent in the forward
    # pass; a third, distant doc does not pair with them
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),
        (3, "zzz yyy xxx www vvv uuu"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = snm_dedup_pairs(df, window=2, n=1, threshold=0.5).collect()
    pairs = {(row["id_a"], row["id_b"]) for row in out}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)


def test_snm_multipass_reversed_key_rescues_head_divergence(spark):
    # doc 1/2 share their TAIL but diverge at the head: the forward
    # key separates them, the reversed key sorts them adjacent.
    # Window 2 with >=2 separator docs in between on the forward
    # order makes the reversed pass load-bearing.
    shared = "common shared suffix tokens here"
    rows = [
        (1, "aaa " + shared),
        (2, "zzz " + shared),
        (3, "bbb unrelated filler text one"),
        (4, "ccc unrelated filler text two"),
        (5, "ddd unrelated filler text three"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = snm_dedup_pairs(df, window=2, n=1, threshold=0.5).collect()
    by_pair = {(row["id_a"], row["id_b"]): row["passes"] for row in out}
    assert by_pair.get((1, 2)) == 1  # reversed pass only


def test_snm_exact_dup_found_by_both_passes(spark):
    rows = [
        (1, "identical text body here"),
        (2, "identical text body here"),
        (3, "totally different content words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = snm_dedup_pairs(df, window=3, n=1, threshold=0.9).collect()
    by_pair = {(row["id_a"], row["id_b"]): row for row in out}
    assert (1, 2) in by_pair
    assert by_pair[(1, 2)]["passes"] == 2
    assert by_pair[(1, 2)]["jaccard"] == pytest.approx(1.0)


def test_snm_null_text_never_matches(spark):
    # null docs key as '' and sort adjacent, but the null-gram guard
    # scores the pair UNKNOWN and the threshold drops it
    rows = [(1, None), (2, None), (3, "some real text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = snm_dedup_pairs(df, window=3, n=1, threshold=0.1).collect()
    assert out == []


def test_snm_key_frame_is_ascii_sanitized(spark):
    df = spark.createDataFrame(
        [(1, "Héllo WORLD suffix"), (2, None)],
        "doc_id long, text string",
    )
    keys = {
        row["doc_id"]: (row["k_fwd"], row["k_rev"])
        for row in snm_normalized_key_frame(df).collect()
    }
    assert keys[1][0] == "hllo world suffi"  # é stripped, lowered
    assert keys[1][1] == "xiffus dlrow oll"[: len(keys[1][1])]
    assert keys[2] == ("", "")
