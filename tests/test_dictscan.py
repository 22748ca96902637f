"""Dictionary scan (ext/dictscan.py): Aho–Corasick semantics pinned
against hand-computable fixtures — overlap counting, failure-link
transitions across patterns, suffix-output merging — plus the
mine/apply split contract."""

from pac_data_pipeline_spark.ext.dictscan import (
    _build_automaton,
    dictionary_scan,
    phrase_dictionary,
)


def _count(phrases, tokens):
    trans, fail, out = _build_automaton(
        [tuple(p.split(" ")) for p in phrases]
    )
    counts = [0] * len(phrases)
    s = 0
    for tok in tokens:
        while s and tok not in trans[s]:
            s = fail[s]
        s = trans[s].get(tok, 0)
        for pid in out[s]:
            counts[pid] += 1
    return counts


def test_automaton_counts_overlapping_matches():
    assert _count(["a a"], ["a", "a", "a", "a"]) == [3]


def test_automaton_failure_link_across_patterns():
    # after reading "a b", the next "c" has no edge from the "a b"
    # state — the failure link must land in the "b" state so "b c"
    # still matches
    assert _count(["b c", "a b x"], ["a", "b", "c"]) == [1, 0]


def test_automaton_suffix_outputs_merge():
    # "b c" is a suffix of "a b c": one scan position must emit both
    assert _count(["a b c", "b c"], ["a", "b", "c"]) == [1, 1]


def test_automaton_shared_prefix_patterns():
    counts = _count(
        ["x y", "x z"], ["x", "y", "x", "z", "x", "y"]
    )
    assert counts == [2, 1]


def test_phrase_dictionary_full_windows_and_ties(spark):
    # doc shorter than L contributes no L-phrases; ties break
    # lexicographically ascending after count descending
    df = spark.createDataFrame(
        [(0, "b b b"), (2, "a a a"), (4, "c")],
        "doc_id long, text string",
    )
    got = [
        (r["length"], r["phrase"], r["dict_count"])
        for r in phrase_dictionary(
            df, lengths=(2,), per_length=2
        ).collect()
    ]
    assert got == [(2, "a a", 2), (2, "b b", 2)]


def test_dictionary_scan_mine_apply_split(spark):
    # dictionary mined from even ids only; matches counted on odd
    # ids only; a phrase absent from the odd half reports 0/0
    rows = [
        (0, "alpha beta alpha beta"),        # mines "alpha beta" (x2)
        (2, "gamma delta gamma delta"),      # mines "gamma delta" (x2)
        (1, "alpha beta alpha beta alpha"),  # 2 matches, 1 doc
        (3, "alpha beta zzz"),               # 1 match, 1 doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["phrase"]: r
        for r in dictionary_scan(
            df, lengths=(2,), per_length=2
        ).collect()
    }
    ab = got["alpha beta"]
    assert (ab["dict_count"], ab["n_docs"], ab["n_matches"]) == (2, 2, 3)
    gd = got["gamma delta"]
    assert (gd["dict_count"], gd["n_docs"], gd["n_matches"]) == (2, 0, 0)
