"""Unigram-LM tokenizer (ext/unigram.py): equality with a
plain-Python reference trainer, Viterbi optimality vs brute force,
and the encode/empty/contract edges — the bpe_train test model."""

from __future__ import annotations

import itertools
import math
from collections import Counter

import pytest

from pac_data_pipeline_spark.ext.text import py_tokens
from pac_data_pipeline_spark.ext.unigram import (
    _viterbi,
    unigram_encode,
    unigram_train,
)

CORPUS = [
    "low lower lowest low low",
    "new newer newest new news",
    "wide wider widest wide",
    "low new wide widely",
    "newest lowest widest",
    "er est ly low new",
    None,
    "   ",
    "low\tnew\nwide",
]


def _py_train(
    texts,
    n_rounds: int = 2,
    max_piece_len: int = 4,
    seed_multis: int = 64,
) -> dict[str, tuple[int, float]]:
    """Independent plain-Python reference: same seeding, same
    (cnt DESC, piece ASC) selection, same hard-EM with char floor,
    same round-6 -ln(cnt/total) costs."""
    words = Counter(w for t in texts for w in py_tokens(t))
    cand: Counter[str] = Counter()
    for w, f in words.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                cand[w[i : i + l]] += f
    pieces = {p: c for p, c in cand.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in cand.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:seed_multis]
    pieces.update(dict(multis))

    def costs(tbl: dict[str, int]) -> dict[str, float]:
        t = sum(tbl.values())
        return {p: round(-math.log(c / t), 6) for p, c in tbl.items()}

    for _ in range(n_rounds):
        ct = costs(pieces)
        newc: Counter[str] = Counter()
        for w, f in words.items():
            seg = _viterbi(w, ct, max_piece_len)
            assert seg is not None
            for p in seg:
                newc[p] += f
        pieces = {
            p: max(newc[p], 1 if len(p) == 1 else 0)
            for p in pieces
            if newc[p] > 0 or len(p) == 1
        }
    ct = costs(pieces)
    return {p: (c, ct[p]) for p, c in pieces.items()}


def test_unigram_train_matches_python_reference(spark):
    """The Spark trainer equals an independently written pure-Python
    trainer piece-for-piece: same surviving pieces after pruning,
    same expected counts, same round-6 costs."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = {
        r.piece: (r.cnt, r.cost) for r in unigram_train(df).collect()
    }
    want = _py_train(CORPUS)
    assert set(got) == set(want)
    for p, (cnt, cost) in want.items():
        assert got[p][0] == cnt, p
        assert got[p][1] == pytest.approx(cost, abs=1e-9), p


def test_viterbi_optimal_vs_bruteforce():
    """DP cost equals the brute-force minimum over ALL segmentations,
    the returned pieces concatenate to the word, and the tie order
    (equal cost -> fewer, longer pieces first from the right) is the
    documented one."""
    costs = {
        "a": 2.0,
        "b": 2.0,
        "ab": 3.5,
        "ba": 4.0,
        "aba": 6.5,
        "abab": 7.0,
        "bb": 4.0,
    }
    for word in ("abab", "ababa", "abba", "bbbb", "a", "ba"):
        seg = _viterbi(word, costs, 4)
        if seg is None:
            continue
        assert "".join(seg) == word
        got_cost = sum(costs[p] for p in seg)
        best = None
        n = len(word)
        for cuts in itertools.product([0, 1], repeat=n - 1):
            parts, prev = [], 0
            for i, c in enumerate(cuts, start=1):
                if c:
                    parts.append(word[prev:i])
                    prev = i
            parts.append(word[prev:])
            if all(p in costs and len(p) <= 4 for p in parts):
                tot = sum(costs[p] for p in parts)
                if best is None or tot < best:
                    best = tot
        assert best is not None
        assert got_cost == pytest.approx(best, abs=1e-12), word
    # tie: "ab" (3.5) vs unreachable-equal alternatives; equal-cost
    # tie prefers the LONGER last piece: cost("aa")? craft one —
    # c(a)+c(b) = 4.0 == c(ba): "ba" must segment as ["ba"]
    assert _viterbi("ba", costs, 4) == ["ba"]
    # unreachable: a char with no piece
    assert _viterbi("az", costs, 4) is None


def test_unigram_encode_counts_and_contract(spark):
    """Encode emits whitespace vs unigram token counts per doc —
    n_tokens_unigram re-derivable by running the shared Viterbi with
    the trained table; a corpus word that the piece table cannot
    reach raises loudly instead of silently diverging."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    pieces = unigram_train(df)
    ct = {r.piece: r.cost for r in pieces.select("piece", "cost").collect()}
    out = {
        r.doc_id: (r.n_tokens_ws, r.n_tokens_unigram)
        for r in unigram_encode(df, pieces).collect()
    }
    assert len(out) == len(CORPUS)
    for i, t in enumerate(CORPUS):
        words = py_tokens(t)
        segs = [_viterbi(w, ct, 4) for w in words]
        assert all(s is not None for s in segs)
        assert out[i] == (len(words), sum(len(s) for s in segs)), i

    alien = spark.createDataFrame([(0, "zzzqqq")], "doc_id long, text string")
    with pytest.raises(Exception, match="not segmentable"):
        unigram_encode(alien, pieces).collect()


def test_unigram_train_empty_and_null_corpus(spark):
    """Null-only and zero-row corpora train to an empty piece table
    and encode to (0, 0) counts — the --empty/--blank clone shape."""
    nulls = spark.createDataFrame(
        [(0, None), (1, "   ")], "doc_id long, text string"
    )
    pieces = unigram_train(nulls)
    assert pieces.count() == 0
    out = {
        r.doc_id: (r.n_tokens_ws, r.n_tokens_unigram)
        for r in unigram_encode(nulls, pieces).collect()
    }
    assert out == {0: (0, 0), 1: (0, 0)}


def test_unigram_prune_keeps_char_floor(spark):
    """After EM every single char of the corpus survives with
    cnt >= 1 (the coverage floor), even when multi-piece
    segmentations dominate — so any same-alphabet word stays
    encodable."""
    df = spark.createDataFrame(
        [("abab abab abab",)] * 3, "text string"
    )
    got = {r.piece: r.cnt for r in unigram_train(df).collect()}
    assert got.get("a", 0) >= 1 and got.get("b", 0) >= 1
    assert "abab" in got  # the dominant piece survives with mass
