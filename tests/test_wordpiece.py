"""WordPiece tokenizer (ext/wordpiece.py): equality with a
plain-Python reference trainer (exact-rational argmax), greedy
longest-match encode checks, and the empty/contract edges."""

from __future__ import annotations

import re
from collections import Counter
from fractions import Fraction

from pac_data_pipeline_spark.ext.text import py_tokens
from pac_data_pipeline_spark.ext.wordpiece import (
    _SCALE,
    wordpiece_encode,
    wordpiece_train,
)

CORPUS = [
    "quick quick brown fox fox fox",
    "the quick brown dog dog",
    "brown fox quick the the",
    None,
    " ",
    "fox\tbrown\nquick",
]


def _py_train(texts, n_merges=8):
    """Independent reference: likelihood argmax via exact Fractions
    (NOT the quantized quotient — agreement proves the 1e-18
    quantization never flipped an argmax on this corpus), same
    (left, right) ASC tie order, same leftmost-bounded rewrite."""
    words = Counter(w for t in texts for w in py_tokens(t))
    vocab = Counter({" ".join(w): f for w, f in words.items()})
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        units: Counter = Counter()
        for syms, f in vocab.items():
            parts = syms.split(" ")
            for u in parts:
                units[u] += f
            for a, b in zip(parts, parts[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = None
        best_score = None
        for p, c in sorted(pairs.items()):
            s = Fraction(c, units[p[0]] * units[p[1]])
            if best_score is None or s > best_score:
                best, best_score = p, s
        l, r = best
        score_q = pairs[best] * _SCALE // (units[l] * units[r])
        merges.append((rank, l, r, pairs[best], score_q))
        pat = re.compile(
            r"(?<!\S)" + re.escape(l) + " " + re.escape(r) + r"(?!\S)"
        )
        nxt: Counter = Counter()
        for syms, f in vocab.items():
            nxt[pat.sub(l + r, syms)] += f
        vocab = nxt
    return merges


def test_wordpiece_train_matches_python_reference(spark):
    """Spark trainer equals the exact-Fraction reference merge for
    merge — and since the reference argmax uses UNQUANTIZED ratios,
    agreement also proves the 1e-18 integer quantization never
    flipped a selection on this corpus."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = [
        (r.rank, r.left, r.right, r.pair_count, r.score_q)
        for r in wordpiece_train(df).orderBy("rank").collect()
    ]
    want = _py_train(CORPUS)
    assert got == want


def test_wordpiece_prefers_cohesive_pairs(spark):
    """The likelihood argmax must pick the COHESIVE rare pair over
    the raw-frequency winner: 'qu' (q never appears without u)
    beats 'aa' (frequent but its parts are everywhere) — the exact
    property that separates WordPiece from BPE."""
    df = spark.createDataFrame(
        [("aa aa aa aa quz quz",)] * 2, "text string"
    )
    first = wordpiece_train(df, n_merges=1).collect()[0]
    assert (first["left"], first["right"]) == ("q", "u")


def test_wordpiece_encode_greedy_longest_match(spark):
    """Encode counts equal an independent greedy longest-match
    replay; docs with no words encode to (0, 0)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = wordpiece_train(df)
    pieces = {
        r.left + r.right for r in merges.select("left", "right").collect()
    }
    max_len = max((len(p) for p in pieces), default=1)

    def replay(w):
        pos, cnt = 0, 0
        while pos < len(w):
            m = 1
            for L in range(min(max_len, len(w) - pos), 1, -1):
                if w[pos : pos + L] in pieces:
                    m = L
                    break
            pos += m
            cnt += 1
        return cnt

    out = {
        r.doc_id: (r.n_tokens_ws, r.n_tokens_wordpiece)
        for r in wordpiece_encode(df, merges).collect()
    }
    for i, t in enumerate(CORPUS):
        words = py_tokens(t)
        assert out[i] == (len(words), sum(replay(w) for w in words)), i


def test_wordpiece_score_quotient_bounded(spark):
    """score_q ≤ 10^18 for every merge (cnt ≤ min(lcnt, rcnt)) —
    the bound that keeps the quotient inside BIGINT on both
    engines."""
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    for r in wordpiece_train(df).collect():
        assert 0 < r.score_q <= _SCALE, r


def test_wordpiece_n_merges_guard(spark):
    """n_merges=0 fails loudly everywhere (an empty UNION ALL list
    would otherwise emit malformed 'SELECT * FROM ()' SQL) — the
    same contract as the hits()/hits_fixture_sql n_iter guards."""
    import pytest

    from pac_data_pipeline_spark.ext.wordpiece import (
        wordpiece_encode_sql,
        wordpiece_train_sql,
    )

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    for n in (0, -1):
        with pytest.raises(ValueError, match="n_merges"):
            wordpiece_train(df, n_merges=n)
        with pytest.raises(ValueError, match="n_merges"):
            wordpiece_train_sql(n_merges=n)
        with pytest.raises(ValueError, match="n_merges"):
            wordpiece_encode_sql(n_merges=n)
