"""Tokenizer round-trip contract (ext/roundtrip.py): held-in
training, full-corpus encode+detok, UNK accounting — including the
non-vacuity fixture (held-out-only characters MUST produce UNKs for
unigram/WordPiece and must NOT for BPE) and a direct Spark-vs-DuckDB
parity run of all three oracles on that fixture, so the UNK branch
is differentially verified even though the clean generator corpus
never reaches it."""

from __future__ import annotations

import os

import duckdb
import pytest

from pac_data_pipeline_spark.ext.roundtrip import (
    _train_split,
    bpe_roundtrip,
    bpe_roundtrip_sql,
    unigram_roundtrip,
    unigram_roundtrip_sql,
    wordpiece_roundtrip,
    wordpiece_roundtrip_sql,
)

# even doc_ids train; doc 5 carries a character ('z') the training
# split never sees; doc 7 carries a non-BMP emoji (codepoint-vs-
# code-unit tripwire); doc 9 is blank, doc 11 NULL text
CORPUS = [
    (0, "abab cac abc abab"),
    (2, "cab abba bac cab abab"),
    (4, "abc bca cab abba"),
    (6, "abab abba cac bca"),
    (1, "abab cab bca"),
    (3, "abba abc cac"),
    (5, "abz cab abab"),
    (7, "ab\U0001f600b cab"),
    (9, "   "),
    (11, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _by_id(rows):
    return {r["doc_id"]: r for r in rows}


def test_bpe_roundtrip_always_lossless(spark, docs):
    out = _by_id(bpe_roundtrip(_train_split(docs), docs).collect())
    assert len(out) == len(CORPUS)
    for r in out.values():
        assert r["lossless"], r
        assert r["n_unk"] == 0, r
        # pieces never outnumber characters, never undercut words
        assert r["n_pieces"] >= r["n_tokens_ws"]
    assert out[9]["n_tokens_ws"] == 0 and out[9]["n_pieces"] == 0
    assert out[11]["n_tokens_ws"] == 0 and out[11]["lossless"]


def test_unigram_roundtrip_unk_on_held_out_chars(spark, docs):
    out = _by_id(unigram_roundtrip(_train_split(docs), docs).collect())
    # training-split docs reconstruct (their words are all reachable)
    for i in (0, 2, 4, 6, 1, 3):
        assert out[i]["lossless"] and out[i]["n_unk"] == 0, out[i]
    # held-out-only characters are unreachable → UNK, lossy
    assert out[5]["n_unk"] == 1 and not out[5]["lossless"], out[5]
    assert out[7]["n_unk"] == 1 and not out[7]["lossless"], out[7]
    # the UNK word still counts exactly one piece
    assert out[5]["n_pieces"] >= out[5]["n_tokens_ws"]


def test_wordpiece_roundtrip_unk_on_held_out_chars(spark, docs):
    out = _by_id(
        wordpiece_roundtrip(_train_split(docs), docs).collect()
    )
    for i in (0, 2, 4, 6, 1, 3):
        assert out[i]["lossless"] and out[i]["n_unk"] == 0, out[i]
    assert out[5]["n_unk"] == 1 and not out[5]["lossless"], out[5]
    # non-BMP char: Python/DuckDB treat it as ONE unseen codepoint
    assert out[7]["n_unk"] == 1 and not out[7]["lossless"], out[7]


def test_roundtrip_oracle_parity_on_unk_fixture(spark, docs, tmp_path):
    """All three oracles vs Spark on the UNK fixture — the branch
    the clean-corpus gate can never reach."""
    pq = os.path.join(str(tmp_path), "documents.parquet")
    docs.toPandas().to_parquet(pq, index=False)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
    for fn, sql in (
        (bpe_roundtrip, bpe_roundtrip_sql(n_merges=8)),
        (unigram_roundtrip, unigram_roundtrip_sql()),
        (wordpiece_roundtrip, wordpiece_roundtrip_sql(n_merges=8)),
    ):
        got = {
            r["doc_id"]: (
                r["n_tokens_ws"], r["n_pieces"], r["n_unk"],
                r["lossless"],
            )
            for r in fn(_train_split(docs), docs).collect()
        }
        want = {
            r[0]: (r[1], r[2], r[3], r[4])
            for r in con.execute(sql).fetchall()
        }
        assert got == want, fn.__name__
