"""Null-robustness regression guard: fuzz a clone of the smallest
testdata in-test (tools/nullfuzz logic) and differentially check a
representative query slice — the queries whose null semantics broke
once already (window null ordering, null event time, all-null sums,
null-text similarity, to_json null fields). The full sweep is
`python tools/nullfuzz.py && python tools/check_oracle.py ...`."""

import subprocess
import sys

import pytest

REPRESENTATIVES = [
    "h_window_funcs",      # window ORDER BY null placement
    "h_window_distinct",   # cumulative window: null-day exclusion
    "j2_dedup_keep_first", # keep-first ordering with null keys
    "x_sessionize",        # null event-time exclusion
    "x_stream_sessions",   # stateful sum-over-all-null
    "x_ngram_jaccard",     # null-text similarity (was jaccard=1.0)
    "x_minhash_portable",  # null shingles (md5(null) aborted map build)
    "p7_doc_records",      # to_json null-field retention
    "h_moving_avg",        # integer-cents windowed mean
    "x_gopher_rules",      # HOF folds over null token arrays
]


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_nullfuzz"))
    r = subprocess.run(
        [sys.executable, "tools/nullfuzz.py", "/root/testdata/sf0.001", out],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    return out


def test_representative_queries_survive_null_fuzz(fuzz_dir):
    r = subprocess.run(
        [
            sys.executable,
            "tools/check_oracle.py",
            fuzz_dir,
            *REPRESENTATIVES,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert ", 0 failed," in r.stdout, r.stdout[-3000:]
