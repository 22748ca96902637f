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


DUP_REPRESENTATIVES = [
    # the dedup/near-dup family against a clone where the positive
    # class actually exists: the generator's clean data has almost
    # no genuine duplicates, so without this gate these queries'
    # verdicts never exercise a real duplicate group / near-dup
    # band / cosine-1 pair
    "x_dedup_exact_groups",  # real multi-member content-hash groups
    "j2_dedup_keep_first",   # keep-first across real duplicates
    "x_minhash_portable",    # LSH bands actually colliding
    "x_simhash_pairs",       # hamming-band pairs firing
    "x_jaccard_join",        # prefix-filter candidates surviving verify
    "x_dedup_clusters",      # multi-node connected components
    "x_dedup_representatives",
    "x_ngram_novelty",       # assembled-from-seen docs scoring low
    "x_chunk_dedup",         # window-level spans deduping
    "x_embedding_near_dup_axis",  # exact-copy vectors at cosine 1
    "x_decontaminate",       # duplicated text crossing the eval set
    "x_bloom_decontaminate",
]


@pytest.fixture(scope="module")
def dupes_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_dupes"))
    r = subprocess.run(
        [
            sys.executable,
            "tools/nullfuzz.py",
            "--dupes",
            "/root/testdata/sf0.001",
            out,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    return out


def test_dedup_family_fires_and_matches_on_duplicate_injection(dupes_dir):
    """Differential + non-vacuous: the dedup family must hash-match
    its oracles on the duplicate-injected clone AND actually find
    duplication (exact groups shrink below the row count)."""
    r = subprocess.run(
        [
            sys.executable,
            "tools/check_oracle.py",
            dupes_dir,
            *DUP_REPRESENTATIVES,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert ", 0 failed," in r.stdout, r.stdout[-3000:]
    # non-vacuous: exact dedup found real groups (fewer groups than
    # docs) — parse its [ok] line row count from the gate output
    import re as _re

    m = _re.search(r"\[ok\] x_dedup_exact_groups: (\d+) rows", r.stdout)
    assert m, r.stdout[-2000:]
    import duckdb as _duck

    n_docs = _duck.connect().execute(
        f"SELECT count(*) FROM '{dupes_dir}/documents.parquet'"
    ).fetchone()[0]
    assert int(m.group(1)) < n_docs, (m.group(1), n_docs)


SKEW_REPRESENTATIVES = [
    # the three queries the skew clone actually broke (underdetermined
    # keep-first ties; Double.toString scientific notation above 1e7)
    "j2_dedup_keep_first",
    "pipe_snowflake_batch",
    "a10_nested_rollup",
    # the skew-safe operators, under real heavy hitters for once
    "x_salted_sum",
    "x_skew_distinct",
    "x_skew_profile",
    "a1_groupby_sum",
    "x_top_tokens",
    "x_sessionize",
]


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_skew"))
    r = subprocess.run(
        [
            sys.executable,
            "tools/nullfuzz.py",
            "--skew",
            "/root/testdata/sf0.001",
            out,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    return out


def test_skew_clone_gate(skew_dir):
    """Heavy-hitter robustness: the gate must hold when one user owns
    ~35% of events, one part ~30% of lineitem, and a stopword floods
    20% of documents. This clone found two real defect classes on
    first run: keep-first dedup with a non-total order (engine-
    dependent winners on payload-distinct ties) and Java
    Double.toString scientific notation in JSON payloads above 1e7."""
    r = subprocess.run(
        [
            sys.executable,
            "tools/check_oracle.py",
            skew_dir,
            *SKEW_REPRESENTATIVES,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert ", 0 failed," in r.stdout, r.stdout[-3000:]


PATHO_REPRESENTATIVES = [
    # the gram-explode family, whose quadratic-in-|doc| prefix
    # machinery has per-doc guards (min_grams, tiny-string
    # exclusion, k-bounded suffixes) that were contract-tested but
    # never fuzz-gated end-to-end against pathological LENGTHS
    "x_jaccard_join",
    "x_containment_join",
    "x_edit_join",
    "x_suffix_dups",
    "x_lsh_tuning",
    "x_ngram_novelty",
    "x_chunk_dedup",
    "x_doc_chunks",
    # length-sensitive quality/stat filters on a 1 MB doc and a
    # 0-length flood
    "x_gopher_rules",
    "x_c4_filters",
    "x_sentence_stats",
    "x_token_budget",
    # the tokenizer lifecycles: their oracles' unrolled word-length
    # tripwires must HOLD (short words inside huge docs), not fire
    "x_bpe_encode",
    "x_unigram_encode",
]


@pytest.fixture(scope="module")
def patho_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_patho"))
    r = subprocess.run(
        [
            sys.executable,
            "tools/nullfuzz.py",
            "--patho",
            "/root/testdata/sf0.001",
            out,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    return out


def test_patho_clone_gate(patho_dir):
    """Pathological-length robustness: the gate must hold with one
    ~1 MB document, an 80-doc contiguous 0-length flood, and
    max-length single-line unicode docs in the corpus. Non-vacuity
    is asserted on the clone itself (the megadoc and the flood
    really exist), so a future generator edit can't silently turn
    this into a no-op gate."""
    import duckdb as _duck

    big, flood = _duck.connect().execute(
        f"""SELECT max(len(text)),
                   sum(CASE WHEN text = '' THEN 1 ELSE 0 END)
            FROM '{patho_dir}/documents.parquet'"""
    ).fetchone()
    assert big >= 1_000_000, big
    assert flood >= 50, flood
    r = subprocess.run(
        [
            sys.executable,
            "tools/check_oracle.py",
            patho_dir,
            *PATHO_REPRESENTATIVES,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert ", 0 failed," in r.stdout, r.stdout[-3000:]


PATHO2_REPRESENTATIVES = [
    # the distinct-gram axis: vocab-frame tokenizer lifecycles (the
    # word frame jumps ~30 -> ~20k entries), the prefix/posting-list
    # similarity joins (every megadoc gram is globally rare, so it
    # lands IN the rarest-first prefixes), and the suffix machinery
    # (15k unique suffix starts in one doc)
    "x_bpe_train",
    "x_bpe_encode",
    "x_unigram_train",
    "x_unigram_encode",
    "x_wordpiece_train",
    "x_wordpiece_encode",
    "x_roundtrip_bpe",
    "x_roundtrip_unigram",
    "x_roundtrip_wordpiece",
    "x_jaccard_join",
    "x_containment_join",
    "x_suffix_dups",
    "x_top_tokens",
    "x_ngram_novelty",
]


@pytest.fixture(scope="module")
def patho2_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("sf_patho2"))
    r = subprocess.run(
        [
            sys.executable,
            "tools/nullfuzz.py",
            "--patho2",
            "/root/testdata/sf0.001",
            out,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    return out


def test_patho2_clone_gate(patho2_dir):
    """High-entropy megadoc robustness: the distinct-gram axis the
    repeated-sentence --patho clone deliberately avoids. Non-vacuity
    asserted on the clone itself: the corpus-wide distinct-word
    count must exceed 15k (vs ~30 in generator data), so a future
    generator edit can't silently reduce this to a no-op gate."""
    import duckdb as _duck

    nwords, big = _duck.connect().execute(
        f"""SELECT count(DISTINCT w), max(len(text)) FROM (
                SELECT unnest(string_split_regex(trim(text, ' '),
                    '[ \\t\\n\\f\\r]+')) AS w, text
                FROM '{patho2_dir}/documents.parquet'
            )"""
    ).fetchone()
    assert nwords >= 15_000, nwords
    assert big >= 100_000, big
    r = subprocess.run(
        [
            sys.executable,
            "tools/check_oracle.py",
            patho2_dir,
            *PATHO2_REPRESENTATIVES,
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert ", 0 failed," in r.stdout, r.stdout[-3000:]
