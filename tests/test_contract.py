"""Driver-contract meta-tests: the queries()/oracle_sql() mapping is
consistent, and every declared query builds a valid plan and
produces rows on the smallest fixture. Catches a broken entry before
the round driver does."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

#: Queries whose semantics need more rows than sf0.001 provides to
#: emit anything (LSH band collisions, near-dup thresholds).
MAY_BE_EMPTY = {
    "x_minhash_near_dup",
    "x_embedding_near_dup",
    "h3_shipping_priority",
}


def test_every_oracle_key_has_a_query():
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    assert o <= q, f"oracle keys without queries: {sorted(o - q)}"


def test_rows_only_set_is_intentional():
    """Queries without an oracle must be the documented
    non-SQL-expressible ones — a typo'd key would silently demote a
    query to the weaker rows-only check."""
    q = set(entry.queries())
    o = set(entry.oracle_sql())
    expected_rows_only = {
        "p6_uuid_records",  # uuid() nondeterministic
        "k5_keyed_tree",  # JSON key order engine-specific
        "x_minhash_near_dup",  # engine hash function
        "x_multimodal_features",  # float features; dims ARE decoded
        "x_approx_stats",  # sketches are engine-specific
        "x_hll_distinct",  # HLL estimates are engine-specific
    }
    assert q - o == expected_rows_only


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_query_builds_and_runs_on_smallest_sf(spark, name):
    df = entry.queries()[name](spark, SF)
    n = df.count()
    assert df.schema.fields, name
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name} returned 0 rows at sf0.001"


def test_entry_returns_rows(spark):
    out = entry.entry(spark)
    assert out.count() > 0


def test_cli_list_and_run(tmp_path):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "pac_data_pipeline_spark", "list", "dedup"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0
    assert "j2_dedup_keep_first" in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "pac_data_pipeline_spark", "run",
         "a6_distinct_values", "-n", "5"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "a6_distinct_values" in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "pac_data_pipeline_spark", "explain",
         "a1_groupby_sum"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "Physical Plan" in r.stdout
