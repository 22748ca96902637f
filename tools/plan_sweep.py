"""Fast standalone registry plan sweep — the scale-antipattern gate
that `tests/test_plans.py::test_no_scale_antipatterns_across_registry`
enforces in CI, runnable in ~1 minute WITHOUT the full test suite.

Run this after EVERY registry-touching commit (round-4 postmortem:
x_bm25 landed in the last commit of the round without a suite re-run
and shipped with an unwhitelisted BroadcastNestedLoopJoin — benign,
but RED CI). The whitelists below are the single source of truth;
the pytest sweep imports them from here.

Checked anti-patterns, per optimized physical plan:
- ``row-python``:  BatchEvalPython — row-at-a-time Python eval in the
  hot path (Pandas/Arrow eval shows as ArrowEvalPython and is fine);
- ``cartesian``:   CartesianProduct — an all-pairs product;
- ``bnl``:         BroadcastNestedLoopJoin outside ALLOWED_BNL — only
  documented tiny-frame broadcasts (1-row global stats, ≤5-row query
  sets) may use it;
- ``global-window``: Window + Exchange SinglePartition outside
  ALLOWED_GLOBAL_WINDOW — a window funnelling the table through one
  task is the canonical 100 TB scale-killer.

Usage: python tools/plan_sweep.py [sf_dir] [query ...]
Exit 0 = clean; exit 1 = violations (printed per query).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: Queries allowed a BroadcastNestedLoopJoin: the broadcast side is a
#: documented tiny frame (1-row global aggregate or a ≤5-row probe
#: set), so the "nested loop" is a constant-width map over the scan.
ALLOWED_BNL = {
    "x_cosine_topk",      # 5-row query set vs corpus (documented)
    "x_cosine_topk_ivf",  # 1-row centroid-probe broadcast
    "x_cosine_topk_pq",   # 5-row query set, ADC scoring
    "x_cosine_topk_ivfpq",  # 1-row cell + residual-codebook broadcasts
    "x_logfreq_score",    # 1-row corpus-total broadcast
    "x_collocations",     # 1-row bigram-total broadcast
    "h22_idle_rich",      # 1-row global-average broadcast
    "h11_important_stock",  # 1-row national-total broadcast (share HAVING)
    "h_equidepth",        # 1-row quantile-bounds broadcast
    "x_tfidf_terms",      # 1-row corpus doc-count broadcast
    "x_token_budget",     # 1-row cutoff broadcast
    "x_hard_negatives",   # 5-row anchor set vs corpus
    "x_negative_pairs",   # 1-row corpus-count broadcast
    "x_lm_perplexity",    # 1-row vocabulary-size broadcast
    "x_doremi_weights",   # 1-row vocab + reference-total + weight-
                          # normalizer broadcasts over the
                          # |domains|-row aggregate
    "x_lsh_tuning",       # 1-row pooled-verified-count broadcast
                          # onto the 3-row config table
    "x_nb_classifier",    # |labels|-row label-stats broadcast
    "x_bm25",             # 1-row (N, avgdl) corpus-stats broadcast
    "x_pagerank",         # 1-row node-count broadcast (teleport term)
    "x_hits",             # 1-row node-count + per-iteration 1-row
                          # L1-total broadcasts
    "x_ppr",              # 1-row seed-count broadcast (teleport term)
    "x_triangles",        # 1-row node-count broadcast (edge fixture mod-N)
    "x_khop_bfs",         # 1-row node-count broadcast (edge fixture mod-N)
    "x_kmeans",           # 1-row centroid-array broadcast (scan-side argmin)
    "x_rfm",              # 1-row quintile-boundary broadcast
    "x_cms_heavy_hitters",  # 1-row packed counter-matrix broadcast
    "x_dsir_weights",     # 1-row (R, T) feature-total broadcast
    "x_zipf_fit",         # 1-row corpus-totals broadcast onto the
                          # 1-row head regression
    "x_jl_recall",        # 5-row query sets vs corpus, both legs
                          # (the x_cosine_topk pattern, twice)
    "x_rrf_fusion",       # 1-row (N, avgdl) BM25-stats broadcast +
                          # 1-row query-vector broadcast (dense leg)
    "x_theta_setops",     # 1-row theta broadcasts + 1-row sketch/
                          # exact aggregate cross-joins (all frames
                          # ≤ 2k sketch rows by construction)
    "x_kcenter_coreset",  # 1-row center-table broadcast per greedy
                          # round (the x_kmeans centroid pattern)
    "x_textrank",         # 1-row node-count broadcast (teleport
                          # term — the x_pagerank pattern)
}

#: The Window+SinglePartition heuristic ANDs two independent plan
#: facts, so these are documented false positives (or by-design):
#: k3's window IS globally ordered by design (reference-faithful
#: oracle variant); x_tfidf_terms' SinglePartition belongs to its
#: 1-row global count aggregate while the window is doc-partitioned;
#: x_token_budget's running sum windows over ~100 bucket aggregates,
#: not corpus rows; h_funnel's window partitions by user_id — the
#: SinglePartition exchange is the final 1-row count aggregate;
#: x_nb_classifier's argmax window partitions by doc_id — its
#: SinglePartition exchanges are the 1-row corpus-count and
#: vocab-size aggregates feeding the broadcast label stats.
#: x_mutual_info's SUM() OVER () computes the grand total over the
#: |X|·|Y|-row JOINT AGGREGATE (25 rows here), not the input — the
#: single partition is the point (marginals without a second scan).
ALLOWED_GLOBAL_WINDOW = {
    "k3_batch_id",
    "x_tfidf_terms",
    "x_token_budget",
    "h_funnel",
    "x_nb_classifier",
    "x_mutual_info",
    # x_auc's running-negative window spans the DISTINCT-SCORE
    # aggregate (bounded by score cardinality), not the input.
    "x_auc",
    # x_benford's SUM() OVER () total spans the 9-row digit
    # aggregate, not the input.
    "x_benford",
    # x_temperature_mix's apportionment windows (total weight,
    # remainder rank, leftover) span the |domains|-row aggregate,
    # never the corpus.
    "x_temperature_mix",
    # x_reservoir_sample's Hamilton quota windows span the
    # |strata|-row count aggregate (same pattern); the corpus-side
    # rank is PARTITIONED by stratum, not global.
    "x_reservoir_sample",
    # x_cosine_topk_ivf's SinglePartition exchange is the n_cells-row
    # centroid table collapsing into the 1-row broadcast (the
    # kmeans assignment pattern); both rank windows are PARTITIONED
    # by query_id.
    "x_cosine_topk_ivf",
    # x_cosine_topk_pq: same — the n_codes-row per-subspace codebook
    # tables collapse into 1-row broadcasts; shortlist and rerank
    # windows are PARTITIONED by query_id.
    "x_cosine_topk_pq",
    # x_cosine_topk_ivfpq composes both of the above: cell AND
    # residual-codebook tables collapse into 1-row broadcasts; the
    # probe/shortlist/rerank windows are PARTITIONED by query_id.
    "x_cosine_topk_ivfpq",
    # x_rrf_fusion's two rank windows span the legs' top-100
    # TakeOrderedAndProject outputs (≤100 rows each), never the
    # corpus — fusion is post-retrieval by construction.
    "x_rrf_fusion",
    # x_zipf_fit's rank window spans the top-1000
    # TakeOrderedAndProject vocabulary head, never the corpus or
    # the full vocab (which aggregates separately).
    "x_zipf_fit",
}


def sweep(spark, sf_dir: str, names=None) -> dict[str, list[str]]:
    """Build every (batch) registry query's plan and return
    {name: [violation, ...]} for any scale anti-pattern found."""
    import __spark_entry__ as entry

    sc = spark.sparkContext
    bad: dict[str, list[str]] = {}
    for name, fn in entry.queries().items():
        if names and name not in names:
            continue
        if "stream" in name:
            continue  # streaming queries execute eagerly; pinned in tests
        df = fn(spark, sf_dir)
        p = sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "simple"
        )
        hits = []
        if "BatchEvalPython" in p:
            hits.append("row-python")
        if "CartesianProduct" in p:
            hits.append("cartesian")
        if "BroadcastNestedLoopJoin" in p and name not in ALLOWED_BNL:
            hits.append("bnl")
        if (
            "Window" in p
            and "Exchange SinglePartition" in p
            and name not in ALLOWED_GLOBAL_WINDOW
        ):
            hits.append("global-window")
        if hits:
            bad[name] = hits
    return bad


def main() -> int:
    from pac_data_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = set(sys.argv[2:]) or None
    spark = get_spark(
        app_name="plan_sweep", master="local[4]", shuffle_partitions=4
    )
    t0 = time.perf_counter()
    bad = sweep(spark, sf_dir, names)
    dt = time.perf_counter() - t0
    if bad:
        for name, hits in sorted(bad.items()):
            print(f"FAIL {name}: {', '.join(hits)}")
        print(f"plan sweep: {len(bad)} violating queries in {dt:.1f}s")
        return 1
    print(f"plan sweep: clean in {dt:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
