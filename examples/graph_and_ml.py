"""Graph + ML-analytics tier against the synthetic testdata: the
link graph gets PageRank, triangle counts, and a bounded BFS; the
embedding corpus gets fully-distributed fixed-point k-means and
SemDeDup semantic dedup; the event stream gets an A/B readout, an
exact AUC, EWMA smoothing, streak detection, and a Tukey-fence
outlier profile; orders get a Benford audit; lineitem gets
market-basket pair mining and a migration checksum.

Every one of these is oracle-exact in the differential gate — the
point of the demo is that the "ML" tier holds the same determinism
bar as the SQL tier.

Run:  python examples/graph_and_ml.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pac_data_pipeline_spark.session import get_spark
from pac_data_pipeline_spark.sources.readers import load_events, scan_parquet
from pac_data_pipeline_spark.ext.graph import (
    TRIANGLE_MULTIPLIERS,
    functional_edges,
    khop_distances,
    pagerank,
    personalized_pagerank,
    triangle_counts,
)
from pac_data_pipeline_spark.ext.kmeans import (
    kmeans_assign,
    planted_near_dups,
    semantic_dedup,
    semantic_dedup_eval,
)
from pac_data_pipeline_spark.operators.basket import frequent_pairs
from pac_data_pipeline_spark.operators.aggregates import rfm_segments
from pac_data_pipeline_spark.operators.quality import (
    benford_audit,
    table_checksum,
)
from pac_data_pipeline_spark.operators.skew import key_skew_profile
from pac_data_pipeline_spark.operators.stats import ab_test, auc, iqr_outliers
from pac_data_pipeline_spark.operators.timeseries import (
    ewma_smooth,
    longest_streaks,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graph_and_ml", master="local[4]")

    print("-- link graph: rank, triangles, 3-hop reach")
    nodes = scan_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id")
    edges = functional_edges(nodes, multipliers=TRIANGLE_MULTIPLIERS)
    pagerank(nodes, edges).orderBy(F.desc("rank")).show(3)
    personalized_pagerank(nodes, edges).orderBy(F.desc("rank")).show(3)
    tri = triangle_counts(nodes, edges)
    tri.agg(
        F.sum("n_triangles").alias("corner_incidences"),
        F.count(F.lit(1)).alias("nodes_in_triangles"),
    ).show()
    khop_distances(nodes, edges).groupBy("hops").count().orderBy("hops").show()

    print("-- embeddings: distributed k-means + SemDeDup")
    emb = scan_parquet(spark, f"{sf_dir}/embeddings.parquet")
    kmeans_assign(emb).groupBy("cluster").count().orderBy("cluster").show()
    dd = semantic_dedup(planted_near_dups(emb))
    dd.agg(
        F.count(F.lit(1)).alias("vectors"),
        F.sum(F.col("dup_of").isNotNull().cast("int")).alias("near_dups"),
    ).show()
    semantic_dedup_eval(emb).show()  # P/R/F1 vs the planted truth

    print("-- events: experiment readout, AUC, smoothing, streaks, fences")
    events = load_events(spark, sf_dir)
    ab_test(events, "event_type", "user_id", F.col("value") > 50).show()
    auc(events, "value", F.col("event_type") == F.lit("purchase")).show()
    ewma_smooth(events, "user_id", ("ts", "event_id"), "value").show(3)
    longest_streaks(events, "user_id", ("ts", "event_id"), "event_type") \
        .orderBy(F.desc("streak_len")).show(3)
    iqr_outliers(events, "event_type", "value").show()

    print("-- orders/lineitem: Benford audit, basket pairs, checksum")
    orders = scan_parquet(spark, f"{sf_dir}/orders.parquet")
    benford_audit(orders, "o_totalprice").orderBy("digit").show()
    li = scan_parquet(spark, f"{sf_dir}/lineitem.parquet")
    frequent_pairs(li, k=5).show()
    table_checksum(
        li,
        ("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
         "l_returnflag", "l_linestatus"),
    ).show()

    print("-- segmentation + skew diagnostics")
    rfm_segments(orders).groupBy("segment").count().orderBy("segment").show()
    key_skew_profile(li, ("l_partkey", "l_suppkey", "l_orderkey")).show()

    spark.stop()


if __name__ == "__main__":
    main()
