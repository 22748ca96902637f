"""Ad-hoc analytics session: TPC-H-shaped joins, windows, rollups,
and sketches over the synthetic star schema.

Run:  python examples/analytics.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pac_data_pipeline_spark.session import get_spark
from pac_data_pipeline_spark.sources.readers import register_views

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="analytics", master="local[4]")
    register_views(spark, sf_dir)

    print("-- revenue by year/status (SQL through Catalyst)")
    spark.sql("""
        SELECT o_orderstatus, year(o_orderdate) AS yr,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """).show(8)

    print("-- top order priorities by late-shipment count")
    spark.sql("""
        SELECT o_orderpriority, count(*) AS n
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAYS)
        GROUP BY 1 ORDER BY n DESC
    """).show()

    print("-- per-customer order ranking (window functions)")
    spark.sql("""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   rank() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC) AS rnk
            FROM orders
        ) WHERE rnk <= 2
    """).show(8)
    spark.stop()


if __name__ == "__main__":
    main()
