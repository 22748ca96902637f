"""Structured Streaming session: watermarked tumbling windows and
the custom stateful sessionizer over the events stream.

Run:  python examples/streaming_session.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pac_data_pipeline_spark.session import get_spark
from pac_data_pipeline_spark.streaming.windows import run_streaming_tumbling
from pac_data_pipeline_spark.streaming.stateful import run_streaming_sessions


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="streaming", master="local[4]")

    print("-- watermarked tumbling windows (complete mode)")
    run_streaming_tumbling(spark, sf_dir).orderBy(
        "window_start", "event_type"
    ).show(8, truncate=False)

    print("-- stateful sessionization (applyInPandasWithState)")
    run_streaming_sessions(spark, sf_dir).orderBy(
        "user_id", "session_id"
    ).show(8)
    spark.stop()


if __name__ == "__main__":
    main()
