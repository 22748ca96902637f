"""Isolated-warm per-query timing — the round's measurement loop.

One fresh JVM, bench-equivalent session confs; each named query runs
``n_reps`` times through the noop sink (the bench methodology), and
the tool prints per-query {first, min, median} so first-run JIT
separates from steady-state compute. Use this to decide whether a
bench number is plan cost or positional/session noise BEFORE
touching the operator (guide §1: measure first).

    python tools/isobench.py [--sf DIR] [--reps N] query [query ...]
    python tools/isobench.py --top K          # K slowest by committed record
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pac_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--top", type=int, default=0)
    args = ap.parse_args()

    names = list(args.queries)
    if args.top:
        rec = json.load(
            open(os.path.join(os.path.dirname(__file__), "..", "bench_results.json"))
        )["queries"]
        names += [
            q for q, _ in sorted(rec.items(), key=lambda x: -x[1])[: args.top]
            if q not in names
        ]

    spark = get_spark(app_name="isobench")
    reg = entrymod.queries()
    spark.range(1_000_000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    out = {}
    for name in names:
        fn = reg[name]
        times = []
        for rep in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}#{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = times
        print(
            f"{name:32s} first={times[0]:7.2f}  min={min(times):7.2f}"
            f"  med={statistics.median(times):7.2f}  all={times}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
