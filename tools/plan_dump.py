"""Dump `.explain("formatted")` for named queries to plans/<round>/.

    python tools/plan_dump.py --suffix before query [query ...]

Writes plans/<round>/<query>_<suffix>.txt at sf0.1 (the bench scale)
so plan-shape claims in OPTIMIZATION_r*.md are auditable offline.
Queries whose builders eagerly execute (localCheckpoint chains) are
still fine: the dump captures the final returned frame's plan.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pac_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--round", default="r12")
    args = ap.parse_args()

    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.round,
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan_dump")
    reg = entrymod.queries()
    for name in args.queries:
        df = reg[name](spark, args.sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)", flush=True)


if __name__ == "__main__":
    main()
