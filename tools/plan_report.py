"""Auto-generate PLANS_AUTO.md: the optimized physical plan (simple
mode) of every registered batch query at sf0.001.

PLANS.md makes claims about plan shapes; this artifact is the
ground truth those claims can be audited against without running
anything. Streaming queries are skipped (building them executes the
stream); their shapes are pinned in tests instead.

Usage: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from pac_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(
        app_name="plan_report", master="local[4]", shuffle_partitions=4
    )
    sc = spark.sparkContext
    out = [
        "# PLANS_AUTO — optimized physical plans (auto-generated)",
        "",
        f"`python tools/plan_report.py {sf_dir}` — simple-mode explain of",
        "every batch query in `queries()`. Streaming queries execute on",
        "build and are pinned in tests/test_stateful.py instead.",
        "",
    ]
    for name, fn in entrymod.queries().items():
        if "stream" in name:
            out.append(f"## {name}\n\n(streaming — see tests)\n")
            continue
        try:
            df = fn(spark, sf_dir)
            p = sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "simple"
            ).strip()
        except Exception as exc:
            p = f"ERROR building plan: {exc}"
        out.append(f"## {name}\n\n```\n{p}\n```\n")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS_AUTO.md",
    )
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path} ({len(out)} sections)")


if __name__ == "__main__":
    main()
