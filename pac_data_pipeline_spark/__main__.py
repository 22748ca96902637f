"""Command-line interface: list, run, or explain any registered
query against a scale-factor directory.

    python -m pac_data_pipeline_spark list [filter]
    python -m pac_data_pipeline_spark run <query> [--sf-dir DIR] [-n ROWS]
    python -m pac_data_pipeline_spark explain <query> [--sf-dir DIR]

The registry is the driver contract (`__spark_entry__.queries`), so
the CLI exposes exactly the checked surface — what a reference user
gets on day one without writing a line of Spark.
"""

from __future__ import annotations

import argparse
import os
import sys


def _entry():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    return entrymod


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pac_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("filter", nargs="?", default="")
    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument(
            "--sf-dir", default=os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
            )
        )
        if name == "run":
            sp.add_argument("-n", type=int, default=20, help="rows to show")
    args = p.parse_args(argv)

    entrymod = _entry()
    registry = entrymod.queries()

    if args.cmd == "list":
        oracles = entrymod.oracle_sql()
        for name in registry:
            if args.filter in name:
                tag = "exact-oracle" if name in oracles else "rows-only"
                print(f"{name:28s} {tag}")
        return 0

    if args.query not in registry:
        print(f"unknown query {args.query!r}; try: list", file=sys.stderr)
        return 2

    from pac_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"cli_{args.query}")
    df = registry[args.query](spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
        print(f"-- {args.query} on {args.sf_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
