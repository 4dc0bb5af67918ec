"""CLI query runner: execute any registered query by name.

Usage::

    python -m oxford_data_pipeline_spark.run <query> [sf_dir] [--limit N]
                                             [--explain] [--json | --parquet OUT]
    python -m oxford_data_pipeline_spark.run --list

A user of the reference pipeline runs one analysis script per
question; here every question in SURVEY §2 is a named query, and this
entry point is the switchboard: show, explain, or export any of them
at any scale directory without writing code.
"""

from __future__ import annotations

import argparse
import json
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def main(argv: list[str] | None = None) -> int:
    from oxford_data_pipeline_spark.plans import ORACLES, QUERIES

    ap = argparse.ArgumentParser(prog="oxford_data_pipeline_spark.run")
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("sf_dir", nargs="?", default=DEFAULT_SF_DIR)
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument("--limit", type=int, default=20, help="rows to show (default 20)")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--json", action="store_true", help="print all rows as JSON lines")
    ap.add_argument("--parquet", metavar="OUT", help="write full result to parquet")
    args = ap.parse_args(argv)

    if args.list:
        for name in QUERIES:
            kind = "oracle" if name in ORACLES else "rows-only"
            print(f"{name}\t{kind}")
        return 0
    if not args.query:
        ap.error("query name required (or --list)")
    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; use --list", file=sys.stderr)
        return 2

    from oxford_data_pipeline_spark.session import get_spark

    spark = get_spark(f"run-{args.query}")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
        return 0
    if args.parquet:
        df.write.mode("overwrite").parquet(args.parquet)
        print(f"wrote {args.parquet}")
        return 0
    if args.json:
        for row in df.toJSON().toLocalIterator():
            print(row)
        return 0
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
