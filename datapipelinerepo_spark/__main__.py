"""CLI query runner: run or explain any registered query by name.

    python -m datapipelinerepo_spark --list [pattern]
    python -m datapipelinerepo_spark <query> [--sf-dir DIR] [--limit N]
    python -m datapipelinerepo_spark <query> --explain
    python -m datapipelinerepo_spark <query> --oracle   # print DuckDB twin SQL

The per-query shell entrypoint the reference exposes through its CLI
pipelines (reference: main.py's pipeline dispatch), generalized to the
whole registry so any operator can be smoke-run or plan-audited without
writing a script.
"""

from __future__ import annotations

import argparse
import fnmatch
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m datapipelinerepo_spark")
    p.add_argument("query", nargs="?", help="registry query name")
    p.add_argument("--list", action="store_true", help="list queries (optionally filter with the positional as a glob)")
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="data dir (defaults to $SPARK_GRAFT_SF_DIR, same as bench.py)",
    )
    p.add_argument("--limit", type=int, default=20, help="rows to show (0 = count only)")
    p.add_argument("--explain", action="store_true", help="print the formatted physical plan instead of rows")
    p.add_argument("--oracle", action="store_true", help="print the DuckDB oracle SQL and exit (no Spark session)")
    args = p.parse_args(argv)

    from .registry import REGISTRY
    from . import registry_ext  # noqa: F401 (registers extension queries)

    if args.list or args.query is None:
        pat = args.query or "*"
        for name in sorted(REGISTRY):
            if fnmatch.fnmatch(name, pat):
                e = REGISTRY[name]
                kind = "oracle" if e.sql else "rows-only"
                bench = " [bench]" if getattr(e, "bench", False) else ""
                print(f"{name:36s} {kind}{bench}")
        return 0

    if args.query not in REGISTRY:
        close = [n for n in sorted(REGISTRY) if args.query in n]
        print(f"unknown query {args.query!r}" + (f"; close: {close[:8]}" if close else ""), file=sys.stderr)
        return 2

    entry = REGISTRY[args.query]
    if args.oracle:
        if entry.sql is None:
            print(f"{args.query} is rows-only (no oracle SQL)", file=sys.stderr)
            return 1
        print(entry.sql.strip())
        return 0

    from .session import get_spark

    spark = get_spark(app_name=f"run:{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = entry.fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    elif args.limit == 0:
        print(df.count())
    else:
        df.show(args.limit, truncate=40)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
