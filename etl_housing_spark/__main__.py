"""CLI: run any catalog query from the shell.

The reference's operational surface is ``python trulia_scrape.py <city>
<state>`` plus notebooks (SURVEY.md §3); the engine's equivalent is one
entry point over the whole query catalog:

    python -m etl_housing_spark list [--tag join]
    python -m etl_housing_spark run q_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m etl_housing_spark run q_topk --explain
    python -m etl_housing_spark oracle q_topk        # print the DuckDB twin SQL

``run`` prints result rows as JSON lines (driver-side collect bounded by
--limit, default 100 — the CLI is an inspection tool, not a sink; pipelines
use the library API and write to storage).
"""

from __future__ import annotations

import argparse
import json
import sys


def _specs():
    from etl_housing_spark.plans import all_queries

    return all_queries()


def cmd_list(args) -> int:
    for name, spec in sorted(_specs().items()):
        if args.tag and args.tag not in spec.tags:
            continue
        mark = "oracle" if spec.oracle else "rows-only"
        print(f"{name}\t{mark}\t{', '.join(spec.tags) or '-'}")
    return 0


def cmd_oracle(args) -> int:
    spec = _specs().get(args.query)
    if spec is None:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    if spec.oracle is None:
        print(f"{args.query} is rows-only (no oracle SQL)", file=sys.stderr)
        return 1
    print(spec.oracle.strip())
    return 0


def cmd_run(args) -> int:
    spec = _specs().get(args.query)
    if spec is None:
        print(f"unknown query: {args.query}", file=sys.stderr)
        return 2
    from etl_housing_spark.session import get_session

    spark = get_session(app_name=f"ehs-cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = spec.fn(spark, args.sf_dir)
    if args.explain:
        df.explain(mode="formatted")
        return 0
    rows = df.limit(args.limit).collect()
    for r in rows:
        print(json.dumps(r.asDict(), default=str))
    print(f"# {len(rows)} row(s) (limit {args.limit})", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m etl_housing_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pl = sub.add_parser("list", help="list catalog queries")
    pl.add_argument("--tag", default=None)
    pl.set_defaults(fn=cmd_list)

    po = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    po.add_argument("query")
    po.set_defaults(fn=cmd_oracle)

    pr = sub.add_parser("run", help="run a catalog query")
    pr.add_argument("query")
    pr.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    pr.add_argument("--limit", type=int, default=100)
    pr.add_argument("--explain", action="store_true")
    pr.set_defaults(fn=cmd_run)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
