"""Command-line surface: list, run, or explain any declared query.

    python -m gmall_realtime_ck_spark list [--filter TEXT]
    python -m gmall_realtime_ck_spark run NAME [--sf-dir DIR] [--limit N]
    python -m gmall_realtime_ck_spark explain NAME [--sf-dir DIR]
    python -m gmall_realtime_ck_spark sql "SELECT ..." [--sf-dir DIR] [--limit N]

The reference's users launch per-app Flink mains (one class per job,
COMMON/base/BaseApp.java); here every query in the registry is
addressable by name from one entry point, on any testdata scale
directory. ``explain`` prints the formatted physical plan — the same
artifact the plan-audit tests assert on.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="gmall_realtime_ck_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    lp = sub.add_parser("list", help="list declared queries")
    lp.add_argument("--filter", default="", help="substring filter")

    for cmd, hlp in (("run", "run a query and print rows"),
                     ("explain", "print the formatted physical plan"),
                     ("plancheck", "summarize shuffles/broadcasts/scans in the plan")):
        rp = sub.add_parser(cmd, help=hlp)
        rp.add_argument("name", help="query name (see `list`)")
        rp.add_argument(
            "--sf-dir",
            default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        )
        if cmd == "run":
            rp.add_argument("--limit", type=int, default=20)

    sp = sub.add_parser(
        "sql",
        help="ad-hoc SQL over the registered tables (region nation customer "
        "supplier part orders lineitem events documents embeddings) — the "
        "reference's ClickHouse-console workflow",
    )
    sp.add_argument("query", help="ANSI SQL string")
    sp.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
    )
    sp.add_argument("--limit", type=int, default=20)
    sp.add_argument("--explain", action="store_true", help="print the plan instead of rows")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from . import registry

    if args.cmd == "list":
        for name in registry.all_query_names():
            if args.filter in name:
                kind = "stream" if name in registry.STREAM_BUILDERS else "batch"
                oracle = "oracled" if name in registry.ORACLES else "rows-only"
                print(f"{name}\t{kind}\t{oracle}")
        return 0

    from .session import get_spark

    if args.cmd == "sql":
        from .catalog import load_tables

        spark = get_spark(app_name="cli-sql")
        spark.sparkContext.setLogLevel("ERROR")
        load_tables(spark, args.sf_dir)  # registers every table as a view
        df = spark.sql(args.query)
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=False)
        return 0

    if args.name not in registry.BUILDERS and args.name not in registry.STREAM_BUILDERS:
        print(f"unknown query: {args.name} (try `list`)", file=sys.stderr)
        return 2

    spark = get_spark(app_name=f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = registry.make_query(args.name)(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
    elif args.cmd == "plancheck":
        p = df._jdf.queryExecution().executedPlan().toString()
        for label, needle in (
            ("shuffles (Exchange hashpartitioning)", "Exchange hashpartitioning"),
            ("range exchanges", "Exchange rangepartitioning"),
            ("broadcast hash joins", "BroadcastHashJoin"),
            ("sort-merge joins", "SortMergeJoin"),
            ("nested-loop joins", "BroadcastNestedLoopJoin"),
            ("cartesian products", "CartesianProduct"),
            ("parquet scans", "Scan parquet"),
            ("windows", "Window"),
            ("Python (Arrow) stages", "InPandas"),
        ):
            print(f"{p.count(needle):3d}  {label}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
