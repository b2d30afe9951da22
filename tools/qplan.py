#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/<tag>/<name>_<suffix>.txt.

Usage:
    python tools/qplan.py --tag r13 --suffix before name1 name2 ...

Streaming (flow_*) builders run a bounded pipeline whose result is a
materialized memory table; for those we capture the post-run plan of the
result DataFrame (the sink table scan) AND, where the builder exposes one,
the last micro-batch plan is not recoverable here — so streaming names are
captured best-effort.
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from gmall_realtime_ck_spark import registry
    from gmall_realtime_ck_spark.catalog import load_tables
    from gmall_realtime_ck_spark.session import get_spark

    spark = get_spark(app_name="qplan")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, args.sf_dir)

    outdir = os.path.join(ROOT, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)

    for name in args.names:
        try:
            if name in registry.BUILDERS:
                df = registry.BUILDERS[name](tables)
            elif name in registry.STREAM_BUILDERS:
                df = registry.STREAM_BUILDERS[name](spark, args.sf_dir)
            else:
                print(f"# {name}: unknown", file=sys.stderr)
                continue
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            n_ex = plan.count("Exchange")
            print(f"# {name}: {len(plan)} bytes, Exchange x{n_ex} -> {path}")
        except Exception as exc:  # capture must not abort the sweep
            print(f"# {name}: ERROR {type(exc).__name__}: {exc}"[:300], file=sys.stderr)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
