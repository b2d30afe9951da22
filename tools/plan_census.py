#!/usr/bin/env python
"""Plan census: for every batch builder, count physical-plan node types
(Exchange / BroadcastExchange / ReusedExchange / Sort / Window /
ArrowEvalPython / BatchEvalPython) without executing the query (except
builders that localCheckpoint eagerly). Output: TSV to stdout.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    from gmall_realtime_ck_spark import registry
    from gmall_realtime_ck_spark.catalog import load_tables
    from gmall_realtime_ck_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan_census")
    spark.sparkContext.setLogLevel("ERROR")
    tables = load_tables(spark, sf_dir)

    names = sys.argv[1:] or sorted(registry.BUILDERS)
    print("name\tshuffle_ex\tbcast_ex\treused\tsort\twindow\tpyeval\tplan_bytes")
    for name in names:
        try:
            df = registry.BUILDERS[name](tables)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:
            print(f"{name}\tERR\t{type(exc).__name__}", flush=True)
            continue
        def c(pat):
            return len(re.findall(pat, plan))
        print(
            f"{name}\t{c(r'[)] Exchange')}\t{c(r'[)] BroadcastExchange')}\t"
            f"{c(r'[)] ReusedExchange')}\t{c(r'[)] Sort')}\t{c(r'[)] Window')}\t"
            f"{c(r'EvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas')}\t{len(plan)}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
