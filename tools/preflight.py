#!/usr/bin/env python
"""Pre-flight the driver's correctness sweep on a VANILLA session.

The round-3 incident (`corpus_inverted_index`) proved the repo's own
sf0.001 pytest gate and the driver's sf0.01 sweep can disagree: the
driver canonicalizes results through pandas (sort columns by name,
factorize, hash) and hard-fails on list/struct/map cells. This tool
replays the driver's comparison as faithfully as we can reconstruct it:

  * fresh `SparkSession.builder.master("local[N]")` with NO repo session
    helper — only `spark.sql.shuffle.partitions` like the driver stub;
  * sf0.01 (the driver's sf), not the tests' sf0.001;
  * per-query: row count, sorted-column schema, scalar-only cell lint,
    and an order-insensitive value hash computed through pandas — the
    same library the driver hashes with, so dtype coercion surprises
    (Arrow decimal vs float, date vs datetime) surface HERE, not in
    CORRECTNESS_r{N}.json.

Usage:
    python tools/preflight.py                 # first 50 = driver window
    python tools/preflight.py --all           # every declared query
    python tools/preflight.py name1 name2 ... # explicit list
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_PREFLIGHT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _canon(rows: list[tuple], columns: list[str], name: str):
    """Driver-shaped canonical form, delegating to the ONE shared
    canonicalizer (gmall_realtime_ck_spark.canon — also used by the
    pytest gate, so the two local gates cannot drift); returns
    (schema, hash). Hashing goes through the pandas string repr to
    catch NaN/None and dtype divergence the tuple compare can mask."""
    import pandas as pd

    from gmall_realtime_ck_spark.canon import canonicalize

    cols, out = canonicalize(rows, columns)
    df = pd.DataFrame(out, columns=cols)
    payload = df.astype(str).to_csv(index=False).encode()
    return cols, hashlib.sha256(payload).hexdigest()


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    run_all = "--all" in sys.argv

    import duckdb
    from pyspark.sql import SparkSession

    from gmall_realtime_ck_spark import registry
    from gmall_realtime_ck_spark.streaming.pipelines import _sweep_stale_temp_dirs

    _sweep_stale_temp_dirs()  # reap SIGKILL-orphaned ckpt/streamsrc dirs

    names = registry.all_query_names()
    if args:
        names = args
    elif not run_all:
        names = names[:50]

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("preflight")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    q = registry.queries()
    oracles = registry.oracle_sql()
    report, failures = {}, []
    for name in names:
        t0 = time.time()
        try:
            df = q[name](spark, SF_DIR)
            spark_rows = [tuple(r) for r in df.collect()]
            spark_cols = list(df.columns)
            row = {"spark_rows": len(spark_rows), "sec": round(time.time() - t0, 2)}
            if name in oracles:
                rel = duck.sql(oracles[name])
                duck_cols = list(rel.columns)
                duck_rows = [tuple(r) for r in rel.fetchall()]
                cs, hs = _canon(spark_rows, spark_cols, name)
                cd, hd = _canon(duck_rows, duck_cols, name)
                row.update(
                    oracle_rows=len(duck_rows),
                    schema_match=cs == cd,
                    rows_match=len(spark_rows) == len(duck_rows),
                    hash_match=hs == hd,
                )
                ok = row["schema_match"] and row["rows_match"] and row["hash_match"]
            else:
                _canon(spark_rows, spark_cols, name)  # scalar lint still applies
                row["err"] = "no_oracle"
                ok = len(spark_rows) >= 0
            row["ok"] = ok
        except Exception as exc:  # noqa: BLE001 — report, don't abort the sweep
            row = {"ok": False, "exception": f"{type(exc).__name__}: {exc}"[:400]}
        report[name] = row
        if not row["ok"]:
            failures.append(name)
        status = "ok " if row["ok"] else "FAIL"
        print(f"[{status}] {name}  {json.dumps(row, default=str)[:200]}", flush=True)

    print(json.dumps({"checked": len(report), "failures": failures}))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
