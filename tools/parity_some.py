#!/usr/bin/env python
"""Targeted DuckDB parity check for a subset of registry queries.

Usage: python tools/parity_some.py NAME [NAME ...] [--sf DIR]
(default sf dir /root/testdata/sf0.01 — the driver's gate scale).

Same harness as tools/parity_all.py (vanilla SparkSession, DuckDB views,
tests.oracle.compare_frames) but only for the named queries, so a new or
edited operator can be spot-checked in seconds instead of re-sweeping the
full registry.
"""

from __future__ import annotations

import os
import sys
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        args = args[:i] + args[i + 2 :]
    names = args
    if not names:
        print("usage: parity_some.py NAME [NAME ...] [--sf DIR]")
        return 2

    from logflow.queries import load_all
    from tests.oracle import compare_frames

    registry = load_all()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("logflow-parity-some")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failed = []
    for name in names:
        q = registry[name]
        try:
            spark_pdf = q.fn(spark, sf_dir).toPandas()
            if q.oracle is None:
                print(f"rows_only {name}: {len(spark_pdf)} rows")
                continue
            duck_pdf = duck.execute(q.oracle).fetchdf()
            compare_frames(spark_pdf, duck_pdf, name)
            print(f"pass      {name}: {len(spark_pdf)} rows")
        except Exception:
            failed.append(name)
            print(f"FAIL      {name}\n{traceback.format_exc(limit=5)}")
    if failed:
        print(f"\nFAILED: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
