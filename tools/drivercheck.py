#!/usr/bin/env python
"""Driver-isolation check: run registered queries the way the DRIVER does.

The driver's correctness gate executes each query in a FRESH subprocess
with a VANILLA SparkSession (no logflow.session confs, no state from
earlier queries). tools/parity_all.py checks oracle parity but shares one
session across the sweep — it cannot catch bugs that only appear with
per-query session isolation (conf leakage between queries, operators that
depend on a registered datasource/table from a previous query, first-use
initialization paths).

This tool spawns one subprocess per query (vanilla session, sf0.01 by
default) and reports rows or the error. Use it on new queries that touch
session state (conf set/restore, datasource registration, catalog tables,
tmp-dir caches) before trusting a green parity sweep.

Usage: python tools/drivercheck.py [sf_dir] [query ...]   (default: all)
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHILD = """
import sys; sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .appName("drivercheck").getOrCreate())
import __spark_entry__ as e
df = e.queries()[{name!r}](spark, {sf_dir!r})
print("DRIVERCHECK_ROWS", df.count())
spark.stop()
"""


def main() -> int:
    from logflow.queries import load_all

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(load_all())
    failures = []
    for name in names:
        try:
            proc = subprocess.run(
                [sys.executable, "-c", _CHILD.format(repo=REPO, name=name, sf_dir=sf_dir)],
                capture_output=True,
                text=True,
                timeout=600,
            )
        except subprocess.TimeoutExpired:
            # A hung query must not abort the sweep — record and move on.
            failures.append(name)
            print(f"FAIL {name}\n  timed out after 600s")
            continue
        rows = [
            line for line in proc.stdout.splitlines() if line.startswith("DRIVERCHECK_ROWS")
        ]
        if proc.returncode == 0 and rows:
            print(f"OK   {name}: {rows[0].split()[1]} rows")
        else:
            failures.append(name)
            tail = (proc.stderr or proc.stdout).strip().splitlines()[-8:]
            print(f"FAIL {name}\n  " + "\n  ".join(tail))
    print(f"\n{len(names) - len(failures)} ok / {len(failures)} failed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
