#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "..."}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect overhead).  A warmup pass on sf0.001 triggers JVM/codegen
warm paths so the measured numbers reflect steady-state execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = "/root/testdata/sf0.001"


def main() -> None:
    from logflow.queries import load_all
    from logflow.session import get_spark

    spark = get_spark(app_name="logflow-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    # Warmup: run everything once at the smallest SF (codegen + class loading).
    for q in registry.values():
        try:
            q.fn(spark, WARMUP_DIR).write.format("noop").mode("overwrite").save()
        except Exception:
            pass

    timings: dict[str, float] = {}
    for name, q in registry.items():
        t0 = time.perf_counter()
        q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
