#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total_query_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": "..."}

Each query is forced end-to-end with the noop sink (full computation, no
driver collect overhead).  A warmup pass at the SAME scale factor runs
first so the measured numbers reflect steady-state execution: AQE picks
different physical plans (and therefore different generated classes) at
different data sizes, so warming at a smaller SF would leave the measured
pass paying Janino compilation + JIT warmup — measured as up to 10×
first-run inflation on sub-second queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _parse_shard(argv: list[str]) -> tuple[int, int]:
    """`--shard i/n` runs every n-th registry query starting at i (0-based)
    — mirrors tools/drivercheck.py sharding so close-of-round sweeps can
    run as n parallel PROCESSES instead of one serial hour. Default 0/1
    (the full registry; the driver's invocation is unchanged)."""
    for a in argv:
        if a.startswith("--shard"):
            spec = a.split("=", 1)[1] if "=" in a else argv[argv.index(a) + 1]
            i, n = spec.split("/")
            return int(i), int(n)
    return 0, 1


def main() -> None:
    from logflow.operators.cache import release_all
    from logflow.queries import load_all
    from logflow.session import get_spark

    shard_i, shard_n = _parse_shard(sys.argv[1:])
    spark = get_spark(app_name="logflow-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    if shard_n > 1:
        names = list(registry)[shard_i::shard_n]
        registry = {n: registry[n] for n in names}

    # Warmup at the measured SF (codegen classes + JIT are plan-shape
    # specific); drop any caches a query materialized so the measured pass
    # starts from a clean executor state.
    for q in registry.values():
        try:
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception:
            pass
    release_all()
    spark.catalog.clearCache()

    # Two measured runs per query, report the min: the host shows bursty
    # noisy-neighbor interference (same query measured 1.3 s and 20 s
    # minutes apart with identical plans and healthy GC), and min-of-N is
    # the standard robust estimator for the true cost under additive noise.
    timings: dict[str, float] = {}
    for _ in range(2):
        for name, q in registry.items():
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            release_all()
            spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:5])
    # The driver captures only the tail of stdout (~2 KB): print a compact
    # summary line ("queries" = slowest 5 only) and write the full
    # per-query timing map to bench_detail.json next to this script.
    detail_name = (
        "bench_detail.json" if shard_n == 1 else f"bench_detail_{shard_i}of{shard_n}.json"
    )
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    with open(detail_path, "w") as fh:
        json.dump(
            {"metric": "total_query_sec", "value": total, "unit": "sec",
             "queries": timings, "sf": SF_DIR},
            fh, indent=1, sort_keys=True,
        )
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "max_sec": max(timings.values()) if timings else 0.0,
                "queries": slowest,
                "detail": detail_name,
                "sf": SF_DIR,
                **({"shard": f"{shard_i}/{shard_n}"} if shard_n > 1 else {}),
            }
        )
    )


if __name__ == "__main__":
    main()
