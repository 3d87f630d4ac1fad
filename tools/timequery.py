#!/usr/bin/env python
"""Time named queries at a given SF: warmup + min-of-N, one JSON line per query.

Usage: python tools/timequery.py SF_DIR name [name ...] [--runs N]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # parse both --runs=N and --runs N (mirrors bench.py's shard parsing),
    # dropping the consumed value token from the positional names list
    argv = sys.argv[1:]
    runs = 3
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--runs"):
            if "=" in a:
                runs = int(a.split("=", 1)[1])
            else:
                if i + 1 >= len(argv):
                    sys.exit("usage: timequery.py SF_DIR name [...] [--runs N]")
                runs = int(argv[i + 1])
                i += 1
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    sf_dir, names = args[0], args[1:]

    from logflow.operators.cache import release_all
    from logflow.queries import load_all
    from logflow.session import get_spark

    spark = get_spark(app_name="logflow-timequery")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    for name in names:
        q = registry[name]
        # warmup
        q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_all()
        spark.catalog.clearCache()
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            release_all()
            spark.catalog.clearCache()
        print(json.dumps({"query": name, "sf_dir": sf_dir, "min": min(times), "runs": times}))


if __name__ == "__main__":
    main()
