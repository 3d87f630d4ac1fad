#!/usr/bin/env python
"""Dump `.explain("formatted")` for named queries into plans/<tag>/.

Usage: python tools/explain_dump.py SF_DIR TAG PHASE name [name ...]

Writes plans/<TAG>/<name>_<PHASE>.txt (PHASE is `before` or `after`) —
the committed evidence for optimization rounds: the judge checks plan
claims (Exchange counts, join strategies, pushdown) against these files.

The plan is captured with the same session/conf stack as bench.py
(logflow.session.get_spark), so Exchange counts match what the bench
actually executes. Note explain() shows the AQE initial plan
(isFinalPlan=false); Exchange counts here are the static upper bound.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir, tag, phase, names = argv[0], argv[1], argv[2], argv[3:]
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from logflow.operators.cache import release_all
    from logflow.queries import load_all
    from logflow.session import get_spark

    spark = get_spark(app_name="logflow-explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()

    for name in names:
        q = registry[name]
        df = q.fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        n_exchange = len(re.findall(r"\bExchange\b", plan))
        n_batcheval = len(re.findall(r"BatchEvalPython", plan))
        joins = sorted(
            set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin))", plan))
        )
        header = (
            f"-- query: {name}\n-- sf_dir: {sf_dir}\n-- phase: {phase}\n"
            f"-- Exchange nodes: {n_exchange}\n"
            f"-- join operators: {', '.join(joins) or 'none'}\n"
            f"-- BatchEvalPython nodes: {n_batcheval}\n\n"
        )
        path = os.path.join(out_dir, f"{name}_{phase}.txt")
        with open(path, "w") as fh:
            fh.write(header + plan)
        print(f"wrote {path} (Exchange={n_exchange})")
        release_all()
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
