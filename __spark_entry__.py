"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference topology: enrich →
branch → even sink) over sf0.001.  ``queries()`` / ``oracle_sql()`` expose
every implemented operator from SURVEY.md §2 with DuckDB oracles; see
``logflow/queries/`` for the implementations and the cross-engine
determinism rules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's core dataflow (StreamsConfig.java:30-52): records →
    traced enrich ("set" stage, messageid baggage) → branch on value
    parity → even sink, returning the even branch with trace context.
    """
    from logflow.queries import load_all

    return load_all()["trace_route_even"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from logflow.queries import load_all

    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from logflow.queries import load_all

    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
