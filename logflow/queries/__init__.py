"""Query registry: one entry per implemented operator (SURVEY.md §2.2).

Each :class:`Query` pairs a Spark callable ``(spark, sf_dir) -> DataFrame``
with an equivalent ANSI-SQL oracle string for DuckDB (or ``None`` for ops
that are genuinely not SQL-expressible — the driver then records a weaker
rows-only check).

Cross-engine determinism rules (every query in this package obeys them —
violating any of these makes the driver's value-hash comparison flaky):

* ``FLOOR`` before any double→int conversion (Spark truncates on cast,
  DuckDB rounds).
* Money/quantity aggregates: cast to DECIMAL(18,2) BEFORE summing (exact
  arithmetic, no float ordering effects), then ROUND, then CAST AS DOUBLE.
* Averages/ratios: divide the exact decimal-sum (as double) by the exact
  count — identical numerator and denominator give an identical IEEE
  quotient — then ROUND.
* Counts and integer sums: CAST AS BIGINT (DuckDB HUGEINT sums otherwise
  come back as float64 through pandas).
* Hashes: md5 only (identical lowercase hex in both engines).
* Window orderings always carry a unique-key tiebreak.
* Aliases identical on both sides; the driver sorts columns by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    """A registered engine query with its DuckDB oracle."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator registering a query callable under ``name``."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    from logflow.queries import llm, multimodal, relational, trace  # noqa: F401

    return REGISTRY
