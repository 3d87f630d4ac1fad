"""DataFrame-level operators (SURVEY.md §2.2)."""

from logflow.operators.branch import branch
from logflow.operators.topology import enrich_trace, route_even_odd, spans_from_records

__all__ = ["branch", "enrich_trace", "route_even_odd", "spans_from_records"]
