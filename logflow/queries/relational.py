"""Relational operator queries over the TPC-H-ish tables (SURVEY.md §2.2).

Populated incrementally: joins (broadcast/SMJ/semi/anti/range/as-of), aggs
(rollup/cube/distinct), windows, sort/limit, set ops, scalar functions.
"""
