"""Stream-stream joins with watermark-bounded state (SURVEY.md §2.2 joins).

The reference correlates records across topics by trace context; the
streaming generalization is the event-time interval join: match rows of
two unbounded streams on an equi-key when their event times fall within a
band.  Structured Streaming keeps both sides' unmatched rows in state —
the watermarks PLUS the time-range condition are what let it evict state
(a row older than `watermark + band` can never match again), so both are
mandatory here: an unbounded stream-stream join would grow state forever
at 100 TB/day ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logflow.streaming.windows import _event_time_ltz


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    band: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join of two streams.

    Matches ``left`` and ``right`` rows with equal ``on`` keys where
    ``right_ts ∈ [left_ts, left_ts + band]`` (e.g. a purchase following a
    click within an hour).  Both inputs get event-time watermarks; state
    for each side is dropped once the other side's watermark passes the
    band, giving bounded state regardless of stream length.

    Outer variants ("leftOuter"/"rightOuter"/"fullOuter") emit NULL-padded
    rows only after the watermark closes the match window — they are
    correct but delayed by `watermark`, exactly Spark's contract.
    """
    l = _event_time_ltz(left, left_ts).withWatermark(left_ts, watermark).alias("l")
    r = _event_time_ltz(right, right_ts).withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {band}"))
    )
    return l.join(r, cond, how)


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Enrich a stream with a STATIC dimension table (stream-static join).

    The workhorse of every ingest topology: events join a slowly-changing
    dimension (user→segment, service→owner). Structured Streaming plans
    this as a per-micro-batch join against the static side — no streaming
    state at all (unlike stream-stream joins there is nothing to evict),
    and for file-based dims the static side is RE-READ each micro-batch,
    so dim updates flow in without restarting the query. With
    ``broadcast_dim`` the dim ships to executors once per batch and the
    unbounded stream side never shuffles — at 100 TB/day ingest this is
    the only layout that holds; a shuffle-join enrichment would re-
    partition every micro-batch. Inner and left_outer are supported by
    Spark for stream-left joins; right/full would need the stream on the
    state-managed side and are rejected by the planner.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)
