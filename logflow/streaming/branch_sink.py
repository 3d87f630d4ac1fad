"""Single-pass multi-sink branch for streaming (SURVEY §4.2, the one
genuinely tricky streaming pattern).

Two independent ``writeStream`` queries over the same source would read
every record twice (and from Kafka could see different offsets).  The
reference's semantics — each record consumed once, routed to exactly one
sink (StreamsConfig.java:39-51) — need a SINGLE consumer fanning out per
micro-batch:

    foreachBatch:  batch.persist() → write even → write odd → unpersist

``persist`` makes the two writes share one scan; checkpointing gives
exactly-once per micro-batch against idempotent (file) sinks, which is
STRONGER than the reference's at-least-once (SURVEY §4.1).  For Kafka
sinks the result is at-least-once, matching the reference.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from logflow.operators.topology import enrich_trace, route_even_odd


def branch_writer(
    sink_even: Callable[[DataFrame, int], None],
    sink_odd: Callable[[DataFrame, int], None],
) -> Callable[[DataFrame, int], None]:
    """foreachBatch function: enrich → branch → both sinks, one scan."""

    def write(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            even, odd = route_even_odd(enrich_trace(batch))
            sink_even(even, batch_id)
            sink_odd(odd, batch_id)
        finally:
            batch.unpersist()

    return write


def parquet_sink(path: str) -> Callable[[DataFrame, int], None]:
    """Idempotent-enough file sink for tests/demo (overwrite per batch dir
    keeps replays idempotent)."""

    def write(df: DataFrame, batch_id: int) -> None:
        df.drop("headers").write.mode("overwrite").parquet(f"{path}/batch={batch_id}")

    return write


def start_branch_query(
    records: DataFrame,
    sink_even: Callable[[DataFrame, int], None],
    sink_odd: Callable[[DataFrame, int], None],
    checkpoint: str,
) -> StreamingQuery:
    """Start the reference topology as a streaming query (K1/K2 dual sink)."""
    return (
        records.writeStream.foreachBatch(branch_writer(sink_even, sink_odd))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
