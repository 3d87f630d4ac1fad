"""Structured Streaming tests: single-pass branch, windows, dedup, batch-equivalence.

Strategy (SURVEY §5): streaming ops aren't DuckDB-checkable, so each
streaming query is verified against its batch twin over the same input.
File sources + availableNow triggers keep runs bounded and deterministic.
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from logflow.operators.topology import enrich_trace, route_even_odd
from logflow.sources.records import numbers_fixture
from logflow.streaming.branch_sink import parquet_sink, start_branch_query
from logflow.streaming.sources import file_record_stream
from logflow.streaming.windows import deduped_stream, hourly_type_counts, session_spans

TRACE = "77" * 16


@pytest.fixture()
def record_dir(spark, tmp_path):
    path = str(tmp_path / "records")
    numbers_fixture(spark, list(range(10)), trace_id=TRACE).write.parquet(path)
    return path


def test_streaming_branch_matches_batch(spark, record_dir, tmp_path):
    stream = file_record_stream(spark, record_dir)
    out = str(tmp_path / "out")
    q = start_branch_query(
        stream,
        parquet_sink(f"{out}/even"),
        parquet_sink(f"{out}/odd"),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    even_s = spark.read.parquet(f"{out}/even").select("value", "trace_id", "span_id")
    odd_s = spark.read.parquet(f"{out}/odd").select("value", "trace_id", "span_id")
    batch = spark.read.parquet(record_dir)
    even_b, odd_b = route_even_odd(enrich_trace(batch))
    assert even_s.exceptAll(even_b.select("value", "trace_id", "span_id")).count() == 0
    assert even_b.select("value", "trace_id", "span_id").exceptAll(even_s).count() == 0
    assert sorted(r.value for r in odd_s.collect()) == [1, 3, 5, 7, 9]


def test_streaming_branch_is_single_pass(spark, record_dir, tmp_path):
    """Both sinks must be written from ONE pass per micro-batch: the
    foreachBatch writer persists the batch, so the even/odd scans hit the
    cached data, and every input row lands in exactly one sink."""
    stream = file_record_stream(spark, record_dir)
    seen: dict[str, list[int]] = {"even": [], "odd": []}

    def sink(name):
        def write(df, batch_id):
            seen[name].extend(r.value for r in df.select("value").collect())

        return write

    q = start_branch_query(stream, sink("even"), sink("odd"), checkpoint=str(tmp_path / "c2"))
    q.awaitTermination(120)
    assert sorted(seen["even"] + seen["odd"]) == list(range(10))
    assert set(seen["even"]).isdisjoint(seen["odd"])


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp").write.mode(
        "append"
    ).parquet(path)


def test_streaming_hourly_counts_match_batch(spark, tmp_path):
    path = str(tmp_path / "ev")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (u, t, base + datetime.timedelta(minutes=m))
        for u, t, m in [
            (1, "click", 5), (1, "click", 20), (2, "view", 61), (2, "click", 70), (1, "view", 130)
        ]
    ]
    _write_events(spark, path, rows)
    stream = spark.readStream.schema("user_id long, event_type string, ts timestamp").parquet(path)
    q = (
        hourly_type_counts(stream)
        .writeStream.format("memory")
        .queryName("hourly_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.hour_start, r.event_type): r.n
        for r in spark.sql("select * from hourly_t").collect()
    }
    batch = spark.read.parquet(path)
    want = {
        (r.hour_start, r.event_type): r.n
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_streaming_session_window(spark, tmp_path):
    path = str(tmp_path / "ev2")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "click", base),
        (1, "click", base + datetime.timedelta(minutes=10)),  # same session
        (1, "click", base + datetime.timedelta(minutes=90)),  # new session (gap > 30m)
    ]
    _write_events(spark, path, rows)
    stream = spark.readStream.schema("user_id long, event_type string, ts timestamp").parquet(path)
    q = (
        session_spans(stream)
        .writeStream.format("memory")
        .queryName("sessions_t")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows_out = spark.sql("select * from sessions_t").collect()
    assert sorted(r.n_events for r in rows_out) == [1, 2]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    path = str(tmp_path / "recs3")
    fixture = numbers_fixture(spark, [1, 2, 3], trace_id=TRACE)
    fixture.unionByName(fixture).write.parquet(path)  # every record duplicated
    stream = file_record_stream(spark, path)
    q = (
        deduped_stream(stream, ["key", "value", "offset"])
        .writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    vals = sorted(r.value for r in spark.sql("select value from dedup_t").collect())
    assert vals == [1, 2, 3]
