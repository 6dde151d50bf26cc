"""Structured Streaming extension tests (SURVEY §2.8): stream/batch parity
for the windowed aggregate, and the custom stateful sessionizer vs the batch
window implementation (q22)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigquack_spark.queries import QUERIES
from bigquack_spark.streaming.events import (
    hourly_counts,
    read_events_stream,
    run_available_now,
    sessionize_stateful,
)
from tests.conftest import SF_SMOKE


def test_stream_hourly_matches_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    result = run_available_now(hourly_counts(stream), "hourly_test")
    got = {
        (r.hour_key, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in result.collect()
    }
    from bigquack_spark.sources.parquet import load_table

    batch = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour_key"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    want = {
        (r.hour_key, r.event_type): (r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }
    assert got == want


def test_stateful_sessionize_matches_batch(spark):
    stream = read_events_stream(spark, SF_SMOKE)
    result = run_available_now(sessionize_stateful(stream, 30), "sessionize_test")
    got = {r.user_id: (r.n_sessions, r.n_events) for r in result.collect()}
    batch = QUERIES["q22_sessionize"].fn(spark, SF_SMOKE)
    want = {r.user_id: (r.n_sessions, r.n_events) for r in batch.collect()}
    assert got == want


def test_exactly_once_sink(spark, tmp_path):
    """bigquery_write.go:448-460 offset semantics in streaming: replayed
    batch ids are no-ops, committed offset survives 'restart'."""
    import os

    from bigquack_spark.streaming.sink import ExactlyOnceBatchSink

    target = str(tmp_path / "sink_out")
    os.makedirs(target)
    ckpt = str(tmp_path / "ckpt")
    sink = ExactlyOnceBatchSink(target)
    stream = read_events_stream(spark, SF_SMOKE).select("event_id", "user_id", "value")
    (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    n = spark.read.parquet(target).count()
    assert n == 1000  # all events landed exactly once
    committed = sink.next_batch_id
    assert committed >= 1

    # simulate a restart replaying the same batches: fresh sink instance
    # reloads the durable offset and must skip them all
    replay = ExactlyOnceBatchSink(target)
    assert replay.next_batch_id == committed
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(10)
    replay(batch, batch_id=0)  # replayed offset -> no-op
    assert spark.read.parquet(target).count() == n
    replay(batch, batch_id=committed)  # next offset -> appends
    assert spark.read.parquet(target).count() == n + 10


def test_exactly_once_sink_corrupt_offset_file(spark, tmp_path):
    """A damaged offset file must degrade to offset 0 (reprocess), never
    crash the stream."""
    import os

    from bigquack_spark.streaming.sink import ExactlyOnceBatchSink

    target = str(tmp_path / "corrupt_sink")
    os.makedirs(target)
    with open(os.path.join(target, "_COMMITTED_BATCH"), "w") as fh:
        fh.write("{not json")
    sink = ExactlyOnceBatchSink(target)
    assert sink.next_batch_id == 0
    batch = spark.read.parquet(f"{SF_SMOKE}/events.parquet").limit(5)
    sink(batch, batch_id=0)
    assert spark.read.parquet(target).count() == 5
