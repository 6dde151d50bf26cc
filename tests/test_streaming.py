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
