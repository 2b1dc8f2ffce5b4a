"""Batch-equivalence law (SURVEY.md §7 M4): draining the full fixture
through the streaming pipelines (availableNow) must produce exactly the
batch operators' results."""

from __future__ import annotations

from beauty_lakehouse_spark.operators import events as batch_events
from beauty_lakehouse_spark.streaming import (
    hourly_event_counts,
    run_available_now,
    session_values,
    stream_events,
)


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_hourly_equals_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    got = run_available_now(hourly_event_counts(stream), "t_hourly")
    expected = batch_events.q_events_hourly(spark, sf_dir)
    assert _canon(got) == _canon(expected)


def test_streaming_sessions_equal_batch(spark, sf_dir):
    stream = stream_events(spark, sf_dir)
    got = run_available_now(session_values(stream), "t_sessions")
    expected = batch_events.q_events_sessions(spark, sf_dir)
    assert _canon(got) == _canon(expected)


def test_stream_source_is_streaming(spark, sf_dir):
    assert stream_events(spark, sf_dir).isStreaming
