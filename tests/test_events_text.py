"""Events (TIMESTAMP(NANOS) handling, window semantics) and text
analysis sanity properties."""

from __future__ import annotations

from pyspark.sql import types as T

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators import events, text


def test_events_ts_surfaces_as_timestamp(spark, sf_dir):
    t = load(spark, sf_dir)
    assert isinstance(t.events.schema["ts"].dataType, T.TimestampType)
    assert t.events.count() > 0


def test_hourly_buckets_align(spark, sf_dir):
    rows = events.q_events_hourly(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.hour_start_us % 3_600_000_000 == 0
        assert r.n_events > 0


def test_sliding_doubles_event_mass(spark, sf_dir):
    t = load(spark, sf_dir)
    n = t.events.count()
    total = sum(r.n_events for r in events.q_events_sliding(spark, sf_dir).collect())
    assert total == 2 * n  # 1h window / 30min slide → every event in 2 windows


def test_sessions_partition_events(spark, sf_dir):
    t = load(spark, sf_dir)
    n = t.events.count()
    total = sum(r.n_events for r in events.q_events_sessions(spark, sf_dir).collect())
    assert total == n


def test_text_stats_ranges(spark, sf_dir):
    rows = text.q_text_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.ttr <= 1.0
        assert r.n_distinct <= r.n_tokens
        assert r.avg_token_len > 0


def test_lang_id_domain(spark, sf_dir):
    rows = text.q_lang_id(spark, sf_dir).collect()
    assert rows
    allowed = {"en", "de", "fr", "es", "und"}
    for r in rows:
        assert r.pred_lang in allowed
        best = max(r.score_en, r.score_de, r.score_fr, r.score_es)
        if best == 0:
            assert r.pred_lang == "und"


def test_doc_fingerprint_stable(spark, sf_dir):
    a = sorted(tuple(r) for r in text.q_doc_fingerprint(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in text.q_doc_fingerprint(spark, sf_dir).collect())
    assert a == b
