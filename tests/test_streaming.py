"""Streaming == batch: replay the events parquet through Structured
Streaming and compare final state against the batch twins."""

import pytest
from pyspark.sql import functions as F

from adcirctime2cogs_spark.operators import eventwindows
from adcirctime2cogs_spark.streaming import windows as sw


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir):
    return sw.read_events_stream(spark, sf_dir)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, sf_dir, events_stream):
    out = sw.run_to_memory(sw.tumbling_counts(events_stream), "t_tumble")
    batch = eventwindows.events_tumbling_window(spark, sf_dir)
    cols = ["win_start", "event_type", "n"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_sliding_stream_matches_batch(spark, sf_dir, events_stream):
    out = sw.run_to_memory(sw.sliding_counts(events_stream), "t_slide")
    batch = eventwindows.events_sliding_window(spark, sf_dir)
    cols = ["win_start", "event_type", "n"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_session_stream_matches_batch(spark, sf_dir, events_stream):
    out = sw.run_to_memory(sw.session_counts(events_stream), "t_sess")
    batch = eventwindows.events_session_window(spark, sf_dir)
    cols = ["user_id", "sess_start", "n"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_dedup_within_watermark(spark, sf_dir, events_stream):
    out = sw.run_to_memory(sw.dedup_within_watermark(events_stream), "t_dedup")
    batch_pairs = (
        eventwindows.events_dedup_first(spark, sf_dir)
        .select("user_id", "event_type")
    )
    # streaming dedup keeps an arbitrary row per key, but the KEY SET
    # must match the batch dedup exactly
    assert _rows(out.select("user_id", "event_type"), ["user_id", "event_type"]) == _rows(
        batch_pairs, ["user_id", "event_type"]
    )


def test_stateful_running_totals(spark, sf_dir, events_stream):
    out = sw.run_to_memory(
        sw.running_value_by_user(events_stream), "t_state", mode="update"
    )
    # final state per user (one batch -> one emission) == batch groupBy
    from adcirctime2cogs_spark.tables import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    got = {r.user_id: r.n_events for r in out.collect()}
    want = {r.user_id: r.n_events for r in batch.collect()}
    assert got == want
