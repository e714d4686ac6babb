"""Structured Streaming operators: windowed aggs + sessionization, with the
streaming result checked against the batch twin on the same input."""

from goffish_v3_spark.streaming.events import (
    sessionize_batch,
    windowed_counts_batch,
    windowed_counts_stream,
)


def test_windowed_stream_equals_batch(spark, sf_dir):
    path = f"{sf_dir}/events.parquet"
    events = spark.read.parquet(path)
    batch = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in windowed_counts_batch(events).collect()
    }
    streamed = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in windowed_counts_stream(spark, path, query_name="t_wc").collect()
    }
    assert streamed == batch
    assert len(batch) > 10


def test_sessionize_batch_shape(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    sessions = sessionize_batch(events, gap_minutes=30).collect()
    assert len(sessions) >= events.select("user_id").distinct().count()
    assert sum(r.n_events for r in sessions) == events.count()


def test_sessionize_stream_equals_batch(spark, sf_dir):
    """Stateful session_window streaming must produce the same session
    boundaries as the batch window-function twin."""
    from goffish_v3_spark.streaming.events import sessionize_batch, sessionize_stream
    import pyspark.sql.functions as F

    path = f"{sf_dir}/events.parquet"
    batch = sessionize_batch(spark.read.parquet(path), gap_minutes=30)
    stream = sessionize_stream(spark, path, gap_minutes=30, query_name="sess_eq")
    assert stream.count() == batch.count()
    b = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        for r in batch.collect()
    }
    s = {
        (r.user_id, r.session_start, r.n_events, round(r.total_value, 6))
        for r in stream.collect()
    }
    assert s == b


def test_first_touch_stream_equals_batch(spark, sf_dir):
    """applyInPandasWithState first-touch dedup == row_number()=1 batch twin
    (exact: single-file replay, batch sorted by (ts, event_id) in-kernel)."""
    from goffish_v3_spark.streaming.stateful import first_touch_batch, first_touch_stream

    path = f"{sf_dir}/events.parquet"
    batch = first_touch_batch(spark.read.parquet(path))
    stream = first_touch_stream(spark, path, query_name="ft_eq")
    b = {
        (r.user_id, r.event_type, r.first_ts, r.first_event_id, r.first_value)
        for r in batch.collect()
    }
    s = {
        (r.user_id, r.event_type, r.first_ts, r.first_event_id, r.first_value)
        for r in stream.collect()
    }
    assert s == b


def test_first_touch_state_suppresses_later_batches(spark, sf_dir, tmp_path):
    """Duplicates replayed in a LATER micro-batch are suppressed by the
    seen-set state — the cross-batch property stateless ops can't express.
    Two copies of the events file, one file per trigger → 2 micro-batches;
    output must equal ONE copy's first-touch set."""
    import shutil

    from goffish_v3_spark.streaming.stateful import first_touch_batch, first_touch_stream

    src = f"{sf_dir}/events.parquet"
    d = tmp_path / "replay"
    d.mkdir()
    shutil.copy(src, d / "a.parquet")
    shutil.copy(src, d / "b.parquet")
    stream = first_touch_stream(
        spark, str(d), query_name="ft_two_batches", max_files_per_trigger=1
    )
    batch = first_touch_batch(spark.read.parquet(src))
    s = {
        (r.user_id, r.event_type, r.first_ts, r.first_event_id, r.first_value)
        for r in stream.collect()
    }
    b = {
        (r.user_id, r.event_type, r.first_ts, r.first_event_id, r.first_value)
        for r in batch.collect()
    }
    assert s == b
