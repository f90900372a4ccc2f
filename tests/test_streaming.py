"""Structured Streaming jobs: availableNow trigger over the events parquet,
asserting streaming results equal the batch twins (same expressions, two
execution modes)."""

import pyspark.sql.functions as F

from ecommerce_lakehouse_spark.lake import LakeTable
from ecommerce_lakehouse_spark.queries.events import session_window_agg, tumbling_window_agg
from ecommerce_lakehouse_spark.streaming import (
    read_events_stream,
    sessionized_stream,
    stream_merge_into,
    windowed_event_counts,
)


def _run_to_memory(stream_df, spark, name, checkpoint):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_streaming_tumbling_matches_batch(spark, sf_dir, tmp_path):
    stream = windowed_event_counts(read_events_stream(spark, sf_dir))
    got = _run_to_memory(stream, spark, "win_counts", str(tmp_path / "cp1"))
    expect = tumbling_window_agg(spark, sf_dir)
    cols = ["window_start", "event_type", "n_events", "total_value"]
    assert _rows(got, cols) == _rows(expect, cols)


def test_streaming_sessions_match_batch(spark, sf_dir, tmp_path):
    stream = sessionized_stream(read_events_stream(spark, sf_dir))
    got = _run_to_memory(stream, spark, "sess_counts", str(tmp_path / "cp2"))
    expect = session_window_agg(spark, sf_dir)
    cols = ["user_id", "session_start", "session_end", "n_events"]
    assert _rows(got, cols) == _rows(expect, cols)


def test_stream_merge_into_laketable(spark, sf_dir, tmp_path):
    table = LakeTable(spark, str(tmp_path / "events_table"))
    events = read_events_stream(spark, sf_dir).select("event_id", "user_id", "ts", "value")
    q = stream_merge_into(events, table, ["event_id"], str(tmp_path / "cp3")).start()
    q.awaitTermination(120)

    batch_count = (
        spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id").distinct().count()
    )
    assert table.read().count() == batch_count
    # merge is keyed: no duplicate event_ids
    assert table.read().select("event_id").distinct().count() == batch_count
    assert table.history()[-1]["operation"] in ("merge", "overwrite")
