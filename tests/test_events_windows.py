"""Event-sequence operators + Structured Streaming windowed aggregation."""

import pandas as pd

from solrplugins_spark.analytics.events import (
    context_window,
    sessionize,
    windowed_counts,
)
from solrplugins_spark.streaming.windows import streaming_windowed_counts


def test_sessionize_gaps(spark):
    rows = [
        (0, "2024-01-01 00:00:00", 1),
        (1, "2024-01-01 00:10:00", 1),   # 10 min gap -> same session
        (2, "2024-01-01 01:00:00", 1),   # 50 min gap -> new session
        (3, "2024-01-01 01:05:00", 1),
        (4, "2024-01-01 00:00:00", 2),   # other user independent
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long"
    ).selectExpr("event_id", "cast(ts_s as timestamp) as ts", "user_id")
    got = sessionize(ev, gap_minutes=30).toPandas().set_index("event_id")
    assert got.loc[0, "session_id"] == 0 and got.loc[1, "session_id"] == 0
    assert got.loc[2, "session_id"] == 1 and got.loc[3, "session_id"] == 1
    assert got.loc[4, "session_id"] == 0


def test_context_window_assembly(spark):
    rows = [
        (0, "2024-01-01 00:00:00", 1, "view"),
        (1, "2024-01-01 00:01:00", 1, "click"),
        (2, "2024-01-01 00:02:00", 1, "buy"),
        (3, "2024-01-01 00:03:00", 1, "view"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string"
    ).selectExpr("event_id", "cast(ts_s as timestamp) as ts", "user_id", "event_type")
    got = context_window(ev, k=2).toPandas().set_index("event_id")["ctx"]
    assert got[0] == ""
    assert got[1] == "view"
    assert got[2] == "view | click"
    assert got[3] == "click | buy"  # sliding, oldest first


def test_streaming_windows_match_batch(spark, tmp_path):
    """Streamed event-time windows vs the batch twin:
    - complete mode == batch exactly (every event on time with
      availableNow over a static source);
    - append mode emits exactly the windows the watermark has CLOSED
      (those ending at/before max_event_time - watermark) — the
      late-data semantics, asserted, not hand-waved."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src = str(tmp_path / "ev")
    ev.coalesce(2).write.mode("overwrite").parquet(src)

    batch = windowed_counts(ev, window="1 hour").toPandas()
    key = ["window_start", "event_type"]
    b = batch.sort_values(key).reset_index(drop=True)

    def run(mode, name):
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            streaming_windowed_counts(stream, window="1 hour", watermark="2 hours")
            .writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return (
            spark.sql(f"select * from {name}")
            .toPandas()
            .sort_values(key)
            .reset_index(drop=True)
        )

    s_complete = run("complete", "win_complete")
    assert len(b) > 0
    pd.testing.assert_frame_equal(b, s_complete, check_dtype=False)

    s_append = run("append", "win_append")
    # append holds back windows not yet closed by the watermark
    import pandas as pdlib

    max_ts = ev.agg({"ts": "max"}).collect()[0][0]
    cutoff = pdlib.Timestamp(max_ts) - pdlib.Timedelta("2 hours")
    closed = b[
        pdlib.to_datetime(b["window_start"]) + pdlib.Timedelta("1 hour") <= cutoff
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(closed, s_append, check_dtype=False)
