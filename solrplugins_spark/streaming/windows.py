"""Structured Streaming event-time windows with watermarks.

The reference has no streams (SURVEY.md §2.9); this is the engine-side
streaming surface the transcripts pipeline needs: tumbling event-time
window aggregation with a watermark bounding late data. The batch twin
(analytics/events.windowed_counts) is the correctness oracle — with
`availableNow` over a static source every event is on time, so the
streamed result must equal the batch result exactly
(tests/test_events_windows.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_windowed_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Streaming (window_start, <key>, cnt): withWatermark bounds the
    state kept for late events; append mode emits a window once the
    watermark passes its end. Write with foreachBatch or a sink:

        q = (streaming_windowed_counts(stream).writeStream
             .outputMode("append").format("memory")
             .queryName("win").trigger(availableNow=True).start())
    """
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # cast is value-preserving
    stream_df = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return (
        stream_df.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "cnt",
        )
    )
