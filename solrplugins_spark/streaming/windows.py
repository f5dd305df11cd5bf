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


def streaming_dedup(
    stream_df: DataFrame,
    key_cols: tuple[str, ...] = ("doc_id",),
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str | None = None,
) -> DataFrame:
    """Streaming exact dedup — the streaming twin of dedup_exact for
    ingest-time pipelines: keep each key's first arrival, dropping
    later duplicates that arrive within the watermark horizon.

    ``text_col`` switches to content dedup: the key becomes
    xxhash64(text) (the same first-pass key the batch dedup family
    uses), so re-sent identical documents dedupe regardless of id.

    Scale contract: dropDuplicatesWithinWatermark bounds the key
    state by the watermark delay — state size tracks the key arrival
    RATE times the horizon, never the stream's lifetime (the property
    that makes exact dedup runnable forever at ingest). Duplicates
    farther apart than the horizon can re-emit; that is the documented
    trade for bounded state — run the batch dedup_exact over the
    landed corpus for the global pass.
    """
    s = stream_df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    keys = list(key_cols)
    if text_col is not None:
        s = s.withColumn("_dup_key", F.xxhash64(F.col(text_col)))
        keys = ["_dup_key"]
    out = s.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return out.drop("_dup_key") if text_col is not None else out
