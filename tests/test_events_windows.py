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


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization vs the batch twin:
    - one availableNow batch == batch sessionize exactly;
    - TWO chronological micro-batches (time-split sources) == the same
      one-big-batch result, proving per-user state (last ts + session
      ordinal) genuinely carries across micro-batches."""
    from solrplugins_spark.analytics.events import sessionize
    from solrplugins_spark.streaming.stateful import streaming_sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch = (
        sessionize(ev, gap_minutes=30.0)
        .orderBy("event_id")
        .toPandas()
        .reset_index(drop=True)
    )

    def run(src_dir, name, ck):
        stream = spark.readStream.schema(ev.schema).parquet(src_dir)
        q = (
            streaming_sessionize(stream, gap_minutes=30.0)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # single batch
    src1 = str(tmp_path / "all")
    ev.coalesce(2).write.mode("overwrite").parquet(src1)
    run(src1, "sess_all", "ck_all")
    got1 = (
        spark.sql("select * from sess_all")
        .orderBy("event_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert len(got1) == len(batch) > 0
    pd.testing.assert_frame_equal(got1, batch, check_dtype=False)

    # two chronological micro-batches against ONE checkpoint: run over
    # the early half, append the late half, run again with the SAME
    # checkpoint (only new files process; state restores from it). The
    # second run's output covers ONLY late events — their session ids
    # must continue from the carried (last ts, ordinal) state, so
    # early-output + late-output == the one-big-batch result.
    from pyspark.sql import functions as F
    mid = ev.agg(
        F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.5)")
    ).collect()[0][0]
    micros = F.unix_micros(F.col("ts").cast("timestamp"))
    early = ev.filter(micros <= mid)
    late = ev.filter(micros > mid)
    src2 = str(tmp_path / "inc")
    out2 = str(tmp_path / "inc_out")

    def run_file_sink(src_dir):
        # the memory sink cannot recover from a checkpoint; the parquet
        # sink can, which is what makes the state-carry leg honest
        stream = spark.readStream.schema(ev.schema).parquet(src_dir)
        q = (
            streaming_sessionize(stream, gap_minutes=30.0)
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out2)
            .option("checkpointLocation", str(tmp_path / "ck_inc"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    early.coalesce(1).write.mode("overwrite").parquet(src2)
    run_file_sink(src2)
    n_first = spark.read.parquet(out2).count()
    late.coalesce(1).write.mode("append").parquet(src2)
    run_file_sink(src2)
    got2 = (
        spark.read.parquet(out2)
        .orderBy("event_id")
        .toPandas()
        .reset_index(drop=True)
    )
    assert 0 < n_first < len(got2), "second run must process only late events"
    pd.testing.assert_frame_equal(got2, batch, check_dtype=False)


def test_streaming_sessionize_multichunk_order(spark):
    """applyInPandasWithState delivers a key's rows as Arrow-sized
    chunks with NO cross-chunk ordering; the session core must concat
    and sort ALL chunks before threading state (code-review r03).
    Drives the REAL _assign_sessions core with reverse-time chunks and
    with state carried across two calls."""
    import pandas as pd_

    from solrplugins_spark.streaming.stateful import _assign_sessions

    gap_micros = int(30 * 60 * 1e6)
    hours = [3, 4, 5, 0, 1, 2]  # hourly events -> each its own session
    prep = pd_.DataFrame(
        {
            "event_id": hours,
            "_micros": [h * 3600 * 1_000_000 for h in hours],
        }
    )
    # reverse-time chunk split: later hours delivered first
    out, last, sess = _assign_sessions(
        [prep.iloc[:3].copy(), prep.iloc[3:].copy()], None, -1, gap_micros,
        "event_id",
    )
    got = out.sort_values("event_id")
    assert list(got["session_id"]) == [0, 1, 2, 3, 4, 5]
    assert sess == 5 and last == 5 * 3600 * 1_000_000

    # state carries into the next micro-batch: an event 10 min after
    # the last one continues session 5; one 2 h later opens session 6
    nxt = pd_.DataFrame(
        {
            "event_id": [10, 11],
            "_micros": [
                5 * 3600 * 1_000_000 + 10 * 60 * 1_000_000,
                7 * 3600 * 1_000_000,
            ],
        }
    )
    out2, _, sess2 = _assign_sessions([nxt], last, sess, gap_micros, "event_id")
    assert list(out2["session_id"]) == [5, 6] and sess2 == 6


def test_assemble_transcripts(spark):
    """Sessions flatten in (ts, id) order; max_turns truncates the
    transcript but n_turns reports the full session length."""
    from datetime import datetime

    from solrplugins_spark.analytics.events import assemble_transcripts

    def at(minutes):
        return datetime(2024, 1, 1, minutes // 60, minutes % 60, 0)

    rows = [
        # user 1, session 0: 3 turns 5 min apart
        (0, 1, at(0), "a"), (1, 1, at(5), "b"), (2, 1, at(10), "c"),
        # user 1, session 1: one turn 2 h later
        (3, 1, at(130), "d"),
        # user 2, single session, out-of-id-order timestamps
        (5, 2, at(1), "y"), (4, 2, at(0), "x"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r.user_id, r.session_id): (r.n_turns, r.transcript)
        for r in assemble_transcripts(ev, gap_minutes=30.0).collect()
    }
    assert got == {
        (1, 0): (3, "a | b | c"),
        (1, 1): (1, "d"),
        (2, 0): (2, "x | y"),
    }
    trunc = {
        (r.user_id, r.session_id): (r.n_turns, r.transcript)
        for r in assemble_transcripts(ev, gap_minutes=30.0, max_turns=2).collect()
    }
    assert trunc[(1, 0)] == (3, "a | b")  # full length, truncated text
    assert trunc[(2, 0)] == (2, "x | y")


def test_streaming_dedup_matches_batch(spark, tmp_path):
    """Ingest-time exact dedup: a source containing every event twice
    (and some content duplicates) streams through
    dropDuplicatesWithinWatermark and lands exactly the batch-distinct
    key set — both by id and by content hash."""
    from solrplugins_spark.streaming import streaming_dedup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "ts", "event_type"
    )
    src = str(tmp_path / "dup_src")
    # two physical copies of every row -> every key is duplicated
    ev.unionAll(ev).coalesce(2).write.mode("overwrite").parquet(src)

    def run(name, **kw):
        stream = spark.readStream.schema(ev.schema).parquet(src)
        q = (
            streaming_dedup(stream, **kw)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.sql(f"select * from {name}").toPandas()

    got = run("dedup_id", key_cols=("event_id",), watermark="365 days")
    want = ev.select("event_id").distinct().count()
    assert len(got) == want
    assert got["event_id"].is_unique
    assert set(got.columns) == {"event_id", "ts", "event_type"}

    # content dedup: key = xxhash64(text); distinct event_type values
    # collapse to one row each
    got_c = run("dedup_content", key_cols=(), watermark="365 days",
                text_col="event_type")
    want_c = ev.select("event_type").distinct().count()
    assert len(got_c) == want_c
    assert got_c["event_type"].is_unique
    assert "_dup_key" not in got_c.columns
