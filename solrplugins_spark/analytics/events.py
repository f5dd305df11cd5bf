"""Event/transcript sequence operators: sessionization, context-window
assembly, event-time windowed aggregation.

The input_hint's corpus is multi-turn conversations; these are the
sequence-shaped operators such data needs (the reference is
request/response and has none — SURVEY.md §2.9):

- sessionize: gap-based session ids per user/conversation — the
  canonical stateful sequence op, expressed as lag + conditional
  cumsum windows keyed by the entity (scale-safe: partitions by
  user, never a global window).
- context_window: each row plus its previous-k items concatenated —
  the training-example assembly step (turn + context) for
  conversation data.
- windowed_counts: event-time tumbling-window aggregation (the batch
  twin of the Structured Streaming watermark variant in
  streaming/windows.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(event_id, user_id, session_id) — a new session starts when the
    gap to the user's previous event exceeds ``gap_minutes``.
    session_id = ordinal within the user (0-based), deterministic via
    (ts, event_id) ordering. One shuffle on user_id."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    # unix_micros keeps sub-second precision and works for both
    # TIMESTAMP and TIMESTAMP_NTZ (session tz is UTC)
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(F.col(ts_col)).over(w)
    prev_micros = F.unix_micros(prev.cast("timestamp"))
    new_session = F.when(
        prev.isNull() | ((micros - prev_micros) > gap_minutes * 60.0 * 1e6), 1
    ).otherwise(0)
    return events.select(
        F.col(id_col).alias("event_id"),
        F.col(user_col).alias("user_id"),
        (
            F.sum(new_session).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            - 1
        ).alias("session_id"),
    )


def context_window(
    events: DataFrame,
    k: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "event_type",
    sep: str = " | ",
) -> DataFrame:
    """(event_id, ctx) — each row's previous ``k`` values within its
    user/conversation, oldest first, joined by ``sep`` (empty string
    for the first row). The training-example assembly shape: pair a
    turn with its context. Window keyed by the entity — scale-safe."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-k, -1)
    )
    return events.select(
        F.col(id_col).alias("event_id"),
        F.array_join(F.collect_list(value_col).over(w), sep).alias("ctx"),
    )


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """(window_start, <key>, cnt) — event-time tumbling-window counts;
    window_start rendered as 'yyyy-MM-dd HH:mm:ss' so results compare
    across engines. The batch twin of
    streaming.windows.streaming_windowed_counts."""
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            key_col,
            "cnt",
        )
    )


def assemble_transcripts(
    events: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "event_type",
    sep: str = " | ",
    max_turns: int | None = None,
) -> DataFrame:
    """(user_id, session_id, n_turns, transcript) — one row per
    session: the session's turns in (ts, id) order joined by ``sep``.
    The conversation->document flattening step that turns a turn-level
    event log into training examples (and into `documents`-shaped
    input for the index/dedup/LM operators upstream).

    ``max_turns`` keeps only each session's first N turns (context
    budget truncation); n_turns still reports the FULL session length
    so truncation is observable.

    Scale shape: the session assignment is the sessionize lag+cumsum
    window (partitioned by user, never global); the flatten is one
    groupBy(user, session) with sort_array(collect_list(struct)) —
    per-session bounded state, no join back to the event log."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    micros = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(F.col(ts_col)).over(w)
    prev_micros = F.unix_micros(prev.cast("timestamp"))
    new_session = F.when(
        prev.isNull() | ((micros - prev_micros) > gap_minutes * 60.0 * 1e6), 1
    ).otherwise(0)
    with_sid = events.select(
        F.col(user_col).alias("user_id"),
        (
            F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
            - 1
        ).alias("session_id"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(value_col).cast("string").alias("_v"),
    )
    turns = F.array_sort(
        F.collect_list(F.struct(F.col("_ts"), F.col("_id"), F.col("_v")))
    )
    if max_turns is not None:
        kept = F.slice(turns, 1, int(max_turns))
    else:
        kept = turns
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.array_join(
                F.transform(kept, lambda t: t["_v"]), sep
            ).alias("transcript"),
        )
    )
