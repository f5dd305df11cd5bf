"""Custom stateful streaming operator: gap-based sessionization with
applyInPandasWithState.

The batch twin is analytics/events.sessionize (lag + conditional
cumsum); this is the streaming form the transcripts pipeline needs
when events arrive continuously: per-user state carries (last event
timestamp, current session ordinal) across micro-batches, so a user's
session ids keep counting up without reprocessing history. With
`availableNow` over a static source (everything in one batch) the
output equals the batch twin exactly; with multiple chronological
micro-batches the carried state yields the same ids as one big batch
(both asserted in tests/test_events_windows.py).

Ordering contract: events for a user must arrive in event-time order
ACROSS micro-batches (within a batch they are sorted here). That is
the standard contract for watermark-free stateful sessionization —
an upstream `withWatermark` + window sort stage can enforce it for
out-of-order sources.

At scale: state is per-user and O(1) (two longs); the shuffle is the
same user_id exchange the batch twin pays. GroupStateTimeout can evict
idle users' state (left NoTimeout here: the synthetic corpus is
bounded; production would set an event-time timeout past the gap).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign_sessions(
    chunks: list[pd.DataFrame],
    last_micros: int | None,
    sess: int,
    gap_micros: int,
    id_col: str,
) -> tuple[pd.DataFrame, int | None, int]:
    """Session assignment core, shared by the streaming closure and
    unit tests: concat ALL chunks, sort ONCE by (time, id), then walk.
    Chunks arrive with no cross-chunk ordering guarantee, so a
    per-chunk sort with carried state would corrupt session ids."""
    pdf = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
    if len(pdf) == 0:
        return pdf, last_micros, sess
    pdf = pdf.sort_values(["_micros", id_col], kind="stable")
    out_sess = []
    for m in pdf["_micros"].to_numpy():
        if last_micros is None or (m - last_micros) > gap_micros:
            sess += 1
        last_micros = int(m)
        out_sess.append(sess)
    out = pd.DataFrame(
        {"event_id": pdf[id_col].to_numpy(), "session_id": out_sess}
    )
    return out, last_micros, sess


def streaming_sessionize(
    stream_df: DataFrame,
    gap_minutes: float = 30.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming (event_id, user_id, session_id), session ids
    continuing across micro-batches via per-user GroupState."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_micros = int(gap_minutes * 60.0 * 1e6)

    def assign(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_micros, sess = state.get
            if last_micros < 0:  # -1 encodes "no event yet"
                last_micros = None
        else:
            last_micros, sess = None, -1
        out, last_micros, sess = _assign_sessions(
            list(pdfs), last_micros, sess, gap_micros, id_col
        )
        if len(out):
            yield out.assign(user_id=key[0])[
                ["event_id", "user_id", "session_id"]
            ]
        state.update((last_micros if last_micros is not None else -1, sess))

    # output types follow the input schema (the batch twin preserves
    # them); null timestamps are dropped JVM-side — session assignment
    # is undefined for them and int(NaN) would kill the whole query
    user_type = stream_df.schema[user_col].dataType.simpleString()
    id_type = stream_df.schema[id_col].dataType.simpleString()
    prepared = stream_df.select(
        F.col(user_col).alias(user_col),
        F.col(id_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_micros"),
    ).filter(F.col("_micros").isNotNull())
    return prepared.groupBy(user_col).applyInPandasWithState(
        assign,
        outputStructType=(
            f"event_id {id_type}, user_id {user_type}, session_id long"
        ),
        stateStructType="last_micros long, sess long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
