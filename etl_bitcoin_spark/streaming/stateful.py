"""Custom stateful streaming operator: per-conversation progress tracker.

Demonstrates the applyInPandasWithState surface (north-star "custom
stateful operators"): as change events stream in, per-conversation state
tracks turns seen, the max turn index, and the last event time, emitting
an updated progress row per conversation per micro-batch. The state
lives in Spark's streaming state store (checkpointed, recoverable).

Arrow/pandas throughout — the state update is one vectorized pass per
conversation group per batch; no per-row Python beyond the group loop
Spark itself drives.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = (
    "conv_id string, events bigint, max_turn int, last_ts timestamp, "
    "deletes bigint"
)
STATE_SCHEMA = "events bigint, max_turn int, last_ts timestamp, deletes bigint"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    events, max_turn, last_ts, deletes = (
        state.get if state.exists else (0, -1, None, 0)
    )
    for pdf in pdfs:
        events += len(pdf)
        deletes += int((pdf["op"] == "D").sum())
        max_turn = max(max_turn, int(pdf["turn_idx"].max()))
        ts_max = pdf["ts"].max()
        last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
    state.update((events, max_turn, last_ts, deletes))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "events": [events],
            "max_turn": [max_turn],
            "last_ts": [last_ts],
            "deletes": [deletes],
        }
    )


def conversation_progress(stream_df):
    """Attach the stateful progress operator to a streaming binlog
    DataFrame. Returns an 'update'-mode stream of per-conversation
    progress rows."""
    return (
        stream_df.groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def windowed_op_counts(
    stream_df, window_dur: str = "1 minute", watermark: str = "2 minutes"
):
    """Event-time windowed aggregation with a watermark — the standard
    late-data machinery (Structured Streaming's windowed aggs): per
    tumbling event-time window, per op, the event count. The watermark
    bounds state (windows older than max(ts) - watermark finalize and
    evict) and defines the late-event drop horizon; append-mode output
    emits each window exactly once, when it closes.

    At 10^10 events this is the monitoring-plane companion to the merge
    path (rates per op per minute), with state bounded by
    (#open windows x #ops), independent of stream length."""
    from pyspark.sql import functions as F

    return (
        stream_df.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_dur).alias("win"), "op")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "op", "n")
    )
