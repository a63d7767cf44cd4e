"""Custom stateful streaming operators (applyInPandasWithState).

The reference's stateful pieces are all delivery-side (batching timers,
retry state inside the sink actor — Actors.kt); its analytics-side state
lives in ES. This module is the Spark-native home for query-side state the
engine needs beyond built-in windowed aggregations: per-key state carried
ACROSS micro-batches with explicit timeout semantics, via
``applyInPandasWithState`` (Arrow-batched — the state function sees whole
pandas frames per key, never Python-per-row).

First operator: streaming sessionization — the exact streaming twin of
``operators.sessions.sessionize`` (the ev1 batch operator). Built-in
``F.session_window`` could bucket events too, but the custom-state form is
the one that generalizes (emit enriched session records, cap session
length, count distinct actions, ...) and is the pattern SURVEY §2.10 maps
custom stateful operators onto.

Scale: state is one small tuple per ACTIVE user (open session), grouped by
user — Spark hash-partitions state by key, so 10^9 users spread across
executors; each micro-batch touches only keys present in the batch plus
timed-out keys. The per-key pandas frame is that user's events in the
batch — bounded by per-user rates, never corpus-sized.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long"
)
_STATE_SCHEMA = "start long, last long, n long"


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
    timeout: str = "none",
) -> DataFrame:
    """Gap-based sessionization over a stream: a user's session CLOSES
    when a later event arrives more than ``gap_seconds`` after the
    session's last event (emitted then). Open sessions persist in the
    state store across micro-batches — a session spanning many batches
    emits exactly once, when it closes.

    ``timeout="processing"`` additionally flushes idle sessions after
    ``gap_seconds`` of processing-time silence (the production setting —
    otherwise a user who never returns holds state forever); the default
    ``"none"`` closes only on gap-exceeding events, which keeps test
    runs deterministic (timeout firing depends on wall clock).

    Batch parity: on any fixed event set, the emitted sessions plus the
    still-open state equal ``operators.sessions.sessionize`` — pytest
    drives cross-batch carry and gap-split emission through real
    micro-batches and a checkpoint restart.
    """
    gap_ms = int(gap_seconds) * 1000
    use_timeout = timeout == "processing"

    def fn(key, pdfs, state):
        uid = int(key[0])
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [uid],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_events": [n],
                }
            )
            return
        ts = pd.concat([p[ts_col] for p in pdfs]).sort_values()
        ms = (ts.astype("int64") // 1_000_000).to_numpy()
        if state.exists:
            start, last, n = state.get
        else:
            # fresh state: the first event opens the session
            start, last, n = int(ms[0]), int(ms[0]), 1
            ms = ms[1:]
        out_rows = []
        for t in ms:
            t = int(t)
            if t - last > gap_ms:
                out_rows.append((start, last, n))
                start, n = t, 1
            else:
                n += 1
            last = max(last, t)
        state.update((start, last, n))
        if use_timeout:
            state.setTimeoutDuration(gap_ms)
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [uid] * len(out_rows),
                    "session_start": [
                        pd.Timestamp(s, unit="ms") for s, _, _ in out_rows
                    ],
                    "session_end": [
                        pd.Timestamp(e, unit="ms") for _, e, _ in out_rows
                    ],
                    "n_events": [c for _, _, c in out_rows],
                }
            )

    from pyspark.sql.streaming.state import GroupStateTimeout

    mode = (
        GroupStateTimeout.ProcessingTimeTimeout if use_timeout
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select(F.col(user_col).alias("user_id"), F.col(ts_col))
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, SESSION_SCHEMA, _STATE_SCHEMA, "append", mode
        )
    )
