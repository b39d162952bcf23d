"""Streaming gap-based sessionization — the stateful twin of the batch
`events_sessionize` gate query (lag + gap > threshold + running count per
user), maintained per micro-batch with applyInPandasWithState.

State per user = (epoch of the last event seen, running session counter):
a new event starts a session when it is the user's first or its gap from
the previous event exceeds `gap_sec`; session_id is the 1-based running
count — exactly the batch window's `sum(new_sess) over (rows unbounded
preceding)`.

Ordering contract: events are processed in (ts, event_id) order WITHIN
each micro-batch, and the state carries the last timestamp across
batches, so a per-key in-order stream (the Kafka-keyed-by-user shape)
reproduces the batch result row-for-row regardless of how events split
across micro-batches (tested). A cross-batch late event (older than the
user's last seen ts) still applies the gap rule at its arrival position —
the same at-least-once ingest trade the streaming dedup documents; use
the batch path for out-of-order backfills.

Scale posture: state is hash-partitioned by user across executors (two
longs per user — no event buffering); per-batch work is one sort of the
user's batch slice. Nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout


def sessionize_stream(
    stream_df: DataFrame,
    gap_sec: int = 1800,
    user: str = "user_id",
    ts: str = "ts",
    event_id: str = "event_id",
) -> DataFrame:
    """(user_id, event_id, session_id) for every arriving event; session
    ids match the batch sessionize under per-key in-order delivery. Key
    and event-id output types follow the input schema."""
    import pandas as pd

    dt = dict(stream_df.dtypes)
    out_schema = (
        f"user_id {dt[user]}, event_id {dt[event_id]}, session_id long"
    )

    def assign(key, pdfs, state):
        import numpy as np

        if state.exists:
            last_epoch, sess = state.get
        else:
            last_epoch, sess = None, 0
        rows = pd.concat(list(pdfs))
        if len(rows) == 0:
            return
        rows = rows.sort_values([ts, event_id])
        # vectorized gap/cumsum (no per-event Python): epoch seconds for
        # the batch slice, shifted-by-one prev with the carried state (or
        # a sentinel forcing a new session) seeding element 0
        epochs = (
            rows[ts].to_numpy().astype("datetime64[ns]").astype("int64")
            // 1_000_000_000
        )
        seed = last_epoch if last_epoch is not None else epochs[0] - gap_sec - 1
        prev = np.concatenate(([seed], epochs[:-1]))
        session = sess + np.cumsum(epochs - prev > gap_sec)
        state.update((int(epochs[-1]), int(session[-1])))
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "event_id": rows[event_id].to_numpy(),
                "session_id": session,
            }
        )

    return stream_df.groupBy(user).applyInPandasWithState(
        assign,
        outputStructType=out_schema,
        stateStructType="last_epoch long, sess long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
