"""Custom stateful streaming operator: user sessionization.

The one operator class the DataFrame API can't express declaratively —
per-key mutable state across micro-batches — implemented the Spark way:
``applyInPandasWithState`` (Arrow-batched, event-time timeouts driven by
the watermark). The reference has no session concept; this is the engine
extension pattern for "custom stateful operator" (SURVEY.md §2.9 note),
e.g. attributing a burst of donation events to one funding session.

Semantics:
  - events for a user belong to one session while consecutive gaps are
    < ``gap``; a gap of EXACTLY ``gap`` or larger closes the session and
    starts a new one (gap-EXCLUSIVE, Spark's native session_window
    convention; NOTE the batch twin operators/windows.sessionize is
    gap-INCLUSIVE — an exactly-``gap`` interval stays in-session there);
  - a session also closes when the event-time watermark passes
    session_end + gap (user went quiet) — GroupStateTimeout's
    EventTimeTimeout, so state is bounded by the number of ACTIVE users,
    not all users ever seen;
  - closed sessions are emitted exactly once (update mode downstream).

Scale: state lives in the state store keyed by user; each micro-batch
touches only users with new events plus timed-out keys. Arrow moves
whole per-user batches, not rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start_us long, end_us long, n long"

_US = 1_000_000


def _session_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            # watermark passed end+gap with no new events: close and drop
            start_us, end_us, n = state.get
            closed.append((start_us, end_us, n))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                ts_us.extend(int(t.value) // 1000 for t in pdf["ts"])
            ts_us.sort()
            start_us, end_us, n = state.get if state.exists else (None, None, 0)
            for t in ts_us:
                if start_us is None:
                    start_us, end_us, n = t, t, 1
                elif t - end_us < gap_us:
                    end_us, n = max(end_us, t), n + 1
                else:
                    closed.append((start_us, end_us, n))
                    start_us, end_us, n = t, t, 1
            state.update((start_us, end_us, n))
            # close when the watermark passes quiet-period end
            state.setTimeoutTimestamp((end_us + gap_us) // 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "10 minutes",
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Emit closed sessions (user_id, session_start, session_end,
    n_events) from a streaming events frame."""
    value, unit = gap.split()
    gap_us = int(value) * {"seconds": 1, "minutes": 60, "hours": 3600}[unit] * _US
    prepared = events.select(
        events[user_col].alias("user_id"), events[ts_col].alias("ts")
    ).withWatermark("ts", watermark_delay)
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_us),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.EventTimeTimeout,
    )
