"""Custom stateful streaming operator: inactivity-gap sessionization.

The operator Spark's built-in windows can't express: variable-length user
sessions that close after a configurable inactivity gap. Implemented with
applyInPandasWithState — per-key state carries the open session across
micro-batches; closed sessions are appended downstream. This is the
pattern the reference's "live games" roadmap needs (a game is a session of
play events), and the general custom-stateful-operator recipe (SURVEY
§2.10 stretch).

Scale: state is O(active keys), partitioned by user across executors;
emission is append-only so the sink never rewrites.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start_us long, last_us long, n long"

_US = 1_000_000


def _sessionize_fn(gap_seconds: int, idle_timeout_ms: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key

        def emit(closed: list[tuple[int, int, int, int]]):
            return pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime([c[1] * 1000 for c in closed]),
                    "session_end": pd.to_datetime([c[2] * 1000 for c in closed]),
                    "n_events": [c[3] for c in closed],
                }
            )

        if state.hasTimedOut:
            # Idle key: force-close the open session and drop the state.
            if state.exists:
                start_us, last_us, n = state.get
                state.remove()
                yield emit([(user_id, start_us, last_us, n)])
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()

        start_us, last_us, n = state.get if state.exists else (None, None, 0)
        closed: list[tuple[int, int, int, int]] = []
        for t in ts_us:
            if start_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                last_us, n = t, n + 1
        if start_us is not None:
            state.update((start_us, last_us, n))
            if idle_timeout_ms > 0:
                state.setTimeoutDuration(idle_timeout_ms)
        if closed:
            yield emit(closed)

    return fn


def sessionize(
    events: DataFrame, gap_seconds: int = 600, idle_timeout_ms: int = 0
) -> DataFrame:
    """Closed sessions per user (streaming input → append output).

    Each user's final (still-open) session stays in state and closes when
    the next gap arrives. With ``idle_timeout_ms`` > 0, a
    ProcessingTimeTimeout force-closes (and evicts) sessions whose key has
    seen no data for that long — bounding state size on a real unbounded
    stream where dormant keys would otherwise accumulate forever. 0 keeps
    the NoTimeout semantics (deterministic for availableNow parity tests:
    processing-time timeouts are wall-clock-dependent by nature).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds, idle_timeout_ms),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms > 0
        else GroupStateTimeout.NoTimeout,
    )
