"""Event-time-timer sessionization via ``transformWithStateInPandas``
— sessions CLOSE (and emit exactly once) when the watermark proves
they can no longer grow, the canonical use of the arbitrary-state
API's timers that neither ``session_window`` aggregation (fixed agg
functions only) nor ``applyInPandasWithState`` (processing-time
timeouts only) expresses.

Semantics ≡ the batch 30-minute-gap sessionization
(plans/trade.py:events_session_stats): per user, consecutive events
less than GAP apart share a session; a session is closed when
``last_event_time + GAP <= watermark`` — by the watermark contract no
future row can have an event time inside the session's extension
window, so the close decision is FINAL (exactly-once emission without
reconciliation). Out-of-order arrival within the watermark delay is
handled by construction: events accumulate in ListState and sessions
are re-derived from the accumulated set at every close, so a late
event that bridges two tentative sessions merges them before anything
is emitted.

Output rows match the batch mart column-for-column
(user_id, session_seq, n_events, duration_us, total_value); the
equivalence test streams the real events table file-by-file and
compares against the batch query row-for-row.

Scale: state per user = the events of its OPEN tail (everything older
is emitted and cleared on timer fire), sharded by the groupBy key;
timers are per-key and fire on watermark advance — the state bound is
the watermark delay × per-user event rate, not history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

#: 30-minute session gap, microseconds — the batch mart's constant.
GAP_US = 30 * 60 * 1_000_000

OUTPUT_SCHEMA = (
    "user_id long, session_seq int, n_events long, "
    "duration_us long, total_value double"
)


def split_sessions(
    events: list[tuple[int, int]], gap_us: int = GAP_US
) -> list[list[tuple[int, int]]]:
    """Pure gap-rule sessionization of (ts_us, value_micro) tuples —
    shared by the processor and the tests (one definition, no
    drift). Input may be unsorted; output sessions are in time
    order."""
    evs = sorted(events)
    sessions: list[list[tuple[int, int]]] = []
    cur: list[tuple[int, int]] = []
    for e in evs:
        if cur and e[0] - cur[-1][0] >= gap_us:
            sessions.append(cur)
            cur = []
        cur.append(e)
    if cur:
        sessions.append(cur)
    return sessions


class SessionCloseProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._events = handle.getListState(
            "open_events", "ts_us long, val_micro long"
        )
        self._seq = handle.getValueState("emitted", "n int")

    def handleInputRows(
        self, key, rows, timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        fresh: list[tuple[int, int]] = []
        last_us = None
        for pdf in rows:
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            # decimal(18,6) quantization of the value, matching the
            # batch mart's cast (HALF_UP via floor(x·1e6 + 0.5))
            vm = (pdf["value"].astype("float64") * 1e6 + 0.5)
            for t, v in zip(ts_us, vm):
                fresh.append((int(t), int(v // 1)))
        if fresh:
            self._events.appendList(fresh)
            last_us = max(
                t for (t, _) in self._events.get()
            )
            # (re-)arm the close timer for the newest open tail; stale
            # earlier timers fire harmlessly (close nothing) — timer
            # hygiene traded for one fewer state read
            self._handle.registerTimer((last_us + GAP_US + 999) // 1000)
        return iter(())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        wm_us = timerValues.getCurrentWatermarkInMs() * 1000
        held = list(self._events.get())
        if not held:
            return iter(())
        sessions = split_sessions(held)
        closed = [s for s in sessions if s[-1][0] + GAP_US <= wm_us]
        if not closed:
            return iter(())
        keep = [e for s in sessions if s[-1][0] + GAP_US > wm_us for e in s]
        self._events.clear()
        if keep:
            self._events.appendList(keep)
        base = self._seq.get()[0] if self._seq.exists() else 0
        self._seq.update((base + len(closed),))
        out = {
            "user_id": [],
            "session_seq": [],
            "n_events": [],
            "duration_us": [],
            "total_value": [],
        }
        for i, s in enumerate(closed):
            out["user_id"].append(key[0])
            out["session_seq"].append(base + i + 1)
            out["n_events"].append(len(s))
            out["duration_us"].append(s[-1][0] - s[0][0])
            out["total_value"].append(sum(v for _, v in s) / 1e6)
        return iter([pd.DataFrame(out)])

    def close(self) -> None:
        pass


def session_close_stream(
    events: DataFrame, watermark_delay: str = "7 days"
) -> DataFrame:
    """Wire an events stream (user_id, ts timestamp, value) into the
    timer-closed sessionizer. ``watermark_delay`` bounds how
    out-of-order arrival may be; sessions emit exactly once,
    ``watermark_delay`` after their last event's event time. Needs
    the transformWithStateInPandas runtime (protobuf — see
    funnel.transform_with_state_available) and the RocksDB state
    store provider (per-variable column families)."""
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .transformWithStateInPandas(
            SessionCloseProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
