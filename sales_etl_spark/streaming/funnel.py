"""Stateful streaming funnel via ``transformWithStateInPandas`` —
Spark 4's arbitrary-state API (typed per-key state primitives +
timers; successor to ``applyInPandasWithState``, which
streaming/stateful.py demonstrates for comparison).

Semantics match the batch ``events_funnel`` query exactly: per user,
first view, first click AT/AFTER that view, first purchase at/after
that click. The processor is ARRIVAL-ORDER-INSENSITIVE: per-step
event times accumulate in ListState and the funnel re-derives from
the accumulated sets on every update, so late or out-of-order events
can only move the answer toward the batch result — a late early view
legitimately re-opens earlier clicks, which no forward-only state
machine can do. Each update emits the user's current funnel row
stamped with ``n_seen`` (events absorbed so far): the max-``n_seen``
row per user IS the converged snapshot, which the twin test compares
against the batch query row-for-row.

Scale: state is the user's own funnel-step event times — bounded by
per-user activity, sharded by the groupBy key like any aggregation.
For unbounded retention add a TTL (``getListState(..., ttlDurationMs)``)
or truncate below the watermark once late data is fenced; both trade
the re-open property for bounded state, so they are a deployment
decision, not a default.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

STEPS = ("view", "click", "purchase")

OUTPUT_SCHEMA = (
    "user_id long, t_view_micros long, t_click_micros long, "
    "t_purchase_micros long, steps_completed int, n_seen long"
)


def derive_funnel_times(step_times: list[list[int]]) -> list[int | None]:
    """Pure N-step funnel derivation from per-step event-time sets —
    shared by the processor, the batch operator's semantics, and the
    tests (one definition, no drift). Entry i is the first time of
    step i at-or-after entry i-1, or None once the funnel stalls."""
    out: list[int | None] = []
    prev: int | None = None
    for i, times in enumerate(step_times):
        if i == 0:
            cur = min(times) if times else None
        elif prev is None:
            cur = None
        else:
            after = [t for t in times if t >= prev]
            cur = min(after) if after else None
        out.append(cur)
        prev = cur
    return out


def derive_funnel(
    views: list[int], clicks: list[int], purchases: list[int]
) -> tuple[int | None, int | None, int | None, int]:
    """3-step convenience wrapper over :func:`derive_funnel_times`."""
    t_view, t_click, t_purchase = derive_funnel_times(
        [views, clicks, purchases]
    )
    steps = sum(t is not None for t in (t_view, t_click, t_purchase))
    return t_view, t_click, t_purchase, steps


class FunnelProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._steps = {
            name: handle.getListState(f"ts_{name}", "ts_micros long")
            for name in STEPS
        }
        self._n = handle.getValueState("n_seen", "n long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        fresh: dict[str, list[tuple[int]]] = {name: [] for name in STEPS}
        count = 0
        for pdf in rows:
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            for t, et in zip(ts_us, pdf["event_type"]):
                if et in fresh:
                    fresh[et].append((int(t),))
                    count += 1
        for name, vals in fresh.items():
            if vals:
                self._steps[name].appendList(vals)
        n = (self._n.get()[0] if self._n.exists() else 0) + count
        self._n.update((n,))

        times = {
            name: [t for (t,) in self._steps[name].get()] for name in STEPS
        }
        t_view, t_click, t_purchase, steps = derive_funnel(
            times["view"], times["click"], times["purchase"]
        )
        if t_view is None:
            return iter(())  # no funnel entry yet; state keeps waiting
        return iter(
            [
                pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "t_view_micros": [t_view],
                        "t_click_micros": pd.array(
                            [t_click], dtype="Int64"
                        ),
                        "t_purchase_micros": pd.array(
                            [t_purchase], dtype="Int64"
                        ),
                        "steps_completed": [steps],
                        "n_seen": [n],
                    }
                )
            ]
        )

    def close(self) -> None:
        pass


def funnel_stream(events: DataFrame) -> DataFrame:
    """Wire an events stream (user_id, ts timestamp, event_type) into
    the stateful funnel; emits the user's updated funnel row each
    micro-batch in which a funnel-step event for them arrived.

    Requires the ``transformWithStateInPandas`` runtime: protobuf on
    the Python side (absent in some trimmed environments — see
    :func:`transform_with_state_available`, which can satisfy it from
    a vendored copy) AND the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) — each state variable
    lives in its own column family, which the default HDFS-backed
    store refuses. The semantics-identical
    :func:`funnel_stream_legacy` runs everywhere on
    ``applyInPandasWithState``."""
    return (
        events.filter(events["event_type"].isin(*STEPS))
        .groupBy("user_id")
        .transformWithStateInPandas(
            FunnelProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


def transform_with_state_available() -> bool:
    """The transformWithStateInPandas Python runtime needs
    google.protobuf descriptors; gate callers (and tests) on it.
    ``session.ensure_protobuf`` first tries to satisfy the import from
    known vendored copies (and exports PYTHONPATH for workers), so the
    gate only closes when no protobuf exists anywhere on the box."""
    from sales_etl_spark.session import ensure_protobuf

    if not ensure_protobuf():
        return False
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


# -- applyInPandasWithState variant (runs on every deployment) ---------

from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.streaming.state import (  # noqa: E402
    GroupState,
    GroupStateTimeout,
)

#: Per-step accumulated event times + events-absorbed counter.
_LEGACY_STATE_SCHEMA = T.StructType(
    [
        T.StructField("views", T.ArrayType(T.LongType())),
        T.StructField("clicks", T.ArrayType(T.LongType())),
        T.StructField("purchases", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

_LEGACY_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t_view_micros", T.LongType()),
        T.StructField("t_click_micros", T.LongType()),
        T.StructField("t_purchase_micros", T.LongType()),
        T.StructField("steps_completed", T.IntegerType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _legacy_update(key, pdfs, state: GroupState):
    views, clicks, purchases, n = (
        state.get if state.exists else ([], [], [], 0)
    )
    views, clicks, purchases = list(views), list(clicks), list(purchases)
    buckets = {"view": views, "click": clicks, "purchase": purchases}
    for pdf in pdfs:
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        for t, et in zip(ts_us, pdf["event_type"]):
            if et in buckets:
                buckets[et].append(int(t))
                n += 1
    state.update((views, clicks, purchases, n))
    t_view, t_click, t_purchase, steps = derive_funnel(
        views, clicks, purchases
    )
    if t_view is None:
        return iter(())
    return iter(
        [
            pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "t_view_micros": [t_view],
                    "t_click_micros": pd.array([t_click], dtype="Int64"),
                    "t_purchase_micros": pd.array(
                        [t_purchase], dtype="Int64"
                    ),
                    "steps_completed": [steps],
                    "n_seen": [n],
                }
            )
        ]
    )


def funnel_stream_legacy(events: DataFrame) -> DataFrame:
    """The same arrival-order-insensitive funnel on
    ``applyInPandasWithState`` (no protobuf dependency): identical
    state content and emissions, array-typed state columns instead of
    ListState handles."""
    return (
        events.filter(events["event_type"].isin(*STEPS))
        .groupBy("user_id")
        .applyInPandasWithState(
            _legacy_update,
            outputStructType=_LEGACY_OUTPUT_SCHEMA,
            stateStructType=_LEGACY_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
