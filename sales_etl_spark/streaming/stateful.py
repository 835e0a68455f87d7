"""Custom stateful streaming operator: per-user running profile.

The windowed aggregations (streaming/windows.py) cover everything the
built-in operators express; this module is the escape hatch the brief
calls for — arbitrary per-key state evolved batch-to-batch with
``applyInPandasWithState`` (Arrow-batched, state-store-backed, the
Structured Streaming analogue of a keyed process function).

Semantics: for every user, maintain (n_events, total_value, last_ts)
across micro-batches and emit the updated running profile once per
batch in which the user appeared. State is bounded by the key
cardinality (users), not the stream length; at cluster scale the state
store shards by the groupBy key — the same hash partitioning as any
aggregation, so hot users are the same skew problem (and salting
answer) as hot groupBy keys.

Determinism: counts are integers and the value sum accumulates on
Python floats per-key in event order within each batch; emissions are
per-batch snapshots, so the FINAL emission per user equals the batch
groupBy result over the same files — which is what the test asserts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: (n_events, total_value, last_ts_micros)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, -1
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            # normalize to µs regardless of the Arrow/pandas unit
            ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
            last_us = max(last_us, int(ts_us.max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [total],
            "last_ts_micros": [last_us],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Evolve the per-user running profile over a stream of events
    (columns: user_id, ts timestamp, value double). Emits one updated
    row per (user, micro-batch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
