"""Streaming twin of the capped running balance
(operators/windows.py:capped_running_sum) — per-key clamp recurrence
evolved across micro-batches with ``applyInPandasWithState``.

The batch operator scans each key's history in one Arrow group; the
stream cannot (history arrives incrementally), so the balance itself
becomes the state: O(1) per key — one bigint — regardless of stream
length. Within a micro-batch rows fold in (order_by) order; ACROSS
batches ordering is the source's contract (an in-order source such as
the lake change feed, streaming/lake_source.py, or a date-partitioned
drop folder consumed one file per trigger). That is the same contract
every incremental ledger system states: out-of-order history needs
replay/compaction (the batch operator), not per-event streaming.

Emission: every row of the batch is emitted with its post-clamp
balance (output mode "append" — the ledger is a log, not a snapshot),
so after the stream drains, the emitted table over the same rows
equals the batch operator's output exactly (integer arithmetic, no
float drift) — asserted in tests/test_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType([T.StructField("balance", T.LongType())])

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("balance_cents", T.LongType()),
    ]
)


def make_ledger_fold(
    floor: int, cap: int, order_by: list[str], delta_col: str
):
    """Build the per-key fold for ``applyInPandasWithState`` with the
    clamp bounds baked in (closures ship to executors via pickle —
    bounds are plan constants, exactly like the batch operator)."""

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        bal = state.get[0] if state.exists else 0
        for pdf in pdfs:
            pdf = pdf.sort_values(order_by, kind="mergesort")
            out = []
            for d in pdf[delta_col].to_numpy():
                bal = min(cap, max(floor, bal + int(d)))
                out.append(bal)
            yield pd.DataFrame(
                {
                    "o_custkey": pdf["o_custkey"].to_numpy(),
                    "o_orderkey": pdf["o_orderkey"].to_numpy(),
                    "balance_cents": out,
                }
            )
        state.update((int(bal),))

    return fold


def ledger_stream(
    orders: DataFrame,
    floor: int,
    cap: int,
) -> DataFrame:
    """Clamped per-customer balance over an order stream (columns:
    o_custkey, o_orderkey, o_orderdate, delta_cents). Emits one ledger
    row per input row; state is one bigint per customer."""
    return orders.groupBy("o_custkey").applyInPandasWithState(
        make_ledger_fold(
            floor, cap, ["o_orderdate", "o_orderkey"], "delta_cents"
        ),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
