"""Streaming upsert sink: the reference's keyed dimension load
(`etl/load.py:81-109`, INSERT ... ON CONFLICT DO UPDATE) as a
Structured Streaming ``foreachBatch`` — updates arrive continuously
and the keyed snapshot stays current, instead of a nightly re-load.

Semantics: last write wins per key, ordered by the caller's version
column(s) — NOT by micro-batch arrival order, so replayed/out-of-order
batches converge to the same snapshot. Because the merge is a pure
function of (existing snapshot ∪ batch), a batch re-run after a
failure is idempotent — exactly the property ``foreachBatch``'s
at-least-once contract requires.

Scale shape: each merge is one ``upsert_last_wins`` compaction (one
shuffle on the keys) over snapshot ∪ batch. On a real deployment the
swap-directory dance below is replaced by a transactional table format
(Delta/Iceberg ``MERGE INTO``) — the foreachBatch body is the part
that carries over unchanged; for very large dimensions, partition the
snapshot on a stable key prefix and use dynamic partition overwrite so
only touched partitions rewrite.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Iterable
from pathlib import Path

from pyspark.sql import DataFrame

from sales_etl_spark.operators.upsert import upsert_last_wins


def merge_batch_into_parquet(
    batch_df: DataFrame,
    target_dir: str,
    keys: Iterable[str],
    order_by: Iterable[str],
) -> None:
    """Merge one micro-batch into the keyed parquet snapshot at
    ``target_dir`` (local-fs swap via rename, with crash recovery).

    The swap is two renames (target→.old, .tmp→target) and a crash
    between them leaves no target directory — so every merge FIRST
    repairs that state: a complete ``.old`` (or, failing that, a
    complete ``.tmp``) is restored as the snapshot before merging.
    Without this, a restart replay would bootstrap from the batch alone
    and silently discard the prior snapshot, breaking the idempotent
    at-least-once recovery contract.
    """
    spark = batch_df.sparkSession
    target = Path(target_dir)
    if not (target / "_SUCCESS").exists():
        # Crash-recovery: prefer .old (the last complete snapshot);
        # fall back to a fully-written .tmp (crash after write, before
        # the first rename — equivalent content to the lost merge).
        for stale in (f"{target_dir}.old", f"{target_dir}.tmp"):
            if (Path(stale) / "_SUCCESS").exists():
                shutil.rmtree(target_dir, ignore_errors=True)
                os.rename(stale, target_dir)
                break
    if (target / "_SUCCESS").exists():
        existing = spark.read.parquet(str(target))
        merged = upsert_last_wins(
            existing.unionByName(batch_df), keys, order_by
        )
    else:
        merged = upsert_last_wins(batch_df, keys, order_by)
    tmp = f"{target_dir}.tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(tmp)
    old = f"{target_dir}.old"
    shutil.rmtree(old, ignore_errors=True)
    if target.exists():
        os.rename(target_dir, old)
    os.rename(tmp, target_dir)
    shutil.rmtree(old, ignore_errors=True)


def stream_upsert_parquet(
    stream_df: DataFrame,
    target_dir: str,
    keys: Iterable[str],
    order_by: Iterable[str],
    checkpoint_dir: str,
):
    """Wire a streaming DataFrame into the foreachBatch upsert; the
    caller picks the trigger and starts the query."""
    keys = list(keys)
    order_by = list(order_by)

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        merge_batch_into_parquet(batch_df, target_dir, keys, order_by)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
    )


def stream_upsert_jdbc(
    stream_df,
    url: str,
    table: str,
    keys: list[str],
    order_by: list[str],
    dialect: str = "postgres",
    driver: str | None = None,
    checkpoint: str | None = None,
):
    """Streaming upserts into the reference's JDBC warehouse:
    foreachBatch → :func:`sales_etl_spark.load.jdbc_execute_upsert`
    per micro-batch. Structured Streaming replays an unacknowledged
    batch (at-least-once), and the keyed ON CONFLICT / MERGE upsert is
    idempotent, so the TABLE state converges effectively-once — the
    same argument as the parquet/lake sinks, landed on the exact sink
    the reference ships (etl/load.py ON CONFLICT loop). Returns the
    started StreamingQuery (caller owns trigger/termination).

    Scale note: row-level JDBC is the DIMENSION-scale path (one
    connection, driver-bounded batches); fact-scale streams belong in
    the lake sink with the warehouse fed by marts downstream."""
    from sales_etl_spark.load import jdbc_execute_upsert

    def _sink(batch_df, batch_id: int) -> None:
        # guard_versions: micro-batches can replay or arrive with
        # interleaved event order, so the DB-side UPDATE fires only
        # when the incoming row is strictly newer on order_by —
        # without it an out-of-order batch regresses rows
        jdbc_execute_upsert(
            batch_df, url, table, keys=keys, order_by=order_by,
            dialect=dialect, driver=driver, guard_versions=True,
        )

    writer = stream_df.writeStream.foreachBatch(_sink).outputMode("append")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
