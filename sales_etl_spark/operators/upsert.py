"""Upsert semantics (reference §2.1 S5 parity).

The reference's dimension load is ``INSERT ... ON CONFLICT (key) DO
UPDATE`` (etl/load.py:81-109) — last write wins per key. Spark has no
native JDBC upsert; the engine-native equivalent is a deterministic
last-wins dedup *before* the write, which also composes with any sink
(parquet overwrite, Delta MERGE, JDBC staging+MERGE — see load.py).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def upsert_last_wins(
    df: DataFrame,
    keys: Iterable[str],
    order_by: Iterable[str],
) -> DataFrame:
    """Keep the winning row per key: the row ranked first by
    ``order_by`` DESC (e.g. a version/updated_at column), with a
    content-hash final tiebreak so equal-version rows resolve
    deterministically — replayed or out-of-order batches converge to
    the same snapshot even when a key carries two different payloads
    at the same version (without the tiebreak, row_number would pick
    an arbitrary winner per run).

    One shuffle on the keys. At 100 TB this is the standard SCD-0
    "latest snapshot" compaction; pair with partitioned overwrite so
    only touched partitions rewrite.
    """
    keys = list(keys)
    order_by = list(order_by)
    payload = [c for c in df.columns if c not in keys and c not in order_by]
    tiebreak = [F.xxhash64(*[F.col(c) for c in payload]).desc()] if payload else []
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_by], *tiebreak
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def scd2_history(
    df: DataFrame,
    keys: Iterable[str],
    order_by: Iterable[str],
    attrs: Iterable[str],
    ts_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a change
    stream: per key, consecutive rows whose tracked ``attrs`` did not
    change are COMPRESSED away, and each surviving change carries its
    validity interval — ``valid_from`` (its own event time),
    ``valid_to`` (the next change's, NULL while current) and
    ``is_current``. The upsert family's third member: last-wins keeps
    only the present (SCD0/1, :func:`upsert_last_wins`), this keeps
    the full timeline — what a warehouse dim needs for as-of joins
    against historical facts (operators/temporal.py).

    ``order_by`` must be a total order per key (include a unique id
    last); ``ts_col`` names the event-time column for the interval
    bounds (defaults to the first ``order_by`` column).

    Scale shape: ONE shuffle on the keys; both windows (change
    detection, interval close) and the filter between them share the
    same partitioning, so Catalyst plans a single exchange + sort.
    """
    keys = list(keys)
    order_by = list(order_by)
    attrs = list(attrs)
    ts_col = ts_col or order_by[0]
    w = Window.partitionBy(*keys).orderBy(*order_by)

    cur: Column = F.struct(*[F.col(a) for a in attrs])
    prev = F.lag(cur).over(w)
    changed = df.withColumn(
        "__chg", prev.isNull() | (prev != cur)
    ).filter(F.col("__chg"))

    w2 = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("is_current", F.col("valid_to").isNull())
        .drop("__chg")
    )
