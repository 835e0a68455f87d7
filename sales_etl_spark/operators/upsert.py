"""Upsert semantics (reference §2.1 S5 parity).

The reference's dimension load is ``INSERT ... ON CONFLICT (key) DO
UPDATE`` (etl/load.py:81-109) — last write wins per key. Spark has no
native JDBC upsert; the engine-native equivalent is a deterministic
last-wins dedup *before* the write, which also composes with any sink
(parquet overwrite, Delta MERGE, JDBC staging+MERGE — see load.py).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
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
