"""Bucketed managed tables: shuffle-free co-located joins.

The 100 TB lever the parquet-path sources can't give: when a fact
table is joined on the same key query after query (lineitem⨝orders on
the order key, fact⨝fact in general), pre-bucketing BOTH sides on that
key with the same bucket count lets every later join run with ZERO
exchanges — each bucket pair joins locally. The write pays one shuffle
once; every subsequent join reads co-located buckets.

``sortBy`` on the bucket key additionally removes the per-task sort
from sort-merge joins (buckets come back presorted).

Local caveat: bucketed tables are managed-catalog tables
(``saveAsTable``), written under ``spark.sql.warehouse.dir``
(session.py pins it to /tmp so repos stay clean).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and
    optionally sorted) by ``bucket_cols`` — the one-time shuffle that
    buys shuffle-free joins forever after."""
    cols = list(bucket_cols)
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, cols[0], *cols[1:])
    )
    if sort:
        writer = writer.sortBy(cols[0], *cols[1:])
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed (bucketed) table; Catalyst propagates its
    bucketing as the output partitioning, eliminating Exchange nodes
    under joins/aggregations on the bucket key."""
    return spark.table(table)
