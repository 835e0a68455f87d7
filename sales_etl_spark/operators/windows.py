"""Analytic window operators (extension beyond the reference's W4).

The reference's only window computation is the positional rank over a
sorted top-k (etl/transform.py:154). These add the standard analytic
surface — running totals, lag/lead deltas, per-partition ranking —
each a single shuffle on its partition keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def running_total(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value: str,
    out: str = "running_total",
) -> DataFrame:
    """Cumulative sum per partition in event order. ``order_by`` must be
    a deterministic total order (include a unique tiebreaker column)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out, F.sum(value).over(w))


def lag_delta(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    value: str,
    out: str = "delta",
) -> DataFrame:
    """value − lag(value) per partition (e.g. days since previous order)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out, F.col(value) - F.lag(value, 1).over(w))


def rank_in_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    out: str = "rank_position",
) -> DataFrame:
    """row_number per group — partitioned top-k building block. Unlike
    the global top-k (TakeOrderedAndProject), per-group ranking shuffles
    on the group keys and sorts within partitions only."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out, F.row_number().over(w))


def trailing_zscore(
    counts: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    baseline_rows: int = 24,
    min_baseline: int = 12,
) -> DataFrame:
    """Z-score each (key, time) count against its TRAILING window of
    ``baseline_rows`` prior rows (the scored row excluded from its own
    baseline); NULL below ``min_baseline`` history or on a flat
    baseline — an undefined score is not a zero score.

    Cross-engine bit-exactness: the window carries integer sums
    (Σv, Σv², n) and the mean/variance double expression evaluates
    identically on them in any engine — nothing accumulates in
    floating point. Works on any count table, batch or the
    materialized output of a streaming tumbling window (the sink-side
    half of the streaming anomaly pipeline).
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(time_col)
        .rowsBetween(-baseline_rows, -1)
    )
    v = F.col(value_col)
    s = F.sum(v).over(w)
    ss = F.sum(v * v).over(w)
    n = F.count(F.lit(1)).over(w)
    mean = s.cast("double") / n
    var = ss.cast("double") / n - mean * mean
    return counts.withColumn(
        "zscore",
        F.when(
            (n >= min_baseline) & (var > 0),
            F.round((v - mean) / F.sqrt(var), 6),
        ),
    )
