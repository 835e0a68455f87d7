"""Analytic window operators (extension beyond the reference's W4).

The reference's only window computation is the positional rank over a
sorted top-k (etl/transform.py:154). These add the standard analytic
surface — running totals, lag/lead deltas, per-partition ranking —
each a single shuffle on its partition keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


def global_row_number(
    df: DataFrame,
    order_by: list,
    bucket: Column,
    out: str = "row_num",
) -> DataFrame:
    """Global 1-based row numbering in ``order_by`` order WITHOUT the
    single-partition window (`Window.orderBy` with no partitionBy moves
    the whole table through one task — the canonical scale-killer for
    global ranking).

    Scalable rewrite: ``bucket`` is a coarse range key MONOTONE in the
    order (bucket(a) < bucket(b) ⇒ a sorts before b; ties stay in one
    bucket). Per-bucket counts aggregate to a tiny frame (one exchange
    over ~thousands of buckets), cumulative offsets come from a window
    over THAT frame (trivially small), and the offsets broadcast back:
    each row's global number is its within-bucket row_number plus its
    bucket's offset. Two exchanges total, both bounded — at 100 TB the
    within-bucket sort is per-partition work and the global order falls
    out of bucket monotonicity, the same decomposition Spark's own
    ``zipWithIndex`` uses (partition counts + offsets) but in pure
    DataFrame ops with a deterministic order contract.
    """
    counts = df.groupBy(bucket.alias("__bkt")).agg(
        F.count(F.lit(1)).alias("__cnt")
    )
    # Unpartitioned window ON THE COUNTS FRAME ONLY (~|buckets| rows,
    # thousands at most — never the data). The executor's WindowExec
    # "No Partition Defined" warning here is expected and benign.
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        "__bkt",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0)).alias("__off"),
    )
    w_in = Window.partitionBy("__bkt").orderBy(*order_by)
    return (
        df.withColumn("__bkt", bucket)
        .join(F.broadcast(offsets), "__bkt")
        .withColumn(out, F.row_number().over(w_in) + F.col("__off"))
        .drop("__bkt", "__off")
    )


def global_prefix_sum(
    df: DataFrame,
    order_by: list,
    bucket: Column,
    value_col: str,
    out: str = "cum",
    rn_out: str | None = None,
) -> DataFrame:
    """Global running sum (and optionally global row number) in
    ``order_by`` order WITHOUT a single-partition window — the prefix-
    sum generalization of :func:`global_row_number`, same contract:
    ``bucket`` is a coarse range key MONOTONE in the order.

    Per-bucket value subtotals (and row counts) aggregate to a tiny
    frame; cumulative offsets come from a window over THAT frame; each
    row's global prefix sum is its within-bucket running sum plus its
    bucket's value offset (ditto the row number). Two bounded
    exchanges — at 100 TB the per-bucket windows are per-partition
    work, so a corpus-sized ranked-cumulative question (Pareto cuts,
    quantile ogives, capped-budget scans) never serializes through one
    task."""
    per_bucket = df.groupBy(bucket.alias("__bkt")).agg(
        F.sum(value_col).alias("__bsum"),
        F.count(F.lit(1)).alias("__bn"),
    )
    # Unpartitioned window on the per-bucket subtotal frame only
    # (~|buckets| rows) — the expected WindowExec warning is benign,
    # same bounded-frame contract as global_row_number above.
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "__bkt",
        F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__voff"),
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__noff"),
    )
    w_cum = (
        Window.partitionBy("__bkt")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_rn = Window.partitionBy("__bkt").orderBy(*order_by)
    res = (
        df.withColumn("__bkt", bucket)
        .join(F.broadcast(offsets), "__bkt")
        .withColumn(out, F.sum(value_col).over(w_cum) + F.col("__voff"))
    )
    if rn_out is not None:
        res = res.withColumn(
            rn_out, F.row_number().over(w_rn) + F.col("__noff")
        )
    return res.drop("__bkt", "__voff", "__noff")


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


def capped_running_sum(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    delta_col: str,
    floor: int,
    cap: int,
    out: str = "balance",
) -> DataFrame:
    """Running sum clamped into ``[floor, cap]`` after EVERY step:
    bal_i = min(cap, max(floor, bal_{i-1} + delta_i)), bal_0 = clamp of
    the first delta. The ledger/inventory scan (stock on hand cannot go
    negative or exceed capacity).

    This is the registry's one genuinely non-decomposable window: the
    clamp makes the recurrence non-associative, so no prefix-sum
    rewrite exists (unlike plain running totals) — SQL needs a
    recursive CTE, and Spark needs a per-key sequential scan. The
    Spark-first shape is grouped-map ``applyInPandas``: ONE exchange on
    the keys (the same shuffle a window would pay), then each key's
    rows scan sequentially inside an Arrow batch. State is O(1) per
    key, rows stream per group — at 100 TB this parallelizes over
    keys exactly like any keyed window; the only scale limit is the
    largest single key's row count (same limit the recursive-CTE
    formulation has, with none of its per-iteration rescans).

    ``delta_col`` must be an exact integer column (cents) — the clamp
    is branchy, so cross-engine agreement needs integer arithmetic.
    """
    import pandas as pd

    keys = list(keys)
    order_by = list(order_by)
    fields = df.select(*keys, *order_by, delta_col).schema.fields
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in fields
    ) + f", {out} bigint"

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort")
        bal, vals = 0, []
        for d in pdf[delta_col].to_numpy():
            bal = min(cap, max(floor, bal + int(d)))
            vals.append(bal)
        pdf[out] = vals
        return pdf

    return (
        df.select(*keys, *order_by, delta_col)
        .groupBy(*keys)
        .applyInPandas(scan, schema=out_schema)
    )
