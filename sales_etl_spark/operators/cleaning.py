"""Cleaning operators (reference §2.2 P5-P7, §2.6 W5 parity).

All narrow transformations except dedup (one shuffle on the dedup key
set). Filters compile to codegen'd predicates that Catalyst pushes into
the parquet scan when applied directly above a source.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def drop_null_required(df: DataFrame, required: Iterable[str]) -> DataFrame:
    """Drop rows with NULL in any critical field (etl/transform.py:38-43).

    Expressed as a filter conjunction (not ``na.drop``) so the predicate
    is eligible for parquet pushdown (IS NOT NULL reaches the scan).
    """
    cols = list(required)
    if not cols:
        return df
    pred = F.col(cols[0]).isNotNull()
    for c in cols[1:]:
        pred = pred & F.col(c).isNotNull()
    return df.filter(pred)


def fill_defaults(df: DataFrame, defaults: Mapping[str, object]) -> DataFrame:
    """Constant null-fill per column (etl/transform.py:45-49, 87-90)."""
    return df.na.fill(dict(defaults))


def dedup_keep_first(
    df: DataFrame,
    subset: Iterable[str],
    order_by: Iterable[str] | None = None,
) -> DataFrame:
    """Keep one row per duplicate group on ``subset``.

    The reference's ``drop_duplicates(keep="first")`` (etl/transform.py:
    30-35) depends on file order — meaningless under distributed scans.
    Two modes:

    - ``order_by`` given → deterministic keep-first: row_number over
      (partitionBy subset, orderBy order_by) == 1. One shuffle on the
      subset keys; at scale prefer an order_by that is a real column
      (e.g. line number / ingest timestamp), not
      monotonically_increasing_id, so results are partition-stable.
    - ``order_by`` None → ``dropDuplicates(subset)``: keeps *an*
      arbitrary row, which is cheaper (partial dedup map-side before the
      shuffle) and equivalent when duplicates are exact-row copies —
      the reference's actual data shape (tests/test_transform.py:14-33).
    """
    subset = list(subset)
    if order_by is None:
        return df.dropDuplicates(subset)
    w = Window.partitionBy(*subset).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def flag_duplicates(df: DataFrame, subset: Iterable[str]) -> DataFrame:
    """Annotate each row with its duplicate-group size (the reference's
    detection pass, etl/transform.py:31-32, as data instead of a log)."""
    subset = list(subset)
    w = Window.partitionBy(*subset)
    return df.withColumn("duplicate_count", F.count(F.lit(1)).over(w))


def quality_report(
    df: DataFrame,
    checks: Mapping[str, Column],
    group_by: Iterable[str] | None = None,
) -> DataFrame:
    """Data-quality expectations as ONE conditional aggregation — the
    engine form of the reference's per-step row-count logging
    (etl/transform.py:16+ / §2.2 P4), generalized to named boolean
    expectations: each ``n_bad_<name>`` column counts the rows
    VIOLATING that expectation, alongside the group's ``n_rows``. One
    partial-aggregated pass (no extra scans); at 100 TB the report
    costs one exchange of |groups| rows. Violating-row EXTRACTION
    (quarantine) uses the same predicates as filters — compose with
    :func:`drop_null_required`-style cleaning, never re-scan.

    NULL check results count as violations (``when(cond, 0)
    .otherwise(1)`` sends NULL to the otherwise branch) — an
    expectation that cannot evaluate did not pass.
    """
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(cond, 0).otherwise(1)).alias(f"n_bad_{name}")
        for name, cond in checks.items()
    ]
    if group_by:
        return df.groupBy(*list(group_by)).agg(*aggs)
    return df.agg(*aggs)
