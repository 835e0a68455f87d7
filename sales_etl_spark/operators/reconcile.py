"""Snapshot reconciliation: diff two versions of a keyed table.

The operation every warehouse migration / CDC backfill / vendor-feed
swap ends with: given an OLD and a NEW snapshot of the same logical
table, report which keys were added, which were removed, and which
changed in the compared columns — so the load can be audited (and a
bad refresh rolled back) without eyeballing row counts.

Reference parity: the reference engine truncates-and-reloads its marts
(etl/load.py) and has no reconciliation surface; this is engine
extension per SURVEY.md §2.6, the audit step a production deployment
of that same truncate-reload pipeline needs.

Scale shape: ONE full-shuffle join on the key set (sort-merge or
shuffled-hash, AQE's choice) and nothing else — no window, no
collect. With both snapshots bucketed/bucket-sorted on the key (the
natural layout for versioned snapshots, see load.write_clustered) the
exchange disappears entirely and the diff is a zipper merge per
bucket. Unchanged rows — the overwhelming majority of a 100 TB
snapshot pair — are dropped by the post-join filter, so the output is
proportional to the churn, not the table.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff", "snapshot_patch"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Iterable[str],
    compare_cols: Iterable[str],
) -> DataFrame:
    """Full-outer diff of two snapshots on ``keys``.

    Returns one row per key whose state differs between the
    snapshots, with ``diff_status`` ∈ {'added', 'removed', 'changed'}
    and the old/new value of every compared column (``old_<c>`` /
    ``new_<c>``). Keys present in both snapshots with all compared
    columns null-safe-equal are dropped. ``keys`` must be unique per
    snapshot (it is a snapshot, not a log — compact with
    upsert_last_wins first if not).
    """
    keys = list(keys)
    compare_cols = list(compare_cols)
    o = old.select(
        *keys, *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        *keys, *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(True))
    # r11: SHUFFLE_HASH on the new side — a snapshot diff's join keys
    # are unique per side, so the per-partition build is bounded by
    # the post-shuffle partition size (AQE advisory), and skipping the
    # two sort passes of the default sort-merge measured 0.65 → 0.46 s
    # min at sf0.1 (same-process A/B). Bucketed snapshots still take
    # the no-exchange path; the hint only biases the operator choice.
    j = o.join(n.hint("SHUFFLE_HASH"), keys, "full_outer")

    changed: Column = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )
    return (
        j.withColumn("diff_status", status)
        .filter(F.col("diff_status").isNotNull())
        .select(
            *keys,
            "diff_status",
            *[f"old_{c}" for c in compare_cols],
            *[f"new_{c}" for c in compare_cols],
        )
    )


def snapshot_patch(
    old: DataFrame,
    diff: DataFrame,
    keys: Iterable[str],
    compare_cols: Iterable[str],
) -> DataFrame:
    """Apply a :func:`snapshot_diff` to reconstruct the new snapshot —
    the subscriber half of diff-based incremental sync: the publisher
    ships the churn-sized diff instead of the 100 TB snapshot, and the
    subscriber replays it. Invariant (property-tested):
    ``snapshot_patch(old, snapshot_diff(old, new)) ≡ new`` on
    ``keys + compare_cols``.

    Scale shape: one anti-join of old against the (churn-sized)
    removed/changed key set — the diff side broadcasts whenever churn
    is small, which is the entire premise — plus a union with the
    added/changed new-side rows. No window, no full-table shuffle.
    """
    keys = list(keys)
    compare_cols = list(compare_cols)
    drop_keys = diff.filter(
        F.col("diff_status").isin("removed", "changed")
    ).select(*keys)
    kept = old.select(*keys, *compare_cols).join(
        drop_keys, keys, "left_anti"
    )
    incoming = diff.filter(
        F.col("diff_status").isin("added", "changed")
    ).select(
        *keys, *[F.col(f"new_{c}").alias(c) for c in compare_cols]
    )
    return kept.unionByName(incoming)
