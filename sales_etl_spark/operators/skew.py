"""Skew mitigation: salted aggregation and salted broadcast-fragment join.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime; these explicit operators cover the two cases AQE cannot:

- **salted aggregation**: a groupBy whose key distribution is so hot
  that single final-agg tasks become stragglers even after partial
  aggregation (e.g. 3-value status keys over billions of rows). The
  two-phase form bounds any task's input at ~1/n_salts of a hot key.
- **salted join**: replicate the small side n_salts times instead of
  relying on AQE's split (useful when the skewed side feeds a
  downstream op that must keep the salted partitioning).

Correctness note: sums/counts/min/max decompose over salt groups, and
the engine's DECIMAL money sums are exact, so the salted result is
bit-identical to the unsalted one under any partitioning — which is
how the oracle tier can check a distributed-only rewrite against
plain ANSI SQL.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Aggregates that decompose as agg(agg(partial)) over salt groups.
_MERGEABLE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Uniform row salt in [0, n_salts). Derived from a seeded
    per-row rand — any uniform source works because downstream
    aggregates are salt-invariant by construction."""
    return df.withColumn(
        col_name, F.floor(F.rand(seed=42) * n_salts).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (kind, input column) with kind in
    {sum, count, min, max}. Phase 1 aggregates by (keys + salt) —
    splitting every hot key across ``n_salts`` reducers — phase 2
    merges the per-salt partials by ``keys`` (tiny input:
    |groups| × n_salts rows).
    """
    unknown = {k for k, _ in aggs.values()} - set(_MERGEABLE)
    if unknown:
        raise ValueError(f"non-mergeable aggregate kinds: {sorted(unknown)}")
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[
            (F.count(col) if kind == "count" else _MERGEABLE[kind](col)).alias(
                f"__p_{name}"
            )
            for name, (kind, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[
            _MERGEABLE[kind](F.col(f"__p_{name}")).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side
    across all salt values, join on (keys + salt). The small side grows
    n_salts×, the hot key's rows spread over n_salts tasks.

    Only ``inner`` and ``left`` (the big side preserved) are supported:
    under ``right``/``full`` every unmatched small-side row would be
    emitted once per salt replica — n_salts duplicates. Flip the
    operands for a right-preserving join.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            "salted_join supports how='inner'/'left' only: the small "
            f"side is replicated n_salts x, so {how!r} would emit "
            "unmatched small-side rows once per replica"
        )
    on = list(on)
    big = with_salt(skewed, n_salts)
    replicated = small.withColumn(
        "__salt", F.explode(F.lit(list(range(n_salts))))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    # Force a SHUFFLE-MERGE join: Catalyst's size estimate does not
    # scale through the Generate (explode), so the planner sees the
    # PRE-replication bytes and happily broadcasts the n_salts×
    # replica — materializing n_salts copies on every executor
    # (measured 316 MiB at sf0.1) and defeating the salting entirely
    # (a genuinely broadcastable side would never need a salted join
    # in the first place — broadcast joins have no shuffle skew).
    # Merge rather than shuffled-hash for the same mis-estimate
    # reason: a hash build sized off the pre-explode stats can land
    # n_salts× over budget in a memory-tight executor, while
    # sort-merge spills gracefully at any size.
    return big.join(
        replicated.hint("SHUFFLE_MERGE"), on + ["__salt"], how
    ).drop("__salt")


def spread_narrow_input(
    df: DataFrame, denom: int = 4, min_target: int = 2
) -> DataFrame:
    """Repartition a NARROW frame that feeds an expensive per-row
    transform (codec kernel, every-position gram expansion) when it
    arrives with fewer partitions than the cluster can use — the
    classic "repartition before a CPU-heavy narrow stage" pattern,
    made conditional so it is a no-op wherever storage already
    provides parallelism.

    Scale rationale: at 100 TB inputs arrive in thousands of splits
    and this never fires; the local testdata is ONE parquet row group
    (unsplittable), which silently serializes every downstream map on
    one core of 32. The spread is only legitimate for frames whose
    per-row payload is small relative to the per-row CPU (doc ids +
    text, never decoded rasters) — the exchange is O(input bytes)
    while the stage behind it is the actual cost. Streaming frames
    pass through (micro-batches inherit source partitioning; .rdd is
    undefined for them). ``denom`` trades per-stage task count
    against scheduling overhead: a fraction of the cores is enough
    when per-row work is ~100 us (measured: 8-way ~= 32-way for the
    media kernels, and composed plans avoid 32 tiny tasks per stage).

    Determinism: callers must only feed this into partition-
    independent logic (per-row transforms + exact-threshold
    aggregations) — the oracle tier's bit-exact-under-any-parallelism
    contract (tools/check_oracle.py stress knobs) is the regression
    guard."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = max(min_target, sc.defaultParallelism // denom)
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
