"""Temporal join operators: as-of join and time-range window aggregates.

The reference has no temporal joins (SURVEY.md §2.5: "not present:
... theta/range/as-of/interval joins"); these are the Spark-native
extension the ``events`` table (event-time ``ts``) is designed for.

Scale design
------------
``asof_join`` is the union/sort-merge formulation: tag both sides,
union on the key columns, and carry the right side's payload forward
with ``last(..., ignorenulls=True)`` over a (key, time)-ordered
window. Cost is ONE shuffle of |L|+|R| rows on the join key — no row
explosion, no per-row binary search, no broadcast requirement. This is
the plan that survives 100 TB: a naive ``L JOIN R ON key AND r.ts <=
l.ts`` + max-per-group explodes to |L|·|R_key| intermediate rows,
while the window form stays linear and sorts within partitions
(spillable ExternalSort).

``time_range_agg`` expresses "aggregate the trailing T seconds per
row" as a RANGE window frame over the event-time axis — again one
shuffle + one in-partition sort, versus the self-join's quadratic
blowup per hot key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    tolerance_seconds: float | None = None,
    direction: str = "backward",
    _emit_matched_ts: bool = False,
) -> DataFrame:
    """As-of join: for every left row, attach the payload of the
    nearest right row with equal ``by`` keys — the LATEST one with
    ``right.ts <= left.ts`` (``direction="backward"``, the
    DuckDB/pandas default) or the EARLIEST one with ``right.ts >=
    left.ts`` (``direction="forward"``). Ties are inclusive.

    Right rows that tie exactly on (by, ts) must be pre-deduplicated
    by the caller (keep-one-per-key, e.g. ``dedup_keep_first``) — the
    carry-forward picks an arbitrary one otherwise.

    With ``tolerance_seconds`` set, matches farther than the tolerance
    are nulled out (pandas ``merge_asof(tolerance=...)`` semantics).

    Output: all left columns + ``right_payload`` columns (null when no
    matching right row exists).
    """
    if direction == "nearest":
        # closer of the backward/forward matches; backward wins exact
        # ties (pandas merge_asof nearest semantics). ONE union sweep
        # computing both carries as range frames over the numeric time
        # axis: backward = last right row over (-inf, 0], forward =
        # first over [0, +inf). Range frames include ts-equal right
        # rows on both sides, so ties stay inclusive. No re-join:
        # every left row picks its own closer match in place, so
        # duplicate or NULL-bearing left rows pass through untouched.
        # Whole-row semantics: the carry is ONE struct per right row
        # (match time + payload), so a right row whose payload value is
        # genuinely NULL propagates that NULL — per-column carries
        # would skip the NULL and mix columns from different right
        # rows. Still one shuffle on the key + one in-partition sort.
        by = list(by)
        payload = list(right_payload)
        left_cols = left.columns
        r = right.select(
            *by,
            F.col(right_ts).alias("__t"),
            F.lit(0).alias("__side"),
            *[F.col(c) for c in payload],
            *[F.lit(None).alias(f"__l_{c}") for c in left_cols],
        )
        lhs = left.select(
            *by,
            F.col(left_ts).alias("__t"),
            F.lit(1).alias("__side"),
            *[
                F.lit(None).cast(right.schema[c].dataType).alias(c)
                for c in payload
            ],
            *[F.col(c).alias(f"__l_{c}") for c in left_cols],
        )
        # numeric time axis for the range frames: timestamps map to
        # exact integer MICROSECONDS in a double (µs < 2^53 — no
        # rounding, so distance comparisons are exact; a seconds axis
        # would round µs/1e6 and could flip backward/forward ties);
        # numeric axes cast through unchanged, tolerance stays seconds
        # in both cases.
        is_ts = left.schema[left_ts].dataType.typeName().startswith(
            "timestamp"
        )
        if is_ts:
            axis = F.unix_micros(F.col("__t").cast("timestamp")).cast(
                "double"
            )
            tol_scale = 1e6
        else:
            axis = F.col("__t").cast("double")
            tol_scale = 1.0
        unioned = lhs.unionByName(r.select(*lhs.columns)).withColumn(
            "__tn", axis
        )
        wb = (
            Window.partitionBy(*by)
            .orderBy("__tn")
            .rangeBetween(Window.unboundedPreceding, 0)
        )
        wf = (
            Window.partitionBy(*by)
            .orderBy("__tn")
            .rangeBetween(0, Window.unboundedFollowing)
        )
        # One struct per right row with a usable (non-NULL) timestamp;
        # NULL-ts right rows can never be a match at any distance.
        rs = F.when(
            (F.col("__side") == 0) & F.col("__tn").isNotNull(),
            F.struct(
                F.col("__tn").alias("__rt"),
                *[F.col(c) for c in payload],
            ),
        )
        carried = unioned.select(
            "__side",
            "__tn",
            F.last(rs, ignorenulls=True).over(wb).alias("__b"),
            F.first(rs, ignorenulls=True).over(wf).alias("__f"),
            *[F.col(f"__l_{c}") for c in left_cols],
        ).filter(F.col("__side") == 1)
        bd = F.col("__tn") - F.col("__b.__rt")
        fd = F.col("__f.__rt") - F.col("__tn")
        # NULL left ts never matches (nulls sort into their own group,
        # but the [0, +inf) frame would otherwise sweep the partition).
        tn_ok = F.col("__tn").isNotNull()
        b_ok = tn_ok & F.col("__b").isNotNull()
        f_ok = tn_ok & F.col("__f").isNotNull()
        if tolerance_seconds is not None:
            tol = F.lit(float(tolerance_seconds) * tol_scale)
            b_ok = b_ok & (bd <= tol)
            f_ok = f_ok & (fd <= tol)
        use_back = b_ok & (~f_ok | (bd <= fd))
        return carried.select(
            *[F.col(f"__l_{c}").alias(c) for c in left_cols],
            *[
                F.when(use_back, F.col(f"__b.{c}"))
                .when(f_ok, F.col(f"__f.{c}"))
                .alias(c)
                for c in payload
            ],
        )
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward/forward/nearest: {direction}"
        )
    by = list(by)
    payload = list(right_payload)
    left_cols = left.columns

    # Aligned union schema: keys, event time, side tag, both payloads.
    # Right sorts before left on equal timestamps (side 0 < 1) so the
    # carry-forward is inclusive of ts-equal right rows. Forward mode
    # is the same sweep over reversed time.
    r = right.select(
        *by,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in payload],
        *[F.lit(None).alias(f"__l_{c}") for c in left_cols],
    )
    lhs = left.select(
        *by,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in payload],
        *[F.col(c).alias(f"__l_{c}") for c in left_cols],
    )
    t_order = (
        F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(t_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # One struct per right row (match time + whole payload): a right
    # row with a genuinely-NULL payload value propagates that NULL
    # instead of falling through to an older row's value, and output
    # columns always come from the SAME right row. NULL-ts right rows
    # never match; NULL-ts left rows never match (their sweep position
    # is undefined — nulls-first asc / nulls-last desc).
    rs = F.when(
        (F.col("__side") == 0) & F.col("__t").isNotNull(),
        F.struct(
            F.col("__t").alias("__rt"), *[F.col(c) for c in payload]
        ),
    )
    carried = lhs.unionByName(r.select(*lhs.columns)).select(
        "__t",
        "__side",
        F.last(rs, ignorenulls=True).over(w).alias("__r"),
        *[F.col(f"__l_{c}") for c in left_cols],
    )
    out = carried.filter(F.col("__side") == 1)
    match_ok: Column = F.col("__t").isNotNull() & F.col("__r").isNotNull()
    if tolerance_seconds is not None:
        if direction == "backward":
            match_ok = match_ok & (
                F.col("__r.__rt").cast("double")
                >= F.col("__t").cast("double")
                - F.lit(float(tolerance_seconds))
            )
        else:
            match_ok = match_ok & (
                F.col("__r.__rt").cast("double")
                <= F.col("__t").cast("double")
                + F.lit(float(tolerance_seconds))
            )
    matched = F.when(match_ok, F.col("__r"))
    extra = (
        [matched.getField("__rt").alias("__asof_matched_t")]
        if _emit_matched_ts
        else []
    )
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left_cols],
        *[matched.getField(c).alias(c) for c in payload],
        *extra,
    )


def time_range_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    ts: str,
    aggs: dict[str, Column],
    lookback_seconds: int,
) -> DataFrame:
    """Trailing time-window aggregate per row: for each row, aggregate
    all same-key rows with ``ts in [row.ts - lookback, row.ts]``
    (inclusive both ends, self included).

    Expressed as a RANGE frame over microsecond epoch — one shuffle on
    the key, one in-partition sort, linear state; the equivalent
    range self-join materializes every (row, neighbor) pair.

    ``aggs`` maps output column name -> aggregate Column (built from
    the caller's value columns).
    """
    # unix_micros requires an instant; NTZ event time is reinterpreted
    # under the engine's pinned UTC session (session.py), so the cast
    # is a pure relabel — wall-clock arithmetic is unchanged.
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(F.unix_micros(F.col(ts).cast("timestamp")))
        .rangeBetween(-int(lookback_seconds) * 1_000_000, 0)
    )
    return df.select(
        "*", *[expr.over(w).alias(name) for name, expr in aggs.items()]
    )


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered conversion funnel over an ARBITRARY step list: per
    user, the first occurrence of each step at-or-after the previous
    step's first occurrence, plus ``steps_completed``. Emits one row
    per user who reached step 1, with a ``t_<step>`` column per step
    (NULL once the funnel stalls).

    Scale shape (the same design the 3-step flagship grades on): each
    stage is one pushdown-filtered scan of the events source — the
    ``type_col = step`` predicate reaches the parquet scan — and a
    user-keyed partial aggregate; stage inputs shrink monotonically as
    the funnel deepens, so the per-step joins get cheaper, never a
    sessionized global sort. Same-instant steps count (``>=``), and a
    user's pre-step-1 events of later types are ignored — the batch
    twin of the arrival-order-insensitive streaming processor
    (streaming/funnel.py), which re-derives exactly these semantics
    from accumulated state.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    t_cols = [f"t_{s}" for s in steps]
    prev: DataFrame | None = None
    stages: list[DataFrame] = []
    for step, t_col in zip(steps, t_cols):
        stage = events.filter(F.col(type_col) == step)
        if prev is None:
            s = stage.groupBy(user_col).agg(F.min(ts_col).alias(t_col))
        else:
            prev_t = t_cols[len(stages) - 1]
            s = (
                stage.join(prev.select(user_col, prev_t), user_col)
                .filter(F.col(ts_col) >= F.col(prev_t))
                .groupBy(user_col)
                .agg(F.min(ts_col).alias(t_col))
            )
        stages.append(s)
        prev = s
    out = stages[0]
    for s in stages[1:]:
        out = out.join(s, user_col, "left")
    completed = sum(
        (F.when(F.col(c).isNotNull(), 1).otherwise(0) for c in t_cols[1:]),
        F.lit(1),
    )
    return out.withColumn(
        "steps_completed", completed.cast("int")
    )
