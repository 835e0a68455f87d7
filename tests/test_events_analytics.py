"""Planted-fixture semantics tests for the event-analytics queries:
funnel step ordering (a click BEFORE the first view must not count)
and cohort age bucketing (exact week boundaries). The oracle gate
checks engine agreement; these pin the intended semantics themselves.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    # (event_id, ts_offset_minutes, user_id, event_type)
    return spark.createDataFrame(
        [
            (eid, BASE + dt.timedelta(minutes=m), uid, et, 1.0, "{}")
            for eid, m, uid, et in rows
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )


def _funnel(spark, df):
    """Run the registered funnel logic against an arbitrary events df
    (mirrors plans/temporal.py::events_funnel)."""

    def first_step(etype):
        return (
            df.filter(F.col("event_type") == etype)
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )

    def next_step(prev, prev_t, etype, out_t):
        return (
            df.filter(F.col("event_type") == etype)
            .join(prev.select("user_id", prev_t), "user_id")
            .filter(F.col("ts") >= F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    s1 = first_step("view").withColumnRenamed("t", "t_view")
    s2 = next_step(s1, "t_view", "click", "t_click")
    s3 = next_step(s2, "t_click", "purchase", "t_purchase")
    return {
        r.user_id: (r.t_view, r.t_click, r.t_purchase)
        for r in s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .collect()
    }


def test_funnel_ignores_out_of_order_steps(spark):
    rows = [
        # user 1: click BEFORE first view -> click must not count;
        # later click does
        (1, 0, 1, "click"),
        (2, 10, 1, "view"),
        (3, 20, 1, "click"),
        (4, 30, 1, "purchase"),
        # user 2: purchase before click -> stops at click
        (5, 0, 2, "view"),
        (6, 5, 2, "purchase"),
        (7, 10, 2, "click"),
        # user 3: never viewed -> not in funnel at all
        (8, 0, 3, "click"),
        (9, 5, 3, "purchase"),
    ]
    out = _funnel(spark, _events(spark, rows))
    assert set(out) == {1, 2}
    t_view, t_click, t_purchase = out[1]
    assert t_click == BASE + dt.timedelta(minutes=20)
    assert t_purchase == BASE + dt.timedelta(minutes=30)
    assert out[2][1] == BASE + dt.timedelta(minutes=10)
    assert out[2][2] is None  # purchase at +5 preceded the click


def test_funnel_same_timestamp_counts(spark):
    # >= semantics: a step at the exact same instant as the previous
    # step's first occurrence qualifies
    rows = [(1, 0, 1, "view"), (2, 0, 1, "click"), (3, 0, 1, "purchase")]
    out = _funnel(spark, _events(spark, rows))
    assert out[1] == (BASE, BASE, BASE)


def test_cohort_age_week_boundaries(spark):
    from sales_etl_spark.plans import QUERY_REGISTRY  # noqa: F401
    # age buckets are exact integer microsecond division: an event
    # 7d-1us after signup is age 0; exactly 7d is age 1
    week_us = 7 * 86400 * 1_000_000
    us = [(0, 0), (week_us - 1, 0), (week_us, 1), (2 * week_us - 1, 1)]
    rows = [(1, BASE, 1, "signup", 1.0, "{}")] + [
        (10 + i, BASE + dt.timedelta(microseconds=off), 1, "click", 1.0, "{}")
        for i, (off, _) in enumerate(us)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    signups = (
        df.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    ages = (
        df.join(signups, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .select(
            F.expr(
                f"CAST((unix_micros(ts) - unix_micros(t0)) "
                f"div {week_us}L AS INT)"
            ).alias("age")
        )
        .collect()
    )
    got = sorted(r.age for r in ages)
    # signup itself (age 0) + the four planted offsets
    assert got == [0, 0, 0, 1, 1]
