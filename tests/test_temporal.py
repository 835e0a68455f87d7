"""Unit tier for temporal operators (as-of join, time-range frames).

Mirrors the reference's inline-golden-fixture style
(tests/test_transform.py in /root/reference) on tiny literal frames —
the oracle tier (test_queries_oracle.py) covers the same operators on
real testdata vs DuckDB's native ASOF JOIN.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sales_etl_spark.operators.temporal import asof_join, time_range_agg


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _events(spark):
    rows = [
        # (user, ts, side-payload)
        (1, _ts("2024-01-01T10:00:00"), 100, 5.0),
        (1, _ts("2024-01-01T12:00:00"), 101, 7.0),
        (2, _ts("2024-01-01T11:00:00"), 200, 9.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, purchase_id long, amount double"
    )


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), "a"),  # before any purchase
            (1, _ts("2024-01-01T11:30:00"), "b"),  # after 10:00, before 12:00
            (1, _ts("2024-01-01T12:00:00"), "c"),  # tie → inclusive
            (2, _ts("2024-01-01T23:00:00"), "d"),  # user 2's only purchase
            (3, _ts("2024-01-01T10:00:00"), "e"),  # user with no purchases
        ],
        "user_id long, ts timestamp, tag string",
    )
    out = asof_join(
        left,
        _events(spark),
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_id", "amount"],
    )
    got = {r["tag"]: (r["purchase_id"], r["amount"]) for r in out.collect()}
    assert got == {
        "a": (None, None),
        "b": (100, 5.0),
        "c": (101, 7.0),  # ts-equal right row matches (inclusive)
        "d": (200, 9.0),
        "e": (None, None),
    }


def test_asof_join_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T13:30:00"), "x")],
        "user_id long, ts timestamp, tag string",
    )
    # 12:00 purchase is 90 min old: within 2h, outside 1h.
    kwargs = dict(
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_id", "amount"],
    )
    wide = asof_join(
        left, _events(spark), tolerance_seconds=7200, **kwargs
    ).collect()[0]
    tight = asof_join(
        left, _events(spark), tolerance_seconds=3600, **kwargs
    ).collect()[0]
    assert wide["purchase_id"] == 101
    assert tight["purchase_id"] is None and tight["amount"] is None


def test_asof_join_preserves_left_rowcount(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a")] * 3,
        "user_id long, ts timestamp, tag string",
    )
    out = asof_join(
        left,
        _events(spark),
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_id"],
    )
    assert out.count() == 3  # left join: never drops or duplicates left rows


def test_asof_join_nearest_keeps_null_and_duplicate_left_rows(spark):
    # Regression: a prior revision re-joined the backward/forward
    # sweeps on ALL left columns with null-unsafe equality, silently
    # dropping any left row containing a NULL (and fanning out
    # duplicate left rows). The single-sweep form must preserve both.
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:30:00"), None),  # NULL payload col
            (1, _ts("2024-01-01T10:30:00"), None),  # exact duplicate
            (1, _ts("2024-01-01T11:30:00"), "b"),
            (1, None, "null-ts"),  # NULL join-time row survives too
            (3, _ts("2024-01-01T10:00:00"), "e"),  # key with no rights
        ],
        "user_id long, ts timestamp, tag string",
    )
    out = asof_join(
        left,
        _events(spark),
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_id", "amount"],
        direction="nearest",
    ).collect()
    assert len(out) == 5  # left join: never drops or duplicates rows
    by_tag: dict = {}
    for r in out:
        by_tag.setdefault(r["tag"], []).append((r["purchase_id"], r["amount"]))
    # 10:30 is 30 min after 10:00 and 90 min before 12:00 → backward
    assert by_tag[None] == [(100, 5.0), (100, 5.0)]
    # 11:30 is 90 min after 10:00 and 30 min before 12:00 → forward
    assert by_tag["b"] == [(101, 7.0)]
    assert by_tag["null-ts"] == [(None, None)]
    assert by_tag["e"] == [(None, None)]


def test_asof_join_nearest_tolerance_gates_each_side(spark):
    # 13:30 left: backward match 12:00 (90 min), no forward match.
    # tol=1h nulls it; tol=2h keeps it.
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T13:30:00"), "x")],
        "user_id long, ts timestamp, tag string",
    )
    kwargs = dict(
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_id"],
        direction="nearest",
    )
    wide = asof_join(
        left, _events(spark), tolerance_seconds=7200, **kwargs
    ).collect()[0]
    tight = asof_join(
        left, _events(spark), tolerance_seconds=3600, **kwargs
    ).collect()[0]
    assert wide["purchase_id"] == 101
    assert tight["purchase_id"] is None


def test_time_range_agg_trailing_window_inclusive(spark):
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 1.0),
            (1, _ts("2024-01-01T10:30:00"), 2.0),
            (1, _ts("2024-01-01T11:00:00"), 4.0),  # 10:00 still in [-1h, now]
            (1, _ts("2024-01-01T12:30:00"), 8.0),  # all others aged out
            (2, _ts("2024-01-01T10:15:00"), 16.0),  # other key: isolated
        ],
        "user_id long, ts timestamp, value double",
    )
    out = time_range_agg(
        df,
        partition_by=["user_id"],
        ts="ts",
        aggs={"n": F.count(F.lit(1)), "s": F.sum("value")},
        lookback_seconds=3600,
    )
    got = {
        (r["user_id"], r["ts"].isoformat()): (r["n"], r["s"])
        for r in out.collect()
    }
    assert got[(1, "2024-01-01T10:00:00")] == (1, 1.0)
    assert got[(1, "2024-01-01T10:30:00")] == (2, 3.0)
    assert got[(1, "2024-01-01T11:00:00")] == (3, 7.0)  # inclusive both ends
    assert got[(1, "2024-01-01T12:30:00")] == (1, 8.0)
    assert got[(2, "2024-01-01T10:15:00")] == (1, 16.0)


def test_asof_join_null_payload_propagates_whole_row(spark):
    """ADVICE r2: the matched right row's NULL payload value must come
    through as NULL — per-column carries would skip it and mix columns
    from different right rows. Covers all three directions."""
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100, 5.0),
            (1, _ts("2024-01-01T11:00:00"), 101, None),
        ],
        "user_id long, ts timestamp, purchase_id long, amount double",
    )
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T11:05:00"), "x")],
        "user_id long, ts timestamp, tag string",
    )
    for direction in ("backward", "nearest"):
        out = asof_join(
            left,
            right,
            by=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_payload=["purchase_id", "amount"],
            direction=direction,
        ).collect()
        assert [(r["purchase_id"], r["amount"]) for r in out] == [
            (101, None)
        ], direction
    fwd = asof_join(
        spark.createDataFrame(
            [(1, _ts("2024-01-01T10:30:00"), "y")],
            "user_id long, ts timestamp, tag string",
        ),
        right,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_id", "amount"],
        direction="forward",
    ).collect()
    assert [(r["purchase_id"], r["amount"]) for r in fwd] == [(101, None)]


def test_asof_join_null_right_ts_never_matches(spark):
    right = spark.createDataFrame(
        [(1, None, 999, 1.0)],
        "user_id long, ts timestamp, purchase_id long, amount double",
    )
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T11:00:00"), "x")],
        "user_id long, ts timestamp, tag string",
    )
    for direction in ("backward", "forward", "nearest"):
        out = asof_join(
            left,
            right,
            by=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_payload=["purchase_id", "amount"],
            direction=direction,
        ).collect()
        assert [(r["purchase_id"], r["amount"]) for r in out] == [
            (None, None)
        ], direction


def test_generic_funnel_four_steps_planted(spark):
    """N-step funnel operator: per-user first-at-or-after chain over a
    4-step list; stalls leave NULL tails; same-instant steps count;
    pre-step-1 later-type events are ignored. Cross-checked against
    the shared pure derivation (streaming/funnel.py)."""
    import datetime as dt

    from sales_etl_spark.operators.temporal import funnel
    from sales_etl_spark.streaming.funnel import derive_funnel_times

    B = dt.datetime(2024, 1, 1)

    def ts(m):
        return B + dt.timedelta(minutes=m)

    rows = [
        # u1 completes all four, with a same-instant signup/activate
        (1, ts(0), "visit"), (1, ts(5), "signup"), (1, ts(5), "activate"),
        (1, ts(9), "purchase"),
        # u2: activate BEFORE signup -> stalls after signup
        (2, ts(0), "visit"), (2, ts(1), "activate"), (2, ts(3), "signup"),
        # u3: purchase before any visit -> only counted if re-reached
        (3, ts(2), "purchase"), (3, ts(4), "visit"),
        # u4 never visits -> absent from output
        (4, ts(0), "signup"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    steps = ["visit", "signup", "activate", "purchase"]
    got = {
        r.user_id: (
            r.t_visit, r.t_signup, r.t_activate, r.t_purchase,
            r.steps_completed,
        )
        for r in funnel(df, steps).collect()
    }
    assert set(got) == {1, 2, 3}
    assert got[1] == (ts(0), ts(5), ts(5), ts(9), 4)
    assert got[2] == (ts(0), ts(3), None, None, 2)
    assert got[3] == (ts(4), None, None, None, 1)

    # the pure derivation agrees on every planted user
    by_user: dict[int, list[list[int]]] = {}
    for uid, t, et in rows:
        micros = int((t - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
        by_user.setdefault(uid, [[] for _ in steps])
        if et in steps:
            by_user[uid][steps.index(et)].append(micros)
    for uid, expect in got.items():
        derived = derive_funnel_times(by_user[uid])
        want = tuple(
            None if d is None
            else dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=d)
            for d in derived
        )
        assert want == expect[:4], uid


def test_scd2_pointintime_same_day_flip_matches_interval_semantics(spark):
    """Two state changes on the SAME day produce an empty [d, d)
    interval; the point-in-time join must attribute a fact on d to the
    LAST change of the day (what the interval predicate d < valid_to
    selects), and facts before the first interval get no state. This
    is the edge where a naive as-of on valid_from would tie — the
    builder drops empty intervals so the as-of stays the exact
    interval join."""
    import datetime as dt

    from pyspark.sql import functions as F

    from sales_etl_spark.operators import upsert
    from sales_etl_spark.operators.temporal import asof_join

    d = dt.date
    src = spark.createDataFrame(
        [
            (1, "LOW", d(2024, 1, 10), 1),
            (1, "HIGH", d(2024, 1, 10), 2),   # same-day flip
            (1, "MED", d(2024, 2, 1), 3),
        ],
        "customer_id long, priority string, ts date, uid long",
    )
    hist = upsert.scd2_history(
        src, keys=["customer_id"], order_by=["ts", "uid"],
        attrs=["priority"], ts_col="ts",
    ).filter(
        F.col("valid_to").isNull()
        | (F.col("valid_to") > F.col("valid_from"))
    )
    facts = spark.createDataFrame(
        [
            (1, d(2024, 1, 5)),    # before any state -> null
            (1, d(2024, 1, 10)),   # flip day -> HIGH (last change)
            (1, d(2024, 1, 20)),   # inside [1-10, 2-1) -> HIGH
            (1, d(2024, 3, 1)),    # open tail -> MED
        ],
        "customer_id long, d date",
    )
    got = {
        r.d: r.priority
        for r in asof_join(
            facts, hist.select("customer_id", "valid_from", "priority"),
            by=["customer_id"], left_ts="d", right_ts="valid_from",
            right_payload=["priority"],
        ).collect()
    }
    assert got == {
        d(2024, 1, 5): None,
        d(2024, 1, 10): "HIGH",
        d(2024, 1, 20): "HIGH",
        d(2024, 3, 1): "MED",
    }


def test_percentile_cont_matches_the_standard_interpolation(spark):
    """agg_percentile_cont's lerp must agree with the SQL-standard /
    numpy 'linear' definition — anchored on planted data against
    DuckDB's built-in quantile_cont (an INDEPENDENT implementation,
    not our own formula restated)."""
    import duckdb

    from sales_etl_spark.plans import QUERY_REGISTRY

    vals = [10.00, 20.00, 30.00, 40.00, 50.00, 60.00, 70.00]
    want = {
        pct: float(
            duckdb.sql(
                f"SELECT quantile_cont(v, {pct / 100}) "
                f"FROM (SELECT unnest({vals}) AS v)"
            ).fetchone()[0]
        )
        for pct in (50, 90, 99)
    }

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        # real orders rows (full schema passes the scan validation)
        # with the planted value/priority columns substituted
        from pyspark.sql import Window as W
        from pyspark.sql import functions as F

        base = (
            spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
            .orderBy("o_orderkey")
            .limit(len(vals))
            .withColumn(
                "__rn", F.row_number().over(W.orderBy("o_orderkey"))
            )
        )
        planted = spark.createDataFrame(
            [(i + 1, v) for i, v in enumerate(vals)], "__rn int, __v double"
        )
        orders = (
            base.join(planted, "__rn")
            .withColumn("o_totalprice", F.col("__v"))
            .withColumn("o_orderpriority", F.lit("1-URGENT"))
            .drop("__rn", "__v")
        )
        orders.write.parquet(f"{d}/orders.parquet")
        for t in ("region", "nation", "customer", "supplier", "part",
                  "lineitem", "events", "documents", "embeddings"):
            src = f"/root/testdata/sf0.001/{t}.parquet"
            if os.path.exists(src):
                spark.read.parquet(src).limit(1).write.parquet(
                    f"{d}/{t}.parquet"
                )
        got = {
            r.pct: r.value
            for r in QUERY_REGISTRY["agg_percentile_cont"]
            .builder(spark, d)
            .collect()
        }
    assert got == want, (got, want)
