"""Reconciliation & monitoring tier (plans/monitor.py,
operators/reconcile.py): diff classification, chi-square value,
run-count regex counting, and the histogram merge property behind the
quantile rollup."""

from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

from pyspark.sql import functions as F

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from sales_etl_spark.operators.reconcile import snapshot_diff  # noqa: E402
from sales_etl_spark.plans import QUERY_REGISTRY  # noqa: E402
from sales_etl_spark.plans.monitor import _run_count  # noqa: E402

from tests.conftest import SF_SMOKE  # noqa: E402


def test_snapshot_diff_classifies_all_four_states(spark):
    old = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "C"), (5, None, "E")],
        "k long, price double, status string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "A"), (2, 21.0, "B"), (4, 40.0, "D"), (5, None, "E")],
        "k long, price double, status string",
    )
    got = {
        r["k"]: r["diff_status"]
        for r in snapshot_diff(
            old, new, keys=["k"], compare_cols=["price", "status"]
        ).collect()
    }
    # 1 unchanged (dropped), 5 null-safe-equal (dropped), 2 changed,
    # 3 removed, 4 added.
    assert got == {2: "changed", 3: "removed", 4: "added"}


def test_snapshot_diff_null_vs_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    rows = snapshot_diff(old, new, ["k"], ["v"]).collect()
    assert len(rows) == 1 and rows[0]["diff_status"] == "changed"
    assert rows[0]["old_v"] is None and rows[0]["new_v"] == "x"


def test_run_count_counts_maximal_runs(spark):
    df = spark.createDataFrame(
        [("Hi there!! Done... or not? end",)], "text string"
    )
    out = df.select(
        _run_count(F.col("text"), "[.!?]+").alias("sent"),
        _run_count(F.lower(F.col("text")), "[aeiouy]+").alias("syl"),
    ).collect()[0]
    # Runs of [.!?]: '!!', '...', '?' → 3 (trailing 'end' opens no run)
    assert out["sent"] == 3
    # hi:1 there:2(e, e — 'ere'? runs: e, e) … count by hand:
    # "hi there!! done... or not? end" vowel-y runs:
    # i / e / e(*see below) / o e / o / o / e
    # hi→'i'(1), there→'e','e'(2), done→'o','e'(2), or→'o'(1),
    # not→'o'(1), end→'e'(1)  = 8
    assert out["syl"] == 8


def test_chi2_identical_halves_is_zero(spark):
    # Perfectly homogeneous split: every type appears equally in both
    # halves → chi2 exactly 0 after micro-flooring (0.5 floors to 0).
    rows = [(i, t) for i in range(10) for t in ("x", "y")]
    df = spark.createDataFrame(rows, "event_id long, event_type string")
    df.createOrReplaceTempView("__chi2_probe")
    ct = (
        df.select("event_type", (F.col("event_id") % 2 == 0).alias("is_a"))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
            F.sum(F.when(F.col("is_a"), 0).otherwise(1)).alias("n_b"),
        )
        .collect()
    )
    for r in ct:
        assert r["n_a"] == r["n_b"] == 5


def test_chi2_query_nonnegative_and_dof_matches_types(spark):
    q = QUERY_REGISTRY["quality_chi2_drift"]
    row = q.builder(spark, SF_SMOKE).collect()[0]
    types = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type")
        .distinct()
        .count()
    )
    assert row["chi2"] >= 0.0
    assert row["dof"] == types - 1
    assert row["n_events"] > 0


def test_quantile_rollup_merge_equals_direct_weekly(spark):
    """The mergeability claim: weekly quantiles from SUMMED daily
    histograms must equal binning directly at the week grain."""
    q = QUERY_REGISTRY["events_quantile_rollup"]
    via_daily = {
        r["week"]: (r["n_events"], r["p50"], r["p90"], r["p99"])
        for r in q.builder(spark, SF_SMOKE).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .filter(F.col("value").isNotNull())
        .select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week"),
            F.floor(F.col("value") * F.lit(10.0)).cast("long").alias("bin"),
        )
    )
    from collections import Counter

    direct = {}
    for wk, grp in _group_by_week(ev.collect()):
        n = len(grp)
        c = Counter(grp)

        def pick(num, den):
            # smallest bin whose cumulative count crosses the threshold
            cum = 0
            for b in sorted(c):
                cum += c[b]
                if den * cum >= num * n:
                    return b / 10.0
            return None

        direct[wk] = (n, pick(1, 2), pick(9, 10), pick(99, 100))
    assert via_daily == direct


def _group_by_week(rows):
    by_week: dict[dt.date, list[int]] = {}
    for r in rows:
        by_week.setdefault(r["week"], []).append(r["bin"])
    return by_week.items()


def test_snapshot_diff_query_statuses_consistent(spark):
    q = QUERY_REGISTRY["mart_snapshot_diff"]
    out = q.builder(spark, SF_SMOKE)
    counts = {
        r["diff_status"]: r["n"]
        for r in out.groupBy("diff_status").agg(F.count("*").alias("n")).collect()
    }
    assert set(counts) == {"added", "removed", "changed"}
    # old/new sides populated per status
    bad = out.filter(
        (F.col("diff_status") == "added") & F.col("old_status").isNotNull()
        | (F.col("diff_status") == "removed") & F.col("new_status").isNotNull()
        | (F.col("diff_status") == "changed")
        & (F.col("old_status").isNull() | F.col("new_status").isNull())
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# Property: patch(old, diff(old, new)) reconstructs new exactly
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings, strategies as hst  # noqa: E402

from sales_etl_spark.operators.reconcile import snapshot_patch  # noqa: E402

_snap_keys = hst.integers(min_value=0, max_value=9)
_vals = hst.one_of(hst.none(), hst.integers(min_value=0, max_value=3))
_snap = hst.dictionaries(_snap_keys, hst.tuples(_vals, _vals), max_size=10)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(old=_snap, new=_snap)
def test_patch_of_diff_roundtrips(spark, old, new):
    def frame(snap):
        rows = [(k, a, b) for k, (a, b) in snap.items()]
        return spark.createDataFrame(
            rows, "k long, x long, y long"
        ) if rows else spark.createDataFrame([], "k long, x long, y long")

    o, n = frame(old), frame(new)
    diff = snapshot_diff(o, n, ["k"], ["x", "y"])
    rebuilt = snapshot_patch(o, diff, ["k"], ["x", "y"])
    got = {(r["k"], r["x"], r["y"]) for r in rebuilt.collect()}
    want = {(k, a, b) for k, (a, b) in new.items()}
    assert got == want


def test_snapshot_diff_on_bucketed_snapshots_has_no_exchange(spark):
    """SCALE.md §19 claim made checkable: with both snapshots
    bucket-sorted on the key, the full-outer diff runs with ZERO
    exchanges — the churn audit of a 100 TB snapshot pair is a
    zipper merge per bucket."""
    from sales_etl_spark.sources.bucketed import read_table, write_bucketed

    base = spark.read.parquet(
        "/root/testdata/sf0.001/orders.parquet"
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
    )
    write_bucketed(
        base.filter(F.col("k") % 7 != 0), "t_snap_old", ["k"], n_buckets=4
    )
    write_bucketed(
        base.filter(F.col("k") % 5 != 0), "t_snap_new", ["k"], n_buckets=4
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        diff = snapshot_diff(
            read_table(spark, "t_snap_old"),
            read_table(spark, "t_snap_new"),
            keys=["k"],
            compare_cols=["price"],
        )
        diff.write.format("noop").mode("overwrite").save()
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        statuses = {
            r["diff_status"] for r in diff.select("diff_status").distinct().collect()
        }
        assert statuses == {"added", "removed"}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS t_snap_old")
        spark.sql("DROP TABLE IF EXISTS t_snap_new")
