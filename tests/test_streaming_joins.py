"""Stream-stream interval join (streaming/joins.py): the watermarked
streaming run over a file source must produce exactly the batch pair
set — the unified-model guarantee, plus proof the join state is
evictable (watermarks on both sides, range predicate in the
condition)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sales_etl_spark.sources.star import load_star  # noqa: E402
from sales_etl_spark.streaming.joins import (  # noqa: E402
    click_purchase_attribution,
    split_clicks_purchases,
)
from sales_etl_spark.streaming.windows import EVENTS_SCHEMA  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_join_stream"))
    events = load_star(spark, SF_DIR).table("events")
    events = events.withColumn("ts", events["ts"].cast("timestamp"))
    events.repartition(4).write.mode("overwrite").parquet(path)
    return path


def _pairs_key(rows):
    return sorted((r["purchase_id"], r["click_id"]) for r in rows)


def test_stream_interval_join_equals_batch(spark, events_dir):
    batch_events = spark.read.schema(EVENTS_SCHEMA).parquet(events_dir)
    b_clicks, b_purchases = split_clicks_purchases(batch_events)
    batch = click_purchase_attribution(b_clicks, b_purchases).collect()

    stream_events = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    s_clicks, s_purchases = split_clicks_purchases(stream_events)
    joined = click_purchase_attribution(
        s_clicks, s_purchases, watermark="30 days"
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("attr_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("attr_join").collect()
    assert len(batch) > 0
    assert _pairs_key(got) == _pairs_key(batch)


def test_stream_join_plan_has_watermarks_both_sides(spark, events_dir):
    stream_events = spark.readStream.schema(EVENTS_SCHEMA).parquet(events_dir)
    s_clicks, s_purchases = split_clicks_purchases(stream_events)
    joined = click_purchase_attribution(
        s_clicks, s_purchases, watermark="1 hour"
    )
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_batch_pairs_within_window_only(spark):
    st = load_star(spark, SF_DIR)
    clicks, purchases = split_clicks_purchases(st.events)
    pairs = click_purchase_attribution(clicks, purchases)
    bad = pairs.filter(
        (F.col("purchase_ts") <= F.col("click_ts"))
        | (
            F.col("purchase_ts")
            > F.col("click_ts") + F.expr("INTERVAL 2 HOURS")
        )
    ).count()
    assert bad == 0


# ---------------------------------------------------------------------------
# Property: interval join ≡ brute-force pair enumeration
# ---------------------------------------------------------------------------

import datetime as dt  # noqa: E402

from hypothesis import HealthCheck, given, settings, strategies as hst  # noqa: E402

_BASE = dt.datetime(2024, 1, 1)
_GAP = dt.timedelta(hours=2)

_users = hst.integers(min_value=0, max_value=2)
_minutes = hst.integers(min_value=0, max_value=300)
_clicks = hst.lists(hst.tuples(_users, _minutes), max_size=12)
_purchases = hst.lists(hst.tuples(_users, _minutes), max_size=12)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(clicks=_clicks, purchases=_purchases)
def test_interval_join_matches_bruteforce(spark, clicks, purchases):
    clicks = [(i, u, _BASE + dt.timedelta(minutes=m))
              for i, (u, m) in enumerate(clicks)]
    purchases = [(100 + i, u, _BASE + dt.timedelta(minutes=m), 1.0)
                 for i, (u, m) in enumerate(purchases)]
    cdf = spark.createDataFrame(
        clicks or [(None, None, None)],
        "click_id long, user_id long, click_ts timestamp",
    ).filter(F.col("click_id").isNotNull())
    pdf = spark.createDataFrame(
        purchases or [(None, None, None, None)],
        "purchase_id long, user_id long, purchase_ts timestamp, "
        "purchase_value double",
    ).filter(F.col("purchase_id").isNotNull())
    got = {
        (r["purchase_id"], r["click_id"])
        for r in click_purchase_attribution(cdf, pdf).collect()
    }
    want = {
        (pid, cid)
        for cid, cu, cts in clicks
        for pid, pu, pts, _ in purchases
        if cu == pu and cts < pts <= cts + _GAP
    }
    assert got == want
