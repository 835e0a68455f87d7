"""Streaming tier: the SAME aggregation expressions run as Structured
Streaming jobs (file source → availableNow trigger → memory sink) and
must equal their batch results — the unified-model guarantee the
engine's streaming surface is built on."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sales_etl_spark.sources.star import load_star  # noqa: E402
from sales_etl_spark.streaming.windows import (  # noqa: E402
    read_events_stream,
    stream_dedup,
    stream_tumbling_counts,
    tumbling_agg,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # Normalize the driver's NANOS-timestamp events once into a
    # µs-precision parquet dir that the file-source stream can read
    # with an explicit schema (multiple files → multiple triggers).
    path = str(tmp_path_factory.mktemp("events_stream"))
    events = load_star(spark, SF_DIR).table("events")
    # streaming event-time needs TimestampType (instant); UTC session
    # makes the wall-clock values identical to the batch NTZ view
    events = events.withColumn("ts", events["ts"].cast("timestamp"))
    events.repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_stream_tumbling_equals_batch(spark, events_dir):
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in tumbling_agg(spark.read.parquet(events_dir)).collect()
    }
    stream = stream_tumbling_counts(
        read_events_stream(spark, events_dir), watermark="100 days"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("tumbling_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM tumbling_test").collect()
    }
    assert got == batch
    q.stop()


def test_stream_dedup_drops_replayed_events(spark, events_dir, tmp_path):
    # replay the same files twice → at-least-once delivery simulation
    dup_dir = str(tmp_path / "dup")
    base = spark.read.parquet(events_dir)
    base.union(base).repartition(6).write.mode("overwrite").parquet(dup_dir)

    deduped = stream_dedup(
        read_events_stream(spark, dup_dir), watermark="100 days"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("SELECT COUNT(DISTINCT event_id) AS n, COUNT(*) AS total "
                  "FROM dedup_test").collect()[0]
    assert n.total == n.n, "duplicates survived the watermark dedup"
    assert n.n == base.count()
    q.stop()


def test_stateful_user_profile_final_state_equals_batch(spark, events_dir):
    """applyInPandasWithState running profile: after the stream drains,
    the last emission per user must equal the batch groupBy over the
    same files (state correctly accumulated across micro-batches —
    maxFilesPerTrigger forces >1 batch)."""
    from pyspark.sql import functions as F

    from sales_etl_spark.streaming.stateful import user_profile_stream
    from sales_etl_spark.streaming.windows import EVENTS_SCHEMA

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
        .select("user_id", "ts", "value")
    )
    q = (
        user_profile_stream(stream)
        .writeStream.format("memory")
        .queryName("profile_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    emitted = spark.sql("SELECT * FROM profile_test")
    # >1 micro-batch ⇒ at least one user emitted more than once
    assert emitted.count() > emitted.select("user_id").distinct().count()
    final = {
        r.user_id: (r.n_events, round(r.total_value, 6), r.last_ts_micros)
        for r in emitted.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("n_events"))
            ),
        )
        .filter("rn = 1")
        .collect()
    }
    batch = {
        r.user_id: (
            r.n_events,
            round(r.total_value, 6),
            r.last_ts_micros,
        )
        for r in spark.read.parquet(events_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.unix_micros(F.max("ts")).alias("last_ts_micros"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid in batch:
        assert final[uid][0] == batch[uid][0], uid  # exact counts
        assert final[uid][2] == batch[uid][2], uid  # exact last ts
        assert abs(final[uid][1] - batch[uid][1]) < 1e-6, uid
