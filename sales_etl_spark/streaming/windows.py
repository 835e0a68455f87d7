"""Event-time windowing — batch and Structured Streaming forms.

The reference is strictly batch (SURVEY.md §2.8: no streaming
operators); the ``events`` table (event-time ``ts``) is the substrate
for the Spark-native extension. Every aggregation here is written
once against a DataFrame and works in BOTH modes — that is the point
of Structured Streaming's unified model:

- batch: the oracle-checkable form (plans/extensions.py);
- streaming: the same function applied to ``readStream`` input, plus
  a watermark for state eviction.

Money-style metric sums go through DECIMAL(18,6) as everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Streaming-side schema. ``ts`` is TimestampType (instant), not NTZ —
#: watermarks/event-time state require it (EVENT_TIME_IS_NOT_ON_
#: TIMESTAMP_TYPE otherwise); under the engine's pinned UTC session
#: the wall-clock values match the batch NTZ view exactly.
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows: count + exact sum(value) per
    (window, event_type). Output carries window_start so batch results
    hash-compare against a date_trunc/time_bucket oracle."""
    return (
        events.groupBy(
            F.window("ts", width).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding windows (width/slide): each event lands in
    width/slide windows; Spark expands them internally — the oracle
    does the same expansion with explicit bucket arithmetic."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows (gap-based): session = maximal run of
    events with inter-arrival < gap. window.end = last event + gap
    (Spark session_window semantics — the oracle mirrors max(ts)+gap).

    In streaming mode the same expression maintains per-user session
    state with watermark eviction; in batch it is a grouped agg."""
    return (
        events.groupBy(
            F.session_window("ts", gap).alias("w"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Streaming forms
# ---------------------------------------------------------------------------


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over an events parquet directory — the local
    stand-in for a Kafka topic; swap ``format('kafka')`` + the same
    downstream code in production."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Streaming tumbling aggregation with late-data policy: events
    later than ``watermark`` behind max(ts) are dropped and window
    state older than that is evicted — bounded state at any volume."""
    return tumbling_agg(events.withWatermark("ts", watermark), width)


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful exact dedup on event_id within the watermark horizon
    (dropDuplicatesWithinWatermark): at-least-once sources become
    effectively-once without unbounded state."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_stream_attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """STREAM-STREAM inner join: each purchase joins every click by
    the same user within the preceding ``horizon`` (click-to-buy
    attribution). Both sides carry watermarks and the join condition
    bounds event-time distance, so Spark can size the state store and
    EVICT rows no future match can reach — the two requirements that
    make an unbounded two-stream join feasible at all. Without the
    time-range condition the state grows forever; with it, state is
    O(rate x (horizon + watermark)) regardless of total volume.

    Batch twin: the identical equi+interval join on static frames
    (the unified-model guarantee, asserted in tests). In production
    both sides are Kafka topics; here the file-source stand-in."""
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {horizon}")
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id", "click_ts", "purchase_id", "purchase_ts",
        "purchase_value",
    )
