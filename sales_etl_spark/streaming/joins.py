"""Stream-stream interval join — click→purchase attribution.

The reference is strictly batch (SURVEY.md §2.8); this is the
Spark-native streaming extension's join leg: two live event streams
joined on a key within an event-time interval, the canonical
"attribute each purchase to a preceding click within the window"
problem (ad attribution, session stitching, fraud pairing).

Written once against DataFrames, the same function runs in BOTH
modes — batch (the oracle-checkable form, registered as
``events_click_attribution`` in plans/monitor.py) and Structured
Streaming (each side watermarked; the range predicate bounds the
join state, so Spark evicts buffered rows once the watermark passes
``click_ts + max_gap``).

Scale shape: an equi-join on ``user_id`` with a range predicate —
ONE shuffle per side, state linear in the in-window rows per key. In
streaming mode the watermark turns that state into a sliding buffer:
at 100 TB/day the state size is rate × window, independent of
history. The naive alternative (join on user alone, filter later)
buffers unboundedly; the interval predicate in the join condition is
what makes the state evictable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["split_clicks_purchases", "click_purchase_attribution"]


def split_clicks_purchases(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Project the two legs from one events frame (batch) or two
    readStream handles (streaming — call once per handle). The
    event_type filters are pushed to the scans."""
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def click_purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "INTERVAL 2 HOURS",
    watermark: str | None = None,
) -> DataFrame:
    """Purchases paired with every same-user click in the preceding
    ``max_gap`` (strictly before the purchase, inclusive window
    start). Inner interval join; one row per qualifying (click,
    purchase) pair — downstream pick-one attribution (last-touch) is
    upsert_last_wins on purchase_id ordered by click_ts.

    ``watermark`` (streaming only): applied to BOTH sides' event-time
    columns so the join state is evictable. Batch callers leave it
    None — the plan is identical minus the eviction metadata.
    """
    if watermark is not None:
        clicks = clicks.withWatermark("click_ts", watermark)
        purchases = purchases.withWatermark("purchase_ts", watermark)
    # Alias both sides: batch callers commonly derive them from ONE
    # events frame (split_clicks_purchases), which is a self-join.
    c, p = clicks.alias("c"), purchases.alias("p")
    cond = (
        (F.col("c.user_id") == F.col("p.user_id"))
        & (F.col("c.click_ts") < F.col("p.purchase_ts"))
        & (F.col("p.purchase_ts") <= F.col("c.click_ts") + F.expr(max_gap))
    )
    return c.join(p, cond, "inner").select(
        F.col("p.purchase_id"),
        F.col("p.user_id"),
        F.col("c.click_id"),
        F.col("c.click_ts"),
        F.col("p.purchase_ts"),
        F.col("p.purchase_value"),
    )
