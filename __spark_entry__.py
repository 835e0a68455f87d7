"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (sales-summary mart over
lineitem ⨝ orders) at sf0.001. ``queries()`` / ``oracle_sql()`` expose
the full named-query registry from ``sales_etl_spark.plans`` — one
entry per implemented operator from SURVEY.md §2, each with a DuckDB
oracle twin where ANSI SQL can express it.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from sales_etl_spark.plans import QUERY_REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# The driver's correctness sweep covers the first 50 entries of the
# dict returned by ``queries()``. Round-9 rotation contract (the
# round-8 verdict's ask #5): driver coverage has been CLOSED since
# r08 (every registry key holds a CORRECTNESS row across r01-r08),
# so the window's job is now FRESHNESS — positions 1-3 are the keys
# NEW in round 9 (no driver row yet), and every remaining slot goes
# to the LEAST-RECENTLY-CHECKED keys (the 36 keys whose latest row
# is r2 plus the alphabetically-first r3 keys), refreshing hard
# signal for plans that predate the integer-cents/grain rewrites.
# Future rounds repeat this rule: new keys first, then oldest-row
# keys. tests/test_docs_sync.py enforces presence structurally
# (every registry key must hold a driver row in some
# CORRECTNESS_r*.json OR sit inside the 50-slot window).
_SWEEP_FIRST = [
    "tokenize_pipeline_e2e",
    "dedup_video_phash",
    "dedup_video_pairs",
    "video_dedup_pipeline_e2e",
    "dedup_video_recall_eval",
    "media_video_features",
    "mix_pack_assemble",
    "dedup_video_incremental",
    "agg_approx_distinct",
    "agg_avg_check_by_region",
    "agg_count_distinct",
    "agg_order_totals",
    "agg_rollup",
    "agg_salted_skew",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "dedup_embedding_lsh",
    "dedup_embedding_pairs",
    "dedup_exact_docs",
    "emb_norm_stats",
    "events_json_extract",
    "events_session_window",
    "events_window_sliding",
    "events_window_tumbling",
    "join_left_region",
    "join_salted_skew",
    "join_semi_anti",
    "multimodal_features",
    "multimodal_frames",
    "scan_csv",
    "scan_jsonl",
    "scan_orc",
    "set_intersect",
    "set_union_except",
    "sink_roundtrip",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_filter",
    "text_stats",
    "topk_product_ranking",
    "upsert_last_wins",
    "window_lag_delta",
    "window_running_sum",
    "agg_cube",
    "agg_grouping_sets",
    "agg_median_disc",
    "agg_mode",
    "agg_percentiles",
    "agg_pivot_status",
]


def _sweep_order() -> list[str]:
    first = [n for n in _SWEEP_FIRST if n in QUERY_REGISTRY]
    rest = [n for n in QUERY_REGISTRY if n not in _SWEEP_FIRST]
    with_oracle = [n for n in rest if QUERY_REGISTRY[n].oracle is not None]
    no_oracle = [n for n in rest if QUERY_REGISTRY[n].oracle is None]
    return first + with_oracle + no_oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERY_REGISTRY["agg_sales_summary"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: QUERY_REGISTRY[name].builder for name in _sweep_order()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query; keys without one get the driver's
    weaker rows-only check (non-SQL-expressible operators)."""
    return {
        name: QUERY_REGISTRY[name].oracle
        for name in _sweep_order()
        if QUERY_REGISTRY[name].oracle is not None
    }
