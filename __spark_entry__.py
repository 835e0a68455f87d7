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
# dict returned by ``queries()``. Rotation contract (since r9, the
# round-8 verdict's ask #5): driver coverage has been CLOSED since
# r08 (every registry key holds a CORRECTNESS row across r01-r08),
# so the window's job is now FRESHNESS — keys NEW this round (no
# driver row yet) go first, and every remaining slot goes to the
# LEAST-RECENTLY-CHECKED keys (sorted by latest round across
# CORRECTNESS_r*.json, alphabetical within a round stratum). Round
# 11: position 1 is the round's one new key (media_container_probe,
# the MP4/MP3 metadata-only container probe); the other 49 slots
# refresh the stalest strata — all 44 keys whose latest row is r4
# plus the alphabetically-first 5 of the r5 stratum.
# tests/test_docs_sync.py enforces presence structurally (every
# registry key must hold a driver row in some CORRECTNESS_r*.json
# OR sit inside the 50-slot window).
_SWEEP_FIRST = [
    "media_container_probe",
    "agg_order_aging",
    "agg_rfm_segments",
    "agg_seasonal_decompose",
    "agg_share_of_parent",
    "agg_ship_lag_dist",
    "agg_supplier_hhi",
    "agg_weekday_seasonality",
    "ann_hard_negatives",
    "emb_dist_outliers",
    "emb_pca_power",
    "emb_silhouette",
    "emb_truncate_fidelity",
    "events_ab_cuped",
    "events_attribution_last_touch",
    "events_bot_score",
    "events_click_attribution",
    "events_cohort_ltv",
    "events_inter_arrival",
    "events_mad_anomaly",
    "events_quantile_rollup",
    "events_time_to_purchase",
    "events_user_streaks",
    "mart_backfill_partitions",
    "mart_pipeline_e2e",
    "mart_snapshot_diff",
    "multimodal_audio",
    "quality_chi2_drift",
    "quality_column_profile",
    "quality_freshness_sla",
    "quality_k_anonymity",
    "quality_key_skew",
    "quality_l_diversity",
    "quality_mutual_info",
    "quality_psi_drift",
    "quality_uniqueness_audit",
    "sample_kcenter_coreset",
    "scan_bloom_skip",
    "scan_csv_quarantine",
    "scan_xml",
    "text_lang_consistency",
    "text_pmi_collocations",
    "text_readability",
    "window_ma_cross",
    "window_rank_movers",
    "agg_percentile_cont",
    "events_markov_stationary",
    "flagship_above_avg_balance",
    "flagship_brand_revenue",
    "flagship_cust_order_dist",
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
