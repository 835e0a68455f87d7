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
# dict returned by ``queries()``. Round-6 rotation (the round-5
# verdict's asks #1/#2): (a) this round's changed/new code leads —
# hard signal for fresh code outranks rotation turns — starting with
# `flagship_big_orders` (the ONE red r5 row: its exposed decimal is
# now cast to double in builder+oracle; the green r6 row is the
# done-condition), its two dtype siblings (`agg_gini_revenue`,
# `flagship_forecast_revenue`), the rewritten-internals queries
# (`ann_pq_topk` janino fix, `join_asof_nearest` tie dedup), and
# the eight new round-6 queries (media_png_decode,
# dedup_fs_linkage, quality_conformal_gate, ann_ivfpq_topk,
# media_png_resize, events_did_estimator, events_km_survival,
# events_audience_overlap); then (b) the promoted never-driver-checked
# tail (the r5 order's positions 51+, kept stable as the verdict
# asked). 56 never-checked keys + 5 re-checks + 8 new = 69 against
# 50 slots, so the last 19 tail keys land at positions 51-69 for the
# r7 window. Every key in both windows is bit-exact under
# tools/check_oracle.py at sf0.001 AND sf0.01 this session; every
# displaced key holds a green driver row from r01-r05.
_SWEEP_FIRST = [
    # -- changed/new this round (no driver row for the new shape) ----
    "flagship_big_orders",
    "agg_gini_revenue",
    "flagship_forecast_revenue",
    "ann_pq_topk",
    "join_asof_nearest",
    "media_png_decode",
    "dedup_fs_linkage",
    "quality_conformal_gate",
    "ann_ivfpq_topk",
    "media_png_resize",
    "events_did_estimator",
    "events_km_survival",
    "events_audience_overlap",
    # -- promoted never-driver-checked tail (r5 positions 51+) -------
    "dedup_semantic",
    "dedup_containment",
    "dedup_paragraphs",
    "dedup_tf_cosine",
    "dedup_fuzzy_names",
    "corpus_pipeline_e2e",
    "events_variant_agg",
    "join_scd2_pointintime",
    "dim_scd2_history",
    "quality_expectations",
    "quality_expectations_long",
    "mix_pack_sequences",
    "decontam_shuffled",
    "join_bloom_pruned",
    "corpus_overlap_matrix",
    "sample_weighted_k",
    "text_hash_features",
    "events_rate_anomaly",
    "events_cumulative_users",
    "emb_kmeans_assign",
    "emb_kmeans_lloyd",
    "events_ewma_rate",
    "agg_histogram",
    "emb_standardize",
    "events_rolling_active_users",
    "agg_copurchase_topk",
    "agg_yoy_growth",
    "agg_winsorized_stats",
    "quality_orphan_audit",
    "events_transition_matrix",
    "agg_corr_qty_price",
    "events_gapfill",
    "mix_temperature_resample",
    "events_locf",
    "events_twap",
    "sample_quality_deciles",
    "events_session_stats",
    "mix_epoch_schedule",
    "agg_skew_kurtosis",
    "events_type_entropy",
    "text_zipf_slope",
    "text_bm25_topk",
    "search_hybrid_rrf",
    "events_ab_welch",
    "quality_ks_drift",
    "agg_association_rules",
    "quality_benford_digits",
    "agg_argmin_supplier",
    "events_path_topk",
    "agg_pareto_cut",
    "agg_weighted_median",
    "events_hll_rollup",
    "ann_recall_eval",
    "agg_churn_rate",
    "dedup_recall_eval",
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
