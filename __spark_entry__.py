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
# dict returned by ``queries()``. Round-5 rotation (the round-4
# verdict's top ask): every key that has NEVER had a driver
# CORRECTNESS row leads the order. 106 such keys exist (incl. the
# eight new round-5 queries) against a
# 50-slot window, so the window holds, in order: (a) this round's
# changed/new code (the ntile rewrite and its new exact-pairs twin —
# hard signal for fresh code outranks rotation turns), then (b) the
# highest-risk never-checked families the verdict named — the 22
# TPC-H flagships, the lake-format DML surface, the scan-pruning
# family (DPP / bucketed / z-order / partition / schema-evolution /
# binary), the window family, and the mart/graph/dedup machinery
# closers. The 56 remaining never-checked keys follow IMMEDIATELY
# after slot 50 (positions 51-106) so next round's rotation is
# exactly "promote the tail" and the two windows jointly cover all
# 106. Every displaced key is bit-exact under tools/check_oracle.py
# at sf0.001 AND sf0.01 this session, and the keys this window
# displaces (the r04 cohort) all hold green driver rows from
# CORRECTNESS_r04.
_SWEEP_FIRST = [
    # -- changed/new this round (no driver row for the new shape) ----
    "window_ntile_quartiles",
    "dedup_incremental_pairs_exact",
    "sample_dsir_weights",
    "search_ndcg_eval",
    "dedup_substring_span",
    "text_chunk_overlap",
    "ann_pq_topk",
    "agg_percentile_cont",
    "join_asof_nearest",
    "events_markov_stationary",
    # -- TPC-H flagship tier (never driver-checked) ------------------
    "flagship_min_cost_supplier",
    "flagship_product_profit",
    "flagship_important_stock",
    "flagship_shipmode_priority",
    "flagship_supplier_variety",
    "flagship_dominant_supplier",
    "flagship_nation_trade",
    "flagship_market_share",
    "flagship_cust_order_dist",
    "flagship_top_supplier",
    "flagship_brand_revenue",
    "flagship_idle_balances",
    "flagship_local_volume",
    "flagship_small_quantity",
    "flagship_returned_items",
    "flagship_promo_revenue",
    "flagship_late_orders",
    "flagship_above_avg_balance",
    "flagship_big_orders",
    "flagship_forecast_revenue",
    "flagship_revenue_bridge",
    "flagship_waiting_supplier",
    # -- lake DML + scan-pruning family ------------------------------
    "scan_lake_dml",
    "scan_lake_table",
    "scan_dpp_prune",
    "scan_bucketed_join",
    "scan_zorder_prune",
    "scan_partition_prune",
    "scan_binary_files",
    "scan_schema_evolution",
    # -- window family (incl. the one non-decomposable recurrence) ---
    "window_topn_per_group",
    "window_global_rownum",
    "window_capped_running_sum",
    "window_concurrent_orders",
    "window_drawdown",
    # -- mart / graph / dedup machinery closers ----------------------
    "mart_customer_360",
    "mart_incremental_refresh",
    "mart_incremental_join_refresh",
    "graph_pagerank_trade",
    "graph_triangle_cluster",
    # ---- end of the 50-slot window (graph_triangle_cluster is
    # slot 50). The eight brand-new round-5 queries
    # (sample_dsir_weights, search_ndcg_eval, dedup_substring_span,
    # text_chunk_overlap, ann_pq_topk, agg_percentile_cont,
    # join_asof_nearest, events_markov_stationary) joined the lead
    # cohort after this list was first cut, displacing the eight
    # trailing dedup/corpus/variant closers (dedup_semantic onward)
    # to lead the tail — they head the r06 window. Positions 51-106
    # queue the rest of the never-driver-checked keys. ----------------
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
    "agg_gini_revenue",
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
