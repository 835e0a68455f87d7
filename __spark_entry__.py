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
# 10: positions 1-5 are the keys new or semantically REWRITTEN in
# round 10 (perceptual_cluster_resolve, dedup_video_cluster_e2e,
# dedup_video_recall_eval — the r9 row predates its planted-corpus
# rewrite, so it needs a fresh row like a new key — plus the new
# image/audio planted recall evals); the other 45 slots hold keys
# whose latest row is r3 (41 keys) or r4 (the alphabetically-first
# 4), refreshing the stalest strata.
# tests/test_docs_sync.py enforces presence structurally (every
# registry key must hold a driver row in some CORRECTNESS_r*.json
# OR sit inside the 50-slot window).
_SWEEP_FIRST = [
    "perceptual_cluster_resolve",
    "dedup_video_cluster_e2e",
    "dedup_video_recall_eval",
    "dedup_image_recall_eval",
    "dedup_audio_recall_eval",
    "agg_stats",
    "ann_quantized_topk",
    "cast_date_coerce",
    "corpus_report",
    "decontam_corpus",
    "dedup_corpus_survivors",
    "dedup_incremental",
    "dedup_keep_first",
    "emb_label_centroids",
    "emb_quantize_stats",
    "events_cohort_retention",
    "events_funnel",
    "fillna_default",
    "filter_required_nonnull",
    "flagship_pricing_summary",
    "flagship_shipping_priority",
    "fn_customer_days",
    "fn_email_valid",
    "fn_period_date",
    "fn_safe_div",
    "join_asof_prior_purchase",
    "join_events_enrich",
    "join_range_interval",
    "mix_token_budget",
    "proj_month",
    "proj_total_price",
    "quality_classifier_score",
    "sample_domain_cap",
    "sample_split_assign",
    "sample_stratified",
    "text_boilerplate",
    "text_chunk_tokens",
    "text_dup_gram_chars",
    "text_lm_score",
    "text_ngram_topk",
    "text_redact_pii",
    "text_repetition",
    "text_term_freq",
    "text_tfidf_keywords",
    "window_sessionize_ids",
    "window_time_range",
    "agg_abc_classification",
    "agg_holt_backtest",
    "agg_holt_forecast",
    "agg_new_vs_returning",
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
