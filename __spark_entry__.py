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
# dict returned by ``queries()``. Round-8 rotation (the round-7
# verdict's ask #1): positions 1-26 are the 26 registry keys that have
# NEVER held a driver CORRECTNESS row (the 18-key r6 tail that fell
# outside the r7 window because r7 never rotated, plus all 8 round-7
# media/phash queries). Landing these closes driver coverage at
# 261/261 permanently. Positions 27+ are re-checks of everything
# round 8 touches (the vectorized JPEG/MJPEG entropy decoder feeds
# media_jpeg_decode/media_mjpeg_frames/media_pipeline_e2e in the 1-26
# block already) plus any queries new in round 8, which are appended
# to this list as they are registered. tests/test_docs_sync.py now
# enforces the invariant structurally: every registry key must hold a
# driver row in some CORRECTNESS_r*.json OR sit inside the 50-slot
# window, so a stale window fails the build instead of silently
# starving new keys of hard signal.
_SWEEP_FIRST = [
    # -- never driver-checked: the 18-key r6 tail (positions 51-69 of
    #    the r7 order, which the 50-slot window could not reach) ------
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
    # -- never driver-checked: the 8 round-7 media/phash queries ------
    "media_jpeg_decode",
    "media_gif_decode",
    "media_wav_samples",
    "media_mjpeg_frames",
    "media_audio_features",
    "dedup_image_phash",
    "media_header_dimensions",
    "media_pipeline_e2e",
    # -- new in round 8 (no driver row yet for the new code) ----------
    "dedup_audio_fingerprint",
    "text_bpe_train",
    "text_bpe_segment",
    "text_bpe_token_count",
    "dedup_phash_pairs",
    "dedup_audio_pairs",
    # -- re-checks: queries whose internals round 8 touched ----------
    "ann_ivfpq_topk",  # r7 drift flag; one-process A/B + re-check
    "agg_sales_summary",  # flagship, exercised by entry()
    # the conditional narrow-input spread (operators/skew.py) changed
    # these queries' physical plans; all hold older green rows, and
    # all re-verified bit-exact at sf0.01 this session — the driver
    # row refreshes the hard signal for the new plan shape
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_cluster_resolve",
    "dedup_cluster_weights",
    "dedup_substring_span",
    "dedup_semantic",
    "dedup_paragraphs",
    "dedup_incremental_pairs_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_lsh_incremental",
    "decontam_overlap",
    "corpus_overlap_matrix",
    "search_ndcg_eval",
    # the vectorized JPEG/GIF codecs and the fixture spread also feed
    # the PNG-kernel queries (shared fingerprint helpers)
    "media_png_decode",
    "media_png_resize",
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
