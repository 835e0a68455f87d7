"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is forced end-to-end through the noop sink (full physical
plan, no driver collect bottleneck, nothing skipped by count-style
pruning). The session is warmed with one trivial job so JVM/codegen
startup is not billed to the first query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

#: Headline set: the reference-parity marts + one representative per
#: extension family (dedup, ANN, text, events, windows). Round 3 ADDED
#: four corpus-hygiene queries (decontam, domain cap, classifier, LM
#: score) — cross-round TOTAL comparisons must use the shared 16-query
#: subset; per-query times are the signal either way.
HEADLINE = [
    "flagship_pricing_summary",
    "flagship_shipping_priority",
    "agg_sales_summary",
    "agg_avg_check_by_region",
    "agg_stats",
    "topk_product_ranking",
    "join_asof_prior_purchase",
    "upsert_last_wins",
    "window_running_sum",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "ann_cosine_topk",
    "text_stats",
    "events_window_tumbling",
    "events_session_window",
    # round-3 corpus-hygiene tier
    "decontam_overlap",
    "sample_domain_cap",
    "quality_classifier_score",
    "text_lm_score",
]

#: Runs per query; the minimum is reported as the headline number
#: (steady-state execution — whole-stage codegen compilation and
#: broadcast warm-up amortize away on any long-lived cluster, so
#: first-run JIT cost is not the metric) and the median alongside, so
#: ±15% single-run scheduler noise can't masquerade as a regression
#: across rounds.
RUNS = 3


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from sales_etl_spark.plans import QUERY_REGISTRY
    from sales_etl_spark.session import get_spark

    spark = get_spark(
        "sales-etl-spark-bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/codegen path and the parquet file index + footers
    # outside the timed region: the bench measures steady-state query
    # execution, not first-touch filesystem metadata.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "nation", "region",
              "part", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    for name in HEADLINE:
        builder = QUERY_REGISTRY[name].builder
        runs: list[float] = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            df = builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)
        spark.catalog.clearCache()  # operator-internal caches stay local

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "runs": RUNS,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
