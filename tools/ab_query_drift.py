"""One-process A/B of window-median drift for arbitrary queries
(r7 verdict ask #3 — pattern lifted from tools/ab_dedup_drift.py).

`ann_ivfpq_topk` moved 0.389 s (r6 median) -> 0.560 s (r7 median) with
no code change to the operator; best-of was flat.  On this contended
box only same-process ratios are trustworthy (SCALE.md §27.1), so this
harness runs HEAD and the pinned r6-closing registry (git worktree at
.ab_r6) interleaved in ONE JVM with one calibration.

Usage:
    python tools/ab_query_drift.py [sf_dir] [query ...]
                                   # default: ann_ivfpq_topk vs ../.ab_r6
    AB_PIN=.ab_r5 python tools/ab_query_drift.py ...   # other pin
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PIN = REPO / os.environ.get("AB_PIN", ".ab_r6")

_ACTIVE_ROOT: list = [None]


def load_registry(root: Path):
    """Import sales_etl_spark fresh from ``root`` (sys.modules purge —
    see tools/ab_dedup_drift.py for the lazy-import caveat)."""
    for mod in [m for m in sys.modules if m.startswith("sales_etl_spark")]:
        del sys.modules[mod]
    sys.path.insert(0, str(root))
    try:
        from sales_etl_spark.plans import QUERY_REGISTRY
        _ACTIVE_ROOT[0] = root
        return dict(QUERY_REGISTRY)
    finally:
        sys.path.remove(str(root))


def activate(root: Path, registries: dict) -> dict:
    if _ACTIVE_ROOT[0] != root:
        registries[root] = load_registry(root)
    return registries[root]


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    queries = args[1:] or ["ann_ivfpq_topk"]
    rounds = int(os.environ.get("RUNS", "5"))

    sys.path.insert(0, str(REPO))
    import bench
    from sales_etl_spark.session import get_spark

    registries: dict = {}
    registries[REPO] = load_registry(REPO)

    spark = get_spark("ab-query", master="local[32]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("documents", "embeddings", "lineitem", "orders"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    cal = bench.calibrate(spark)

    def run_one(root, name) -> float:
        reg = activate(root, registries)
        t0 = time.perf_counter()
        reg[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    times: dict[str, dict[str, list[float]]] = {
        q: {"head": [], "pin": []} for q in queries
    }
    for q in queries:  # JIT warmup, uncounted
        run_one(REPO, q)
        run_one(PIN, q)
    # Alternate within-pair order per round: a fixed head-then-pin
    # order measures ~1.13-1.20x on a SELF-A/B (identical code both
    # sides, measured round 9) — whichever side runs first in a pair
    # systematically pays more on this box. Symmetric alternation
    # cancels the position bias instead of attributing it to HEAD.
    for i in range(rounds):
        for q in queries:
            order = (REPO, PIN) if i % 2 == 0 else (PIN, REPO)
            for root in order:
                key = "head" if root is REPO else "pin"
                times[q][key].append(round(run_one(root, q), 3))

    out = {"calibration": cal, "sf_dir": sf_dir, "pin": str(PIN),
           "queries": {}}
    from statistics import median as med

    for q in queries:
        h, p = min(times[q]["head"]), min(times[q]["pin"])
        out["queries"][q] = {
            "head_min": h, "pin_min": p,
            "head_median": med(times[q]["head"]),
            "pin_median": med(times[q]["pin"]),
            "ratio_head_over_pin_min": round(h / p, 3),
            "ratio_head_over_pin_median": round(
                med(times[q]["head"]) / med(times[q]["pin"]), 3),
            "head_all": times[q]["head"], "pin_all": times[q]["pin"],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
