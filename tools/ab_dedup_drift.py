"""One-process A/B of the dedup-family window drift (r6 verdict #4).

dedup_ngram_jaccard / dedup_exact_docs / dedup_minhash_lsh /
sample_dsir_weights regressed 20-26% between the r5 and r6 driver
windows with no code change. This harness removes every cross-run
variable: ONE JVM, one calibration, HEAD's registry and the pinned
r5-closing registry (a git worktree) imported alternately in the SAME
process (sys.modules purge between phases — the package is pure
Python), queries interleaved A/B/A/B so machine drift lands on both
sides equally.

Usage:
    python tools/ab_dedup_drift.py [sf_dir]   # expects ../.ab_r5
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
R5 = REPO / ".ab_r5"

QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_exact_docs",
    "dedup_minhash_lsh",
    "sample_dsir_weights",
]


_ACTIVE_ROOT: list = [None]


def load_registry(root: Path):
    """Import sales_etl_spark fresh from ``root``, returning its
    QUERY_REGISTRY. Purges prior imports so HEAD and r5 can share the
    process despite the identical package name.

    CAVEAT: builders hold their def-time module globals, but a
    builder that LAZY-imports sales_etl_spark.* at call time would
    resolve against whichever version is resident in sys.modules —
    silently mixing code across phases. activate() re-purges and
    re-imports before each phase switch so resident modules always
    match the registry being timed."""
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
    """Return ``root``'s registry, re-importing iff another root's
    modules are currently resident (keeps lazy imports honest while
    amortizing the reload across consecutive same-root runs)."""
    if _ACTIVE_ROOT[0] != root:
        registries[root] = load_registry(root)
    return registries[root]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    rounds = int(os.environ.get("RUNS", "3"))

    sys.path.insert(0, str(REPO))
    import bench
    from sales_etl_spark.session import get_spark

    registries: dict = {}
    registries[REPO] = load_registry(REPO)

    spark = get_spark("ab-dedup", master="local[32]", shuffle_partitions=8)
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
        q: {"head": [], "r5": []} for q in QUERIES
    }
    # JIT warmup pass (uncounted), then interleaved measured rounds
    for q in QUERIES:
        run_one(REPO, q)
        run_one(R5, q)
    for _ in range(rounds):
        for q in QUERIES:
            times[q]["head"].append(round(run_one(REPO, q), 3))
            times[q]["r5"].append(round(run_one(R5, q), 3))

    out = {"calibration": cal, "sf_dir": sf_dir, "queries": {}}
    for q in QUERIES:
        h = min(times[q]["head"])
        r = min(times[q]["r5"])
        out["queries"][q] = {
            "head_min": h,
            "r5_min": r,
            "ratio_head_over_r5": round(h / r, 3),
            "head_all": times[q]["head"],
            "r5_all": times[q]["r5"],
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
