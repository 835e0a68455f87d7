"""Runtime shuffle/stage probe: run queries through the noop sink in
one session and report, per query, the ACTUAL executed cost from the
Spark status API — completed stages, total shuffle write bytes, input
bytes, and task count. Wall-clock-free evidence for optimization
claims ("this change removes an exchange / shuffles fewer bytes")
that stays valid on a contended box where timings are weather.

Cached frames materialize once at runtime, so unlike static
explain-node counts this is immune to InMemoryRelation subtree
repetition.

Usage:
    python tools/shuffle_probe.py [sf_dir] q1 q2 ...
    AB_PIN=.ab_r11base python tools/shuffle_probe.py ...  # adds pinned
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PIN = os.environ.get("AB_PIN")


def load_registry(root: Path):
    for mod in [m for m in sys.modules if m.startswith("sales_etl_spark")]:
        del sys.modules[mod]
    sys.path.insert(0, str(root))
    try:
        from sales_etl_spark.plans import QUERY_REGISTRY

        return dict(QUERY_REGISTRY)
    finally:
        sys.path.remove(str(root))


def stage_totals(ui: str, app_id: str) -> dict:
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    ) as r:
        stages = json.load(r)
    return {
        "stages": len(stages),
        "tasks": sum(s["numCompleteTasks"] for s in stages),
        "shuffle_write": sum(s["shuffleWriteBytes"] for s in stages),
        "shuffle_read": sum(s["shuffleReadBytes"] for s in stages),
        "input_bytes": sum(s["inputBytes"] for s in stages),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]

    sys.path.insert(0, str(REPO))
    from sales_etl_spark.session import get_spark

    spark = get_spark("shuffle-probe", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    roots = [("head", REPO)] + ([("pin", REPO / PIN)] if PIN else [])
    out: dict[str, dict] = {}
    for label, root in roots:
        reg = load_registry(root)
        for name in names:
            spark.sparkContext.setJobDescription(f"{label}:{name}")
            before = stage_totals(ui, app_id)
            reg[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            after = stage_totals(ui, app_id)
            spark.catalog.clearCache()
            out.setdefault(name, {})[label] = {
                k: after[k] - before[k] for k in before
            }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
