"""Capture .explain("formatted") before/after files for the
optimization round: "before" from the pinned A/B worktree's registry,
"after" from HEAD — plus a one-line Exchange/Join/Python summary of
each, so plan-diff claims in OPTIMIZATION_rN.md are checkable against
committed files.

Usage:
    AB_PIN=.ab_r11base OUT=plans/r11 \
        python tools/capture_plans.py [sf_dir] q1 q2 ...
"""

from __future__ import annotations

import os
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
PIN = REPO / os.environ.get("AB_PIN", ".ab_r11base")
OUT = REPO / os.environ.get("OUT", "plans/r11")


def load_registry(root: Path):
    for mod in [m for m in sys.modules if m.startswith("sales_etl_spark")]:
        del sys.modules[mod]
    sys.path.insert(0, str(root))
    try:
        from sales_etl_spark.plans import QUERY_REGISTRY

        return dict(QUERY_REGISTRY)
    finally:
        sys.path.remove(str(root))


def summarize(plan: str) -> str:
    ex = len(re.findall(r"\bExchange\b", plan))
    reuse = len(re.findall(r"ReusedExchange", plan))
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)",
        plan,
    )
    py = re.findall(
        r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|"
        r"FlatMapGroupsInPandas)",
        plan,
    )
    aggs = len(re.findall(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan))
    return (
        f"exchanges={ex} (reused={reuse}) aggregates={aggs} "
        f"joins={sorted(set(joins)) or 'none'} python={sorted(set(py)) or 'none'}"
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = [a for a in args if "/" not in a]

    sys.path.insert(0, str(REPO))
    from sales_etl_spark.session import get_spark

    spark = get_spark("capture-plans", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    OUT.mkdir(parents=True, exist_ok=True)

    for label, root in (("before", PIN), ("after", REPO)):
        reg = load_registry(root)
        for name in names:
            if name not in reg:
                print(f"{name}: missing in {label}")
                continue
            df = reg[name].builder(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
            path = OUT / f"{name}_{label}.txt"
            path.write_text(plan)
            print(f"{name} [{label}]: {summarize(plan)}")
    spark.stop()


if __name__ == "__main__":
    main()
