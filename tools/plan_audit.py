"""Plan-audit evidence generator: for each headline query, print the
physical-plan scale signals SCALE.md cites — exchange count, join
strategies, pushed filters, scan width, Python nodes.

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = sys.argv[2:]

    from bench import HEADLINE
    from sales_etl_spark.plans import QUERY_REGISTRY
    from sales_etl_spark.session import get_spark

    names = only or HEADLINE
    spark = get_spark("plan-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    print("| query | exchanges | joins | python | scan cols | pushed filters |")
    print("|---|---|---|---|---|---|")
    for name in names:
        df = QUERY_REGISTRY[name].builder(spark, sf_dir)
        p = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        ex = len(re.findall(r"\(\d+\) Exchange", p))
        joins = "+".join(
            sorted(
                {
                    m
                    for m in re.findall(
                        r"(BroadcastHashJoin|SortMergeJoin|"
                        r"BroadcastNestedLoopJoin|ShuffledHashJoin)",
                        p,
                    )
                }
            )
        ) or "-"
        py = len(re.findall(r"EvalPython|InPandas", p))
        scans = [
            len(s.split(","))
            for s in re.findall(r"ReadSchema: struct<([^>]*)>", p)
        ]
        pushed = sum(
            1 for f in re.findall(r"PushedFilters: \[([^\]]*)\]", p) if f.strip()
        )
        print(
            f"| {name} | {ex} | {joins} | {py} | "
            f"{'+'.join(map(str, scans)) or '-'} | {pushed} scans |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
