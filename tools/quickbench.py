"""Ad-hoc timing harness for tuning sessions: calibrates like bench.py,
then times the named queries (min/median of N) under optional conf
overrides. Not part of the driver protocol — bench.py is.

Usage:
    python tools/quickbench.py q1 q2 ...            # default 3 runs
    RUNS=5 CONF="spark.sql.files.maxPartitionBytes=4m;..." \
        python tools/quickbench.py q1 q2
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1:]
    runs = int(os.environ.get("RUNS", "3"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from sales_etl_spark.plans import QUERY_REGISTRY
    from sales_etl_spark.session import get_spark

    spark = get_spark("quickbench", master="local[32]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for kv in filter(None, os.environ.get("CONF", "").split(";")):
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in ("lineitem", "orders", "customer", "nation", "region",
              "part", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    cal = bench.calibrate(spark)

    out: dict[str, dict] = {}
    for name in names or bench.HEADLINE:
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            QUERY_REGISTRY[name].builder(spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        ts.sort()
        out[name] = {"min": ts[0], "med": ts[len(ts) // 2]}
        spark.catalog.clearCache()
    print(json.dumps({"calibration": cal, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
