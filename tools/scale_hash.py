"""Canonical result hashes for every oracle-backed query at one
parallelism level — the building block of the cross-scale determinism
sweep (SCALE.md: results must be bit-exact under local[4]/8/16/32).

Prints one JSON line {query: sha256-of-sorted-rows}. Run twice with
different masters and diff: any query whose hash differs is
partitioning-dependent (an order-dependent float sum, a keep-one
without a total-order tiebreaker, ...).

Usage: python tools/scale_hash.py local[4] [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def row_key(row) -> str:
    # repr round-trips floats exactly (shortest-exact in py3), so two
    # bit-identical results hash identically and any ULP drift shows.
    return repr(tuple(row))


def main() -> None:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[4]"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from sales_etl_spark.plans import QUERY_REGISTRY
    from sales_etl_spark.session import get_spark

    # shuffle_partitions intentionally varies with the master's
    # parallelism: determinism must hold across BOTH axes.
    cpus = master.split("[")[1].rstrip("]")
    sp = 2 * int(cpus) if cpus.isdigit() else 8
    spark = get_spark("scale-sweep", master=master, shuffle_partitions=sp)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, str] = {}
    for name, qd in QUERY_REGISTRY.items():
        if qd.oracle is None:
            continue
        rows = qd.builder(spark, sf_dir).collect()
        h = hashlib.sha256()
        for key in sorted(row_key(r) for r in rows):
            h.update(key.encode())
            h.update(b"\n")
        out[name] = h.hexdigest()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
