"""Oracle tier: every registered query vs its DuckDB twin at sf0.001.

This is the local mirror of the driver's t2 gate (CORRECTNESS_r{N});
bit-exact is required — tolerance-close is a failure here because the
driver hashes values.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracle import compare, duckdb_conn  # noqa: E402

from sales_etl_spark.plans import QUERY_REGISTRY  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERY_REGISTRY))
def test_query_matches_oracle(spark, oracle_con, name):
    qd = QUERY_REGISTRY[name]
    sdf = qd.builder(spark, SF_DIR).toPandas()
    if qd.oracle is None:
        # rows-only contract: runs, returns a stable schema
        assert sdf is not None
        return
    odf = oracle_con.execute(qd.oracle).fetchdf()
    res = compare(sdf, odf)
    assert res["rows_match"], res
    assert res["schema_match"], res
    assert res["values_exact"], {
        k: res.get(k) for k in ("bad_cols", "sample_diff")
    }
