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

from tools.check_oracle import (  # noqa: E402
    compare,
    duckdb_conn,
    oracle_dtype_offenders,
)

from sales_etl_spark.plans import QUERY_REGISTRY  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb_conn(SF_DIR)
    yield con
    con.close()


def test_no_engine_variant_output_dtypes(spark):
    """Registry-wide dtype hygiene: no query may EXPOSE a DecimalType
    column — it round-trips differently per engine (Spark toPandas ->
    float64 vs DuckDB -> decimal.Decimal), so a stringify-then-hash
    comparator diverges even when values are bit-equal. Decimals stay
    INTERNAL (exact sums) and cast to bigint/double at the output
    boundary — the r5 verdict root-caused flagship_big_orders' red
    driver row to exactly this. TimestampType event-time columns are
    NOT flagged: both engines surface them as datetime64[us] through
    pandas, and the five queries exposing them have been driver
    hash-green since r1. Schema-only (analysis, no execution), so the
    whole registry checks in a couple of minutes.
    """
    from pyspark.sql.types import DecimalType

    offenders = {}
    for name in sorted(QUERY_REGISTRY):
        schema = QUERY_REGISTRY[name].builder(spark, SF_DIR).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, DecimalType)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "engine-variant output dtypes (cast to bigint/double or "
        f"timestamp_ntz at the boundary): {offenders}"
    )


def test_no_engine_variant_oracle_dtypes(oracle_con):
    """Oracle-side mirror of the Spark DecimalType guard above: no
    oracle may DECLARE a HUGEINT/UHUGEINT/DECIMAL output column.
    DuckDB widens SUM over INTEGER to HUGEINT, which fetchdf()
    surfaces as object/Decimal — the driver's value-hash then reds a
    result whose VALUES are bit-identical to Spark's int64 (r6's only
    two failures, quality_expectations{,_long}). Oracles cast such
    columns to BIGINT/DOUBLE at the output boundary. Schema-only
    (DESCRIBE, no execution), so the whole registry checks in
    seconds."""
    offenders = {}
    for name in sorted(QUERY_REGISTRY):
        oracle = QUERY_REGISTRY[name].oracle
        if oracle is None:
            continue
        bad = oracle_dtype_offenders(oracle_con, oracle)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle output dtypes that diverge at the driver hash "
        f"(CAST to BIGINT/DOUBLE in the oracle SQL): {offenders}"
    )


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
