"""Accuracy contracts for approximate operators + physical-layout
evidence (partition pruning) that SCALE.md claims."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sales_etl_spark.plans import QUERY_REGISTRY

SF = "/root/testdata/sf0.001"


def test_approx_distinct_within_rsd(spark):
    approx = {
        r.category: r.approx_customers
        for r in QUERY_REGISTRY["agg_approx_distinct"]
        .builder(spark, SF)
        .collect()
    }
    exact = {
        r.category: r.n
        for r in spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.col("o_orderpriority").alias("category"))
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for cat, n in exact.items():
        assert abs(approx[cat] - n) <= max(3, 0.06 * n), (cat, approx[cat], n)


def test_date_partitioned_write_prunes_at_scan(spark, tmp_path):
    """Partition pruning end-to-end: write orders partitioned by year,
    filter on the partition column, and assert the scan's
    PartitionFilters carries the predicate (at 100 TB this is the
    difference between reading one partition and the whole table)."""
    out = str(tmp_path / "orders_by_year")
    orders = spark.read.parquet(f"{SF}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("order_year").parquet(out)

    df = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "order_year" in m.group(1), plan
    # and the pruned read agrees with the unpruned filter
    assert df.count() == orders.filter(F.col("order_year") == 1997).count()


def test_variant_extraction_nulls_malformed_and_missing(spark):
    """The VARIANT path (events_variant_agg's kernel): parse_json +
    try_variant_get must null out missing paths and wrong-typed
    values rather than fail the job; unparseable JSON must not
    propagate an error through try_parse_json."""
    df = spark.createDataFrame(
        [
            (1, '{"k": 7}'),
            (2, '{"k": "not-an-int"}'),
            (3, '{"other": 1}'),
            (4, "not json at all"),
            (5, None),
        ],
        "id long, props string",
    )
    out = {
        r.id: r.k
        for r in df.select(
            "id",
            F.try_variant_get(
                F.try_parse_json(F.col("props")), "$.k", "long"
            ).alias("k"),
        ).collect()
    }
    assert out == {1: 7, 2: None, 3: None, 4: None, 5: None}


def test_backfill_rewrites_only_affected_partitions(spark, tmp_path):
    """Dynamic partition overwrite: the correction's months are
    rewritten, every other month directory keeps its PHYSICAL files
    (same names — a rewrite would mint new uuids), and the patched
    table equals a full rebuild."""
    from pathlib import Path

    from sales_etl_spark.load import write_parquet

    out = str(tmp_path / "mart")
    base = spark.createDataFrame(
        [(f"2024-{m:02d}", m, float(m * 100)) for m in range(1, 13)],
        "order_month string, n_orders long, revenue double",
    )
    write_parquet(base, out, partition_by=["order_month"])

    def listing(month):
        d = Path(out) / f"order_month={month}"
        return sorted(p.name for p in d.glob("*.parquet"))

    before = {f"2024-{m:02d}": listing(f"2024-{m:02d}")
              for m in range(1, 13)}
    assert all(before.values())

    fix = spark.createDataFrame(
        [("2024-03", 3, 999.0), ("2024-07", 7, 777.0)],
        "order_month string, n_orders long, revenue double",
    )
    write_parquet(
        fix, out, mode="overwrite",
        partition_by=["order_month"], dynamic_partition_overwrite=True,
    )
    for m in range(1, 13):
        key = f"2024-{m:02d}"
        if m in (3, 7):
            assert listing(key) != before[key]  # rewritten
        else:
            assert listing(key) == before[key]  # physically untouched
    got = {
        r.order_month: r.revenue
        for r in spark.read.parquet(out).collect()
    }
    assert got["2024-03"] == 999.0 and got["2024-07"] == 777.0
    assert got["2024-05"] == 500.0 and len(got) == 12
