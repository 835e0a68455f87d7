"""End-to-end pipeline integration on real driver testdata: star views
→ reference-shaped inputs → run_pipeline → parquet marts → read-back.
(The unit tier runs the same pipeline on the reference's inline
fixtures; this tier proves the composition at data scale, including
the observe() metrics and the cache fan-out.)"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sales_etl_spark.load import write_parquet
from sales_etl_spark.pipeline import run_pipeline
from sales_etl_spark.sources.star import load_star

SF = "/root/testdata/sf0.001"


def test_run_pipeline_on_star_testdata(spark, tmp_path):
    st = load_star(spark, SF)
    sales_raw = st.sales().withColumn(
        "product_name", F.concat(F.lit("part-"), F.col("product_id"))
    )
    customers_raw = st.customers().select(
        "customer_id",
        "customer_name",
        # deterministic synthetic email/registration (reference columns
        # the star schema lacks)
        F.when(
            F.col("customer_id") % 2 == 0,
            F.concat(F.lit("c"), F.col("customer_id"), F.lit("@example.com")),
        ).alias("email"),
        F.lit("2020-06-01").cast("date").alias("registration_date"),
        "region",
    )

    result = run_pipeline(
        spark,
        sales_raw,
        customers_raw,
        snapshot_date=dt.date(2026, 1, 1),
        top_n=5,
    )
    try:
        # write every mart like the reference's LOAD stage, read back
        marts = {
            "sales_summary": result.sales_summary,
            "product_ranking": result.product_ranking,
            "avg_check_by_region": result.avg_check_by_region,
            "customers": result.customers,
        }
        for name, df in marts.items():
            write_parquet(df, str(tmp_path / name))
        back = {
            name: spark.read.parquet(str(tmp_path / name)).count()
            for name in marts
        }
        assert back["product_ranking"] == 5
        assert back["sales_summary"] > 0
        assert 1 <= back["avg_check_by_region"] <= 6  # 5 regions + Unknown
        assert back["customers"] == 150

        # observe() metrics came along for free with the first actions
        assert result.observations["sales"].get["rows"] > 0
        assert result.observations["customers"].get["rows"] == 150

        # cleaning invariants on real data
        cust = spark.read.parquet(str(tmp_path / "customers"))
        assert cust.filter(F.col("region").isNull()).count() == 0
        assert cust.filter(
            F.col("is_email_valid") & F.col("email").isNull()
        ).count() == 0
        # pinned snapshot: registration 2020-06-01 → 2026-01-01
        days = cust.select("customer_days").distinct().collect()
        assert [r.customer_days for r in days] == [2040]
    finally:
        result.unpersist()
