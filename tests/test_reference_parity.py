"""Unit tier mirroring the reference's test suite (SURVEY.md §5.1).

Same four scenarios as /root/reference/tests/test_transform.py —
dedup+enrich, email+customer_days, summary aggregation, top-N ranking
— plus the avg-check-by-region join case the reference never tested
(SURVEY.md §5.1 'zero test coverage' note). Fixtures keep the
reference's shapes: Unicode names, exact duplicate pairs, null keys,
unparseable dates, multi-line orders.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from sales_etl_spark.pipeline import (
    create_avg_check_by_region,
    create_product_ranking,
    create_sales_summary,
    run_pipeline,
    transform_customers,
    transform_sales,
)

SNAPSHOT = dt.date(2024, 2, 1)


@pytest.fixture()
def sales_raw(spark):
    # Mirrors tests/test_transform.py:12-55: one exact duplicate pair,
    # one null customer_id, one null category, one bad date, one
    # multi-line order.
    rows = [
        # duplicate pair (order 1, product P1) — one must survive
        Row(order_id=1, customer_id="CUST001", product_id="P1",
            product_name="Ноутбук", quantity=2, unit_price=100.0,
            order_date="2024-01-15", category="Электроника"),
        Row(order_id=1, customer_id="CUST001", product_id="P1",
            product_name="Ноутбук", quantity=2, unit_price=100.0,
            order_date="2024-01-15", category="Электроника"),
        # multi-line order 1, second product, null category → Unknown
        Row(order_id=1, customer_id="CUST001", product_id="P2",
            product_name="Мышь", quantity=1, unit_price=50.0,
            order_date="2024-01-15", category=None),
        # null customer_id → dropped
        Row(order_id=2, customer_id=None, product_id="P3",
            product_name="Клавиатура", quantity=1, unit_price=70.0,
            order_date="2024-01-16", category="Электроника"),
        # unparseable date → null → dropped
        Row(order_id=3, customer_id="CUST002", product_id="P1",
            product_name="Ноутбук", quantity=1, unit_price=100.0,
            order_date="not-a-date", category="Электроника"),
        # clean row, different month
        Row(order_id=4, customer_id="CUST002", product_id="P3",
            product_name="Клавиатура", quantity=3, unit_price=70.0,
            order_date="2024-02-10", category="Аксессуары"),
    ]
    return spark.createDataFrame(rows)


def test_transform_sales_deduplicates_and_enriches(sales_raw):
    out = transform_sales(sales_raw).orderBy("order_id", "product_id")
    rows = out.collect()
    # 6 in → dedup removes 1 → null customer dropped → bad date dropped = 3
    assert len(rows) == 3
    by_key = {(r.order_id, r.product_id): r for r in rows}
    assert float(by_key[(1, "P1")].total_price) == 200.0
    assert by_key[(1, "P1")].month == "2024-01"
    assert by_key[(1, "P2")].category == "Unknown"
    assert by_key[(4, "P3")].month == "2024-02"


def test_transform_customers_validates_email_and_computes_days(spark):
    rows = [
        Row(customer_id="CUST001", customer_name="Иван",
            email="ivan@example.com", registration_date="2024-01-01",
            region="Москва"),
        Row(customer_id="CUST002", customer_name="Анна",
            email="invalid-email", registration_date="2023-12-01",
            region=None),
        Row(customer_id=None, customer_name="Ghost", email=None,
            registration_date=None, region=None),
    ]
    out = transform_customers(spark.createDataFrame(rows), SNAPSHOT)
    got = {r.customer_id: r for r in out.collect()}
    assert set(got) == {"CUST001", "CUST002"}  # null key dropped
    assert got["CUST001"].is_email_valid is True
    assert got["CUST001"].customer_days == 31  # 2024-01-01 → 2024-02-01
    assert got["CUST002"].is_email_valid is False
    assert got["CUST002"].region == "Unknown"


def test_create_sales_summary_aggregates_correctly(sales_raw):
    out = create_sales_summary(transform_sales(sales_raw))
    got = {(r.category, r.month): r for r in out.collect()}
    jan = got[("Электроника", "2024-01")]
    # order 1 line P1 only: 2×100 = 200; one distinct order → AOV 200
    assert jan.total_sales == 200.0
    assert jan.total_quantity == 2.0
    assert jan.average_order_value == 200.0
    assert jan.period_date == dt.date(2024, 1, 1)
    unk = got[("Unknown", "2024-01")]
    assert unk.total_sales == 50.0
    feb = got[("Аксессуары", "2024-02")]
    assert feb.total_sales == 210.0


def test_create_product_ranking_limits_top_n(sales_raw):
    out = create_product_ranking(transform_sales(sales_raw), top_n=2)
    rows = out.collect()
    assert len(rows) == 2
    assert [r.rank_position for r in rows] == [1, 2]
    # P3: qty 3 beats P1: qty 2 beats P2: qty 1
    assert rows[0].product_id == "P3"
    assert rows[0].total_sold == 3.0
    assert rows[1].product_id == "P1"


def test_create_avg_check_by_region_joins_and_fills_unknown(spark, sales_raw):
    customers = spark.createDataFrame(
        [
            Row(customer_id="CUST001", customer_name="Иван",
                email="ivan@example.com", registration_date="2024-01-01",
                region="Москва"),
            # CUST002 intentionally missing → region Unknown via left join
        ]
    )
    sales = transform_sales(sales_raw)
    out = create_avg_check_by_region(
        sales, transform_customers(customers, SNAPSHOT)
    )
    got = {r.region: r for r in out.collect()}
    # CUST001: order 1 = 200 + 50 = 250; CUST002: order 4 = 210
    assert got["Москва"].avg_check == 250.0
    assert got["Москва"].orders_count == 1
    assert got["Unknown"].avg_check == 210.0
    # sorted desc by avg_check
    assert [r.region for r in out.collect()] == ["Москва", "Unknown"]


def test_run_pipeline_composes_and_observes(spark, sales_raw):
    customers = spark.createDataFrame(
        [
            Row(customer_id="CUST001", customer_name="Иван",
                email="ivan@example.com", registration_date="2024-01-01",
                region="Москва"),
        ]
    )
    result = run_pipeline(spark, sales_raw, customers, SNAPSHOT, top_n=5)
    assert result.sales_summary.count() == 3
    assert result.product_ranking.count() == 3
    assert result.avg_check_by_region.count() == 2
    # observe() metrics materialize with the actions above — no extra jobs
    assert result.observations["sales"].get["rows"] == 3
    result.unpersist()
