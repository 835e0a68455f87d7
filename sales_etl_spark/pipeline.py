"""Reference-parity ETL pipeline (erxaan/sales-etl ``etl/transform.py``
and ``main.py``, re-expressed lazily).

These functions operate on DataFrames with the reference's own column
names (sales: order_id/customer_id/product_id/product_name/quantity/
unit_price/order_date/category; customers: customer_id/customer_name/
email/registration_date/region), so the reference's unit-test fixtures
(tests/test_transform.py) port 1:1. The star-schema query registry
(plans/core.py) exercises the same operators on the driver testdata.

Execution-model differences from the reference, by design:

- lazy composition: nothing runs until a sink/action; the cleaned
  sales frame is cached by run_pipeline because three marts fan out
  from it (reference main.py:73-75 recomputes nothing only because
  pandas is eager — Spark must cache or re-scan three times);
- data-quality counts ride on ``df.observe`` accumulators, not extra
  count() jobs (reference logs len(df) at every step, transform.py:16+);
- ``snapshot_date`` is a required parameter (reference defaults to
  wall-clock today, transform.py:93 — nondeterministic at scale).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from sales_etl_spark.functions.scalars import (
    days_since,
    email_valid,
    month_str,
)
from sales_etl_spark.operators.aggregates import (
    avg_check_by_region,
    product_ranking,
    sales_summary,
)
from sales_etl_spark.operators.cleaning import (
    dedup_keep_first,
    drop_null_required,
    fill_defaults,
)
from sales_etl_spark.schemas import MONEY

SALES_REQUIRED_NONNULL = (
    "order_id",
    "customer_id",
    "order_date",
    "quantity",
    "unit_price",
)
DEDUP_SUBSET = ("order_id", "product_id", "quantity", "unit_price")


def transform_sales(sales: DataFrame, line_order: str | None = None) -> DataFrame:
    """Clean + enrich the sales fact (reference transform_sales,
    etl/transform.py:14-52):

    1. null-on-error date coercion (upstream reader already did it for
       CSV; re-coerce defensively when fed raw strings);
    2. dedup on (order_id, product_id, quantity, unit_price) — with a
       deterministic keep-first when ``line_order`` names an ordering
       column, else arbitrary-row (duplicates are exact copies);
    3. drop rows with nulls in critical fields;
    4. category → 'Unknown';
    5. derive total_price (DECIMAL) and month ('YYYY-MM').
    """
    df = sales
    if dict(df.dtypes).get("order_date") == "string":
        df = df.withColumn("order_date", F.try_to_date("order_date"))
    df = dedup_keep_first(
        df,
        subset=list(DEDUP_SUBSET),
        order_by=[line_order] if line_order else None,
    )
    df = drop_null_required(df, SALES_REQUIRED_NONNULL)
    df = fill_defaults(df, {"category": "Unknown"})
    return df.withColumn(
        "total_price", (F.col("quantity") * F.col("unit_price")).cast(MONEY)
    ).withColumn("month", month_str("order_date"))


def transform_customers(
    customers: DataFrame, snapshot_date: dt.date
) -> DataFrame:
    """Clean + enrich the customers dim (reference transform_customers,
    etl/transform.py:55-97): drop null keys, validate email (NULL →
    False), fill region 'Unknown', compute customer_days against the
    pinned snapshot."""
    df = customers
    if dict(df.dtypes).get("registration_date") == "string":
        df = df.withColumn(
            "registration_date", F.try_to_date("registration_date")
        )
    df = drop_null_required(df, ["customer_id"])
    df = df.withColumn("is_email_valid", email_valid("email"))
    df = fill_defaults(df, {"region": "Unknown"})
    return df.withColumn(
        "customer_days",
        days_since("registration_date", F.lit(snapshot_date)),
    )


# The three marts are the operator-module functions — re-exported here
# under the reference's names so the pipeline reads like main.py:71-75.
create_sales_summary = sales_summary
create_product_ranking = product_ranking
create_avg_check_by_region = avg_check_by_region


@dataclass
class PipelineResult:
    sales: DataFrame
    customers: DataFrame
    sales_summary: DataFrame
    product_ranking: DataFrame
    avg_check_by_region: DataFrame
    observations: dict[str, Observation]

    def unpersist(self) -> None:
        self.sales.unpersist()


def run_pipeline(
    spark: SparkSession,
    sales_raw: DataFrame,
    customers_raw: DataFrame,
    snapshot_date: dt.date,
    top_n: int = 5,
) -> PipelineResult:
    """Compose the full reference dataflow (main.py:61-93) lazily.

    The cleaned sales frame feeds three marts, so it is cached; row
    counts are attached as ``observe`` metrics (collected for free on
    the first action over each frame, zero extra jobs — the Spark
    answer to the reference's per-step len() logging)."""
    obs_sales = Observation("sales_clean")
    obs_cust = Observation("customers_clean")

    sales = transform_sales(sales_raw).observe(
        obs_sales, F.count(F.lit(1)).alias("rows")
    )
    sales = sales.cache()
    customers = transform_customers(customers_raw, snapshot_date).observe(
        obs_cust, F.count(F.lit(1)).alias("rows")
    )

    return PipelineResult(
        sales=sales,
        customers=customers,
        sales_summary=create_sales_summary(sales),
        product_ranking=create_product_ranking(sales, top_n=top_n),
        avg_check_by_region=create_avg_check_by_region(sales, customers),
        observations={"sales": obs_sales, "customers": obs_cust},
    )
