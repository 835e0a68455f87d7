from sales_etl_spark.operators.cleaning import (
    drop_null_required,
    fill_defaults,
    dedup_keep_first,
)
from sales_etl_spark.operators.aggregates import (
    sales_summary,
    order_totals,
    avg_check_by_region,
    product_ranking,
)
from sales_etl_spark.operators.upsert import upsert_last_wins

__all__ = [
    "drop_null_required",
    "fill_defaults",
    "dedup_keep_first",
    "sales_summary",
    "order_totals",
    "avg_check_by_region",
    "product_ranking",
    "upsert_last_wins",
]
