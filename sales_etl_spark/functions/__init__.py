from sales_etl_spark.functions.scalars import (
    EMAIL_PATTERN,
    email_valid,
    safe_div,
    month_str,
    period_date,
    days_since,
)

__all__ = [
    "EMAIL_PATTERN",
    "email_valid",
    "safe_div",
    "month_str",
    "period_date",
    "days_since",
]
