from sales_etl_spark.sources.readers import (
    read_csv,
    read_parquet,
    read_sales_csv,
    read_customers_csv,
    validate_columns,
)
from sales_etl_spark.sources.star import StarSchema, load_star

__all__ = [
    "read_csv",
    "read_parquet",
    "read_sales_csv",
    "read_customers_csv",
    "validate_columns",
    "StarSchema",
    "load_star",
]
