"""Typed, validated source readers (reference ``etl/extract.py`` parity).

Mirrors the reference's contract — read, parse dates null-on-error,
fail fast with the exact list of missing columns (``etl/extract.py:
33-64``) — but schema-first: explicit ``StructType`` means the reader
never runs an inference scan, and column pruning / predicate pushdown
reach the scan untouched.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sales_etl_spark import schemas


class MissingColumnsError(ValueError):
    """Raised when a source lacks required columns (extract.py:53-61)."""

    def __init__(self, source: str, missing: list[str]):
        self.source = source
        self.missing = missing
        super().__init__(
            f"{source}: missing required columns: {', '.join(sorted(missing))}"
        )


def validate_columns(df: DataFrame, required: Iterable[str], source: str = "input") -> DataFrame:
    """Fail fast (driver-side, before any job) if columns are missing."""
    missing = [c for c in required if c not in df.columns]
    if missing:
        raise MissingColumnsError(source, missing)
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: Iterable[str] | None = None,
    date_columns: Iterable[str] = (),
) -> DataFrame:
    """CSV scan with explicit schema + null-on-error date parsing.

    ``date_columns`` are read as strings and parsed with ``try_to_date``
    so malformed values become NULL instead of failing the scan — the
    reference's ``errors="coerce"`` semantics, but ANSI-safe.
    """
    df = spark.read.csv(path, header=True, schema=schema, mode="PERMISSIVE")
    if required:
        validate_columns(df, required, source=path)
    for col in date_columns:
        df = df.withColumn(col, F.try_to_date(F.col(col)))
    return df


def read_sales_csv(spark: SparkSession, path: str) -> DataFrame:
    """Sales fact reader (reference ``etl/extract.py:67-73``)."""
    return read_csv(
        spark,
        path,
        schema=schemas.SALES_CSV,
        required=schemas.SALES_REQUIRED,
        date_columns=("order_date",),
    )


def read_customers_csv(spark: SparkSession, path: str) -> DataFrame:
    """Customers dim reader (reference ``etl/extract.py:76-82``)."""
    return read_csv(
        spark,
        path,
        schema=schemas.CUSTOMERS_CSV,
        required=schemas.CUSTOMERS_REQUIRED,
        date_columns=("registration_date",),
    )


def read_parquet(
    spark: SparkSession,
    path: str,
    required: Iterable[str] | None = None,
) -> DataFrame:
    """Parquet scan; schema travels with the data, structure still validated."""
    df = spark.read.parquet(path)
    if required:
        validate_columns(df, required, source=path)
    return df
