"""Typed, validated source readers (reference ``etl/extract.py`` parity).

Mirrors the reference's contract — read, parse dates null-on-error,
fail fast with the exact list of missing columns (``etl/extract.py:
33-64``) — but schema-first: explicit ``StructType`` means the reader
never runs an inference scan, and column pruning / predicate pushdown
reach the scan untouched.

Error taxonomy (reference ``etl/extract.py:41-51``, which distinguishes
FileNotFoundError / EmptyDataError / parse failure / missing columns):

- :class:`SourceNotFoundError` — the path does not exist (driver-side
  check for local paths, before any job);
- :class:`EmptySourceError` — the file exists but is zero bytes (the
  pandas ``EmptyDataError`` case; a header-only CSV reads as 0 rows,
  same as pandas);
- :class:`SourceParseError` — the leading rows do not parse under the
  declared schema (a bounded FAILFAST probe; the full scan stays
  PERMISSIVE/lazy, so gross corruption fails at the driver while a
  100 TB scan never pays an extra eager pass);
- :class:`MissingColumnsError` — required columns absent.
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from urllib.parse import urlparse

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


class SourceNotFoundError(FileNotFoundError):
    """Raised when the source path does not exist (extract.py:43-45)."""


class EmptySourceError(ValueError):
    """Raised when the source file is zero bytes (extract.py:46-48,
    pandas ``EmptyDataError`` parity)."""


class SourceParseError(ValueError):
    """Raised when leading rows fail to parse under the declared
    schema (extract.py:49-51)."""


def _check_local_source(path: str) -> None:
    """Driver-side existence/emptiness check for local paths; non-local
    URIs (s3://, hdfs://) defer to the filesystem at scan planning."""
    scheme = urlparse(path).scheme
    if scheme not in ("", "file"):
        return
    local = path[len("file:"):] if scheme == "file" else path
    # A glob defers to Spark's own listing (missing glob → empty scan).
    if any(ch in local for ch in "*?["):
        return
    if not os.path.exists(local):
        raise SourceNotFoundError(f"source not found: {path}")
    if os.path.isfile(local) and os.path.getsize(local) == 0:
        raise EmptySourceError(f"source is empty: {path}")


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
    probe_rows: int = 16,
) -> DataFrame:
    """CSV scan with explicit schema + null-on-error date parsing.

    ``date_columns`` are read as strings and parsed with ``try_to_date``
    so malformed values become NULL instead of failing the scan — the
    reference's ``errors="coerce"`` semantics, but ANSI-safe.

    ``probe_rows`` (default 16) FAILFAST-parses that many leading rows
    so a file that grossly violates the schema raises
    :class:`SourceParseError` at the driver instead of silently
    nulling every field; the limit pushes down, so only the first file
    split is touched. Pass 0 to skip (hot-path scans that can't afford
    the probe job).
    """
    _check_local_source(path)
    if probe_rows:
        try:
            spark.read.csv(
                path, header=True, schema=schema, mode="FAILFAST"
            ).limit(probe_rows).collect()
        except Exception as exc:
            raise SourceParseError(
                f"{path}: leading rows do not parse under the declared "
                f"schema: {exc}"
            ) from exc
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
    _check_local_source(path)
    df = spark.read.parquet(path)
    if required:
        validate_columns(df, required, source=path)
    return df
