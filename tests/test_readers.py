"""Source-validation tier: the reference's fail-fast contract
(etl/extract.py:53-61 — missing columns raise with the exact list)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from sales_etl_spark.sources.readers import (
    MissingColumnsError,
    read_csv,
    validate_columns,
)


def test_validate_columns_passes_when_present(spark):
    df = spark.range(3).selectExpr("id", "id * 2 AS v")
    assert validate_columns(df, ["id", "v"]) is df


def test_validate_columns_raises_with_exact_missing_list(spark):
    df = spark.range(3).selectExpr("id")
    with pytest.raises(MissingColumnsError) as e:
        validate_columns(df, ["id", "a", "b"], source="t")
    assert sorted(e.value.missing) == ["a", "b"]
    assert "t" in str(e.value)


def test_read_csv_coerces_bad_dates_to_null(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,d\n1,2024-01-05\n2,not-a-date\n3,\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("d", T.StringType()),
        ]
    )
    df = read_csv(
        spark, str(p), schema, required=["id", "d"], date_columns=["d"]
    )
    rows = {r.id: r.d for r in df.collect()}
    assert rows[1] is not None
    assert rows[2] is None and rows[3] is None  # errors="coerce" parity


def test_read_csv_missing_file_raises_typed(spark, tmp_path):
    from sales_etl_spark.sources.readers import SourceNotFoundError

    schema = T.StructType([T.StructField("id", T.LongType())])
    with pytest.raises(SourceNotFoundError):
        read_csv(spark, str(tmp_path / "nope.csv"), schema)


def test_read_csv_empty_file_raises_typed(spark, tmp_path):
    from sales_etl_spark.sources.readers import EmptySourceError

    p = tmp_path / "empty.csv"
    p.write_text("")
    schema = T.StructType([T.StructField("id", T.LongType())])
    with pytest.raises(EmptySourceError):
        read_csv(spark, str(p), schema)


def test_read_csv_garbage_rows_raise_typed(spark, tmp_path):
    from sales_etl_spark.sources.readers import SourceParseError

    p = tmp_path / "garbage.csv"
    p.write_text("id,v\nnot-a-number,xyz\n")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.LongType()),
        ]
    )
    with pytest.raises(SourceParseError):
        read_csv(spark, str(p), schema)
    # header-only file parses to 0 rows (pandas parity: only a
    # zero-byte file is the EmptyDataError case)
    p2 = tmp_path / "header_only.csv"
    p2.write_text("id,v\n")
    assert read_csv(spark, str(p2), schema).count() == 0
