"""Sink tier: parquet round-trip, partitioned overwrite, sink casts,
upsert compaction (reference etl/load.py semantics, Spark-native)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Row

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sales_etl_spark.load import cast_for_sink, write_parquet  # noqa: E402
from sales_etl_spark.operators.upsert import upsert_last_wins  # noqa: E402


def test_parquet_roundtrip_preserves_rows(spark, tmp_path):
    df = spark.range(100).withColumnRenamed("id", "k")
    path = str(tmp_path / "t")
    write_parquet(df, path)
    back = spark.read.parquet(path)
    assert back.count() == 100
    assert set(r.k for r in back.collect()) == set(range(100))


def test_partitioned_overwrite_only_touches_partitions(spark, tmp_path):
    path = str(tmp_path / "p")
    df = spark.createDataFrame(
        [Row(month="2024-01", v=1), Row(month="2024-02", v=2)]
    )
    write_parquet(df, path, partition_by=["month"])
    dirs = {p.name for p in Path(path).iterdir() if p.is_dir()}
    assert dirs == {"month=2024-01", "month=2024-02"}
    back = spark.read.parquet(path)
    assert back.count() == 2


def test_cast_for_sink_types(spark):
    df = spark.createDataFrame([Row(a="1", b="2.5", c="2024-01-15")])
    out = cast_for_sink(df, {"a": "int", "b": "double", "c": "date"})
    assert dict(out.dtypes) == {"a": "int", "b": "double", "c": "date"}
    row = out.collect()[0]
    assert (row.a, row.b, str(row.c)) == (1, 2.5, "2024-01-15")


def test_upsert_last_wins_keeps_latest_per_key(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", v=1, version=1),
            Row(k="a", v=2, version=3),
            Row(k="a", v=3, version=2),
            Row(k="b", v=9, version=1),
        ]
    )
    out = upsert_last_wins(df, keys=["k"], order_by=["version"])
    got = {r.k: r.v for r in out.collect()}
    assert got == {"a": 2, "b": 9}
