"""Integration tier for the ``python -m sales_etl_spark`` entry point
(reference main.py:61-96: extract -> transform -> report -> load, with
the sys.exit(1) failure boundary)."""

from __future__ import annotations

from sales_etl_spark.__main__ import main

SALES_CSV = """order_id,customer_id,product_id,product_name,quantity,unit_price,order_date,category
1,c1,p1,Widget,2,10.50,2024-01-05,Tools
2,c1,p2,Gadget,1,99.99,2024-02-10,Toys
3,c2,p1,Widget,5,10.50,2024-02-11,
4,c3,p3,Sprocket,3,7.25,not-a-date,Tools
"""

CUSTOMERS_CSV = """customer_id,customer_name,email,registration_date,region
c1,Alice,alice@example.com,2023-05-01,North
c2,Bob,bob@bad,2023-06-01,
c3,Cara,cara@example.com,2023-07-01,South
"""


def test_cli_end_to_end_parquet_sink(spark, tmp_path):
    (tmp_path / "sales.csv").write_text(SALES_CSV)
    (tmp_path / "customers.csv").write_text(CUSTOMERS_CSV)
    out = tmp_path / "lake"
    rc = main(
        [
            "--sales", str(tmp_path / "sales.csv"),
            "--customers", str(tmp_path / "customers.csv"),
            "--snapshot-date", "2024-03-01",
            "--top-n", "2",
            "--output-dir", str(out),
        ]
    )
    assert rc == 0
    # row 4's bad date is dropped (null critical field); 3 sales rows
    assert spark.read.parquet(str(out / "sales")).count() == 3
    assert spark.read.parquet(str(out / "customers")).count() == 3
    assert spark.read.parquet(str(out / "product_ranking")).count() == 2
    cats = {
        r["category"]
        for r in spark.read.parquet(str(out / "sales")).collect()
    }
    assert "Unknown" in cats  # null category filled


def test_cli_missing_input_exits_nonzero(tmp_path):
    rc = main(
        [
            "--sales", str(tmp_path / "absent.csv"),
            "--customers", str(tmp_path / "absent2.csv"),
            "--output-dir", str(tmp_path / "lake"),
        ]
    )
    assert rc == 1


def test_cli_list_queries(capsys):
    from sales_etl_spark.__main__ import main

    assert main(["--list-queries"]) == 0
    out = capsys.readouterr().out
    assert "agg_sales_summary" in out and "[oracle]" in out


def test_cli_run_query_to_parquet(spark, tmp_path):
    from sales_etl_spark.__main__ import main

    rc = main([
        "--query", "agg_stats",
        "--sf-dir", "/root/testdata/sf0.001",
        "--output-dir", str(tmp_path),
    ])
    assert rc == 0
    got = spark.read.parquet(str(tmp_path / "agg_stats"))
    assert got.count() == 5


def test_cli_rejects_unknown_query_and_missing_args():
    from sales_etl_spark.__main__ import main

    assert main(["--query", "no_such_query", "--sf-dir", "/tmp"]) == 1
    assert main(["--query", "agg_stats"]) == 1          # no --sf-dir
    assert main(["--sales", "x.csv"]) == 1              # incomplete ETL mode


def test_cli_end_to_end_lake_sink(spark, tmp_path):
    """The full ETL committing marts as transaction-log tables: a
    rerun produces version 1 of each table with version 0 still
    time-travel readable."""
    from sales_etl_spark import lake

    (tmp_path / "sales.csv").write_text(SALES_CSV)
    (tmp_path / "customers.csv").write_text(CUSTOMERS_CSV)
    out = tmp_path / "laketbls"
    argv = [
        "--sales", str(tmp_path / "sales.csv"),
        "--customers", str(tmp_path / "customers.csv"),
        "--snapshot-date", "2024-03-01",
        "--lake-dir", str(out),
    ]
    assert main(argv) == 0
    assert main(argv) == 0  # rerun commits a second version
    t = str(out / "sales")
    assert lake.versions(t) == [0, 1]
    assert lake.read_table(spark, t).count() == 3
    assert lake.read_table(spark, t, 0).count() == 3


def test_cli_explain_prints_plan(capsys):
    from sales_etl_spark.__main__ import main

    rc = main([
        "--query", "agg_histogram",
        "--sf-dir", "/root/testdata/sf0.001",
        "--explain",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "== Physical Plan ==" in out
    assert "HashAggregate" in out


def test_cli_lake_compact(spark, tmp_path, caplog):
    from sales_etl_spark import lake
    from sales_etl_spark.__main__ import main

    t = str(tmp_path / "tbl")
    for i in range(3):
        lake.commit_write(
            spark.createDataFrame([(i,)], "k long"), t, "append"
        )
    rc = main(["--lake-compact", t, "--target-files", "1"])
    assert rc == 0
    assert lake.versions(t) == [0, 1, 2, 3]
    got = sorted(r.k for r in lake.read_table(spark, t).collect())
    assert got == [0, 1, 2]


def test_cli_sql_mode(capsys):
    from sales_etl_spark.__main__ import main

    rc = main([
        "--sql",
        "SELECT r_name FROM region ORDER BY r_name LIMIT 2",
        "--sf-dir", "/root/testdata/sf0.001",
    ])
    out = capsys.readouterr().out
    assert rc == 0
    assert "AFRICA" in out


def test_cli_sql_requires_sf_dir():
    from sales_etl_spark.__main__ import main

    assert main(["--sql", "SELECT 1"]) == 1


def test_cli_lake_delete(spark, tmp_path):
    from sales_etl_spark import lake
    from sales_etl_spark.__main__ import main

    t = str(tmp_path / "tbl")
    lake.commit_write(
        spark.createDataFrame([(1, "a"), (2, "b"), (3, "a")],
                              "k long, v string"), t
    )
    rc = main(["--lake-delete", t, "--where", "v = 'a'"])
    assert rc == 0
    assert sorted(r.k for r in lake.read_table(spark, t).collect()) == [2]
    # predicate with no matches: exit 0, no new version
    head = lake.versions(t)[-1]
    rc = main(["--lake-delete", t, "--where", "v = 'zzz'"])
    assert rc == 0
    assert lake.versions(t)[-1] == head
    # missing --where is an error
    assert main(["--lake-delete", t]) == 1


def test_cli_lake_vacuum(spark, tmp_path):
    from sales_etl_spark import lake
    from sales_etl_spark.__main__ import main

    t = str(tmp_path / "tbl")
    lake.commit_write(spark.createDataFrame([(1,)], "k long"), t)
    lake.commit_write(
        spark.createDataFrame([(9,)], "k long"), t, "overwrite"
    )
    rc = main(["--lake-vacuum", t, "--keep-versions", "1"])
    assert rc == 0
    # the overwritten v0 file is gone; the live snapshot still reads
    assert [r.k for r in lake.read_table(spark, t).collect()] == [9]
    assert lake.versions(t) == [1]
    # a bad path is an error exit, not a traceback
    assert main(["--lake-vacuum", str(tmp_path / "nope")]) == 1
