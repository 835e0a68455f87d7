"""Sink tier: parquet round-trip, partitioned overwrite, sink casts,
upsert compaction (reference etl/load.py semantics, Spark-native)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import Row
from pyspark.sql import functions as F

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


def test_warehouse_ddl_bootstrap_and_truncate_reload(spark):
    from sales_etl_spark.load import (
        cast_for_sink,
        create_warehouse_tables,
        load_warehouse_table,
    )

    create_warehouse_tables(spark, database="wh_test")
    create_warehouse_tables(spark, database="wh_test")  # idempotent
    try:
        mart = spark.createDataFrame(
            [("1-URGENT", "2024-01", 10.5, 3.0, 5.25, "2024-01-01")],
            "category string, month string, total_sales double, "
            "total_quantity double, average_order_value double, "
            "period_date string",
        )
        typed = cast_for_sink(
            mart,
            {
                "total_sales": "decimal(15,2)",
                "average_order_value": "decimal(15,2)",
                "period_date": "date",
            },
        )
        load_warehouse_table(typed, "sales_summary", database="wh_test")
        load_warehouse_table(typed, "sales_summary", database="wh_test")
        out = spark.table("wh_test.sales_summary").collect()
        assert len(out) == 1  # reload replaced, not appended
        assert str(out[0].total_sales) == "10.50"  # DECIMAL at rest
        assert out[0].period_date.isoformat() == "2024-01-01"
    finally:
        spark.sql("DROP DATABASE IF EXISTS wh_test CASCADE")


def _derby_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.derby.jdbc.EmbeddedDriver"
        )
        return True
    except Exception:
        return False


def test_jdbc_roundtrip_append_truncate_upsert(spark, tmp_path):
    """Gated live-JDBC integration (reference etl/load.py:18-157):
    append, truncate-overwrite, and last-wins upsert against the
    embedded Derby engine Spark ships — skipped if the driver jar is
    absent (e.g. a trimmed deployment)."""
    import pytest

    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the classpath")
    from sales_etl_spark.load import jdbc_upsert, jdbc_write

    spark._jvm.java.lang.System.setProperty(
        "derby.system.home", str(tmp_path)
    )
    url = f"jdbc:derby:{tmp_path}/wh;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}

    df = spark.createDataFrame(
        [Row(k=1, name="a", v=1.5), Row(k=2, name="b", v=2.5)]
    )
    # append creates the table (reference create_tables + batch INSERT)
    jdbc_write(df, url, "sales_mart", mode="append", num_partitions=1,
               properties=props)
    back = spark.read.jdbc(url, "sales_mart", properties=props)
    assert {(r.k, r.name, r.v) for r in back.collect()} == {
        (1, "a", 1.5), (2, "b", 2.5)
    }

    # truncate-overwrite (reference truncate_tables + reload)
    df2 = spark.createDataFrame([Row(k=3, name="c", v=3.5)])
    jdbc_write(df2, url, "sales_mart", mode="overwrite", truncate=True,
               num_partitions=1, properties=props)
    back = spark.read.jdbc(url, "sales_mart", properties=props)
    assert {(r.k, r.name, r.v) for r in back.collect()} == {(3, "c", 3.5)}

    # upsert: duplicate keys compact last-wins before the load
    # (reference ON CONFLICT DO UPDATE)
    dup = spark.createDataFrame(
        [
            Row(k=3, name="old", v=0.0, ts=1),
            Row(k=3, name="new", v=9.9, ts=2),
            Row(k=4, name="d", v=4.5, ts=1),
        ]
    )
    jdbc_upsert(dup, url, "upsert_mart", keys=["k"], order_by=["ts"],
                properties=props)
    back = spark.read.jdbc(url, "upsert_mart", properties=props)
    assert {(r.k, r.name, r.v) for r in back.collect()} == {
        (3, "new", 9.9), (4, "d", 4.5)
    }


def test_clustered_write_produces_tight_file_ranges(spark, tmp_path):
    """cluster_by range-partitions + sorts, so each output file covers
    a disjoint, tight key range (parquet min/max stats become usable
    zone maps); an unclustered multi-partition write of the same rows
    produces overlapping ranges."""
    import glob

    import pyarrow.parquet as pq

    from sales_etl_spark.load import write_parquet

    df = spark.range(0, 10_000).selectExpr(
        "cast(id as long) AS k", "cast(id % 97 as long) AS payload"
    ).repartition(8)  # scrambled input

    def ranges(path):
        out = []
        for f in sorted(glob.glob(f"{path}/*.parquet")):
            md = pq.ParquetFile(f).metadata
            ks = [
                (md.row_group(i).column(0).statistics.min,
                 md.row_group(i).column(0).statistics.max)
                for i in range(md.num_row_groups)
            ]
            out.append((min(lo for lo, _ in ks), max(hi for _, hi in ks)))
        return out

    clustered = str(tmp_path / "clustered")
    write_parquet(df, clustered, cluster_by=["k"],
                  max_records_per_file=2_000)
    spans = sorted(ranges(clustered))
    assert len(spans) >= 5
    # disjoint: each file's min is above the previous file's max
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a < lo_b
    # round-trips identically
    got = spark.read.parquet(clustered)
    assert got.count() == 10_000

    plain = str(tmp_path / "plain")
    write_parquet(df, plain)
    overlapping = sorted(ranges(plain))
    assert any(
        hi_a >= lo_b
        for (lo_a, hi_a), (lo_b, hi_b) in zip(overlapping, overlapping[1:])
    ), "control: scrambled write should overlap"


def test_upsert_equal_version_ties_resolve_deterministically(spark):
    """Two different payloads at the same (key, version) must converge
    to ONE winner regardless of input order/partitioning — the
    content-hash tiebreak (ADVICE r3), not row_number arbitrariness."""
    rows = [(1, "payload-a", 7), (1, "payload-b", 7), (2, "only", 1)]
    df = spark.createDataFrame(rows, "k long, v string, ver long")
    a = sorted(
        (r.k, r.v, r.ver)
        for r in upsert_last_wins(df, ["k"], ["ver"]).collect()
    )
    flipped = spark.createDataFrame(
        list(reversed(rows)), "k long, v string, ver long"
    ).repartition(7)
    b = sorted(
        (r.k, r.v, r.ver)
        for r in upsert_last_wins(flipped, ["k"], ["ver"]).collect()
    )
    assert a == b and len(a) == 2


def test_dynamic_partition_overwrite_rewrites_only_touched(spark, tmp_path):
    """A daily load into a date-partitioned table must replace only its
    own partition(s): untouched months keep their rows, the overwritten
    month carries the new batch — the incremental replacement for the
    reference's whole-table TRUNCATE+reload."""
    from sales_etl_spark.load import write_parquet

    target = str(tmp_path / "orders_by_month")
    base = spark.createDataFrame(
        [(1, "1997-01", 10.0), (2, "1997-01", 20.0), (3, "1997-02", 30.0)],
        "order_id long, order_month string, total double",
    )
    write_parquet(base, target, partition_by=["order_month"])

    batch = spark.createDataFrame(
        [(4, "1997-02", 99.0)],
        "order_id long, order_month string, total double",
    )
    write_parquet(
        batch, target, partition_by=["order_month"],
        dynamic_partition_overwrite=True,
    )
    got = {
        (r.order_id, r.order_month, r.total)
        for r in spark.read.parquet(target).collect()
    }
    assert got == {
        (1, "1997-01", 10.0),
        (2, "1997-01", 20.0),
        (4, "1997-02", 99.0),
    }


def test_build_upsert_sql_shapes():
    from sales_etl_spark.load import build_upsert_sql

    pg = build_upsert_sql(
        "customers", ["customer_id", "name", "region"], ["customer_id"]
    )
    assert pg == (
        "INSERT INTO customers (customer_id, name, region) "
        "VALUES (?, ?, ?) ON CONFLICT (customer_id) DO UPDATE SET "
        "name = EXCLUDED.name, region = EXCLUDED.region"
    )
    merge = build_upsert_sql(
        "customers", ["customer_id", "name"], ["customer_id"],
        dialect="merge",
    )
    assert merge == (
        "MERGE INTO customers t USING customers_stage s "
        "ON t.customer_id = s.customer_id "
        "WHEN MATCHED THEN UPDATE SET name = s.name "
        "WHEN NOT MATCHED THEN INSERT (customer_id, name) "
        "VALUES (s.customer_id, s.name)"
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        build_upsert_sql("t", ["k"], ["k"])  # no non-key column
    with _pytest.raises(ValueError):
        build_upsert_sql("t", ["k", "v"], ["k"], dialect="oracleish")


def test_on_conflict_sql_executes_and_matches_engine_compaction(spark):
    """The EXACT generated Postgres ON CONFLICT string, executed
    against DuckDB (same dialect for this statement), must converge to
    the same snapshot as the engine-side last-wins compaction — the
    reference's headline sink semantics (etl/load.py:91-96) verified
    by running its own SQL."""
    import duckdb

    from sales_etl_spark.load import build_upsert_sql

    rows = [
        (1, "a0", 1), (2, "b0", 1),           # batch 1
        (1, "a2", 3), (2, "b1", 2), (3, "c0", 1),   # batch 2 (newer)
        (1, "a1", 2),                          # batch 3 (stale for k=1)
    ]
    sql = build_upsert_sql("dim", ["k", "v", "ver"], ["k"])
    con = duckdb.connect()
    con.execute("CREATE TABLE dim (k BIGINT PRIMARY KEY, v VARCHAR, ver BIGINT)")
    # the DB sees batches in arrival order; ON CONFLICT applies each —
    # guard the stale write exactly as the reference does (:97, WHERE
    # EXCLUDED version is newer) by pre-compacting per batch boundary
    # in version order, which is what jdbc_execute_upsert feeds it
    for r in sorted(rows, key=lambda r: r[2]):
        con.execute(sql, list(r))
    db = {tuple(r) for r in con.execute("SELECT k, v, ver FROM dim").fetchall()}

    df = spark.createDataFrame(rows, "k long, v string, ver long")
    engine = {
        (r.k, r.v, r.ver)
        for r in upsert_last_wins(df, ["k"], ["ver"]).collect()
    }
    assert db == engine == {(1, "a2", 3), (2, "b1", 2), (3, "c0", 1)}


def test_jdbc_execute_upsert_live_derby_merge(spark, tmp_path):
    """Row-level upsert through a real JDBC PreparedStatement batch
    against embedded Derby (MERGE dialect): insert, then re-upsert a
    mix of newer/stale/new rows — the table converges to the
    deterministic last-wins snapshot."""
    import pytest

    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the classpath")
    from sales_etl_spark.load import jdbc_execute_upsert

    spark._jvm.java.lang.System.setProperty(
        "derby.system.home", str(tmp_path)
    )
    url = f"jdbc:derby:{tmp_path}/whm;create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
        "CREATE TABLE dim (k BIGINT PRIMARY KEY, v VARCHAR(64), ver BIGINT)"
    )
    conn.close()

    b1 = spark.createDataFrame(
        [(1, "a0", 1), (2, "b0", 1)], "k long, v string, ver long"
    )
    n1 = jdbc_execute_upsert(
        b1, url, "dim", keys=["k"], order_by=["ver"], dialect="merge",
        batch_size=1,
    )
    assert n1 == 2
    b2 = spark.createDataFrame(
        [(1, "a2", 3), (1, "a1", 2), (3, "c0", 1)],
        "k long, v string, ver long",
    )
    n2 = jdbc_execute_upsert(
        b2, url, "dim", keys=["k"], order_by=["ver"], dialect="merge",
    )
    assert n2 == 2  # the stale (1,'a1',2) row compacts away pre-SQL

    got = {
        (r[0], r[1], r[2])  # Derby uppercases identifiers on read-back
        for r in spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "dim")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
        .collect()
    }
    assert got == {(1, "a2", 3), (2, "b0", 1), (3, "c0", 1)}


def test_scd2_history_compresses_and_closes_intervals(spark):
    """Planted change stream: consecutive same-value rows compress;
    intervals chain [valid_from, valid_to) per key; exactly one
    is_current row per key; reordering input changes nothing."""
    from sales_etl_spark.operators.upsert import scd2_history

    rows = [
        # key 1: A A B A  -> A[d1,d3) B[d3,d4) A[d4,null)
        (1, "A", "2024-01-01", 10),
        (1, "A", "2024-01-02", 11),
        (1, "B", "2024-01-03", 12),
        (1, "A", "2024-01-04", 13),
        # key 2: single row -> current from the start
        (2, "Z", "2024-02-01", 20),
    ]
    df = spark.createDataFrame(
        rows, "k long, attr string, ts string, uid long"
    ).withColumn("ts", F.to_date("ts"))
    out = scd2_history(
        df, keys=["k"], order_by=["ts", "uid"], attrs=["attr"], ts_col="ts"
    ).select("k", "attr", "valid_from", "valid_to", "is_current")

    def norm(o):
        return sorted(
            (r.k, r.attr, str(r.valid_from), str(r.valid_to), r.is_current)
            for r in o.collect()
        )

    got = norm(out)
    assert got == [
        (1, "A", "2024-01-01", "2024-01-03", False),
        (1, "A", "2024-01-04", "None", True),
        (1, "B", "2024-01-03", "2024-01-04", False),
        (2, "Z", "2024-02-01", "None", True),
    ]
    # partition/input-order invariance
    flipped = spark.createDataFrame(
        list(reversed(rows)), "k long, attr string, ts string, uid long"
    ).withColumn("ts", F.to_date("ts")).repartition(7)
    got2 = norm(
        scd2_history(
            flipped, keys=["k"], order_by=["ts", "uid"], attrs=["attr"],
            ts_col="ts",
        ).select("k", "attr", "valid_from", "valid_to", "is_current")
    )
    assert got2 == got


def test_quality_report_counts_violations_null_is_bad(spark):
    from sales_etl_spark.operators.cleaning import quality_report

    df = spark.createDataFrame(
        [
            ("s1", "hello", 5),
            ("s1", "", 0),
            ("s1", None, 3),   # NULL text: nonempty check can't pass
            ("s2", "world", 99),
        ],
        "source string, text string, n int",
    )
    out = {
        r.source: (r.n_rows, r.n_bad_nonempty, r.n_bad_n_small)
        for r in quality_report(
            df,
            checks={
                "nonempty": F.col("text").isNotNull()
                & (F.length("text") > 0),
                "n_small": F.col("n") < 10,
            },
            group_by=["source"],
        ).collect()
    }
    assert out == {"s1": (3, 2, 0), "s2": (1, 0, 1)}


def test_zorder_clustered_write_prunes_both_dimensions(spark, tmp_path):
    """Z-order clustering: after cluster_by the Morton key, every file
    covers a bounded rectangle in (x, y), so a point/range filter on
    EITHER column touches a small subset of files — which 1-D
    clustering on x cannot provide for y. Verified from real parquet
    footers and from input_file_name() on filtered reads."""
    import glob

    import pyarrow.parquet as pq

    from sales_etl_spark.load import write_parquet, zorder_value

    n = 1 << 7
    grid = spark.range(n * n).selectExpr(
        f"CAST(id % {n} AS LONG) AS x", f"CAST(id DIV {n} AS LONG) AS y",
        "id AS payload",
    ).repartition(16)  # scrambled input
    df = grid.withColumn(
        "__z", zorder_value(F.col("x"), 0, n - 1, F.col("y"), 0, n - 1, bits=7)
    )
    out = str(tmp_path / "zordered")
    write_parquet(df, out, cluster_by=["__z"], max_records_per_file=1_500)

    def col_spans(path, col_idx):
        spans = []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            st = [
                (md.row_group(i).column(col_idx).statistics.min,
                 md.row_group(i).column(col_idx).statistics.max)
                for i in range(md.num_row_groups)
            ]
            spans.append(
                max(hi for _, hi in st) - min(lo for lo, _ in st)
            )
        return spans

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 8
    # control: the same rows written scrambled — every file spans
    # (nearly) the whole domain on both axes
    plain = str(tmp_path / "plain")
    write_parquet(
        df.drop("__z"), plain, max_records_per_file=1_500
    )
    # both dimensions bounded per file: clustered spans must sit well
    # under the scrambled control's (Morton files are quadrant-aligned,
    # so spans like 63 on a 0..127 domain are the expected shape; a
    # file crossing the top-level quadrant boundary may span it all)
    for idx in (0, 1):  # x, y column indexes in the written schema
        spans = col_spans(out, idx)
        ctrl = col_spans(plain, idx)
        assert (
            sum(spans) / len(spans) < 0.7 * (sum(ctrl) / len(ctrl))
        ), (idx, spans, ctrl)

    # runtime proof: a rectangle filter touches a minority of files
    touched = {
        r.f
        for r in spark.read.parquet(out)
        .filter("x BETWEEN 10 AND 20 AND y BETWEEN 10 AND 20")
        .select(F.input_file_name().alias("f"))
        .distinct()
        .collect()
    }
    assert 0 < len(touched) <= len(files) // 2
    # and the data round-trips completely
    assert spark.read.parquet(out).count() == n * n


def test_stream_upsert_jdbc_converges_to_batch_state(spark, tmp_path):
    """Gated live test: a keyed event stream upserted into Derby via
    the foreachBatch JDBC sink (MERGE dialect) must leave the table in
    exactly the batch last-wins state, across multiple micro-batches
    with overlapping keys."""
    import pytest

    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the classpath")
    from sales_etl_spark.operators.upsert import upsert_last_wins
    from sales_etl_spark.streaming.upsert_sink import stream_upsert_jdbc

    spark._jvm.java.lang.System.setProperty(
        "derby.system.home", str(tmp_path)
    )
    url = f"jdbc:derby:{tmp_path}/whs;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    props = {"driver": driver}

    rows = [
        (1, 1, "a1"), (2, 1, "b1"),          # file 0
        (1, 2, "a2"), (3, 1, "c1"),          # file 1
        (2, 3, "b3"), (1, 3, "a3"),          # file 2
    ]
    src = str(tmp_path / "srcs")
    batch = spark.createDataFrame(rows, "k long, ver long, payload string")
    batch.repartition(3).write.mode("overwrite").parquet(src)

    # seed the target table with UNQUOTED DDL (Spark's JDBC writer
    # quotes identifiers, which Derby then treats case-sensitively —
    # the unquoted MERGE statement would not see those columns)
    jvm = spark._jvm
    jvm.java.lang.Class.forName(driver)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    conn.createStatement().execute(
        "CREATE TABLE dim_live (k BIGINT, ver BIGINT, payload VARCHAR(32))"
    )
    conn.close()

    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_upsert_jdbc(
            stream, url, "dim_live", keys=["k"],
            order_by=["ver"], dialect="merge", driver=driver,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    q.stop()

    back = spark.read.jdbc(url, "dim_live", properties=props)
    back = back.toDF(*[c.lower() for c in back.columns])  # Derby upper-cases unquoted DDL
    got = {(r.k, r.ver, r.payload) for r in back.collect()}
    want = {
        (r.k, r.ver, r.payload)
        for r in upsert_last_wins(
            batch, keys=["k"], order_by=["ver"]
        ).collect()
    }
    assert got == want


def test_guarded_upsert_sql_strings():
    """guard_by renders the strictly-newer predicate in both dialects
    (lexicographic over the order_by columns; equal versions no-op)."""
    from sales_etl_spark.load import build_upsert_sql

    pg = build_upsert_sql(
        "t", ["k", "v", "p"], ["k"], "postgres", guard_by=["v"]
    )
    assert pg.endswith("WHERE (EXCLUDED.v > t.v)"), pg

    mg = build_upsert_sql(
        "t", ["k", "a", "b", "p"], ["k"], "merge", guard_by=["a", "b"]
    )
    assert (
        "WHEN MATCHED AND ((s.a > t.a) OR (s.a = t.a AND s.b > t.b)) "
        "THEN UPDATE" in mg
    ), mg


def test_wait_for_db_retries_until_ready(spark, monkeypatch):
    """Readiness probe (reference main.py:42-58): a database that
    refuses the first attempts is retried with backoff and the
    succeeding attempt number is returned; sleeps happen between
    failures only."""
    from sales_etl_spark.load import wait_for_db

    slept: list[float] = []
    monkeypatch.setattr("time.sleep", lambda s: slept.append(s))

    calls = {"n": 0}

    def flaky_connect():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("db still booting")

    attempt = wait_for_db(
        spark, "jdbc:fake:db", max_retries=5, delay=0.5,
        _connect=flaky_connect,
    )
    assert attempt == 3
    assert slept == [0.5, 0.5]  # no sleep after the success


def test_wait_for_db_exhaustion_raises_with_cause(spark, monkeypatch):
    """After max_retries failures the probe raises RuntimeError with
    the last driver error chained (never an infinite wait)."""
    import pytest as _pytest

    from sales_etl_spark.load import wait_for_db

    monkeypatch.setattr("time.sleep", lambda s: None)

    def refuse():
        raise ConnectionError("connection refused")

    with _pytest.raises(RuntimeError) as exc:
        wait_for_db(
            spark, "jdbc:fake:db", max_retries=4, delay=0.1,
            _connect=refuse,
        )
    assert "after 4 attempts" in str(exc.value)
    assert isinstance(exc.value.__cause__, ConnectionError)


def test_wait_for_db_fails_fast_on_non_transient_errors(
    spark, monkeypatch
):
    """Only connection-level failures are retried (the reference
    retries only psycopg2.OperationalError): an auth rejection or a
    malformed URL raises the ORIGINAL error on attempt 1 — no ~18 s of
    doomed retries burying the root cause under a generic 'not
    ready'."""
    import pytest as _pytest

    from sales_etl_spark.load import wait_for_db

    monkeypatch.setattr(
        "time.sleep",
        lambda s: (_ for _ in ()).throw(AssertionError("slept")),
    )
    calls = {"n": 0}

    def reject_auth():
        calls["n"] += 1
        raise ValueError("FATAL: password authentication failed")

    with _pytest.raises(ValueError, match="authentication failed"):
        wait_for_db(
            spark, "jdbc:fake:db", max_retries=10, _connect=reject_auth
        )
    assert calls["n"] == 1  # no retry on a non-transient failure


def test_transient_classifier_retries_on_introspection_failure():
    """If the Py4J gateway hiccups WHILE classifying a Java cause
    chain (getClass()/getMessage() itself raises), the classifier
    must default to transient=retry, not fail-fast: aborting
    wait_for_db on attempt 1 because the gateway blinked defeats the
    probe's whole purpose, and the retry loop is bounded anyway."""
    from sales_etl_spark.load import _is_transient_connect_error

    class _GatewayDown:
        def getClass(self):
            raise RuntimeError("Py4J gateway not responding")

    class _FakePy4JError(Exception):
        java_exception = _GatewayDown()

    assert _is_transient_connect_error(_FakePy4JError("boom")) is True


def test_wait_for_db_probe_authenticates_with_properties(
    spark, tmp_path
):
    """The probe must pass the caller's properties mapping
    (user/password) to getConnection(url, props) — i.e. authenticate
    exactly like the real write. Embedded Derby accepts credentialed
    connections, so a successful credentialed probe proves the
    properties route through; a credential-LESS probe against an
    auth-required database would otherwise fail all attempts even
    when the DB is ready."""
    if not _derby_available(spark):
        pytest.skip("Derby JDBC driver not on the classpath")

    from sales_etl_spark.load import wait_for_db

    spark._jvm.java.lang.System.setProperty(
        "derby.system.home", str(tmp_path)
    )
    url = f"jdbc:derby:{tmp_path}/whauth;create=true"
    attempt = wait_for_db(
        spark,
        url,
        max_retries=2,
        delay=0.1,
        properties={
            "driver": "org.apache.derby.jdbc.EmbeddedDriver",
            "user": "app",
            "password": "secret",
        },
    )
    assert attempt == 1


def test_wait_for_db_fails_fast_on_no_suitable_driver(
    spark, monkeypatch
):
    """Java-path classification: a URL no registered driver accepts is
    a configuration error — DriverManager raises SQLException('No
    suitable driver', some JDKs stamp it 08001) and the probe must
    surface it on attempt 1 through the REAL getConnection route, not
    burn retries on it."""
    import pytest as _pytest

    monkeypatch.setattr(
        "time.sleep",
        lambda s: (_ for _ in ()).throw(AssertionError("slept")),
    )
    with _pytest.raises(Exception, match="No suitable driver"):
        from sales_etl_spark.load import wait_for_db

        wait_for_db(spark, "jdbc:nosuchproto:nowhere", max_retries=10)


def test_wait_for_db_immediate_success_never_sleeps(spark, monkeypatch):
    """A ready database costs exactly one probe connection."""
    from sales_etl_spark.load import wait_for_db

    monkeypatch.setattr(
        "time.sleep",
        lambda s: (_ for _ in ()).throw(AssertionError("slept")),
    )
    assert wait_for_db(
        spark, "jdbc:fake:db", _connect=lambda: None
    ) == 1
