"""Sinks (reference ``etl/load.py`` parity, Spark-native).

The reference loads into PostgreSQL with psycopg2: DDL bootstrap,
truncate-and-reload for facts/marts, ON CONFLICT upsert for the dim
(etl/load.py:29-157). The Spark-native surface:

- engine-native: partitioned parquet (the lake path — what the bench
  and tests exercise; no DB in this environment);
- JDBC append / truncate-overwrite via ``df.write.jdbc`` — same
  semantics as the reference's batch INSERT and TRUNCATE+reload, with
  per-partition parallel writers instead of one connection;
- upsert = engine-side last-wins compaction (operators/upsert.py)
  followed by truncate-overwrite; a true in-DB MERGE needs a staging
  table + ``MERGE INTO`` statement, documented in ``jdbc_upsert``.

Output typing is explicit: ``cast_for_sink`` replaces the reference's
per-row Python coercions (etl/load.py:63-77) with one projection.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame


def cast_for_sink(df: DataFrame, types: Mapping[str, str]) -> DataFrame:
    """Explicit cast projection at the sink boundary — the declarative
    form of etl/load.py:63-77's int()/float()/.date() loop."""
    cols = [
        (df[c].cast(t).alias(c) if c in types else df[c])
        for c, t in ((c, types.get(c)) for c in df.columns)
    ]
    return df.select(*cols)


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Iterable[str] = (),
    cluster_by: Iterable[str] = (),
    max_records_per_file: int | None = None,
    dynamic_partition_overwrite: bool = False,
) -> None:
    """Engine-native sink. ``partition_by`` on a low-cardinality column
    (e.g. month) gives partition pruning to every downstream reader —
    the 100 TB replacement for the reference's whole-table TRUNCATE:
    dynamic partition overwrite rewrites only touched partitions.

    ``cluster_by`` range-partitions then sorts rows within each output
    file on the given columns: every parquet row group's min/max
    statistics become tight, so downstream range/point filters on
    those columns skip whole row groups and files (zone-map pruning —
    at rest, the cheapest scan you ever run is the one that never
    reads the page). Use for the dominant filter column (event time,
    date, tenant). ``max_records_per_file`` bounds file size so a
    clustered write cannot produce one giant file per range."""
    cluster_by = list(cluster_by)
    if cluster_by:
        df = df.repartitionByRange(*cluster_by).sortWithinPartitions(
            *cluster_by
        )
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    partition_by = list(partition_by)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
        if dynamic_partition_overwrite:
            # overwrite replaces ONLY the partitions present in df —
            # the incremental daily load (untouched partitions keep
            # their files; the reference's TRUNCATE would drop them).
            writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.parquet(path)


def _is_transient_connect_error(exc: Exception) -> bool:
    """Connection-level (retryable) vs everything else (fail fast).

    Mirror of the reference retrying ONLY psycopg2.OperationalError
    (main.py:42-58): a booting/unreachable server is worth waiting
    for; an auth rejection, malformed URL, or missing driver class is
    not — retrying those ``max_retries`` times just buries the root
    cause under a generic "not ready". Retryable =

    - SQLState class 08 (connection exception) anywhere in the Java
      cause chain — EXCEPT DriverManager's "No suitable driver",
      which some JDKs stamp 08001 despite being a configuration
      error that no amount of waiting fixes. Class 08 is retried
      WHOLESALE: drivers overload it (Derby stamps auth failures
      08004; "too many connections" is 08004 on some engines and
      genuinely transient), and psycopg2.OperationalError — the
      reference's retry set — makes the same err-on-retry call.
      Unambiguous auth rejections arrive as class 28 (PostgreSQL
      28P01) and fail fast;
    - ``SQLTransientConnectionException`` /
      ``SQLNonTransientConnectionException`` subclasses;
    - raw socket-level failures (``java.net.ConnectException``,
      ``SocketTimeoutException``, ``UnknownHostException`` is NOT
      retried — a bad hostname is configuration);
    - for injected test fakes: Python ``ConnectionError`` /
      ``TimeoutError``;
    - a Java cause chain whose OWN introspection fails (Py4J gateway
      hiccup mid-classification) — retried conservatively rather
      than aborting a bounded probe on attempt 1.
    """
    je = getattr(exc, "java_exception", None)
    if je is None:
        return isinstance(exc, (ConnectionError, TimeoutError))
    cur = je
    while cur is not None:
        try:
            cname = cur.getClass().getName()
            msg = cur.getMessage() or ""
        except Exception:
            # Gateway introspection itself failed — most often a
            # transient Py4J hiccup while classifying what may be a
            # genuine connection-refused. Failing fast here would
            # abort wait_for_db on attempt 1 for exactly the class of
            # error the probe exists to ride out; the retry loop is
            # bounded by max_retries, so the conservative default is
            # to retry, not to raise.
            return True
        if "UnknownHostException" in cname:
            return False
        if "No suitable driver" in msg:
            return False
        if (
            "SQLTransientConnectionException" in cname
            or "SQLNonTransientConnectionException" in cname
            or "java.net.ConnectException" in cname
            or "SocketTimeoutException" in cname
        ):
            return True
        try:
            state = cur.getSQLState()
        except Exception:
            state = None
        if state and str(state).startswith("08"):
            return True
        try:
            cur = cur.getCause()
        except Exception:
            cur = None
    return False


def wait_for_db(
    spark,
    url: str,
    max_retries: int = 10,
    delay: float = 2.0,
    driver: str | None = None,
    properties: Mapping[str, str] | None = None,
    _connect=None,
) -> int:
    """Bounded database-readiness probe (reference main.py:42-58
    ``wait_for_db``: 10 attempts × 2 s against a cold PostgreSQL).
    Opens and closes one JDBC connection per attempt, sleeping
    ``delay`` seconds between failures; returns the 1-based attempt
    that succeeded or raises ``RuntimeError`` after ``max_retries``
    with the last driver error chained.

    The probe authenticates EXACTLY like the real write: the caller's
    ``properties`` mapping (user/password — the standard Spark JDBC
    pattern) becomes a ``java.util.Properties`` passed to
    ``getConnection(url, props)``. A credential-less probe against an
    authenticated database burns all ``max_retries`` (~18 s) and then
    fails a sink whose database was ready the whole time.

    Only connection-level failures are retried
    (:func:`_is_transient_connect_error` — the reference retries only
    psycopg2.OperationalError); auth rejections, malformed URLs, and
    missing driver classes raise immediately with the real cause.
    Each failed attempt is logged.

    Real deployments hit cold databases constantly — every sink entry
    point calls this before its first real connection so a container
    that is still booting costs a few retries, not a failed run.
    ``_connect`` injects the connection attempt for tests (a
    refusing-then-accepting fake); production always probes through
    ``java.sql.DriverManager``."""
    import logging
    import time

    log = logging.getLogger(__name__)
    if _connect is None:
        jvm = spark._jvm
        if driver is None and properties:
            driver = properties.get("driver")
        if driver:
            jvm.java.lang.Class.forName(driver)
        props = jvm.java.util.Properties()
        for k, v in (properties or {}).items():
            if k != "driver":
                props.setProperty(k, str(v))

        def _connect() -> None:
            jvm.java.sql.DriverManager.getConnection(url, props).close()

    last: Exception | None = None
    for attempt in range(1, max_retries + 1):
        try:
            _connect()
            return attempt
        except Exception as exc:  # Py4JJavaError / fake test error
            if not _is_transient_connect_error(exc):
                raise
            log.warning(
                "wait_for_db attempt %d/%d against %s failed: %s",
                attempt, max_retries, url, exc,
            )
            last = exc
            if attempt < max_retries:
                time.sleep(delay)
    raise RuntimeError(
        f"database at {url} not ready after {max_retries} attempts"
    ) from last


def jdbc_write(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    truncate: bool = False,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    properties: Mapping[str, str] | None = None,
    connect_retries: int = 10,
    retry_delay: float = 2.0,
) -> None:
    """JDBC sink (reference etl/load.py:58-78 batch insert; 40-55
    truncate). ``mode='overwrite', truncate=True`` is TRUNCATE+reload
    without dropping DDL; ``batchsize`` is the executemany batch;
    ``num_partitions`` caps concurrent connections. The readiness
    probe (``wait_for_db``) runs first so per-partition writers never
    race a still-booting database; ``connect_retries=1`` disables the
    backoff (fail fast)."""
    wait_for_db(
        df.sparkSession,
        url,
        max_retries=connect_retries,
        delay=retry_delay,
        properties=properties,
    )
    if num_partitions:
        df = df.coalesce(num_partitions)
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .option("truncate", "true" if truncate else "false")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.mode(mode).save()


def jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Iterable[str],
    order_by: Iterable[str],
    properties: Mapping[str, str] | None = None,
) -> None:
    """Upsert into a JDBC table (reference ON CONFLICT DO UPDATE,
    etl/load.py:81-109).

    Engine-side: compact to one winning row per key (deterministic
    last-wins), then truncate-overwrite — idempotent like the
    reference's upsert, and scales as a single shuffle + parallel
    write. For incremental in-DB merges instead, write ``df`` to a
    staging table with :func:`jdbc_write` and run
    ``MERGE INTO target USING staging ON (keys) WHEN MATCHED THEN
    UPDATE ... WHEN NOT MATCHED THEN INSERT ...`` via the DB's own
    client — Spark's JDBC writer has no MERGE mode.
    """
    from sales_etl_spark.operators.upsert import upsert_last_wins

    compacted = upsert_last_wins(df, keys=keys, order_by=order_by)
    jdbc_write(
        compacted, url, table, mode="overwrite", truncate=True,
        properties=properties,
    )


def _lex_newer(sq: str, tq: str, cols: list[str]) -> str:
    """SQL predicate: staged row is lexicographically NEWER than the
    target row on ``cols`` (the order_by columns) — strictly greater,
    so equal-version replays are no-ops."""
    terms = []
    for i, c in enumerate(cols):
        eqs = " AND ".join(f"{sq}.{e} = {tq}.{e}" for e in cols[:i])
        cmp_ = f"{sq}.{c} > {tq}.{c}"
        terms.append(f"({eqs} AND {cmp_})" if eqs else f"({cmp_})")
    return " OR ".join(terms)


def build_upsert_sql(
    table: str,
    columns: Iterable[str],
    keys: Iterable[str],
    dialect: str = "postgres",
    guard_by: Iterable[str] | None = None,
) -> str:
    """The reference's upsert statement (etl/load.py:91-96), generated
    per dialect with ``?`` parameter placeholders:

    - ``postgres``: ``INSERT ... ON CONFLICT (keys) DO UPDATE SET
      col = EXCLUDED.col`` — byte-for-byte the reference's headline
      sink shape (also the DuckDB dialect, which the tests use to
      execute this exact string).
    - ``merge``: the standard-SQL ``MERGE INTO target USING staging``
      equivalent, for engines without ON CONFLICT (Derby/Oracle/
      SQL Server) — pair with a staging table the rows are batch-
      inserted into first (pass its name as ``staging``); this is the
      form the live embedded-Derby test drives end-to-end.

    ``guard_by`` (the order_by/version columns) makes the UPDATE
    conditional on the incoming row being strictly newer — REQUIRED
    when batches can arrive out of order (a streaming sink's replays
    and re-ordered micro-batches), where an unguarded upsert would let
    an older version regress the row. The reference's unguarded form
    stays the default (its single-threaded loop is ordered by
    construction).
    """
    columns = list(columns)
    keys = list(keys)
    guard = list(guard_by) if guard_by else []
    updates = [c for c in columns if c not in keys]
    if not updates:
        raise ValueError("upsert needs at least one non-key column")
    cols_sql = ", ".join(columns)
    qs = ", ".join("?" for _ in columns)
    if dialect == "postgres":
        set_sql = ", ".join(f"{c} = EXCLUDED.{c}" for c in updates)
        stmt = (
            f"INSERT INTO {table} ({cols_sql}) VALUES ({qs}) "
            f"ON CONFLICT ({', '.join(keys)}) DO UPDATE SET {set_sql}"
        )
        if guard:
            stmt += f" WHERE {_lex_newer('EXCLUDED', table, guard)}"
        return stmt
    if dialect == "merge":
        staging = f"{table}_stage"
        on_sql = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        # SET targets must be UNQUALIFIED: standard SQL (and Postgres
        # 15, which rejects `SET t.c = ...` outright — found by the
        # live round-trip in tests/test_postgres_live.py); Derby
        # accepts both forms
        set_sql = ", ".join(f"{c} = s.{c}" for c in updates)
        ins_sql = ", ".join(f"s.{c}" for c in columns)
        matched = "WHEN MATCHED"
        if guard:
            matched += f" AND ({_lex_newer('s', 't', guard)})"
        return (
            f"MERGE INTO {table} t USING {staging} s ON {on_sql} "
            f"{matched} THEN UPDATE SET {set_sql} "
            f"WHEN NOT MATCHED THEN INSERT ({cols_sql}) "
            f"VALUES ({ins_sql})"
        )
    raise ValueError(f"unknown upsert dialect: {dialect}")


def jdbc_execute_upsert(
    df: DataFrame,
    url: str,
    table: str,
    keys: Iterable[str],
    order_by: Iterable[str],
    dialect: str = "postgres",
    batch_size: int = 1_000,
    driver: str | None = None,
    guard_versions: bool = False,
    connect_retries: int = 10,
    retry_delay: float = 2.0,
    properties: Mapping[str, str] | None = None,
) -> int:
    """Row-level upsert through a real JDBC ``PreparedStatement`` batch
    (the reference's psycopg2 ``execute`` loop, etl/load.py:81-109, on
    a JDBC connection).

    The frame is first compacted to one deterministic winner per key
    (``upsert_last_wins``) so the statement stream is conflict-free
    within itself — the reference gets this ordering implicitly from
    its single-threaded loop. With ``dialect='postgres'`` each row
    executes the generated ON CONFLICT statement in ``batch_size``
    JDBC batches; with ``dialect='merge'`` rows batch-insert into a
    scratch ``{table}_stage`` table and a single ``MERGE INTO``
    applies them (the staging pattern for engines without ON
    CONFLICT). Rows stream through the driver via ``toLocalIterator``
    — one partition in driver memory at a time, bounded like the
    reference's own single process. This is the DIMENSION-scale path:
    row-at-a-time SQL against one connection is inherently
    single-node, exactly like the reference; for fact-scale upserts
    use ``jdbc_upsert`` (compact + truncate-overwrite, fully
    parallel). Returns the number of rows upserted.
    """
    from sales_etl_spark.operators.upsert import upsert_last_wins

    compacted = upsert_last_wins(df, keys=keys, order_by=order_by)
    columns = compacted.columns
    cols_sql = ", ".join(columns)
    qs = ", ".join("?" for _ in columns)
    jvm = df.sparkSession._jvm
    wait_for_db(
        df.sparkSession,
        url,
        max_retries=connect_retries,
        delay=retry_delay,
        driver=driver,
        properties=properties,
    )
    # the real connection authenticates exactly like the probe did
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        if k != "driver":
            props.setProperty(k, str(v))
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    n = 0
    try:
        guard = list(order_by) if guard_versions else None
        if dialect == "merge":
            staging = f"{table}_stage"
            conn.createStatement().execute(
                f"CREATE TABLE {staging} AS SELECT * FROM {table} "
                "WITH NO DATA"
            )
            row_sql = f"INSERT INTO {staging} ({cols_sql}) VALUES ({qs})"
        else:
            row_sql = build_upsert_sql(
                table, columns, keys, dialect, guard_by=guard
            )
        stmt = conn.prepareStatement(row_sql)
        pending = 0
        for row in compacted.toLocalIterator():
            for i, c in enumerate(columns):
                stmt.setObject(i + 1, row[c])
            stmt.addBatch()
            pending += 1
            n += 1
            if pending >= batch_size:
                stmt.executeBatch()
                pending = 0
        if pending:
            stmt.executeBatch()
        stmt.close()
        if dialect == "merge":
            merge = conn.createStatement()
            merge.execute(
                build_upsert_sql(
                    table, columns, keys, "merge", guard_by=guard
                )
            )
            merge.execute(f"DROP TABLE {staging}")
            merge.close()
    finally:
        conn.close()
    return n


#: Warehouse DDL (reference db.sql:1-46): the four target tables with
#: Spark-typed columns (DECIMAL money at rest like the reference).
WAREHOUSE_DDL: dict[str, str] = {
    "sales": (
        "order_id BIGINT, customer_id STRING, product_id BIGINT, "
        "product_name STRING, category STRING, quantity INT, "
        "unit_price DECIMAL(10,2), total_price DECIMAL(15,2), "
        "order_date DATE, month STRING"
    ),
    "customers": (
        "customer_id STRING, customer_name STRING, email STRING, "
        "is_email_valid BOOLEAN, registration_date DATE, "
        "customer_days INT, region STRING"
    ),
    "sales_summary": (
        "category STRING, month STRING, total_sales DECIMAL(15,2), "
        "total_quantity DOUBLE, average_order_value DECIMAL(15,2), "
        "period_date DATE"
    ),
    "product_ranking": (
        "product_id BIGINT, product_name STRING, total_sold DOUBLE, "
        "total_revenue DECIMAL(15,2), rank_position INT"
    ),
}


def create_warehouse_tables(spark, database: str = "warehouse") -> None:
    """DDL bootstrap (reference create_tables, etl/load.py:29-37 +
    db.sql): CREATE TABLE IF NOT EXISTS for the four targets as
    catalog-managed parquet tables. Idempotent, like the reference."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, cols in WAREHOUSE_DDL.items():
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {database}.{name} ({cols}) "
            "USING PARQUET"
        )


def load_warehouse_table(
    df: DataFrame, table: str, database: str = "warehouse"
) -> None:
    """Truncate-and-reload (reference truncate_tables + load_*,
    etl/load.py:40-55,58-145): INSERT OVERWRITE replaces the table
    contents atomically; schema enforcement comes from the DDL (casts
    belong in cast_for_sink before the call)."""
    df.createOrReplaceTempView("__load_src")
    cols = ", ".join(df.columns)
    df.sparkSession.sql(
        f"INSERT OVERWRITE TABLE {database}.{table} ({cols}) "
        f"SELECT {cols} FROM __load_src"
    )


def zorder_value(
    a: Column,
    a_min: float,
    a_max: float,
    b: Column,
    b_min: float,
    b_max: float,
    bits: int = 10,
) -> Column:
    """Z-order (Morton) key for two columns — bit-interleaved bucket
    ids, pure codegen expression. Pair with ``write_parquet(...,
    cluster_by=["__z"])``: range-partitioning + in-file sort on the
    z-value gives EVERY file a bounded rectangle in (a, b) space, so
    parquet min/max statistics prune point/range filters on EITHER
    column (1-D clustering can only serve one) — the Delta/Iceberg
    OPTIMIZE ZORDER layout, engine-native.

    Buckets here are uniform over [min, max] (``width_bucket``);
    heavily skewed columns want quantile buckets instead — compute
    boundaries with ``approxQuantile`` and bucketize by range, the
    interleave below is unchanged. ``bits`` per dimension: 10 → a
    1024×1024 grid, 20-bit keys.
    """
    from pyspark.sql import functions as F

    n = F.lit(2**bits)
    ab = F.width_bucket(a.cast("double"), F.lit(a_min), F.lit(a_max), n) - 1
    bb = F.width_bucket(b.cast("double"), F.lit(b_min), F.lit(b_max), n) - 1
    ab = F.greatest(F.lit(0), F.least(ab, n - 1)).cast("long")
    bb = F.greatest(F.lit(0), F.least(bb, n - 1)).cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(ab, i) % 2, 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(bb, i) % 2, 2 * i + 1))
    return z
