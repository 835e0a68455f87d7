"""Contract tests for the harness tools — chiefly the synthetic-twin
ROW-IDENTITY contract of tools/scaling_curve.py (the r10 verdict's
ask #3: the event_id unshifted-primary-key bug as a test, not a
memory). The twin builders double tables by unioning key-shifted
copies; an identity key left unshifted duplicates "primary keys"
across copies with identical attributes, making pick-one-per-key
queries legitimately ambiguous across engines (SCALE.md §30.10)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scaling_curve import (  # noqa: E402
    PRIMARY_KEYS,
    TABLES,
    synth_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_every_scaling_table_declares_an_identity_key():
    """Adding a table to the twin (TABLES) without declaring its
    row-identity key (PRIMARY_KEYS) must fail loudly — the class of
    omission that let event_id ship unshifted for a round."""
    assert set(TABLES) == set(PRIMARY_KEYS), (
        "TABLES and PRIMARY_KEYS out of lockstep: "
        f"{set(TABLES) ^ set(PRIMARY_KEYS)}"
    )
    for table, pk in PRIMARY_KEYS.items():
        assert pk, f"{table}: empty identity key"


def test_every_doubled_table_shifts_an_identity_key_column():
    """Structural half of the contract: each doubled table's shift
    list must include at least one identity-key column — otherwise
    every copy reuses the base identity values verbatim and the
    empirical check below could only catch it after a rebuild."""
    for table, keys in TABLES.items():
        if keys is None:
            continue  # fixed dim: copied once, identity untouched
        assert set(keys) & set(PRIMARY_KEYS[table]), (
            f"{table}: shift list {keys} misses identity key "
            f"{PRIMARY_KEYS[table]} — copies would collide"
        )


def test_synth_copies_keep_identity_keys_disjoint(spark):
    """Empirical half: build each table's 3-copy twin with the REAL
    builder block (synth_table — the same code build_sf10/build_sf02
    write to disk) and assert distinct-identity count is exactly
    n_copies × the base count, i.e. the copies' identity sets are
    pairwise DISJOINT. Phrased as copy-disjointness rather than
    absolute uniqueness because the driver's base lineitem is itself
    not unique on any column subset — the twin must not ADD
    collisions, base-internal duplicates are the base data's
    business."""
    n_copies = 3
    for table, keys in TABLES.items():
        pk = [F.col(c) for c in PRIMARY_KEYS[table]]
        base = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        base_distinct = base.select(
            F.countDistinct(*pk).alias("d")
        ).first()["d"]
        twin = synth_table(spark, SF_DIR, table, n_copies=n_copies)
        twin_distinct = twin.select(
            F.countDistinct(*pk).alias("d")
        ).first()["d"]
        want = base_distinct if keys is None else n_copies * base_distinct
        assert twin_distinct == want, (
            f"{table}: {twin_distinct} distinct identities in the "
            f"{n_copies}-copy twin, expected {want} — cross-copy "
            "identity collision (an unshifted key?)"
        )


def test_engine_digest_cross_engine_exact_on_double_battery(spark, tmp_path):
    """tools/engine_digest's float canonicalization — the exact
    IEEE-754 (sign, mantissa, exponent) decomposition — must agree
    BIT-FOR-BIT between Spark and DuckDB, including the cases that
    break every formatting-based approach: Java 17's Double.toString
    is not always shortest-round-trip, and Java's %.17e pads the
    shortest repr where C rounds the true binary expansion. Battery:
    edge cases (±0, subnormals, DBL_MAX, NaN, ±Inf) + 20k random
    bit patterns, one digest per engine over the same parquet."""
    import math
    import random
    import struct

    import duckdb

    from tools.engine_digest import duck_digest, spark_digest

    random.seed(11)
    vals = [
        0.1, -0.0, 0.0, 1e300, 123456789.123, 1e-310, 4.9e-324,
        2.0 ** -1022, 1.5 * 2.0 ** -1030, 1234.5, 1e21, 0.35,
        2.5e-10, 1.7976931348623157e308, 5e-324, float("nan"),
        float("inf"), float("-inf"), None,
    ]
    for _ in range(20000):
        b = random.getrandbits(64)
        x = struct.unpack("<d", struct.pack("<Q", b))[0]
        if not (math.isnan(x) or math.isinf(x)):
            vals.append(x)
    p = str(tmp_path / "battery.parquet")
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, x double"
    ).coalesce(1).write.parquet(p)

    sd = spark_digest(spark.read.parquet(p))
    con = duckdb.connect()
    od = duck_digest(con, f"SELECT i, x FROM '{p}/*.parquet'")
    assert sd == od and sd[0] == len(vals)


def test_engine_digest_all_kinds_and_order_insensitivity(spark, tmp_path):
    """One column per canonical kind (int, bool, string, double,
    date, timestamp, binary) + nulls in every column: Spark and
    DuckDB digests agree, the digest ignores row order, and any
    single-value change flips it."""
    import duckdb

    from tools.engine_digest import duck_digest, spark_digest

    p = str(tmp_path / "kinds.parquet")
    spark.sql(
        """
        SELECT id AS i,
               CASE WHEN id = 3 THEN NULL ELSE id * 7 END AS n,
               id % 2 = 0 AS b,
               CASE WHEN id = 4 THEN NULL
                    ELSE concat('s', CAST(id AS STRING)) END AS s,
               CASE WHEN id = 5 THEN NULL
                    ELSE CAST(id AS DOUBLE) / 3.0 END AS d,
               DATE '2024-01-01' + make_interval(0,0,0,CAST(id AS INT),0,0,0) AS dt,
               TIMESTAMP_NTZ '2024-01-02 03:04:05.123456' AS ts,
               CAST(concat('b', CAST(id AS STRING)) AS BINARY) AS bb
        FROM range(50)
        """
    ).coalesce(1).write.parquet(p)
    sd = spark_digest(spark.read.parquet(p))
    con = duckdb.connect()
    src = f"'{p}/*.parquet'"
    od = duck_digest(con, f"SELECT * FROM {src}")
    assert sd == od
    # row order must not matter
    od_rev = duck_digest(
        con, f"SELECT * FROM {src} ORDER BY i DESC"
    )
    assert od_rev == od
    # a one-value change must flip the digest
    od_mut = duck_digest(
        con,
        f"SELECT i, CASE WHEN i = 7 THEN n + 1 ELSE n END AS n, "
        f"b, s, d, dt, ts, bb FROM {src}",
    )
    assert od_mut != od


def test_engine_digest_array_columns_cross_engine(spark, tmp_path):
    """Array columns canonicalize engine-side too (the round-11
    extension that retires the last pandas fallbacks): per-element
    canon with order PRESERVED, chr(3) joiner, length prefix. Checks
    double arrays (same IEEE decomposition as scalars, incl. a NULL
    element), int and string arrays, empty-vs-[''] disambiguation,
    NULL arrays, element-order sensitivity, and row-order
    insensitivity — one digest per engine over the same parquet."""
    import duckdb

    from tools.engine_digest import duck_digest, spark_digest

    p = str(tmp_path / "arr.parquet")
    spark.sql(
        """
        SELECT id AS i,
               CASE WHEN id = 3 THEN NULL
                    WHEN id = 4 THEN array(CAST(NULL AS DOUBLE), 0.1)
                    ELSE array(CAST(id AS DOUBLE) / 3.0, 1e300,
                               4.9e-324) END AS xs,
               CASE WHEN id = 5 THEN array()
                    WHEN id = 6 THEN array('')
                    ELSE array(concat('s', CAST(id AS STRING)), 'k')
                    END AS ss,
               array(id, id * 7, CAST(NULL AS BIGINT)) AS ns
        FROM range(40)
        """
    ).coalesce(1).write.parquet(p)
    sd = spark_digest(spark.read.parquet(p))
    assert sd is not None, "array schema must be digestable now"
    con = duckdb.connect()
    src = f"'{p}/*.parquet'"
    od = duck_digest(con, f"SELECT * FROM {src}")
    assert sd == od
    # row order must not matter...
    assert duck_digest(con, f"SELECT * FROM {src} ORDER BY i DESC") == od
    # ...but ELEMENT order must (arrays are sequences, not sets)
    od_rev = duck_digest(
        con,
        f"SELECT i, xs, ss, list_reverse(ns) AS ns FROM {src}",
    )
    assert od_rev != od
    # [] vs [''] must differ: flipping id=5's empty list to ['']
    # collides with id=6's row only if the length prefix is broken
    od_mut = duck_digest(
        con,
        f"SELECT i, xs, CASE WHEN i = 5 THEN [''] ELSE ss END AS ss, "
        f"ns FROM {src}",
    )
    assert od_mut != od


def test_engine_digest_covers_every_oracle_backed_key(spark):
    """Structural fence: every oracle-backed registry key must be
    engine-digestable with AGREEING canonical kinds on both sides —
    otherwise a future key silently falls back to the pandas
    comparator and loses the scan-cost verification path at 10x scale
    (SCALE.md §31.3 closed the fallback set to zero; this keeps it
    closed). Schema-only: Spark plans are built but never executed,
    DuckDB sees one DESCRIBE per oracle."""
    import duckdb

    from sales_etl_spark.plans import QUERY_REGISTRY
    from tools.check_oracle import TABLES
    from tools.engine_digest import duck_schema_kinds, spark_schema_kinds

    sf_dir = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    undigestable = []
    for name, qd in sorted(QUERY_REGISTRY.items()):
        if qd.oracle is None:
            continue
        sk = spark_schema_kinds(qd.builder(spark, sf_dir))
        dk = duck_schema_kinds(con, qd.oracle)
        if sk is None or dk is None or sk != dk:
            undigestable.append((name, sk, dk))
    assert not undigestable, (
        "keys lost engine-digest coverage (spark kinds vs duck kinds): "
        f"{undigestable}"
    )
