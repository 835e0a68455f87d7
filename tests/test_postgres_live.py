"""LIVE PostgreSQL 15 round-trip of the upsert seam (round 10 — the
r8/r9 verdicts' standing stretch ask: the reference deployment's sink
is Postgres 15, and until now the live sink tests ran the same code
paths only against embedded Derby).

The sandbox has Postgres 15 server binaries but no JDBC jar and no
Python driver, so the TRANSPORT here is the psql client (CSV \\copy
in, CSV out) — but everything under test is the engine's own code:

- ``build_upsert_sql(dialect="postgres")`` — the reference's
  ``INSERT ... ON CONFLICT (keys) DO UPDATE SET col = EXCLUDED.col``
  shape (reference etl/load.py:91-96) — PREPAREd and EXECUTEd
  statement-for-statement on a real Postgres 15 server (JDBC ``?``
  placeholders map 1:1 to PG-wire ``$n``), unguarded and
  version-guarded;
- ``build_upsert_sql(dialect="merge")`` — the staged-MERGE twin the
  Derby test drives — run as Postgres 15 native ``MERGE``;
- final table state compared row-for-row against the engine's own
  ``upsert_last_wins`` compaction of the same event stream, the
  equivalence the README's dialect-seam note promises.

Each test run initdb's a private scratch cluster on a unix socket
under /tmp and tears it down; everything is env-gated (skipped where
the server binaries, the ``postgres`` user, or root are missing).
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import uuid
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sales_etl_spark.load import build_upsert_sql  # noqa: E402
from sales_etl_spark.operators.upsert import upsert_last_wins  # noqa: E402

PG_BIN = Path("/usr/local/bin")
PG_PORT = "54331"

_have_pg = (
    (PG_BIN / "initdb").exists()
    and (PG_BIN / "pg_ctl").exists()
    and shutil.which("psql") is not None
)
_have_user = (
    os.geteuid() != 0
    or (
        shutil.which("runuser") is not None
        and subprocess.run(
            ["id", "-u", "postgres"], capture_output=True
        ).returncode
        == 0
    )
)

pytestmark = pytest.mark.skipif(
    not (_have_pg and _have_user),
    reason="PostgreSQL server binaries / postgres user not available",
)


def _as_pg(cmd: list[str]) -> list[str]:
    """Run a server-side command as a non-root user (postgres refuses
    to run as root; the sandbox runs tests as root)."""
    if os.geteuid() == 0:
        return ["runuser", "-u", "postgres", "--", *cmd]
    return cmd


@pytest.fixture(scope="module")
def pg(tmp_path_factory):
    """A private scratch Postgres 15 cluster on a unix socket."""
    base = Path("/tmp") / f"pg_live_{uuid.uuid4().hex[:8]}"
    base.mkdir()
    if os.geteuid() == 0:
        shutil.chown(base, user="postgres", group="postgres")
    data = base / "data"
    subprocess.run(
        _as_pg([str(PG_BIN / "initdb"), "-D", str(data), "-U", "postgres"]),
        check=True, capture_output=True,
    )
    subprocess.run(
        _as_pg([
            str(PG_BIN / "pg_ctl"), "-D", str(data),
            "-l", str(base / "log"),
            "-o", f"-p {PG_PORT} -k {base} -c listen_addresses=''",
            "start",
        ]),
        check=True, capture_output=True,
    )
    try:
        yield {"host": str(base), "port": PG_PORT}
    finally:
        subprocess.run(
            _as_pg([str(PG_BIN / "pg_ctl"), "-D", str(data), "stop"]),
            capture_output=True,
        )
        shutil.rmtree(base, ignore_errors=True)


def _psql(pg: dict, sql: str, stdin: str | None = None) -> str:
    """One psql invocation, CSV output, errors fatal."""
    proc = subprocess.run(
        [
            "psql", "-h", pg["host"], "-p", pg["port"], "-U", "postgres",
            "-d", "postgres", "-v", "ON_ERROR_STOP=1",
            "--csv", "-t", "-q", "-c", sql,
        ],
        input=stdin, capture_output=True, text=True,
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def _pg_placeholders(stmt: str) -> str:
    """JDBC ``?`` positional placeholders -> PG-wire ``$n`` (the
    1:1 mapping a JDBC driver performs)."""
    out, n = [], 0
    for ch in stmt:
        if ch == "?":
            n += 1
            out.append(f"${n}")
        else:
            out.append(ch)
    return "".join(out)


#: Out-of-order, replayed event stream: key 1 arrives v2 then v1 then
#: a v2 replay; key 2 arrives in order; key 3 is insert-only.
EVENTS = [
    (1, "one-v2", 2),
    (1, "one-v1", 1),
    (2, "two-v1", 1),
    (1, "one-v2", 2),
    (2, "two-v3", 3),
    (3, "three-v1", 1),
    (1, "one-v1-late", 1),  # stale straggler: the guard's raison d'etre
]


def _spark_want(spark, guarded: bool) -> set:
    """The engine's own last-wins compaction of the same stream —
    what a version-guarded sink must converge to. (An UNGUARDED
    per-row upsert applied in arrival order ends at the last arrival
    per key instead; computed inline in the test.)"""
    df = spark.createDataFrame(EVENTS, "k long, v string, ver long")
    rows = upsert_last_wins(df, keys=["k"], order_by=["ver"]).collect()
    return {(r.k, r.v, r.ver) for r in rows}


def test_on_conflict_guarded_matches_last_wins(spark, pg):
    """The reference's ON CONFLICT statement, version-guarded,
    executed row-by-row on live Postgres 15 over an out-of-order
    replayed stream, converges to upsert_last_wins exactly."""
    _psql(pg, "DROP TABLE IF EXISTS t_guard;"
              "CREATE TABLE t_guard (k bigint PRIMARY KEY,"
              " v text, ver bigint)")
    stmt = _pg_placeholders(
        build_upsert_sql(
            "t_guard", ["k", "v", "ver"], ["k"],
            dialect="postgres", guard_by=["ver"],
        )
    )
    batch = [f"PREPARE ups (bigint, text, bigint) AS {stmt};"]
    batch += [f"EXECUTE ups({k}, '{v}', {ver});" for k, v, ver in EVENTS]
    _psql(pg, "\n".join(batch))
    got = {
        (int(k), v, int(ver))
        for k, v, ver in (
            line.split(",")
            for line in _psql(
                pg, "SELECT k, v, ver FROM t_guard ORDER BY k"
            ).strip().splitlines()
        )
    }
    assert got == _spark_want(spark, guarded=True)
    assert got == {(1, "one-v2", 2), (2, "two-v3", 3), (3, "three-v1", 1)}


def test_on_conflict_unguarded_is_arrival_order(spark, pg):
    """The reference's UNGUARDED form (its single-threaded loop is
    ordered by construction) ends at the LAST ARRIVAL per key — the
    documented reason guard_by exists for out-of-order sinks."""
    _psql(pg, "DROP TABLE IF EXISTS t_raw;"
              "CREATE TABLE t_raw (k bigint PRIMARY KEY,"
              " v text, ver bigint)")
    stmt = _pg_placeholders(
        build_upsert_sql("t_raw", ["k", "v", "ver"], ["k"],
                         dialect="postgres")
    )
    batch = [f"PREPARE ups (bigint, text, bigint) AS {stmt};"]
    batch += [f"EXECUTE ups({k}, '{v}', {ver});" for k, v, ver in EVENTS]
    _psql(pg, "\n".join(batch))
    got = {
        (int(k), v, int(ver))
        for k, v, ver in (
            line.split(",")
            for line in _psql(
                pg, "SELECT k, v, ver FROM t_raw ORDER BY k"
            ).strip().splitlines()
        )
    }
    last_arrival = {k: (k, v, ver) for k, v, ver in EVENTS}
    assert got == set(last_arrival.values())
    assert got != _spark_want(spark, guarded=False)  # the gap is real


def test_staged_merge_on_postgres15(spark, pg):
    """The staged-MERGE twin (the statement the Derby live test
    drives) runs natively on Postgres 15: stage via \\copy, MERGE
    with the version guard, converge to upsert_last_wins."""
    _psql(pg, "DROP TABLE IF EXISTS t_m; DROP TABLE IF EXISTS t_m_stage;"
              "CREATE TABLE t_m (k bigint PRIMARY KEY, v text, ver bigint);"
              "CREATE TABLE t_m_stage (k bigint, v text, ver bigint)")
    # seed the target with the v1 generation, stage the full stream
    # compacted (the staged-MERGE contract: one winning row per key
    # in staging; the guard decides against the seeded generation)
    _psql(pg, "INSERT INTO t_m VALUES (1,'one-v1',1), (2,'two-v1',1)")
    df = spark.createDataFrame(EVENTS, "k long, v string, ver long")
    staged = upsert_last_wins(df, keys=["k"], order_by=["ver"])
    csv = "\n".join(
        f"{r.k},{r.v},{r.ver}" for r in staged.collect()
    )
    _psql(
        pg,
        "\\copy t_m_stage FROM STDIN WITH (FORMAT csv)",
        stdin=csv + "\n",
    )
    merge = build_upsert_sql(
        "t_m", ["k", "v", "ver"], ["k"],
        dialect="merge", guard_by=["ver"],
    )
    _psql(pg, merge)
    got = {
        (int(k), v, int(ver))
        for k, v, ver in (
            line.split(",")
            for line in _psql(
                pg, "SELECT k, v, ver FROM t_m ORDER BY k"
            ).strip().splitlines()
        )
    }
    assert got == _spark_want(spark, guarded=True)


def test_mart_roundtrip_through_postgres(spark, pg):
    """The flagship mart's rows survive a full live round-trip
    through the reference's actual sink engine: Spark mart -> CSV
    \\copy -> Postgres 15 table -> CSV out -> compare values,
    including the date and double coercions the sink seam applies."""
    from sales_etl_spark.plans import QUERY_REGISTRY

    mart = QUERY_REGISTRY["agg_sales_summary"].builder(
        spark, "/root/testdata/sf0.001"
    )
    rows = mart.collect()
    cols = mart.columns
    _psql(pg, "DROP TABLE IF EXISTS sales_summary;"
              "CREATE TABLE sales_summary (category text, month text,"
              " total_sales double precision, total_quantity double precision,"
              " average_order_value double precision,"
              " period_date date)")
    csv = "\n".join(
        ",".join("" if r[c] is None else str(r[c]) for c in cols)
        for r in rows
    )
    _psql(
        pg,
        f"\\copy sales_summary ({', '.join(cols)}) FROM STDIN"
        " WITH (FORMAT csv, NULL '')",
        stdin=csv + "\n",
    )
    out = _psql(
        pg,
        "SELECT category, month, total_sales, total_quantity,"
        " average_order_value, period_date"
        " FROM sales_summary ORDER BY category, month",
    ).strip().splitlines()
    assert len(out) == len(rows) > 0
    want = sorted(
        (
            str(r.category), r.month, float(r.total_sales),
            float(r.total_quantity),
            float(r.average_order_value), str(r.period_date),
        )
        for r in rows
    )
    got = [
        (c, m, float(ts), float(tq), float(aov), d)
        for c, m, ts, tq, aov, d in (line.split(",") for line in out)
    ]
    assert got == want
