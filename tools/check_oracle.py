"""Local mirror of the driver's t2 correctness gate.

Runs every registered query on Spark AND its DuckDB oracle on the same
parquet, then compares: row count, schema (column names), and values
(columns sorted by name, rows sorted, floats compared BIT-EXACT first
and with tolerance second). Bit-exact is the bar — the driver hashes
values, so "close" is not good enough; any query reported as
tolerance-only needs its arithmetic made order-independent (decimal
sums, deterministic folds).

ORACLE_DIGEST=1 switches to the ENGINE-SIDE comparator
(tools/engine_digest.py): each engine computes the canonical
order-insensitive value-hash itself and returns ONE row — no pandas
fetch, no sort — so row-grain marts (1.5-6 M rows at sf1.0) verify in
scan time instead of minutes of driver-side fetch+sort. Queries whose
output schema the digest can't canonicalize (arrays/structs) fall
back to the pandas comparator automatically.

Usage:
    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # Sharded big-SF sweeps (sf1.0 twin, 4 parallel shards) need fair
    # resource splits: DuckDB defaults to ALL cores and unbounded
    # memory per connection, so 4 shards thrash 128 threads and race
    # toward one box-wide OOM. Opt-in knobs; single-process runs keep
    # the defaults.
    threads = os.environ.get("ORACLE_DUCK_THREADS")
    if threads:
        con.execute(f"SET threads={int(threads)}")
    memlim = os.environ.get("ORACLE_DUCK_MEM")
    if memlim:
        con.execute(f"SET memory_limit='{memlim}'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        # driver testdata is a single file; Spark-written tables (the
        # sf1.0 synth twin from tools/scaling_curve.py) are part-file
        # DIRECTORIES, which DuckDB needs as a glob
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


# DuckDB output types whose pandas round-trip diverges from Spark's
# even when values are equal: HUGEINT/UHUGEINT fetch as Python ints /
# object dtype (vs Spark's int64) and DECIMAL as decimal.Decimal (vs
# float64), so the driver's stringify-then-hash comparator reds a
# bit-identical result. The r6 driver's only two failures were exactly
# this — SUM(CASE...) widening to HUGEINT in two oracles. Oracles must
# CAST such columns to BIGINT / DOUBLE at the output boundary (the
# oracle-side mirror of the no-DecimalType Spark-schema guard).
BANNED_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_dtype_offenders(
    con: duckdb.DuckDBPyConnection, oracle_sql: str
) -> list:
    """(column, duckdb_type) pairs in the oracle's DECLARED output
    schema that would hash differently at the driver. Schema-only:
    DESCRIBE plans the query without executing it."""
    rows = con.execute(f"DESCRIBE ({oracle_sql})").fetchall()
    return [
        (name, ctype)
        for name, ctype, *_ in rows
        if any(ctype.upper().startswith(b) for b in BANNED_ORACLE_TYPES)
    ]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Columns sorted by name, rows sorted by all columns — the
    order-insensitive canonical form the driver hashes."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(
            drop=True
        )
    return df


def compare(spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> dict:
    out: dict = {"rows": (len(spark_df), len(oracle_df))}
    out["rows_match"] = len(spark_df) == len(oracle_df)
    s_cols, o_cols = sorted(spark_df.columns), sorted(oracle_df.columns)
    out["schema_match"] = s_cols == o_cols
    if not out["schema_match"]:
        out["schema"] = (s_cols, o_cols)
        return out
    a, b = canon(spark_df), canon(oracle_df)
    if not out["rows_match"]:
        return out
    exact = True
    close = True
    bad_cols = []
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            col_exact = (
                (av.isna() & bv.isna()) | (av == bv)
            ).all()
        except Exception:
            col_exact = False
        if col_exact:
            continue
        exact = False
        # float tolerance pass
        try:
            af = av.astype(float)
            bf = bv.astype(float)
            both_nan = af.isna() & bf.isna()
            col_close = (
                both_nan
                | (abs(af - bf) <= 1e-9 + 1e-9 * abs(bf).fillna(0))
            ).all()
        except Exception:
            col_close = False
        if not col_close:
            close = False
        bad_cols.append(c)
    out["values_exact"] = bool(exact)
    out["values_close"] = bool(exact or close)
    if bad_cols:
        out["bad_cols"] = bad_cols
        c = bad_cols[0]
        merged = pd.DataFrame({"spark": a[c], "oracle": b[c]})
        diff = merged[
            ~(
                (merged["spark"].isna() & merged["oracle"].isna())
                | (merged["spark"] == merged["oracle"])
            )
        ]
        out["sample_diff"] = diff.head(5).to_dict("records")
    return out


def _digest_compare(
    spark, con, name, qd, sf_dir, failures, warnings
) -> bool:
    """Engine-side digest comparison for one query. Returns True when
    the comparison was fully handled here (pass or fail recorded),
    False when the schema is not digestable and the caller should run
    the pandas comparator instead."""
    from tools.engine_digest import (
        duck_digest,
        duck_schema_kinds,
        spark_digest,
        spark_schema_kinds,
    )

    try:
        df = qd.builder(spark, sf_dir)
        s_kinds = spark_schema_kinds(df)
    except Exception as e:
        failures.append((name, f"spark error: {e}"))
        print(f"FAIL  {name}: spark error: {e}")
        return True
    try:
        bad_types = oracle_dtype_offenders(con, qd.oracle)
        if bad_types:
            failures.append((name, f"oracle dtype: {bad_types}"))
            print(
                f"FAIL  {name}: oracle output dtype would diverge at "
                f"the driver hash (CAST to BIGINT/DOUBLE): {bad_types}"
            )
            return True
        o_kinds = duck_schema_kinds(con, qd.oracle)
    except Exception as e:
        failures.append((name, f"oracle error: {e}"))
        print(f"FAIL  {name}: oracle error: {e}")
        return True
    if s_kinds is None or o_kinds is None:
        return False  # array/struct output: pandas comparator
    if [c for c, _ in s_kinds] != [c for c, _ in o_kinds]:
        failures.append(
            (name, f"schema: {[c for c, _ in s_kinds]} vs "
             f"{[c for c, _ in o_kinds]}")
        )
        print(f"FAIL  {name}: schema mismatch {s_kinds} vs {o_kinds}")
        return True
    if s_kinds != o_kinds:
        # same names, different canonical kinds (e.g. int vs double):
        # the digest cannot adjudicate value equality across kinds —
        # the pandas comparator can
        return False
    try:
        sd = spark_digest(df)
        od = duck_digest(con, qd.oracle)
    except Exception as e:
        failures.append((name, f"digest error: {e}"))
        print(f"FAIL  {name}: digest error: {e}")
        return True
    if sd == od:
        print(f"PASS  {name}: {sd[0]} rows digest-exact (engine-side)")
    else:
        failures.append((name, f"digest: spark={sd} oracle={od}"))
        print(f"FAIL  {name}: digest mismatch spark={sd} oracle={od}")
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from sales_etl_spark.plans import QUERY_REGISTRY
    from sales_etl_spark.session import get_spark

    # Determinism stress knobs: results must be bit-identical under ANY
    # parallelism (see SCALE.md §12) — e.g.
    #   ORACLE_MASTER='local[16]' ORACLE_SHUFFLE=7 python tools/check_oracle.py
    # ORACLE_VANILLA=1 builds a bare ANSI-on Spark 4 session instead of
    # get_spark — the driver's exact environment (pin_semantics inside
    # each builder must then do all the work).
    import os

    if os.environ.get("ORACLE_VANILLA"):
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master(os.environ.get("ORACLE_MASTER", "local[4]"))
            .config("spark.ui.enabled", "false")
            .getOrCreate()
        )
    else:
        spark = get_spark(
            "oracle-check",
            master=os.environ.get("ORACLE_MASTER", "local[4]"),
            shuffle_partitions=int(os.environ.get("ORACLE_SHUFFLE", "8")),
        )
    con = duckdb_conn(sf_dir)
    digest_mode = bool(os.environ.get("ORACLE_DIGEST"))

    failures = []
    warnings = []
    n_run = 0
    for name, qd in sorted(QUERY_REGISTRY.items()):
        if only and name not in only:
            continue
        n_run += 1
        if n_run % 25 == 0:
            # Nudge the JVM so the ContextCleaner actually reclaims
            # dropped broadcasts (it is GC-triggered); clearCache alone
            # leaves them resident until a collection happens.
            spark._jvm.System.gc()
        # Release cached frames and let the ContextCleaner drop stale
        # broadcasts between queries: a full-registry sweep (190+
        # builders in ONE session) otherwise accumulates driver heap
        # until a late broadcast build OOMs — observed at sf0.1 as
        # spurious STAGE_MATERIALIZATION failures on the last few
        # queries, each passing in a fresh session. Verification
        # harness: correctness isolation beats cache reuse here.
        spark.catalog.clearCache()
        if digest_mode and qd.oracle is not None:
            done = _digest_compare(
                spark, con, name, qd, sf_dir, failures, warnings
            )
            if done:
                continue
            # fall through: schema not digestable — pandas comparator
        try:
            sdf = qd.builder(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"spark error: {e}"))
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if qd.oracle is None:
            status = "rows-only"
            print(f"OK?   {name}: {len(sdf)} rows ({status}, no oracle)")
            continue
        try:
            bad_types = oracle_dtype_offenders(con, qd.oracle)
            if bad_types:
                failures.append((name, f"oracle dtype: {bad_types}"))
                print(
                    f"FAIL  {name}: oracle output dtype would diverge at "
                    f"the driver hash (CAST to BIGINT/DOUBLE): {bad_types}"
                )
                continue
            odf = con.execute(qd.oracle).fetchdf()
        except Exception as e:
            failures.append((name, f"oracle error: {e}"))
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        res = compare(sdf, odf)
        if not (res.get("rows_match") and res.get("schema_match")):
            failures.append((name, res))
            print(f"FAIL  {name}: {res}")
        elif not res.get("values_exact"):
            if res.get("values_close"):
                warnings.append((name, res))
                print(
                    f"WARN  {name}: close-not-exact cols={res.get('bad_cols')}"
                )
                print(f"      sample: {res.get('sample_diff')}")
            else:
                failures.append((name, res))
                print(
                    f"FAIL  {name}: value mismatch cols={res.get('bad_cols')} "
                    f"sample={res.get('sample_diff')}"
                )
        else:
            print(f"PASS  {name}: {len(sdf)} rows bit-exact")
    print(
        f"\n{len(failures)} failures, {len(warnings)} close-not-exact "
        f"warnings"
    )
    spark.stop()
    # The bar is bit-exact (the driver's value-hash comparison): a
    # close-not-exact WARN is a failure for automation purposes too.
    return 1 if failures or warnings else 0


if __name__ == "__main__":
    raise SystemExit(main())
