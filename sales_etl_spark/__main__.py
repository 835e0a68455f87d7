"""``python -m sales_etl_spark`` — the orchestration entry point
(reference ``main.py:61-96`` parity, Spark-native).

Flow mirrors the reference: extract CSVs → transform → build the three
marts → log the avg-check report (O3) → load the four warehouse tables
→ exit non-zero on any failure (O4). Differences by design:

- the load target is the lake (``--output-dir`` parquet, the
  bench/test path) or catalog-managed warehouse tables
  (``--warehouse``); a JDBC URL (``--jdbc-url``) selects the DB path
  like the reference's PostgreSQL load;
- ``--snapshot-date`` replaces the reference's wall-clock ``today``
  (transform.py:93) so reruns are deterministic;
- per-step row counts ride on ``observe`` accumulators collected from
  the load actions themselves — zero extra count() jobs (the
  reference logs ``len(df)`` eagerly at every step).
"""

from __future__ import annotations

import argparse
import datetime as dt
import logging
import sys

logger = logging.getLogger("sales_etl_spark")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m sales_etl_spark",
        description="Run the reference-parity sales ETL on Spark, or "
        "any named query from the registry (--query / --list-queries).",
    )
    p.add_argument("--sales", help="sales CSV path (ETL mode)")
    p.add_argument("--customers", help="customers CSV path (ETL mode)")
    p.add_argument(
        "--snapshot-date",
        default=None,
        help="YYYY-MM-DD snapshot for customer_days (default: today, "
        "logged — pin it for deterministic reruns)",
    )
    p.add_argument("--top-n", type=int, default=5, help="ranking size")
    sink = p.add_mutually_exclusive_group(required=False)
    sink.add_argument("--output-dir", help="parquet lake directory")
    sink.add_argument(
        "--lake-dir",
        help="transaction-log lake directory (atomic versioned "
        "commits + time travel; sales_etl_spark.lake)",
    )
    sink.add_argument(
        "--warehouse", help="catalog database for managed tables"
    )
    sink.add_argument("--jdbc-url", help="JDBC URL for a DB warehouse")
    p.add_argument("--master", default=None, help="Spark master override")
    # -- registry query-runner mode -----------------------------------
    p.add_argument(
        "--query", help="run one registered query by name instead of "
        "the ETL (see --list-queries)",
    )
    p.add_argument(
        "--sf-dir", default=None,
        help="star-schema parquet directory for --query",
    )
    p.add_argument(
        "--limit", type=int, default=20,
        help="rows to print when --query has no --output-dir",
    )
    p.add_argument(
        "--list-queries", action="store_true",
        help="list registered query names and exit",
    )
    p.add_argument(
        "--explain", action="store_true",
        help="with --query: print the formatted physical plan "
        "instead of executing (scan pruning, exchanges, join "
        "strategies — the scale story of the query, inspectable)",
    )
    # -- ad-hoc SQL mode ----------------------------------------------
    p.add_argument(
        "--sql", metavar="QUERY",
        help="run an ad-hoc SQL query against the star schema (tables "
        "region nation customer supplier part orders lineitem events "
        "documents embeddings registered as temp views, plus the "
        "reference views sales/customers_dim/products); prints "
        "--limit rows or writes --output-dir parquet",
    )
    # -- lake maintenance mode ----------------------------------------
    p.add_argument(
        "--lake-compact", metavar="TABLE_PATH",
        help="OPTIMIZE a transaction-log lake table: bin-pack the "
        "current snapshot into --target-files files as a new atomic "
        "version (history stays time-travelable until vacuum)",
    )
    p.add_argument(
        "--target-files", type=int, default=1,
        help="output file count for --lake-compact",
    )
    p.add_argument(
        "--lake-vacuum", metavar="TABLE_PATH",
        help="reclaim data files unreferenced by the retained "
        "versions (see --keep-versions); prints what was deleted",
    )
    p.add_argument(
        "--keep-versions", type=int, default=1,
        help="history retention for --lake-vacuum (time travel "
        "keeps working for the newest N versions)",
    )
    p.add_argument(
        "--lake-fsck", metavar="TABLE_PATH",
        help="manifest integrity audit: missing files (fatal), "
        "orphans, stale index entries, version gaps; exit 1 if a "
        "reader-visible invariant is broken",
    )
    p.add_argument(
        "--lake-delete", metavar="TABLE_PATH",
        help="row-level DELETE on a lake table via positional deletion "
        "vectors (no data-file rewrite; --where gives the predicate; "
        "the next --lake-compact materializes the deletions)",
    )
    p.add_argument(
        "--where", metavar="SQL_PREDICATE",
        help="boolean SQL predicate for --lake-delete "
        "(e.g. \"order_date < DATE '2020-01-01'\")",
    )
    return p


def run_query(args) -> int:
    """Registry query-runner: build the named query against --sf-dir,
    then write parquet (--output-dir) or print the first --limit rows.
    This is how a reference user runs ANY single operator without
    writing a script."""
    from sales_etl_spark.plans import QUERY_REGISTRY
    from sales_etl_spark.session import get_spark

    if args.query not in QUERY_REGISTRY:
        logger.error(
            "unknown query %r — run --list-queries for the registry",
            args.query,
        )
        return 1
    if not args.sf_dir:
        logger.error("--query requires --sf-dir")
        return 1
    spark = get_spark("sales-etl-spark-cli", master=args.master)
    df = QUERY_REGISTRY[args.query].builder(spark, args.sf_dir)
    if args.explain:
        df.explain(mode="formatted")  # public API; prints to stdout
        return 0
    if args.output_dir:
        from sales_etl_spark import load as sinks

        out = f"{args.output_dir}/{args.query}"
        sinks.write_parquet(df, out)
        logger.info("wrote %s", out)
    else:
        # bounded driver materialization, like any interactive show()
        print(df._jdf.showString(args.limit, 40, False))
    return 0


def run_sql(args) -> int:
    """Ad-hoc SQL entry point: every star table (and the reference
    model views) pre-registered as temp views, the user's statement
    handed straight to Catalyst — the engine's open query surface
    (the reference exposes pandas frames; the Spark-first equivalent
    is SQL over the same relations)."""
    from sales_etl_spark import schemas
    from sales_etl_spark.session import get_spark
    from sales_etl_spark.sources.star import load_star

    if not args.sf_dir:
        logger.error("--sql requires --sf-dir")
        return 1
    spark = get_spark("sales-etl-spark-cli", master=args.master)
    st = load_star(spark, args.sf_dir)
    for t in schemas.STAR_REQUIRED:
        st.table(t).createOrReplaceTempView(t)
    st.sales().createOrReplaceTempView("sales")
    st.customers().createOrReplaceTempView("customers_dim")
    st.products().createOrReplaceTempView("products")
    df = spark.sql(args.sql)
    if args.explain:
        df.explain(mode="formatted")
        return 0
    if args.output_dir:
        from sales_etl_spark import load as sinks

        out = f"{args.output_dir}/sql_result"
        sinks.write_parquet(df, out)
        logger.info("wrote %s", out)
    else:
        print(df._jdf.showString(args.limit, 40, False))
    return 0


def _format_report(rows) -> str:
    """Pretty-print the avg-check mart (reference main.py:80 logs the
    frame via to_string)."""
    header = f"{'region':<16}{'avg_check':>14}{'orders_count':>14}"
    lines = [header, "-" * len(header)]
    for r in rows:
        lines.append(
            f"{r['region']:<16}{r['avg_check']:>14.2f}"
            f"{r['orders_count']:>14d}"
        )
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s [%(levelname)s] %(name)s - %(message)s",
    )
    args = build_parser().parse_args(argv)
    if args.list_queries:
        from sales_etl_spark.plans import QUERY_REGISTRY

        for name, qd in QUERY_REGISTRY.items():
            kind = "oracle" if qd.oracle else "rows-only"
            print(f"{name:<28} [{kind}] {qd.doc.splitlines()[0][:80]}")
        return 0
    if args.query:
        try:
            return run_query(args)
        except Exception:
            logger.exception("query run failed")
            return 1
    if args.sql:
        try:
            return run_sql(args)
        except Exception:
            logger.exception("sql run failed")
            return 1
    if args.lake_compact:
        from sales_etl_spark import lake
        from sales_etl_spark.session import get_spark

        try:
            spark = get_spark("sales-etl-spark-cli", master=args.master)
            v = lake.compact(
                spark, args.lake_compact, target_files=args.target_files
            )
            logger.info(
                "compacted %s -> version %d (%d files)",
                args.lake_compact, v, args.target_files,
            )
            return 0
        except Exception:
            logger.exception("lake compaction failed")
            return 1
    if args.lake_fsck:
        import json as _json

        from sales_etl_spark import lake

        report = lake.fsck(args.lake_fsck)
        print(_json.dumps(report, indent=2, default=str))
        return 0 if report["ok"] else 1
    if args.lake_vacuum:
        from sales_etl_spark import lake

        try:
            if not lake.versions(args.lake_vacuum):
                logger.error(
                    "no committed versions at %s — not a lake table",
                    args.lake_vacuum,
                )
                return 1
            deleted = lake.vacuum(
                args.lake_vacuum, keep_versions=args.keep_versions
            )
            logger.info(
                "vacuumed %s: %d files reclaimed (kept %d versions)",
                args.lake_vacuum, len(deleted), args.keep_versions,
            )
            return 0
        except Exception:
            logger.exception("lake vacuum failed")
            return 1
    if args.lake_delete:
        from sales_etl_spark import lake
        from sales_etl_spark.session import get_spark

        if not args.where:
            logger.error("--lake-delete needs --where SQL_PREDICATE")
            return 1
        try:
            spark = get_spark("sales-etl-spark-cli", master=args.master)
            v = lake.delete_where(spark, args.lake_delete, args.where)
            if v is None:
                logger.info(
                    "delete matched no rows at %s — no version committed",
                    args.lake_delete,
                )
            else:
                logger.info(
                    "deleted rows matching %r -> version %d (vectors "
                    "only; run --lake-compact to materialize)",
                    args.where, v,
                )
            return 0
        except Exception:
            logger.exception("lake delete failed")
            return 1
    if not (args.sales and args.customers):
        logger.error(
            "ETL mode needs --sales and --customers (or use --query)"
        )
        return 1
    if not (args.output_dir or args.lake_dir or args.warehouse
            or args.jdbc_url):
        logger.error("ETL mode needs a sink: --output-dir / --lake-dir "
                     "/ --warehouse / --jdbc-url")
        return 1
    try:
        from sales_etl_spark import load as sinks
        from sales_etl_spark.pipeline import run_pipeline
        from sales_etl_spark.session import get_spark
        from sales_etl_spark.sources.readers import (
            read_customers_csv,
            read_sales_csv,
        )

        snapshot = (
            dt.date.fromisoformat(args.snapshot_date)
            if args.snapshot_date
            else dt.date.today()
        )
        logger.info("snapshot_date=%s top_n=%d", snapshot, args.top_n)

        spark = get_spark("sales-etl-spark-cli", master=args.master)

        sales_raw = read_sales_csv(spark, args.sales)
        customers_raw = read_customers_csv(spark, args.customers)
        result = run_pipeline(
            spark, sales_raw, customers_raw, snapshot, top_n=args.top_n
        )

        # O3: the avg-check report — a |regions|-row mart, safe to
        # collect on the driver at any scale.
        report_rows = result.avg_check_by_region.collect()
        logger.info(
            "Average check by region:\n%s", _format_report(report_rows)
        )

        marts = {
            "sales": result.sales,
            "customers": result.customers,
            "sales_summary": result.sales_summary,
            "product_ranking": result.product_ranking,
        }
        if args.output_dir:
            for name, df in marts.items():
                sinks.write_parquet(df, f"{args.output_dir}/{name}")
        elif args.lake_dir:
            from sales_etl_spark import lake

            for name, df in marts.items():
                v = lake.commit_write(
                    df, f"{args.lake_dir}/{name}", mode="overwrite"
                )
                logger.info("committed %s as version %d", name, v)
        elif args.warehouse:
            sinks.create_warehouse_tables(spark, args.warehouse)
            for name, df in marts.items():
                sinks.load_warehouse_table(df, name, args.warehouse)
        else:
            for name, df in marts.items():
                sinks.jdbc_write(
                    df, args.jdbc_url, name, mode="overwrite", truncate=True
                )

        # The load actions above materialized the observed frames, so
        # the accumulators are populated — structured per-step counts
        # without one extra job (reference logs len(df) per step).
        for name, obs in result.observations.items():
            logger.info("rows[%s]=%s", name, obs.get.get("rows"))
        result.unpersist()
        logger.info("ETL run completed")
        return 0
    except Exception:
        logger.exception("ETL run failed")
        return 1


if __name__ == "__main__":
    sys.exit(main())
