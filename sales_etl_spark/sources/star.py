"""Loader for the driver's TPC-H-ish star schema (TESTDATA.md).

One validated parquet reader per table, plus the column-mapped views
that re-express the reference's sales/customers data model on the star
schema (FIXTURES.md §4):

- ``sales`` fact  = lineitem ⨝ orders (category = o_orderpriority)
- ``customers`` dim = customer ⨝ nation ⨝ region (region = r_name)
- ``products`` dim = part
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_etl_spark import schemas
from sales_etl_spark.sources.readers import read_parquet


@dataclass
class StarSchema:
    """Lazy handle on the star-schema tables under one sf directory."""

    spark: SparkSession
    sf_dir: str
    _cache: dict[str, DataFrame] = field(default_factory=dict)

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in schemas.STAR_REQUIRED:
                raise KeyError(f"unknown star table: {name}")
            df = read_parquet(
                self.spark,
                f"{self.sf_dir}/{name}.parquet",
                required=schemas.STAR_REQUIRED[name],
            )
            if name == "events" and dict(df.dtypes).get("ts") == "bigint":
                # TIMESTAMP(NANOS) parquet read as long nanos (see
                # session._RUNTIME_CONFS): truncate to µs with exact
                # integer division (DuckDB truncates identically), then
                # to NTZ under the pinned UTC session.
                df = df.withColumn(
                    "ts",
                    F.timestamp_micros(
                        F.expr("CAST(ts AS BIGINT) div 1000")
                    ).cast("timestamp_ntz"),
                )
            self._cache[name] = df
        return self._cache[name]

    def __getattr__(self, name: str) -> DataFrame:
        if name in schemas.STAR_REQUIRED:
            return self.table(name)
        raise AttributeError(name)

    # -- reference-model views (FIXTURES.md §4 column mapping) ---------

    def _view(self, name: str, build) -> DataFrame:
        """Memoize a derived view's (immutable) plan per schema handle."""
        key = f"__view_{name}"
        if key not in self._cache:
            self._cache[key] = build()
        return self._cache[key]

    def sales(self) -> DataFrame:
        """Reference sales-fact view: one row per order line.

        ``total_price = quantity * unit_price`` is computed here in
        DECIMAL(18,2) (see ``schemas.MONEY``) so downstream sums are
        exact under any partitioning. The lineitem→orders join is a
        pure equi-join on the order key; at scale orders is the smaller
        side after pruning and AQE picks broadcast/shuffled-hash as
        sizes dictate.
        """
        return self._view("sales", self._build_sales)

    def _build_sales(self) -> DataFrame:
        li = self.table("lineitem").select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_partkey").alias("product_id"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("unit_price"),
        )
        orders = self.table("orders").select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_orderpriority").alias("category"),
        )
        return li.join(orders, "order_id", "inner").withColumn(
            "total_price",
            (F.col("quantity") * F.col("unit_price")).cast(schemas.MONEY),
        )

    def customers(self) -> DataFrame:
        """Reference customers-dim view: customer ⨝ nation ⨝ region,
        with the nation→region hop CONSTANT-FOLDED into a literal map.

        nation (25 rows) and region (5 rows) have fixed, spec-bounded
        cardinality at every scale factor — they are lookup constants,
        not data. Folding them into a ``create_map`` literal (collected
        once per schema handle, memoized) removes two broadcast-exchange
        builds — two scheduled jobs — from EVERY plan that touches the
        customers dim; the remaining per-row cost is a ≤25-entry codegen
        map probe, cheaper than the hash-relation lookups it replaces.
        Missing nationkey → NULL map hit → same NULL region the left
        joins produced. NOT applied to the customer table itself, which
        scales with SF and stays a broadcast-joined DataFrame dim.
        """
        return self._view("customers", self._build_customers)

    def _build_customers(self) -> DataFrame:
        c = self.table("customer").select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_name").alias("customer_name"),
            F.col("c_nationkey").alias("nationkey"),
        )
        n = self.table("nation").select(
            F.col("n_nationkey").alias("nationkey"),
            F.col("n_regionkey").alias("regionkey"),
        )
        r = self.table("region").select(
            F.col("r_regionkey").alias("regionkey"),
            F.col("r_name").alias("region"),
        )
        # Rows whose region is NULL are simply left out of the map — an
        # absent key probes to NULL, identical to the left-join result
        # (and map literals must not carry null values).
        nation_region = [
            row
            for row in n.join(F.broadcast(r), "regionkey", "left")
            .select("nationkey", "region")
            .collect()
            if row.region is not None
        ]
        if nation_region:
            region_map = F.create_map(
                *[
                    F.lit(x)
                    for row in nation_region
                    for x in (row.nationkey, row.region)
                ]
            )
            region = region_map[F.col("nationkey")]
        else:
            region = F.lit(None).cast("string")
        return c.select(
            "customer_id", "customer_name", region.alias("region")
        )

    def products(self) -> DataFrame:
        return self._view(
            "products",
            lambda: self.table("part").select(
                F.col("p_partkey").alias("product_id"),
                F.col("p_name").alias("product_name"),
            ),
        )


#: Process-level StarSchema memo. DataFrames are immutable lazy plans,
#: so reusing one handle per (application, sf_dir) is semantics-free —
#: but it removes the per-query driver cost of re-resolving parquet
#: footers and re-validating columns (measured ~0.1s/table/call, the
#: dominant share of "plan build" latency for multi-table queries; at
#: cluster scale the same RPCs hit the namenode instead of being free).
#:
#: Staleness contract: a cached plan captures its parquet FILE LISTING
#: at first resolution. If files under ``sf_dir`` are rewritten within
#: the same application (e.g. a test regenerating fixtures), pass
#: ``refresh=True`` to drop the memo and re-resolve — otherwise reads
#: may hit stale/deleted files. Keys are (applicationId, abspath), so
#: relative and absolute spellings of one directory share an entry and
#: the cache cannot grow beyond the set of distinct directories used.
_STAR_CACHE: dict[tuple[str, str], StarSchema] = {}


def load_star(
    spark: SparkSession, sf_dir: str, refresh: bool = False
) -> StarSchema:
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    st = _STAR_CACHE.get(key)
    if refresh or st is None or st.spark is not spark:
        st = StarSchema(spark, sf_dir)
        _STAR_CACHE[key] = st
    return st
