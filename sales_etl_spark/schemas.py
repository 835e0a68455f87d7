"""Explicit schemas for every source the engine reads.

The reference validates *structure* eagerly (required-column allowlist,
hard error listing what is missing — reference ``etl/extract.py:13-30,
53-61``) while letting the CSV reader infer *types*. At 100 TB an
inference pass over the data is an extra full scan, so this engine
flips that: types are explicit ``StructType``s handed to the reader
(zero inference I/O) and the same structural validation runs against
``df.columns`` before any job is submitted.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference data model (sales fact + customers dim, SURVEY.md §1.1)
# ---------------------------------------------------------------------------

#: CSV schema of the sales fact (reference ``data/sales.csv``,
#: required columns per ``etl/extract.py:13-22``).
SALES_CSV = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("customer_id", T.StringType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("product_name", T.StringType()),
        T.StructField("quantity", T.IntegerType()),
        T.StructField("unit_price", T.DoubleType()),
        T.StructField("order_date", T.StringType()),  # parsed null-on-error
        T.StructField("category", T.StringType()),
    ]
)

#: CSV schema of the customers dimension (``etl/extract.py:24-30``).
CUSTOMERS_CSV = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("customer_name", T.StringType()),
        T.StructField("email", T.StringType()),
        T.StructField("registration_date", T.StringType()),  # null-on-error
        T.StructField("region", T.StringType()),
    ]
)

SALES_REQUIRED = tuple(f.name for f in SALES_CSV.fields)
CUSTOMERS_REQUIRED = tuple(f.name for f in CUSTOMERS_CSV.fields)

# ---------------------------------------------------------------------------
# Driver star schema (TPC-H-ish; TESTDATA.md). Parquet carries its own
# schema so these are for validation + documentation, not inference.
# ---------------------------------------------------------------------------

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

STAR_REQUIRED: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_name", "n_regionkey"),
    "customer": ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier": ("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part": ("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders": (
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ),
    "lineitem": (
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    ),
    "events": ("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents": ("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings": ("vec_id", "embedding", "label"),
}

#: Money columns are computed in DECIMAL(18,2): distributed double sums
#: depend on partition/merge order; decimal sums do not.
MONEY = T.DecimalType(18, 2)
