"""Core reference-parity queries (SURVEY.md §2) on the star schema.

Column mapping (FIXTURES.md §4): lineitem ⨝ orders plays the sales
fact (category = o_orderpriority), customer ⨝ nation ⨝ region plays
the customers dim, part plays the product dim.

Each builder is the Spark-first expression of one reference operator;
the paired oracle is the ANSI-SQL statement DuckDB executes on the same
parquet. Reference citations in docstrings point into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sales_etl_spark.functions.scalars import (
    EMAIL_PATTERN,
    email_valid,
    month_str,
    period_date,
    safe_div,
)
from sales_etl_spark.operators import aggregates, cleaning, upsert, windows
from sales_etl_spark.plans.registry import QUERY_REGISTRY, query
from sales_etl_spark.session import pin_semantics
from sales_etl_spark.sources.star import load_star

# ---------------------------------------------------------------------------
# Shared oracle CTEs (DuckDB) mirroring StarSchema.sales()/customers()
# ---------------------------------------------------------------------------

SALES_CTE = """
sales AS (
    SELECT o.o_orderkey                                            AS order_id,
           o.o_custkey                                             AS customer_id,
           l.l_partkey                                             AS product_id,
           l.l_quantity                                            AS quantity,
           l.l_extendedprice                                       AS unit_price,
           CAST(o.o_orderdate AS DATE)                             AS order_date,
           o.o_orderpriority                                       AS category,
           CAST(l.l_quantity * l.l_extendedprice AS DECIMAL(18,2)) AS total_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
)
"""

CUSTOMERS_CTE = """
customers AS (
    SELECT c.c_custkey AS customer_id,
           c.c_name    AS customer_name,
           r.r_name    AS region
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
)
"""


def _star(spark: SparkSession, sf_dir: str):
    pin_semantics(spark)
    return load_star(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.2 Projections / filters
# ---------------------------------------------------------------------------


@query(
    "proj_total_price",
    oracle="""
    SELECT l_orderkey AS order_id,
           l_linenumber AS line_number,
           CAST(CAST(l_quantity * l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
               AS total_price
    FROM lineitem
    """,
)
def proj_total_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived arithmetic column (reference etl/transform.py:26)."""
    st = _star(spark, sf_dir)
    return st.lineitem.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_number"),
        (F.col("l_quantity") * F.col("l_extendedprice"))
        .cast("decimal(18,2)")
        .cast("double")
        .alias("total_price"),
    )


@query(
    "proj_month",
    oracle="""
    SELECT o_orderkey AS order_id,
           strftime(o_orderdate, '%Y-%m') AS month
    FROM orders
    """,
)
def proj_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-string derivation 'YYYY-MM' (reference etl/transform.py:27)."""
    st = _star(spark, sf_dir)
    return st.orders.select(
        F.col("o_orderkey").alias("order_id"),
        month_str(F.col("o_orderdate")).alias("month"),
    )


@query(
    "cast_date_coerce",
    oracle="""
    SELECT o_orderkey AS order_id,
           TRY_CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS parsed_date,
           TRY_CAST(o_orderpriority AS DATE) AS bad_date
    FROM orders
    """,
)
def cast_date_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-on-error date parse (reference errors="coerce",
    etl/transform.py:20,63): a parseable string round-trips, a
    non-date string becomes NULL instead of failing the job."""
    st = _star(spark, sf_dir)
    return st.orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.try_to_date(F.date_format("o_orderdate", "yyyy-MM-dd")).alias(
            "parsed_date"
        ),
        F.try_to_date(F.col("o_orderpriority")).alias("bad_date"),
    )


@query(
    "filter_required_nonnull",
    oracle="""
    WITH """
    + SALES_CTE
    + """
    SELECT order_id, customer_id, product_id, quantity, unit_price, order_date
    FROM sales
    WHERE order_id IS NOT NULL AND customer_id IS NOT NULL
      AND order_date IS NOT NULL AND quantity IS NOT NULL
      AND unit_price IS NOT NULL
    """,
)
def filter_required_nonnull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Critical-field null filter (reference etl/transform.py:38-43),
    expressed as a pushdown-eligible predicate conjunction."""
    st = _star(spark, sf_dir)
    df = cleaning.drop_null_required(
        st.sales(),
        ["order_id", "customer_id", "order_date", "quantity", "unit_price"],
    )
    return df.select(
        "order_id", "customer_id", "product_id", "quantity", "unit_price",
        "order_date",
    )


@query(
    "fillna_default",
    oracle="""
    SELECT c_custkey AS customer_id,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'Unknown') AS segment
    FROM customer
    """,
)
def fillna_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constant null-fill (reference etl/transform.py:45-49): NULLIF
    manufactures real nulls from the data, fill_defaults closes them."""
    st = _star(spark, sf_dir)
    df = st.customer.select(
        F.col("c_custkey").alias("customer_id"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("segment"),
    )
    return cleaning.fill_defaults(df, {"segment": "Unknown"})


@query(
    "dedup_keep_first",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
    FROM lineitem
    QUALIFY row_number() OVER (
        PARTITION BY l_orderkey, l_partkey
        ORDER BY l_linenumber, l_quantity
    ) = 1
    """,
)
def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup (reference etl/transform.py:30-35):
    keep the lowest line number per (order, part). File order — the
    reference's tiebreaker — does not exist on a distributed scan, so
    the winner is defined by data, not by physical layout. The sort
    key must be a TOTAL order over the emitted columns: the testdata
    plants duplicate (orderkey, partkey, linenumber) rows with
    differing quantity, and with linenumber alone the winner would be
    partition-dependent (flaky hashes). l_quantity completes it."""
    st = _star(spark, sf_dir)
    df = cleaning.dedup_keep_first(
        st.lineitem,
        subset=["l_orderkey", "l_partkey"],
        order_by=["l_linenumber", "l_quantity"],
    )
    return df.select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")


# ---------------------------------------------------------------------------
# §2.3 Scalar functions
# ---------------------------------------------------------------------------


@query(
    "fn_email_valid",
    oracle=f"""
    WITH synth AS (
        SELECT c_custkey AS customer_id,
               CASE c_custkey % 3
                 WHEN 0 THEN regexp_replace(lower(c_name), '[^a-z0-9]', '', 'g')
                             || '@example.com'
                 WHEN 1 THEN 'not-an-email'
                 ELSE NULL
               END AS email
        FROM customer
    )
    SELECT customer_id, email,
           COALESCE(regexp_matches(email, '{EMAIL_PATTERN}'), FALSE)
               AS is_email_valid
    FROM synth
    """,
)
def fn_email_valid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email regex validation (reference etl/transform.py:79-81). The
    reference's row-wise Python .apply becomes a codegen'd rlike; the
    star schema has no email column, so one is synthesized
    deterministically from c_name (valid / invalid / NULL thirds)."""
    st = _star(spark, sf_dir)
    df = st.customer.select(
        F.col("c_custkey").alias("customer_id"),
        F.when(
            F.col("c_custkey") % 3 == 0,
            F.concat(
                F.regexp_replace(F.lower("c_name"), "[^a-z0-9]", ""),
                F.lit("@example.com"),
            ),
        )
        .when(F.col("c_custkey") % 3 == 1, F.lit("not-an-email"))
        .otherwise(F.lit(None).cast("string"))
        .alias("email"),
    )
    return df.withColumn("is_email_valid", email_valid("email"))


@query(
    "fn_customer_days",
    oracle="""
    SELECT o_orderkey AS order_id,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2026-01-01')
                AS INTEGER) AS age_days
    FROM orders
    """,
)
def fn_customer_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff against a pinned snapshot date (reference customer_days,
    etl/transform.py:92-94 — snapshot is an explicit literal, never
    wall-clock)."""
    st = _star(spark, sf_dir)
    return st.orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.datediff(F.lit("2026-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("age_days"),
    )


@query(
    "fn_period_date",
    oracle="""
    SELECT DISTINCT strftime(o_orderdate, '%Y-%m') AS month,
           TRY_CAST(strftime(o_orderdate, '%Y-%m') || '-01' AS DATE)
               AS period_date
    FROM orders
    """,
)
def fn_period_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-string → first-of-month date (reference etl/transform.py:113)."""
    st = _star(spark, sf_dir)
    return (
        st.orders.select(month_str(F.col("o_orderdate")).alias("month"))
        .distinct()
        .withColumn("period_date", period_date("month"))
    )


@query(
    "fn_safe_div",
    oracle="""
    SELECT o_orderkey AS order_id,
           COALESCE(o_totalprice / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0), 0.0)
               AS ratio
    FROM orders
    """,
)
def fn_safe_div(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-divisor-safe division (reference etl/transform.py:111-112:
    x/0 → NULL → 0). o_orderkey % 3 manufactures real zero divisors."""
    st = _star(spark, sf_dir)
    return st.orders.select(
        F.col("o_orderkey").alias("order_id"),
        safe_div(
            F.col("o_totalprice"),
            (F.col("o_orderkey") % 3).cast("double"),
        ).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations + §2.5 Joins + §2.6 top-k — the marts
# ---------------------------------------------------------------------------

_SUMMARY_ORACLE = (
    "WITH "
    + SALES_CTE
    + """
    SELECT category,
           strftime(order_date, '%Y-%m') AS month,
           CAST(SUM(total_price) AS DOUBLE) AS total_sales,
           CAST(SUM(quantity) AS DOUBLE)    AS total_quantity,
           COALESCE(CAST(SUM(total_price) AS DOUBLE)
                    / NULLIF(COUNT(DISTINCT order_id), 0), 0.0)
               AS average_order_value,
           TRY_CAST(strftime(order_date, '%Y-%m') || '-01' AS DATE)
               AS period_date
    FROM sales
    GROUP BY category, strftime(order_date, '%Y-%m')
    """
)


@query("agg_sales_summary", oracle=_SUMMARY_ORACLE)
def agg_sales_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship mart (reference create_sales_summary,
    etl/transform.py:100-117): category × month totals + AOV.

    The reference's two-groupby-plus-merge (A1+A2+A3) collapses, and
    the grain rewrite (sales_summary_grained) goes further: pre-agg
    line items at order grain BEFORE the join, so the count-distinct
    becomes a plain count and the join input shrinks ~4× — the shape
    that wins at every scale (measured: 1.38s → 0.84s at sf0.1)."""
    st = _star(spark, sf_dir)
    li = st.lineitem.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("unit_price"),
    )
    orders = st.orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderpriority").alias("category"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )
    return aggregates.sales_summary_grained(li, orders)


@query(
    "agg_count_distinct",
    oracle="WITH "
    + SALES_CTE
    + """
    SELECT category,
           strftime(order_date, '%Y-%m') AS month,
           COUNT(DISTINCT order_id) AS order_count
    FROM sales
    GROUP BY category, strftime(order_date, '%Y-%m')
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group count-distinct (reference nunique,
    etl/transform.py:108). At 100 TB swap countDistinct for
    approx_count_distinct (HLL) when ±2% is acceptable — exact
    distinct is the expensive path (expand + second shuffle)."""
    st = _star(spark, sf_dir)
    df = st.sales().withColumn("month", month_str("order_date"))
    return df.groupBy("category", "month").agg(
        F.countDistinct("order_id").alias("order_count")
    )


@query(
    "agg_order_totals",
    oracle="WITH "
    + SALES_CTE
    + """
    SELECT order_id, customer_id,
           CAST(SUM(total_price) AS DOUBLE) AS order_total
    FROM sales
    GROUP BY order_id, customer_id
    """,
)
def agg_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order totals (reference etl/transform.py:122-126)."""
    st = _star(spark, sf_dir)
    return aggregates.order_totals(st.sales()).withColumn(
        "order_total", F.col("order_total").cast("double")
    )


#: Spec-bounded cardinality headroom for small ordered rollups: the
#: TPC-H region dim has 5 rows (plus the 'Unknown' fill) at EVERY
#: scale factor, so capping the ordered output far above that is
#: semantics-free and lets the sort compile to TakeOrderedAndProject.
_REGION_SORT_CAP = 64

_AVG_CHECK_ORACLE = (
    "WITH "
    + SALES_CTE
    + ", "
    + CUSTOMERS_CTE
    + """
    , order_totals AS (
        SELECT order_id, customer_id, SUM(total_price) AS order_total
        FROM sales GROUP BY order_id, customer_id
    )
    SELECT COALESCE(c.region, 'Unknown') AS region,
           CAST(SUM(t.order_total) AS DOUBLE) / COUNT(DISTINCT t.order_id)
               AS avg_check,
           COUNT(DISTINCT t.order_id) AS orders_count
    FROM order_totals t
    LEFT JOIN customers c ON t.customer_id = c.customer_id
    GROUP BY COALESCE(c.region, 'Unknown')
    """
)


def _grained_totals(st):
    return aggregates.order_totals_grained(
        st.lineitem.select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("unit_price"),
        ),
        st.orders.select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
        ),
    )


@query("agg_avg_check_by_region", oracle=_AVG_CHECK_ORACLE)
def agg_avg_check_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average check per region (reference create_avg_check_by_region,
    etl/transform.py:120-142): grained order totals in exact long
    cents (narrow shuffle on order_id, see order_cents_grained) →
    broadcast left join on the customers dim → region rollup with
    grain-eliminated distinct. Cents stay LONG through the region
    rollup and convert to double once at the output boundary
    (cents_to_double) — exact at any partitioning, and the whole
    money path runs in codegen long registers instead of BigDecimal."""
    st = _star(spark, sf_dir)
    totals = aggregates.order_cents_grained(
        st.lineitem.select(
            F.col("l_orderkey").alias("order_id"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("unit_price"),
        ),
        st.orders.select(
            F.col("o_orderkey").alias("order_id"),
            F.col("o_custkey").alias("customer_id"),
        ),
    )
    dim = st.customers().select("customer_id", "region")
    joined = totals.join(F.broadcast(dim), "customer_id", "left").withColumn(
        "region", F.coalesce(F.col("region"), F.lit("Unknown"))
    )
    return (
        joined.groupBy("region")
        .agg(
            (
                aggregates.cents_to_double(F.sum("order_cents"))
                / F.count("order_id")
            ).alias("avg_check"),
            F.count("order_id").alias("orders_count"),
        )
        # Region cardinality is spec-bounded (5 named regions +
        # 'Unknown'), so a generous TakeOrdered cap is semantics-free —
        # and it compiles the final sort to TakeOrderedAndProject (per-
        # partition top-k merged on the driver) instead of a range-
        # partitioning exchange + global sort: one whole stage removed
        # from a plan whose cost at bench scale is stage floor, and at
        # cluster scale a barrier removed before the mart sink.
        .orderBy(F.desc("avg_check"))
        .limit(_REGION_SORT_CAP)
    )


@query(
    "join_left_region",
    oracle="WITH "
    + SALES_CTE
    + ", "
    + CUSTOMERS_CTE
    + """
    , order_totals AS (
        SELECT order_id, customer_id, SUM(total_price) AS order_total
        FROM sales GROUP BY order_id, customer_id
    )
    SELECT t.order_id, t.customer_id,
           COALESCE(c.region, 'Unknown') AS region,
           CAST(t.order_total AS DOUBLE) AS order_total
    FROM order_totals t
    LEFT JOIN customers c ON t.customer_id = c.customer_id
    """,
)
def join_left_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left equi-join fact→dim with Unknown fill (reference
    etl/transform.py:128-133). Dim side broadcast: the fact never
    shuffles for this join; the totals input is the grained rewrite."""
    st = _star(spark, sf_dir)
    totals = _grained_totals(st)
    dim = st.customers().select("customer_id", "region")
    return (
        totals.join(F.broadcast(dim), "customer_id", "left")
        .select(
            "order_id",
            "customer_id",
            F.coalesce(F.col("region"), F.lit("Unknown")).alias("region"),
            F.col("order_total").cast("double").alias("order_total"),
        )
    )


_RANKING_ORACLE = """
    WITH agg AS (
        SELECT l_partkey AS product_id,
               CAST(SUM(l_quantity) AS DOUBLE) AS total_sold,
               CAST(SUM(CAST(l_quantity * l_extendedprice
                             AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT a.product_id, p.p_name AS product_name,
           a.total_sold, a.total_revenue,
           CAST(row_number() OVER (
               ORDER BY total_sold DESC, total_revenue DESC, product_id
           ) AS INTEGER) AS rank_position
    FROM agg a
    LEFT JOIN part p ON a.product_id = p.p_partkey
    ORDER BY total_sold DESC, total_revenue DESC, product_id
    LIMIT 5
    """


@query("topk_product_ranking", oracle=_RANKING_ORACLE)
def topk_product_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 products (reference create_product_ranking,
    etl/transform.py:145-157). Grained form straight off lineitem:
    product grain needs no order attributes, so the lineitem⨝orders
    join is elided (order_id is a non-null FK — the inner join cannot
    drop rows), revenue sums in exact long cents, and the sort+limit
    compiles to TakeOrderedAndProject — per-partition local top-k,
    never a global sort. product_id tiebreak makes the cut
    deterministic (the reference relies on input order)."""
    st = _star(spark, sf_dir)
    return aggregates.product_ranking_grained(
        st.lineitem.select(
            F.col("l_partkey").alias("product_id"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("unit_price"),
        ),
        st.products(),
        top_n=5,
    )


# ---------------------------------------------------------------------------
# §2.1 S5 upsert semantics
# ---------------------------------------------------------------------------


@query(
    "upsert_last_wins",
    oracle="""
    SELECT o_custkey AS customer_id,
           o_orderkey AS last_order_id,
           CAST(o_orderdate AS DATE) AS last_order_date,
           o_totalprice AS last_order_total
    FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
    """,
)
def upsert_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native upsert (reference ON CONFLICT DO UPDATE,
    etl/load.py:81-109): deterministic last-wins compaction per key
    before the write. o_orderkey is the total-order tiebreaker."""
    st = _star(spark, sf_dir)
    df = st.orders.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderkey").alias("last_order_id"),
        F.col("o_orderdate").cast("date").alias("last_order_date"),
        F.col("o_totalprice").alias("last_order_total"),
        F.col("o_orderdate").alias("__ts"),
    )
    out = upsert.upsert_last_wins(
        df, keys=["customer_id"], order_by=["__ts", "last_order_id"]
    )
    return out.drop("__ts")


# ---------------------------------------------------------------------------
# Analytic windows (extension beyond reference W4)
# ---------------------------------------------------------------------------


@query(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_custkey AS customer_id,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend in order-date order. DECIMAL running
    sum → exact prefix sums, identical under any partitioning."""
    st = _star(spark, sf_dir)
    df = st.orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total_dec"),
        F.col("o_orderdate").alias("__ts"),
    )
    out = windows.running_total(
        df,
        partition_by=["customer_id"],
        order_by=["__ts", "order_id"],
        value="total_dec",
    )
    return out.select(
        "order_id",
        "customer_id",
        F.col("running_total").cast("double").alias("running_total"),
    )


@query(
    "window_lag_delta",
    oracle="""
    SELECT o_orderkey AS order_id,
           o_custkey AS customer_id,
           CAST(date_diff('day',
               lag(CAST(o_orderdate AS DATE)) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               CAST(o_orderdate AS DATE)
           ) AS INTEGER) AS days_since_prev
    FROM orders
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days since the customer's previous order (lag window)."""
    st = _star(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return st.orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_custkey").alias("customer_id"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lag(F.col("o_orderdate").cast("date")).over(w),
        )
        .cast("int")
        .alias("days_since_prev"),
    )


@query(
    "agg_rollup",
    oracle="WITH "
    + SALES_CTE
    + """
    SELECT category,
           strftime(order_date, '%Y-%m') AS month,
           CAST(SUM(total_price) AS DOUBLE) AS total_sales,
           CAST(GROUPING(category) * 2 + GROUPING(strftime(order_date, '%Y-%m'))
                AS INTEGER) AS grouping_level
    FROM sales
    GROUP BY ROLLUP (category, strftime(order_date, '%Y-%m'))
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (category → month → grand total) — the
    multidimensional extension of the summary mart (SURVEY §2.4 notes
    cube/rollup as the natural Spark upgrade)."""
    st = _star(spark, sf_dir)
    df = st.sales().withColumn("month", month_str("order_date"))
    return (
        df.rollup("category", "month")
        .agg(
            F.sum("total_price").cast("double").alias("total_sales"),
            F.grouping_id().cast("int").alias("grouping_level"),
        )
        .select("category", "month", "total_sales", "grouping_level")
    )


@query(
    "join_semi_anti",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name,
           'has_orders' AS bucket
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT c_custkey, c_name, 'no_orders'
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti joins (customers with / without orders) —
    join types absent from the reference (§2.5 'not present')."""
    st = _star(spark, sf_dir)
    cust = st.customer.select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
    )
    orders = st.orders.select(F.col("o_custkey").alias("customer_id"))
    semi = cust.join(orders, "customer_id", "left_semi").withColumn(
        "bucket", F.lit("has_orders")
    )
    anti = cust.join(orders, "customer_id", "left_anti").withColumn(
        "bucket", F.lit("no_orders")
    )
    return semi.unionByName(anti)


@query(
    "set_union_except",
    oracle="""
    SELECT o_orderkey AS order_id FROM orders WHERE o_orderstatus = 'F'
    UNION
    SELECT o_orderkey FROM orders WHERE o_totalprice > 300000
    EXCEPT
    SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def set_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / EXCEPT set algebra (absent from the reference, §2.7)."""
    st = _star(spark, sf_dir)
    o = st.orders
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("order_id")
    )
    big = o.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_orderkey").alias("order_id")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("order_id")
    )
    return finished.union(big).distinct().exceptAll(urgent.distinct())


@query(
    "set_intersect",
    oracle="""
    SELECT o_orderkey AS order_id FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_orderkey FROM orders WHERE o_totalprice > 100000
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics — completes the §2.7 set-op family
    with set_union_except): finished orders that are also big-ticket.
    Compiles to a left-semi join over distinct inputs — one shuffle
    pair, no row multiplication."""
    st = _star(spark, sf_dir)
    o = st.orders
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("order_id")
    )
    big = o.filter(F.col("o_totalprice") > 100000).select(
        F.col("o_orderkey").alias("order_id")
    )
    return finished.intersect(big)


# ---------------------------------------------------------------------------
# S5 family extension: SCD2 dimension history (round 4)
# ---------------------------------------------------------------------------


@query(
    "dim_scd2_history",
    oracle="""
    WITH src AS (
        SELECT o_custkey AS customer_id,
               o_orderpriority AS priority,
               CAST(o_orderdate AS DATE) AS ts,
               o_orderkey AS uid
        FROM orders
    ),
    chg AS (
        SELECT *, lag(priority) OVER (
            PARTITION BY customer_id ORDER BY ts, uid
        ) AS prev
        FROM src
    ),
    keep AS (SELECT * FROM chg WHERE prev IS NULL OR prev <> priority)
    SELECT customer_id, priority,
           ts AS valid_from,
           lead(ts) OVER (
               PARTITION BY customer_id ORDER BY ts, uid
           ) AS valid_to,
           (lead(ts) OVER (
               PARTITION BY customer_id ORDER BY ts, uid
           ) IS NULL) AS is_current
    FROM keep
    """,
)
def dim_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension history from a change stream (the upsert
    family's timeline form — reference ON CONFLICT keeps only the
    present; a warehouse dim also needs validity intervals for as-of
    joins): per customer, consecutive orders with the same priority
    compress to one row carrying [valid_from, valid_to) and
    is_current. ONE shuffle on the key; change-detect and
    interval-close windows share the partitioning (operators/upsert.py
    scd2_history)."""
    st = _star(spark, sf_dir)
    src = st.orders.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("ts"),
        F.col("o_orderkey").alias("uid"),
    )
    out = upsert.scd2_history(
        src,
        keys=["customer_id"],
        order_by=["ts", "uid"],
        attrs=["priority"],
        ts_col="ts",
    )
    return out.select(
        "customer_id", "priority", "valid_from", "valid_to", "is_current"
    )


# ---------------------------------------------------------------------------
# P4 family extension: data-quality expectations report (round 4)
# ---------------------------------------------------------------------------


@query(
    "quality_expectations",
    oracle="""
    SELECT source,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN text IS NOT NULL AND length(text) > 0
                         THEN 0 ELSE 1 END) AS BIGINT)
               AS n_bad_text_nonempty,
           CAST(SUM(CASE WHEN n_chars >= 64 THEN 0 ELSE 1 END) AS BIGINT)
               AS n_bad_min_chars,
           CAST(SUM(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END)
                AS BIGINT) AS n_bad_chars_consistent,
           CAST(SUM(CASE WHEN lang IN ('en','de','fr','es','zh')
                         THEN 0 ELSE 1 END) AS BIGINT) AS n_bad_lang_known
    FROM documents
    GROUP BY source
    """,
)
def quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named data-quality expectations per source — violation counts
    for non-empty text, minimum length, metadata consistency
    (n_chars = length(text)) and a lang allow-list, in ONE
    partial-aggregated pass (reference P4 generalized from row counts
    to expectations; operators/cleaning.py quality_report)."""
    st = _star(spark, sf_dir)
    docs = st.documents
    return cleaning.quality_report(
        docs,
        checks={
            "text_nonempty": F.col("text").isNotNull()
            & (F.length("text") > 0),
            "min_chars": F.col("n_chars") >= 64,
            "chars_consistent": F.col("n_chars") == F.length("text"),
            "lang_known": F.col("lang").isin("en", "de", "fr", "es", "zh"),
        },
        group_by=["source"],
    )


@query(
    "quality_expectations_long",
    oracle="""
    WITH q AS (
        SELECT source,
               COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN text IS NOT NULL AND length(text) > 0
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_bad_text_nonempty,
               CAST(SUM(CASE WHEN n_chars >= 64 THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_bad_min_chars,
               CAST(SUM(CASE WHEN n_chars = length(text) THEN 0 ELSE 1 END)
                    AS BIGINT) AS n_bad_chars_consistent,
               CAST(SUM(CASE WHEN lang IN ('en','de','fr','es','zh')
                             THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_bad_lang_known
        FROM documents
        GROUP BY source
    )
    SELECT source, check_name, n_bad,
           round(CAST(n_bad AS DOUBLE) / n_rows, 6) AS bad_share
    FROM (
        SELECT source, n_rows, 'text_nonempty' AS check_name,
               n_bad_text_nonempty AS n_bad FROM q
        UNION ALL
        SELECT source, n_rows, 'min_chars', n_bad_min_chars FROM q
        UNION ALL
        SELECT source, n_rows, 'chars_consistent',
               n_bad_chars_consistent FROM q
        UNION ALL
        SELECT source, n_rows, 'lang_known', n_bad_lang_known FROM q
    ) t
    """,
)
def quality_expectations_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The expectations report reshaped long — one row per (source,
    check) with the violation count and share — via Spark's native
    ``unpivot`` (P8-P10 family's missing reshape partner to the pivot
    query). Unpivot is a zero-shuffle row explosion (k rows out per
    input row); composing it ABOVE the aggregated report means the
    explosion runs on |groups|×k rows, never on the corpus."""
    wide = QUERY_REGISTRY["quality_expectations"].builder(spark, sf_dir)
    checks = [
        "text_nonempty", "min_chars", "chars_consistent", "lang_known",
    ]
    return (
        wide.unpivot(
            ids=["source", "n_rows"],
            values=[f"n_bad_{c}" for c in checks],
            variableColumnName="check_name",
            valueColumnName="n_bad",
        )
        .withColumn(
            "check_name", F.expr("substring(check_name, 7)")
        )
        .select(
            "source",
            "check_name",
            "n_bad",
            F.round(
                F.col("n_bad").cast("double") / F.col("n_rows"), 6
            ).alias("bad_share"),
        )
    )
