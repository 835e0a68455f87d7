"""Temporal joins + statistical aggregates (extension surface).

SURVEY.md §2.5 lists as-of/range/interval joins and §2.4 lists
stddev/median/percentile as "not present" in the reference — these
queries close that gap Spark-first:

- as-of join: union/sort-merge carry-forward (operators/temporal.py),
  ONE shuffle, linear — the 100 TB plan (no row explosion);
- trailing time-range aggregate: RANGE window frame, not a self-join;
- stats: decimal-exact sums + an explicit sum-of-squares stddev so the
  distributed result is bit-identical to the single-threaded oracle;
- discrete median: distributed order statistic via row_number — exact,
  interpolation-free, and identically defined in both engines;
- pivot: conditional decimal sums over a fixed status domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sales_etl_spark.functions.scalars import (
    LINE_REVENUE_SQL,
    line_revenue,
    month_str,
)
from sales_etl_spark.operators import aggregates, temporal
from sales_etl_spark.plans.registry import query
from sales_etl_spark.session import pin_semantics
from sales_etl_spark.sources.star import load_star


def _star(spark: SparkSession, sf_dir: str):
    pin_semantics(spark)
    return load_star(spark, sf_dir)


@query(
    "join_asof_prior_purchase",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts,
               event_id AS purchase_event_id,
               value    AS purchase_value
        FROM events WHERE event_type = 'purchase'
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.purchase_event_id, p.purchase_value
    FROM clicks c
    ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def join_asof_prior_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every click event gets the same user's most
    recent purchase at-or-before it (null if none yet). Oracle is
    DuckDB's native ASOF LEFT JOIN; the Spark side is the union/
    sort-merge carry-forward (operators/temporal.py:asof_join) — one
    shuffle on user_id, no |clicks|x|purchases| blowup. (user_id, ts)
    is unique in events, so the match is deterministic."""
    st = _star(spark, sf_dir)
    ev = st.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    return temporal.asof_join(
        clicks,
        purchases,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_event_id", "purchase_value"],
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, event_id, value FROM (
            SELECT user_id, ts, event_id, value,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, ts ORDER BY event_id
                   ) AS rn
            FROM events WHERE event_type = 'purchase'
        ) WHERE rn = 1
    ),
    b AS (
        SELECT c.event_id, MAX(p.ts) AS bt
        FROM clicks c LEFT JOIN purchases p
          ON p.user_id = c.user_id AND p.ts <= c.ts
        GROUP BY c.event_id
    ),
    f AS (
        SELECT c.event_id, MIN(p.ts) AS ft
        FROM clicks c LEFT JOIN purchases p
          ON p.user_id = c.user_id AND p.ts >= c.ts
        GROUP BY c.event_id
    ),
    pick AS (
        SELECT c.event_id, c.user_id, c.ts,
               CASE WHEN bt IS NOT NULL AND (ft IS NULL OR
                         date_diff('microsecond', bt, c.ts)
                             <= date_diff('microsecond', c.ts, ft))
                    THEN bt ELSE ft END AS mt
        FROM clicks c JOIN b USING (event_id) JOIN f USING (event_id)
    )
    SELECT k.event_id, k.user_id, k.ts,
           p.event_id AS purchase_event_id,
           p.value AS purchase_value
    FROM pick k
    LEFT JOIN purchases p
      ON p.user_id = k.user_id AND p.ts = k.mt
     AND abs(date_diff('microsecond', k.ts, k.mt)) <= 86400000000
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join with tolerance (pandas
    ``merge_asof(direction='nearest', tolerance=24h)`` semantics):
    every click gets the same user's temporally CLOSEST purchase —
    before or after, backward winning exact ties — nulled when the
    nearest one is more than 24 h away. Completes the as-of family on
    the hash-checked surface (backward = join_asof_prior_purchase;
    forward/nearest were unit/property-tested only).

    Spark-first shape (operators/temporal.py:asof_join): ONE union
    sweep computes both directional carries as range frames over the
    numeric time axis and each row picks its closer match in place —
    one shuffle on user_id + one in-partition sort, no
    |clicks|×|purchases| pair stream at any scale. The operator's
    contract requires the right side unique on (user_id, ts), so
    exact-ts tying purchases are collapsed FIRST — keep the min
    event_id's whole row via one map-side-combinable min(struct(...))
    aggregate (no window sort) — and the oracle mirrors the identical
    keep-one rule with a ROW_NUMBER before its tolerance-guarded
    equality re-join; without the dedup a tie makes the carry
    arbitrary on the Spark side and row-multiplying on the oracle
    side. The oracle states the same pick declaratively (per-click
    MAX/MIN candidate times, the backward-tie CASE)."""
    st = _star(spark, sf_dir)
    ev = st.events
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.min(
                F.struct(
                    F.col("event_id").alias("purchase_event_id"),
                    F.col("value").alias("purchase_value"),
                )
            ).alias("__p")
        )
        .select(
            "user_id",
            "ts",
            F.col("__p.purchase_event_id").alias("purchase_event_id"),
            F.col("__p.purchase_value").alias("purchase_value"),
        )
    )
    return temporal.asof_join(
        clicks,
        purchases,
        by=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["purchase_event_id", "purchase_value"],
        direction="nearest",
        tolerance_seconds=86_400,
    )


@query(
    "window_time_range",
    oracle="""
    SELECT e.event_id, e.user_id, e.ts,
           COUNT(*) AS n_events_1h,
           CAST(SUM(CAST(e2.value AS DECIMAL(18,6))) AS DOUBLE)
               AS total_value_1h
    FROM events e
    JOIN events e2
      ON e.user_id = e2.user_id
     AND e2.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts
    GROUP BY e.event_id, e.user_id, e.ts
    """,
)
def window_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user activity (count + exact value sum,
    self-inclusive) as a RANGE window frame over microsecond epoch —
    one shuffle + in-partition sort, versus the oracle's range
    self-join that materializes every (event, neighbor) pair. The
    frame is the formulation that survives hot keys at 100 TB."""
    st = _star(spark, sf_dir)
    out = temporal.time_range_agg(
        st.events.select("event_id", "user_id", "ts", "value"),
        partition_by=["user_id"],
        ts="ts",
        aggs={
            "n_events_1h": F.count(F.lit(1)),
            "total_value_1h": F.sum(F.col("value").cast("decimal(18,6)")),
        },
        lookback_seconds=3600,
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "n_events_1h",
        F.col("total_value_1h").cast("double").alias("total_value_1h"),
    )


@query(
    "agg_stats",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority AS category,
               o_totalprice,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                    AS DECIMAL(12,0)) AS c
        FROM orders
    ),
    sums AS (
        SELECT category,
               COUNT(*) AS n_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price,
               CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                         AS VARCHAR) AS DOUBLE) AS s1,
               CAST(CAST(SUM(c) AS VARCHAR) AS DOUBLE) AS s1c,
               CAST(CAST(SUM(c * c) AS VARCHAR) AS DOUBLE) AS s2c
        FROM cents
        GROUP BY category
    )
    SELECT category, n_orders, min_price, max_price,
           s1 AS total_price,
           s1 / n_orders AS avg_price,
           sqrt((s2c - s1c * s1c / n_orders) / (n_orders - 1)) / 100
               AS stddev_price
    FROM sums
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-category order statistics with a distributed-safe stddev:
    both moments accumulate as exact integer-cent DECIMALs
    (order-independent under any partitioning), then the stddev is the
    identical double expression sqrt((Σc² - (Σc)²/n)/(n-1))/100 on
    both sides. Native stddev_samp would be partitioning-order
    dependent. The oracle converts each exact decimal through VARCHAR
    before the DOUBLE cast: DuckDB's direct int128→double is not
    correctly rounded past 2⁵³ (measured 1-ulp drift on Σc² at sf0.1)
    while strtod and Spark's BigDecimal.doubleValue both round
    correctly — string round-trip makes the one rounding identical."""
    st = _star(spark, sf_dir)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    c = (dec * F.lit(100)).cast("decimal(12,0)")
    sums = st.orders.groupBy(
        F.col("o_orderpriority").alias("category")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(c).cast("double").alias("s1c"),
        F.sum(c * c).cast("double").alias("s2c"),
    )
    n = F.col("n_orders")
    s1, s1c, s2c = F.col("s1"), F.col("s1c"), F.col("s2c")
    return sums.select(
        "category",
        "n_orders",
        "min_price",
        "max_price",
        s1.alias("total_price"),
        (s1 / n).alias("avg_price"),
        (F.sqrt((s2c - s1c * s1c / n) / (n - F.lit(1))) / 100).alias(
            "stddev_price"
        ),
    )


@query(
    "agg_median_disc",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority AS category,
               o_totalprice AS price,
               row_number() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice
               ) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_orders
        FROM orders
    )
    SELECT category, n_orders, price AS median_price
    FROM ranked
    WHERE rn = FLOOR((n_orders + 1) / 2.0)
    """,
)
def agg_median_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete median per group as a distributed order
    statistic: row_number over the value order, pick rank
    floor((n+1)/2). Interpolation-free (returns an actual data value),
    so there is no float-arithmetic ambiguity between engines; ties in
    the value column cannot change the selected value. At 100 TB this
    is one shuffle per group column — versus collect-and-sort, which
    does not exist at that scale."""
    st = _star(spark, sf_dir)
    w_rank = Window.partitionBy("category").orderBy("price")
    w_all = Window.partitionBy("category")
    ranked = st.orders.select(
        F.col("o_orderpriority").alias("category"),
        F.col("o_totalprice").alias("price"),
    ).select(
        "category",
        "price",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_orders"),
    )
    return ranked.filter(
        F.col("rn") == F.floor((F.col("n_orders") + 1) / 2.0)
    ).select("category", "n_orders", F.col("price").alias("median_price"))


@query(
    "agg_pivot_status",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS f_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) AS o_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) AS p_total
    FROM orders
    GROUP BY strftime(o_orderdate, '%Y-%m')
    """,
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month × order-status pivot over a FIXED status domain (F/O/P).
    Explicit pivot values keep the plan single-pass — omitting them
    costs an extra distinct-scan job to discover the domain, which is
    the difference between one and two full-table passes at scale."""
    st = _star(spark, sf_dir)
    df = st.orders.select(
        month_str(F.col("o_orderdate")).alias("month"),
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
    )
    out = df.groupBy("month").pivot("o_orderstatus", ["F", "O", "P"]).agg(
        F.sum("p")
    )
    return out.select(
        "month",
        F.col("F").cast("double").alias("f_total"),
        F.col("O").cast("double").alias("o_total"),
        F.col("P").cast("double").alias("p_total"),
    )


@query(
    "join_range_interval",
    oracle="""
    SELECT o.o_orderkey AS order_id,
           COUNT(l.l_linenumber) AS n_shipped_90d,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS shipped_value_90d
    FROM orders o
    LEFT JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate < o.o_orderdate + INTERVAL 90 DAY
    GROUP BY o.o_orderkey
    """,
)
def join_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (equi + range) join: line items shipped within 90 days
    of their order's date. The equality key keeps this a hash join with
    the range as a post-join predicate — O(matches), never the
    quadratic keyless range join. A keyless interval join at scale
    needs time-bucket prefactoring (join on overlapping buckets, then
    exact filter); the equi-keyed form here is the shape to prefer
    whenever a key exists. COUNT(l.l_linenumber) counts only matched
    rows, preserving orders with zero in-window shipments."""
    st = _star(spark, sf_dir)
    o = st.orders.select(
        F.col("o_orderkey").alias("order_id"),
        F.col("o_orderdate").cast("date").alias("order_date"),
    )
    li = st.lineitem.select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_linenumber").alias("line_number"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
    )
    joined = o.join(
        li,
        (o.order_id == li.order_id)
        & (li.ship_date >= o.order_date)
        & (li.ship_date < F.date_add(o.order_date, 90)),
        "left",
    )
    return joined.groupBy(o.order_id.alias("order_id")).agg(
        F.count("line_number").alias("n_shipped_90d"),
        F.sum("price").cast("double").alias("shipped_value_90d"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT o_orderstatus AS status,
           o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS INTEGER) AS grouping_level
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (status, priority): all 4 grouping sets in one
    pass — Spark expands the grouping sets before the single shuffle
    (each input row feeds its 4 set-projections map-side), versus 4
    separate scans+unions."""
    st = _star(spark, sf_dir)
    return (
        st.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.grouping_id().cast("int").alias("grouping_level"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "n_orders",
            "total_price",
            "grouping_level",
        )
    )


@query(
    "flagship_pricing_summary",
    oracle="""
    SELECT l_returnflag AS returnflag,
           l_linestatus AS linestatus,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                     AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                     AS VARCHAR) AS DOUBLE)
               AS sum_base_price,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                              AS DECIMAL(20,0))
                         * CAST((1 - l_discount) * 10000 AS DECIMAL(8,0)))
                     AS VARCHAR)
                AS DOUBLE) / 1e6
               AS sum_disc_price,
           CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                              AS DECIMAL(20,0))
                         * CAST((1 - l_discount) * 10000 AS DECIMAL(8,0))
                         * CAST((1 + l_tax) * 10000 AS DECIMAL(8,0)))
                     AS VARCHAR)
                AS DOUBLE) / 1e10
               AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= DATE '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: one wide scan, predicate
    pushed to parquet, 4 decimal-exact aggregate expressions per
    (returnflag, linestatus) — the canonical scan-dominated workload.
    At 100 TB this is pure scan throughput: partial aggregation
    collapses each partition to ≤|groups| rows before the (tiny)
    exchange, and the shipdate filter prunes at the row-group level.

    Every money aggregate runs integer-exact with per-row arithmetic
    in LONG registers (whole-stage codegen), never BigDecimal per row:

    - sum_qty: quantities are integral doubles, so every partial sum
      is an exact integer below 2⁵³ — a plain double sum equals the
      oracle's decimal sum at any partitioning.
    - sum_base_price: exact long cents (money_cents), one decimal
      division at the output boundary (cents_to_double) — identical
      to CAST(SUM(DECIMAL(18,2)) AS DOUBLE); long sum wraps only past
      $9.2×10¹⁶ per (returnflag, linestatus) group.
    - sum_disc_price / sum_charge: scale-0 integer products
      (price-cents × disc×10⁴ [× tax×10⁴], exact in LONG: ≤10¹⁶ ≪
      2⁶³) widened to decimal only at the sum, because a scale-10
      decimal beyond 2⁵³ double-rounds on the DuckDB side — the same
      bit-exactness rule as agg_stats; the oracle mirrors the
      CAST-then-divide rounding. ~18% faster than decimal multiplies
      per row, identical results."""
    st = _star(spark, sf_dir)
    price_c = F.rint(F.col("l_extendedprice") * F.lit(100.0)).cast("long")
    disc4 = F.round((F.lit(1) - F.col("l_discount")) * 10000).cast("long")
    tax4 = F.round((F.lit(1) + F.col("l_tax")) * 10000).cast("long")
    return (
        st.lineitem.filter(
            F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz")
        )
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            F.sum("l_quantity").cast("double").alias("sum_qty"),
            aggregates.cents_to_double(F.sum(price_c)).alias(
                "sum_base_price"
            ),
            (
                F.sum((price_c * disc4).cast("decimal(30,0)"))
                .cast("double")
                / F.lit(1e6)
            ).alias("sum_disc_price"),
            (
                F.sum((price_c * disc4 * tax4).cast("decimal(38,0)"))
                .cast("double")
                / F.lit(1e10)
            ).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "flagship_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS order_id,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE)
               AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < DATE '1998-01-01'
      AND l.l_shipdate > DATE '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, order_id
    LIMIT 10
    """,
)
def flagship_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped shipping priority: 3-way join with selective
    filters on every side + top-10 by revenue. The plan to want at
    scale: all three filters push to their scans BEFORE the joins, the
    filtered customer dim broadcasts, and the sort+limit compiles to
    TakeOrderedAndProject — never a global sort of the join output."""
    st = _star(spark, sf_dir)
    c = st.customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    o = st.orders.filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = st.lineitem.filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp_ntz")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = line_revenue()  # the shared money contract (scalars)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("order_id"),
            F.col("o_orderdate").cast("date").alias("order_date"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("order_id", "revenue", "order_date")
        .orderBy(F.desc("revenue"), F.asc("order_id"))
        .limit(10)
    )


@query(
    "agg_percentiles",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority AS category,
               o_totalprice AS price,
               row_number() OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice
               ) AS rn,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_orders
        FROM orders
    )
    SELECT category, n_orders,
           MAX(CASE WHEN rn = GREATEST(1, FLOOR((n_orders + 1) * 0.25))
               THEN price END) AS p25,
           MAX(CASE WHEN rn = GREATEST(1, FLOOR((n_orders + 1) * 0.50))
               THEN price END) AS p50,
           MAX(CASE WHEN rn = GREATEST(1, FLOOR((n_orders + 1) * 0.75))
               THEN price END) AS p75,
           MAX(CASE WHEN rn = LEAST(n_orders,
                                    GREATEST(1, FLOOR((n_orders + 1) * 0.95)))
               THEN price END) AS p95
    FROM ranked
    GROUP BY category, n_orders
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-quantile per group (p25/p50/p75/p95) as distributed
    order statistics: one in-partition sort + row_number, pick the
    floor((n+1)·q) ranks (clamped to [1,n]) — interpolation-free, so
    both engines select identical data values. One shuffle regardless
    of how many quantiles; the conditional-max pivot collapses the
    picked rows without a second pass."""
    st = _star(spark, sf_dir)
    w_rank = Window.partitionBy("category").orderBy("price")
    w_all = Window.partitionBy("category")
    ranked = st.orders.select(
        F.col("o_orderpriority").alias("category"),
        F.col("o_totalprice").alias("price"),
    ).select(
        "category",
        "price",
        F.row_number().over(w_rank).alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_orders"),
    )
    n = F.col("n_orders")

    def pick(q, clamp_hi=False):
        pos = F.greatest(F.lit(1), F.floor((n + 1) * q))
        if clamp_hi:
            pos = F.least(n, pos)
        return F.max(F.when(F.col("rn") == pos, F.col("price")))

    return ranked.groupBy("category", "n_orders").agg(
        pick(0.25).alias("p25"),
        pick(0.50).alias("p50"),
        pick(0.75).alias("p75"),
        pick(0.95, clamp_hi=True).alias("p95"),
    )


@query(
    "join_events_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           c.c_mktsegment AS segment,
           COALESCE(r.r_name, 'Unknown') AS region
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def join_events_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-enrichment join in its batch-checkable form: events
    enriched with customer segment + region via broadcast dims — the
    exact plan a readStream would use (stream-static joins broadcast
    the static side per micro-batch; no state, no watermark needed)."""
    st = _star(spark, sf_dir)
    cust = st.customer.select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nationkey"),
    )
    nat = st.nation.select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_regionkey").alias("regionkey"),
    )
    reg = st.region.select(
        F.col("r_regionkey").alias("regionkey"),
        F.col("r_name").alias("region"),
    )
    dim = (
        cust.join(F.broadcast(nat), "nationkey", "left")
        .join(F.broadcast(reg), "regionkey", "left")
        .select("user_id", "segment", "region")
    )
    return (
        st.events.select("event_id", "user_id", "event_type")
        .join(F.broadcast(dim), "user_id", "left")
        .select(
            "event_id",
            "user_id",
            "event_type",
            "segment",
            F.coalesce(F.col("region"), F.lit("Unknown")).alias("region"),
        )
    )


@query(
    "window_sessionize_ids",
    oracle="""
    WITH flagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    < INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
    )
    SELECT event_id, user_id, ts,
           CAST(SUM(new_sess) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_seq
    FROM flagged
    """,
)
def window_sessionize_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session assignment (lag + cumulative new-session
    flag): every event gets its user's running session number — the
    row-level primitive UNDER session_window (which only emits
    aggregates). This is how a training pipeline groups events/turns
    into conversations while keeping the rows. One shuffle on user_id;
    both window passes share the same partitioning and sort."""
    st = _star(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond epoch (NTZ relabeled under the pinned UTC session):
    # full precision, so the 30-min comparison matches the oracle's
    # exact interval arithmetic
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = st.events.select("event_id", "user_id", "ts").withColumn(
        "new_sess",
        F.when(
            us - F.lag(us).over(w) < 30 * 60 * 1_000_000,
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    return flagged.select(
        "event_id",
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int")
        .alias("session_seq"),
    )


@query(
    "agg_mode",
    oracle="""
    WITH counts AS (
        SELECT o_orderpriority AS category,
               o_orderstatus AS status,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderpriority, o_orderstatus
    )
    SELECT category, status AS mode_status, n AS mode_count
    FROM counts
    QUALIFY row_number() OVER (
        PARTITION BY category ORDER BY n DESC, status
    ) = 1
    """,
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode (most frequent status per priority): count per
    (group, value) then keep-max with a value tiebreak — a total
    order, so the distributed pick is deterministic (the native
    ``mode()`` aggregate breaks ties arbitrarily, which would flap the
    hash). Two shuffles, both after map-side combine."""
    st = _star(spark, sf_dir)
    counts = st.orders.groupBy(
        F.col("o_orderpriority").alias("category"),
        F.col("o_orderstatus").alias("status"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("category").orderBy(F.desc("n"), F.asc("status"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "category",
            F.col("status").alias("mode_status"),
            F.col("n").alias("mode_count"),
        )
    )


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts >= s1.t_view
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t_click
        GROUP BY e.user_id
    )
    SELECT s1.user_id, s1.t_view, s2.t_click, s3.t_purchase,
           CAST(1 + (CASE WHEN s2.user_id IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END)
                AS INTEGER) AS steps_completed
    FROM s1
    LEFT JOIN s2 ON s1.user_id = s2.user_id
    LEFT JOIN s3 ON s2.user_id = s3.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per user,
    the first occurrence of each step AT OR AFTER the previous step's
    first occurrence, plus how many steps completed. Each stage is one
    pushdown-filtered scan (event_type reaches the parquet scan) and a
    user-keyed partial aggregate; stages shrink monotonically, so the
    step joins get smaller as the funnel deepens — the standard
    product-analytics shape, and at 100 TB the per-stage filters are
    what keep it one cheap pass per step instead of a sessionized
    sort of everything."""
    from sales_etl_spark.operators.temporal import funnel

    st = _star(spark, sf_dir)
    return funnel(st.events, ["view", "click", "purchase"]).select(
        "user_id", "t_view", "t_click", "t_purchase", "steps_completed"
    )


@query(
    "events_cohort_retention",
    oracle="""
    WITH signups AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week,
               MIN(ts) AS t0
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
        SELECT s.cohort_week,
               CAST((epoch_us(e.ts) - epoch_us(s.t0))
                    // CAST(604800000000 AS BIGINT) AS INTEGER) AS age_weeks,
               e.user_id
        FROM events e JOIN signups s ON e.user_id = s.user_id
        WHERE e.ts >= s.t0
    )
    SELECT cohort_week, age_weeks,
           COUNT(DISTINCT user_id) AS n_active
    FROM activity GROUP BY cohort_week, age_weeks
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by signup week, activity
    counted per whole week of account age (exact integer-microsecond
    arithmetic — no calendar/rounding drift between engines). Shape:
    one pushdown-filtered signup aggregate, one user-keyed join of the
    event stream onto its (small) cohort table, one count-distinct per
    (cohort, age) — the join's build side is user-cardinality and the
    probe is the full stream, the standard retention plan at any
    scale."""
    st = _star(spark, sf_dir)
    ev = st.events
    week_us = 7 * 86400 * 1_000_000
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
        .select(
            "user_id", "t0",
            # DATE, not midnight-timestamp: a week bucket is a date by
            # grain, DuckDB's date_trunc('week') already returns DATE,
            # and matching kinds lets the engine-side digest cover
            # this key instead of falling back to the pandas
            # comparator (SCALE.md §31.3).
            F.date_trunc("week", F.col("t0")).cast("date")
            .alias("cohort_week"),
        )
    )
    return (
        ev.join(signups, "user_id")
        .filter(F.col("ts") >= F.col("t0"))
        .select(
            "cohort_week",
            (
                (F.unix_micros(F.col("ts").cast("timestamp"))
                 - F.unix_micros(F.col("t0").cast("timestamp")))
                .cast("long")
                .alias("__d")
            ),
            "user_id",
        )
        .select(
            "cohort_week",
            F.expr(f"CAST(__d div {week_us}L AS INT)").alias("age_weeks"),
            "user_id",
        )
        .groupBy("cohort_week", "age_weeks")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus AS status,
           o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                AS INTEGER) AS grouping_level
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the hand-picked subset of cube levels
    (per-status, per-priority, grand total; NOT the cross product),
    which at 100 TB is the difference between expanding each row 3×
    and 2^k×. Same one-shuffle expand-before-aggregate execution as
    rollup/cube; grouping_level disambiguates the NULL-as-total rows
    exactly as the SQL GROUPING() pair does."""
    st = _star(spark, sf_dir)
    return (
        st.orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus", "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.grouping_id().cast("int").alias("grouping_level"),
        )
        .select(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            "n_orders", "total_price", "grouping_level",
        )
    )


@query(
    "flagship_local_volume",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l.l_discount AS DECIMAL(8,4))) AS DOUBLE)
               AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def flagship_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped local-supplier volume: the 6-way join
    (customer ⨝ orders ⨝ lineitem ⨝ supplier ⨝ nation ⨝ region) with
    a same-nation customer/supplier condition — the deepest join tree
    in the registry, the classic join-ordering stress test.

    Spark-first plan: the nation⨝region snowflake CONSTANT-FOLDS
    (fixed spec cardinality — same move as star.customers): the ASIA
    nationkey set becomes an IN-list pushed into BOTH the supplier and
    customer scans, and nationkey→name becomes a literal map — two
    joins and their broadcast builds gone from the plan, and the two
    SF-scaled dims arrive pre-filtered to ~1/5 before any join. The
    remaining tree is the real work at 100 TB: date-filtered orders ⨝
    lineitem on the order key, supplier and customer as
    filtered-dimension joins (AQE picks broadcast vs shuffle by size),
    and the same-nation condition rides the customer join as a
    residual predicate instead of forcing a nation-keyed exchange."""
    st = _star(spark, sf_dir)
    nr = (
        st.nation.select("n_nationkey", "n_name", "n_regionkey")
        .join(
            F.broadcast(
                st.region.filter(F.col("r_name") == "ASIA").select(
                    "r_regionkey"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
        .collect()
    )
    asia_keys = [r.n_nationkey for r in nr]
    name_map = F.create_map(
        *[F.lit(x) for r in nr for x in (r.n_nationkey, r.n_name)]
    )
    o = st.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    s = st.supplier.filter(F.col("s_nationkey").isin(asia_keys)).select(
        "s_suppkey", "s_nationkey"
    )
    c = st.customer.filter(F.col("c_nationkey").isin(asia_keys)).select(
        "c_custkey", "c_nationkey"
    )
    li = st.lineitem.select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    rev = line_revenue()  # the shared money contract (scalars)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy(name_map[F.col("s_nationkey")].alias("nation"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@query(
    "events_rate_anomaly",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY 1, 2
    ),
    win AS (
        SELECT event_type, hour, n_events,
               SUM(n_events) OVER w AS s,
               SUM(n_events * n_events) OVER w AS ss,
               COUNT(*) OVER w AS n
        FROM hourly
        WINDOW w AS (
            PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING
        )
    )
    SELECT event_type, hour, n_events,
           CASE WHEN n >= 12
                     AND (CAST(ss AS DOUBLE) / n)
                         - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)
                         > 0
                THEN round(
                    (n_events - CAST(s AS DOUBLE) / n)
                    / sqrt((CAST(ss AS DOUBLE) / n)
                           - (CAST(s AS DOUBLE) / n)
                             * (CAST(s AS DOUBLE) / n)),
                    6)
           END AS zscore
    FROM win
    """,
)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly scores: hourly event counts per type,
    z-scored against the TRAILING 24 hours (current hour excluded —
    the spike being tested must not contaminate its own baseline).
    NULL until 12 baseline hours exist or when the baseline is flat
    (zero variance) — an undefined score is not a zero score.

    Bit-exactness across engines: the window carries integer sums
    (Σc, Σc²,count) and both engines evaluate the identical
    double expression on them — mean/variance never accumulate in
    floating point, and sqrt is correctly-rounded IEEE in both.

    Scale shape: the raw stream collapses to (type, hour) grain in one
    partial-aggregated exchange; the trailing window re-clusters by
    type only — post-agg data is |types|·|hours| rows, so the second
    exchange is negligible at any corpus size. The streaming twin of
    this report is a tumbling-window count (streaming/windows.py) with
    the z-score applied by the sink."""
    from sales_etl_spark.operators.windows import trailing_zscore

    st = _star(spark, sf_dir)
    hourly = (
        st.events.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return trailing_zscore(
        hourly, "event_type", "hour", "n_events",
        baseline_rows=24, min_baseline=12,
    ).select("event_type", "hour", "n_events", "zscore")


@query(
    "events_cumulative_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, min(date_trunc('day', ts)) AS first_day
        FROM events GROUP BY user_id
    ),
    daily_new AS (
        SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY first_day
    ),
    active AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active_users
        FROM events GROUP BY 1
    )
    SELECT a.day, a.active_users,
           COALESCE(d.new_users, 0) AS new_users,
           CAST(SUM(COALESCE(d.new_users, 0)) OVER (
               ORDER BY a.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cumulative_users
    FROM active a LEFT JOIN daily_new d ON a.day = d.day
    """,
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active / new / cumulative distinct users — with the
    cumulative COUNT(DISTINCT) over a growing window REWRITTEN as
    first-seen aggregation + prefix sum: a naive distinct-over-
    unbounded-window re-counts every user every day (O(days·users)
    state, unshippable at scale); min(ts) per user + a count per
    first-seen day + a running sum is two linear aggregations and a
    |days|-row window. The same rewrite is how growth dashboards
    compute all-time uniques incrementally."""
    st = _star(spark, sf_dir)
    ev = st.events.select(
        # DATE grain (not midnight timestamp) — mirrors DuckDB's
        # date_trunc('day') DATE kind so the engine-side digest covers
        # this key (SCALE.md §31.3).
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily_new = first_seen.groupBy(
        F.col("first_day").alias("day")
    ).agg(F.count(F.lit(1)).alias("new_users"))
    active = ev.groupBy("day").agg(
        F.countDistinct("user_id").alias("active_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        active.join(daily_new, "day", "left")
        .select(
            "day",
            "active_users",
            F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
        )
        .withColumn("cumulative_users", F.sum("new_users").over(w))
    )


@query(
    "flagship_small_quantity",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#4'
      AND l.l_quantity < (
          SELECT 0.2 * avg(l2.l_quantity)
          FROM lineitem l2
          WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def flagship_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity revenue: a CORRELATED scalar
    subquery (per-part average quantity) guarding the fact filter —
    the query shape that tests an engine's decorrelation, exercised
    through the SQL surface on purpose (a reference user writes this
    as SQL, not as a hand-decorrelated join). Catalyst rewrites the
    correlation into a per-part aggregate joined back to the fact: the
    naive per-row re-aggregation (O(|lineitem|·|part lines|)) never
    executes. Registered temp views scope the star tables for the SQL
    text; DECIMAL sum → one double division keeps both engines
    bit-identical."""
    st = _star(spark, sf_dir)
    st.lineitem.createOrReplaceTempView("li_q17")
    st.part.createOrReplaceTempView("part_q17")
    return spark.sql("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / 7.0 AS avg_yearly
        FROM li_q17 l
        JOIN part_q17 p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#4'
          AND l.l_quantity < (
              SELECT 0.2 * avg(l2.l_quantity)
              FROM li_q17 l2
              WHERE l2.l_partkey = p.p_partkey
          )
    """)


# ---------------------------------------------------------------------------
# Interpolated percentiles (round 5): the PERCENTILE_CONT surface
# ---------------------------------------------------------------------------


@query(
    "agg_percentile_cont",
    oracle="""
    WITH vals AS (
        SELECT o_orderpriority AS priority,
               CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
        FROM orders
    ),
    counts AS (
        SELECT priority, cents, CAST(COUNT(*) AS BIGINT) AS c
        FROM vals GROUP BY 1, 2
    ),
    cum AS (
        SELECT priority, cents, c,
               SUM(c) OVER (PARTITION BY priority ORDER BY cents
                            ROWS UNBOUNDED PRECEDING) AS cum_c,
               SUM(c) OVER (PARTITION BY priority) AS n
        FROM counts
    ),
    qs AS (SELECT unnest([50, 90, 99]) AS qpct),
    marks AS (
        SELECT priority, qpct, n,
               1 + CAST(qpct AS DOUBLE) / 100.0 * (n - 1) AS rn,
               CAST(floor(1 + CAST(qpct AS DOUBLE) / 100.0 * (n - 1))
                    AS BIGINT) AS lo,
               CAST(ceil(1 + CAST(qpct AS DOUBLE) / 100.0 * (n - 1))
                    AS BIGINT) AS hi
        FROM (SELECT DISTINCT priority, n FROM cum), qs
    ),
    picked AS (
        SELECT m.priority, m.qpct, m.rn, m.lo,
               MIN(CASE WHEN c.cum_c >= m.lo THEN c.cents END) AS v_lo,
               MIN(CASE WHEN c.cum_c >= m.hi THEN c.cents END) AS v_hi
        FROM marks m JOIN cum c ON c.priority = m.priority
        GROUP BY 1, 2, 3, 4
    )
    SELECT priority, CAST(qpct AS INTEGER) AS pct,
           CAST((CAST(v_lo AS DOUBLE)
                 + (rn - lo) * (CAST(v_hi AS DOUBLE) - CAST(v_lo AS DOUBLE)))
                / 100.0 AS DOUBLE) AS value
    FROM picked
    """,
)
def agg_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard PERCENTILE_CONT (linear interpolation between the
    two straddling order statistics at rank 1 + q·(n−1)) of order
    value per priority class, at p50/p90/p99 — the interpolated
    companion to agg_percentiles' discrete order statistics (a
    different named SQL surface: CONT returns values BETWEEN data
    points).

    Spark-first shape — no row-grain window anywhere: values collapse
    to a per-(group, cents) count frame (one partial-aggregated
    exchange; the frame is bounded by the VALUE DOMAIN per group, not
    the corpus — the sample_quality_deciles precedent), the
    cumulative counts run over that bounded frame, the 15 rank marks
    (5 groups × 3 percentiles) broadcast back, and each straddling
    order statistic falls out of one conditional MIN. Cross-engine
    exactness: cents are exact longs, the rank position and the
    interpolation are the IDENTICAL double sequence in both engines
    (q literal, n exact — same rn, same floor/ceil, same lerp), and
    the /100 conversion happens once at the output boundary."""
    st = _star(spark, sf_dir)
    vals = st.orders.select(
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
    )
    counts = vals.groupBy("priority", "cents").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy("priority")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_n = Window.partitionBy("priority")
    cum = counts.select(
        "priority",
        "cents",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_n).alias("n"),
    )
    qs = spark.range(0, 3).select(
        F.element_at(
            F.array(F.lit(50), F.lit(90), F.lit(99)),
            (F.col("id") + 1).cast("int"),
        ).alias("qpct")
    )
    rn = F.lit(1.0) + F.col("qpct").cast("double") / F.lit(100.0) * (
        F.col("n") - F.lit(1)
    )
    marks = (
        cum.select("priority", "n")
        .distinct()
        .crossJoin(F.broadcast(qs))
        .select(
            "priority",
            "qpct",
            rn.alias("rn"),
            F.floor(rn).cast("long").alias("lo"),
            F.ceil(rn).cast("long").alias("hi"),
        )
    )
    picked = (
        F.broadcast(marks)
        .join(cum, "priority")
        .groupBy("priority", "qpct", "rn", "lo")
        .agg(
            F.min(
                F.when(F.col("cum_c") >= F.col("lo"), F.col("cents"))
            ).alias("v_lo"),
            F.min(
                F.when(F.col("cum_c") >= F.col("hi"), F.col("cents"))
            ).alias("v_hi"),
        )
    )
    return picked.select(
        "priority",
        F.col("qpct").cast("int").alias("pct"),
        (
            (
                F.col("v_lo").cast("double")
                + (F.col("rn") - F.col("lo"))
                * (F.col("v_hi").cast("double") - F.col("v_lo").cast("double"))
            )
            / F.lit(100.0)
        ).alias("value"),
    )
