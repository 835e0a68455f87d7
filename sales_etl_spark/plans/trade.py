"""Cross-nation trade flagships + distribution/statistics closers
(round-4 continuation tier).

Join/agg patterns the registry had not yet demonstrated end-to-end,
each a distinct planner stress the TPC-H family is built around:

- Q7-shaped bilateral trade volume: TWO dimension hops off the same
  fact row (supplier nation x customer nation) with a cross-pair
  residual — the shape where a naive plan shuffles the fact twice;
- Q8-shaped market share: conditional share-of-total per year — two
  decimal sums in ONE aggregation pass, divided once in double;
- Q13-shaped customer order distribution: LEFT OUTER join with a
  predicate INSIDE the join condition (not a post-filter — zero-order
  customers must survive), then a groupBy-of-a-groupBy histogram;
- Q15-shaped top supplier: aggregate → scalar max over the aggregate
  → exact-equality filter back on the SAME aggregate (decimal
  equality is safe because the money contract never rounds);
- Q19-shaped disjunctive-predicate revenue: OR-of-ANDs where the
  scan-level prefilters (brand IN-list, quantity envelope) are the
  UNION of the per-branch ranges — pushdown Catalyst cannot derive
  across a join on its own;
- Q22-shaped idle-balance report: uncorrelated scalar subquery
  (global average) + NOT EXISTS anti-join;
- exact Pearson correlation / population covariance from decimal
  moment sums — float statistics made order-free by accumulating
  ONLY exact integers/decimals and evaluating one identical IEEE
  expression on the final scalars (the events_rate_anomaly move,
  generalized to second-order cross moments);
- dense hourly gap-fill: the time-series resample primitive (grid =
  span x keys via sequence(), zero-filled left join) — the missing-
  bucket closer every monitoring rollup needs before rates/averages
  are comparable across hours.

Reference parity: the reference engine (etl/transform.py) stops at
single-pass group-by marts; this tier is the §2.4/§2.5 extension
surface (SURVEY.md) exercised at its hardest. Determinism rules are
the registry's (plans/registry.py docstring): decimal money sums,
double division only on exact operands, full tiebreakers on any
top-k, no wall-clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sales_etl_spark.functions import scalars, vectors
from sales_etl_spark.functions import text as TX
from sales_etl_spark.operators.sampling import (
    hash_uniform_hex,
    threshold_hex,
)
from sales_etl_spark.plans.registry import QUERY_REGISTRY, query
from sales_etl_spark.session import pin_semantics
from sales_etl_spark.sources.star import load_star


def _star(spark: SparkSession, sf_dir: str):
    pin_semantics(spark)
    return load_star(spark, sf_dir)


_REV_SQL = scalars.LINE_REVENUE_SQL.format(q="l.")
_rev = scalars.line_revenue


def _nation_name_map(st) -> F.Column:
    """nationkey → name as a literal map (the fixed-25-row dim
    constant-fold; see sources/star.py customers)."""
    return F.create_map(
        *[
            F.lit(x)
            for r in st.nation.select("n_nationkey", "n_name").collect()
            for x in (r.n_nationkey, r.n_name)
        ]
    )


@query(
    "flagship_nation_trade",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS ship_year,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation sn ON sn.n_nationkey = s.s_nationkey
    JOIN nation cn ON cn.n_nationkey = c.c_nationkey
    WHERE s.s_nationkey IN (3, 8)
      AND c.c_nationkey IN (3, 8)
      AND s.s_nationkey <> c.c_nationkey
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY sn.n_name, cn.n_name, CAST(EXTRACT(year FROM l.l_shipdate) AS INT)
    """,
)
def flagship_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade volume: revenue shipped between
    two nations, by direction and ship year.

    Spark-first plan: both nation dims constant-fold (IN-list into the
    supplier AND customer scans, key→name via one literal map probe),
    so the executed tree is fact ⨝ orders ⨝ two PRE-FILTERED
    ~2/25-size dims — the supplier and customer joins each broadcast,
    and the cross-pair inequality (s_nation <> c_nation) rides the
    customer join as a residual instead of materializing the 2x2
    nation pairs and filtering after. At 100 TB the only real
    exchange is lineitem ⨝ orders on the order key; everything
    nation-side is map-side. Ship year is computed once, post-filter,
    as a grouping column — the group-by grain is (2 directions x
    |years|), so the final exchange is trivially small."""
    st = _star(spark, sf_dir)
    nmap = _nation_name_map(st)
    pair = [3, 8]
    s = st.supplier.filter(F.col("s_nationkey").isin(pair)).select(
        "s_suppkey", "s_nationkey"
    )
    c = st.customer.filter(F.col("c_nationkey").isin(pair)).select(
        "c_custkey", "c_nationkey"
    )
    li = st.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate",
             "l_extendedprice", "l_discount")
    o = st.orders.select("o_orderkey", "o_custkey")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("s_nationkey") != F.col("c_nationkey")),
        )
        .groupBy(
            nmap[F.col("s_nationkey")].alias("supp_nation"),
            nmap[F.col("c_nationkey")].alias("cust_nation"),
            F.year("l_shipdate").alias("ship_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@query(
    "flagship_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS order_year,
           CAST(CAST(SUM(CASE WHEN s.s_nationkey = 6
                              THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
                / CAST(SUM({_REV_SQL}) AS DOUBLE) AS DOUBLE) AS mkt_share,
           CAST(SUM(CASE WHEN s.s_nationkey = 6
                         THEN {_REV_SQL} ELSE 0 END) AS DOUBLE)
               AS nation_revenue,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE c.c_nationkey IN (1, 6, 11, 16, 21)
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    """,
)
def flagship_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: of all ECONOMY-part revenue sold
    into the AMERICA region's customers in 1996-97, what share did
    NATION_6's suppliers supply, per order year?

    Spark-first plan: the share is a CONDITIONAL SUM over the same
    rows as the total — one aggregation pass carries both decimal
    sums, so "share of total" costs zero extra exchanges (the naive
    two-query formulation scans and joins everything twice). The
    region→nationkey hop constant-folds into the customer scan's
    IN-list (AMERICA = regionkey 1 = keys 1,6,11,16,21 — spec-fixed
    cardinality), the supplier dim is projected to (key, is-target
    boolean) — ONE BIT of payload through the join — and part to its
    key after the type filter. Division happens once per year row, on
    exact decimal sums cast to double: identical IEEE in both
    engines."""
    st = _star(spark, sf_dir)
    america = (
        st.nation.join(
            F.broadcast(
                st.region.filter(F.col("r_name") == "AMERICA").select(
                    "r_regionkey"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey")
        .collect()
    )
    america_keys = [r.n_nationkey for r in america]
    o = st.orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = st.customer.filter(F.col("c_nationkey").isin(america_keys)).select(
        "c_custkey"
    )
    s = st.supplier.select(
        "s_suppkey", (F.col("s_nationkey") == 6).alias("__is_target")
    )
    p = st.part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    zero = F.lit(0).cast("decimal(18,2)")
    agg = (
        st.lineitem.select(
            "l_orderkey", "l_suppkey", "l_partkey",
            "l_extendedprice", "l_discount",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("__is_target"), _rev()).otherwise(zero))
            .cast("double")
            .alias("nation_revenue"),
            F.sum(_rev()).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "order_year",
        (F.col("nation_revenue") / F.col("total_revenue")).alias(
            "mkt_share"
        ),
        "nation_revenue",
        "total_revenue",
    )


@query(
    "flagship_cust_order_dist",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON o.o_custkey = c.c_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def flagship_cust_order_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer order-count distribution: how many
    customers placed exactly k non-urgent orders — INCLUDING k=0.

    The shape that forces a LEFT OUTER join with the predicate INSIDE
    the join condition: filtering orders after the join would drop
    zero-order customers entirely, and filtering with WHERE would turn
    the outer join inner. COUNT(o_orderkey) (not COUNT(*)) makes the
    null-extended rows count 0.

    Spark-first plan: orders is pre-filtered and projected to its
    custkey before the join, so the outer join carries one column;
    the per-customer count is one exchange on c_custkey (AQE picks
    broadcast/shuffle by side size — at 100 TB both sides are big and
    it's a shuffle join, which is the correct shape: the grain is
    per-customer and must cluster by customer exactly once). The
    second aggregation reclusters |customers| rows by a small-domain
    integer — negligible. A two-level COUNT-DISTINCT-style rewrite
    does not apply: the histogram needs every customer row once."""
    st = _star(spark, sf_dir)
    c = st.customer.select("c_custkey")
    o = st.orders.filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "flagship_top_supplier",
    oracle=f"""
    WITH per_supp AS (
        SELECT l.l_suppkey, SUM({_REV_SQL}) AS rev
        FROM lineitem l
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey AS supplier_id,
           s.s_name AS supplier_name,
           CAST(p.rev AS DOUBLE) AS revenue
    FROM per_supp p
    JOIN supplier s ON s.s_suppkey = p.l_suppkey
    WHERE p.rev = (SELECT max(rev) FROM per_supp)
    """,
)
def flagship_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: the supplier(s) with the maximum
    quarterly revenue — ALL of them on a tie, which is why this is an
    exact-equality filter against a scalar max, not a LIMIT 1.

    Spark-first plan: one exchange builds the per-supplier aggregate,
    which is CACHED — the SQL formulation reads its view twice (probe
    + scalar max), and neither static ReuseExchange nor AQE stage
    reuse dedupes the two branches (verified on the executed plan:
    two ShuffleQueryStages, two fact scans), so the engine pins the
    |active suppliers|-row exchange OUTPUT instead (SCALE.md §13's
    rule: cache exchange outputs, not inputs — this is the smallest
    one in the registry). The scalar max is then a 1-row aggregate of
    the cache, broadcast back. Equality on the DECIMAL revenue is
    safe across engines because the money contract never rounds —
    each engine compares its own exact sums to its own exact max.
    The supplier-name dim joins AFTER the max-filter, against
    (almost always) one row."""
    st = _star(spark, sf_dir)
    li = st.lineitem.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    per_supp = (
        li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("__rev")).cache()
    )
    mx = per_supp.agg(F.max("__rev").alias("__mx"))
    s = st.supplier.select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(mx), F.col("__rev") == F.col("__mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("supplier_id"),
            F.col("s_name").alias("supplier_name"),
            F.col("__rev").cast("double").alias("revenue"),
        )
    )


@query(
    "flagship_brand_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def flagship_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: an OR of three
    (brand, size-range, quantity-range) conjunctions spanning BOTH
    join inputs.

    Spark-first plan: the residual OR can only be checked after the
    join, but its per-table ENVELOPES can be hoisted — the brand
    IN-list and size<=15 prune the part scan, quantity BETWEEN 1 AND
    30 prunes the fact scan — predicates Catalyst does not derive
    (factoring a disjunction across join inputs is not an implemented
    rewrite), so the engine hoists them explicitly. At 100 TB this is
    the difference between joining every lineitem row and joining the
    ~60% inside the quantity envelope against a ~12%-of-brands part
    side; the envelope predicates land in PushedFilters and ride the
    parquet row-group stats."""
    st = _star(spark, sf_dir)
    p = st.part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#14")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    li = st.lineitem.filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size") <= 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size") <= 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(branch)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "flagship_idle_balances",
    oracle="""
    WITH thr AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS total_balance
    FROM customer c
    CROSS JOIN thr
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      )
    GROUP BY n.n_name
    """,
)
def flagship_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped idle-balance report: customers whose balance
    beats the positive-balance average but who have NO orders, counted
    and totalled per nation.

    Spark-first plan: the global average is an UNCORRELATED scalar
    subquery — one 1-row aggregate broadcast back as a cross join (the
    threshold is computed from exact decimal Σ / exact count, divided
    once in double, so both engines derive the identical IEEE
    threshold and the > comparison cannot straddle an ulp). The NOT
    EXISTS is a LEFT ANTI join on the customer key — orders projected
    to that single column before the exchange; at 100 TB the anti
    join's build side is |customers-with-orders| keys, and AQE turns
    it map-side when the threshold filter leaves few probe rows.
    Nation names via the literal-map constant fold."""
    st = _star(spark, sf_dir)
    nmap = _nation_name_map(st)
    thr = (
        st.customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("__avg_bal")
        )
    )
    c = st.customer.select("c_custkey", "c_nationkey", "c_acctbal")
    idle = (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(
            st.orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
    )
    return idle.groupBy(nmap[F.col("c_nationkey")].alias("nation")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_balance"),
    )


@query(
    "agg_corr_qty_price",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
               SUM(CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
               SUM(CAST(l_quantity AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        FROM lineitem
        GROUP BY l_returnflag
    )
    SELECT l_returnflag AS returnflag,
           n AS n_lines,
           CAST(floor(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
               * 1000000000.0 + 0.5) AS BIGINT) AS corr_nano,
           CAST(floor(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS covar_pop_micro
    FROM m
    """,
)
def agg_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation and population covariance of
    (quantity, extended price) per return flag — WITHOUT the built-in
    corr()/covar_pop(), whose running float accumulators are
    partitioning-order-dependent and can never hash-match a
    single-threaded engine.

    The engine's order-free-float-statistics move, generalized to
    second-order cross moments: both inputs are exact decimals by
    schema (quantity is integral, price has 2 digits), so the five
    moment sums Σx Σy Σxy Σx² Σy² accumulate EXACTLY (decimal adds
    commute) and merge map-side like any algebraic aggregate; the
    correlation is then ONE identical IEEE expression over the final
    scalars in both engines. At 100 TB this is also the fastest shape:
    five mergeable sums in a single partial+final hash aggregate, no
    second pass over the data (the textbook mean-centered formula
    needs the mean first), |returnflag| rows out.

    The emitted statistics are nano-/micro-quantized (floor(x*1e9+0.5)
    into integers — the registry's text_lm_score pattern): the moment
    sums exceed 2^53 in scaled units, and DECIMAL(38,4)→double casts
    of such magnitudes are not correctly rounded identically across
    engines (int128 halves vs BigDecimal), so the raw doubles can
    straddle one ulp. Quantizing the FINAL scalar absorbs that; the
    moments themselves stay exact."""
    st = _star(spark, sf_dir)
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    m = st.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sx * sy
    denx = F.sqrt(nd * F.col("sxx").cast("double") - sx * sx)
    deny = F.sqrt(nd * F.col("syy").cast("double") - sy * sy)
    return m.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("n").alias("n_lines"),
        F.floor(
            (num / (denx * deny)) * F.lit(1000000000.0) + F.lit(0.5)
        ).cast("long").alias("corr_nano"),
        F.floor(
            (num / (nd * nd)) * F.lit(1000000.0) + F.lit(0.5)
        ).cast("long").alias("covar_pop_micro"),
    )


@query(
    "events_gapfill",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM hourly),
    hours AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM span
    ),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT t.event_type, h.hour, COALESCE(x.n_events, 0) AS n_events
    FROM hours h
    CROSS JOIN types t
    LEFT JOIN hourly x
      ON x.event_type = t.event_type AND x.hour = h.hour
    """,
)
def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly event counts: every (type, hour) cell of the
    observed time span, missing hours emitted as ZERO — the resample/
    gap-fill primitive that makes per-hour rates comparable (a sparse
    rollup silently conflates "no events" with "no row", which skews
    any average or anomaly baseline computed over it).

    Spark-first plan: the raw stream collapses to (type, hour) grain
    in one partial-aggregated exchange; the dense grid is generated
    FROM the 1-row span aggregate via sequence()+explode — |hours|
    rows from one row, no driver loop, no collected timestamps — and
    cross-joined with the |types| distinct values (both sides
    broadcast-size by construction: the grid is |types|x|hours|
    regardless of corpus size). The left join back to the sparse
    rollup is grid-sized, not events-sized. At 100 TB nothing here
    grows except the first aggregation's input."""
    st = _star(spark, sf_dir)
    ev = st.events.select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    )
    hourly = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    span = hourly.agg(
        F.min("hour").alias("lo"), F.max("hour").alias("hi")
    )
    hours = span.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = hours.crossJoin(F.broadcast(types))
    return (
        grid.join(F.broadcast(hourly), ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias(
                "n_events"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Batch 2: semantic dedup, temperature mixing, LOCF gap-fill
# ---------------------------------------------------------------------------

#: Same sequential-fold squared-L2 the k-means tier uses — one DuckDB
#: twin of functions.vectors.sq_l2 (bit-identical fold order).
_SQDIST_SQL = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"
)

#: Near-duplicate radius (squared L2, micro-rounded): within-cluster
#: pairs closer than this are semantic duplicates. Chosen from the
#: measured pair-distance distribution (p1~1.35, p5~1.51 at sf0.01) so
#: a real fraction of the synthetic corpus dedups at every scale.
_SEMDEDUP_DELTA = 1.45

_SEMDEDUP_K = 8


@query(
    "dedup_semantic",
    oracle=f"""
    WITH c AS (
        SELECT vec_id AS cluster_id, embedding AS cv
        FROM embeddings WHERE vec_id < {_SEMDEDUP_K}
    ),
    scored AS (
        SELECT e.vec_id, e.embedding, c.cluster_id,
               round({_SQDIST_SQL.format(a='e.embedding', b='c.cv')}, 6)
                   AS dist_sq
        FROM embeddings e CROSS JOIN c
    ),
    a AS (
        SELECT vec_id, embedding, cluster_id, dist_sq
        FROM (SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY dist_sq, cluster_id) AS rn
              FROM scored)
        WHERE rn = 1
    )
    SELECT a.vec_id, a.cluster_id, a.dist_sq
    FROM a
    WHERE NOT EXISTS (
        SELECT 1 FROM a b
        WHERE b.cluster_id = a.cluster_id
          AND b.vec_id <> a.vec_id
          AND round({_SQDIST_SQL.format(a='a.embedding', b='b.embedding')},
                    6) <= {_SEMDEDUP_DELTA}
          AND (b.dist_sq < a.dist_sq
               OR (b.dist_sq = a.dist_sq AND b.vec_id < a.vec_id))
    )
    """,
)
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: cluster the embedding
    corpus, then within each cluster drop every vector that has a
    near-duplicate neighbor (sq_l2 <= delta) which is MORE CENTRAL
    (closer to the centroid; vec_id tiebreak) — keeping one
    representative per semantic neighborhood, preferring central
    points. Survivors emitted with their cluster and centroid
    distance.

    Spark-first plan: assignment is the map-only literal-centroid
    argmin (emb_kmeans_assign's kernel — zero exchanges); candidate
    pairs are generated ONLY within a cluster via a self-join on
    cluster_id, and the drop rule is a single LEFT ANTI join (NOT
    EXISTS with no post-dedup — anti joins never duplicate the probe
    side). The quadratic work is per-cluster, which is the published
    algorithm's actual shape: k grows with the corpus (k ~ sqrt(N)
    in production SemDeDup), holding cluster populations — and so
    per-cluster pair counts — bounded. k=8 here is bench-scale; the
    8-key self-join exchange is the known skew point at this k and
    disappears at production k. Both anti-join inputs re-run the
    map-only scoring pass rather than caching it: duplicating
    scan-speed map work is cheaper than materializing the corpus
    (cache exchange outputs, not map lineage — SCALE.md §13).

    Reference parity: extends dedup_embedding_pairs (exact all-pairs
    tier, fenced to verification scale) with the bucketed production
    path; same family as operators/dedup.py's MinHash-LSH ladder but
    over dense vectors."""
    from sales_etl_spark.plans.analytics import (
        _collect_centroids,
        _kmeans_score_with_vec,
    )

    from sales_etl_spark.operators.skew import spread_narrow_input

    st = _star(spark, sf_dir)
    e = st.embeddings
    seeds = _collect_centroids(
        e.filter(F.col("vec_id") < _SEMDEDUP_K).select(
            F.col("vec_id").alias("cluster_id"),
            F.col("embedding").alias("cv"),
        )
    )
    # the K-distance argmin fold runs twice (both anti-join legs) —
    # spread the narrow (vec_id, embedding) frame so the local
    # single-row-group table doesn't serialize it on one core
    assigned = _kmeans_score_with_vec(
        spread_narrow_input(e.select("vec_id", "embedding")), seeds
    )
    b = assigned.select(
        F.col("vec_id").alias("b_vec_id"),
        F.col("embedding").alias("b_embedding"),
        F.col("cluster_id").alias("b_cluster_id"),
        F.col("dist_sq").alias("b_dist_sq"),
    )
    pair_d = F.round(
        vectors.sq_l2(F.col("embedding"), F.col("b_embedding")), 6
    )
    # Residual order matters: the scalar centrality test runs BEFORE
    # the 64-dim distance fold, so the conjunction short-circuits the
    # expensive term for the half of each bucket's pair stream where
    # the candidate is not more central (measured ~25% off the join
    # stage; Catalyst keeps user predicate order for residuals).
    survivors = assigned.join(
        b,
        (F.col("cluster_id") == F.col("b_cluster_id"))
        & (
            (F.col("b_dist_sq") < F.col("dist_sq"))
            | (
                (F.col("b_dist_sq") == F.col("dist_sq"))
                & (F.col("b_vec_id") < F.col("vec_id"))
            )
        )
        & (pair_d <= F.lit(_SEMDEDUP_DELTA)),
        "left_anti",
    )
    return survivors.select("vec_id", "cluster_id", "dist_sq")


#: Temperature-mix parameters: total document target and the mixing
#: hash seed. Temperature is FIXED at 2 (w ~ mass^(1/2)) because sqrt
#: is correctly rounded in IEEE — an arbitrary pow(x, 1/T) is not,
#: and one-ulp pow drift across engines would flip floor() targets.
_TEMP_MIX_TARGET = 240
_TEMP_MIX_SEED = "temp-v1"


@query(
    "mix_temperature_resample",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, n_tokens
        FROM (SELECT doc_id, source, {{bpe}} AS n_tokens FROM documents)
        WHERE n_tokens > 0
    ),
    mass AS (
        SELECT source,
               CAST(floor(sqrt(CAST(SUM(n_tokens) AS DOUBLE)) * 1000000
                          + 0.5) AS BIGINT) AS w_micro
        FROM toks GROUP BY source
    ),
    tot AS (SELECT SUM(w_micro) AS w_tot FROM mass),
    targets AS (
        SELECT m.source,
               CAST(floor({_TEMP_MIX_TARGET}
                          * (CAST(m.w_micro AS DOUBLE)
                             / CAST(t.w_tot AS DOUBLE))) AS BIGINT)
                   AS n_target
        FROM mass m CROSS JOIN tot t
    )
    SELECT d.doc_id, d.source, d.n_tokens,
           CAST(d.rk AS BIGINT) AS rk,
           g.n_target
    FROM (
        SELECT doc_id, source, n_tokens,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY substr(md5('{_TEMP_MIX_SEED}:'
                                       || CAST(doc_id AS VARCHAR)), 1, 8),
                            doc_id
               ) AS rk
        FROM toks
    ) d
    JOIN targets g ON g.source = d.source
    WHERE d.rk <= g.n_target
    """.replace(
        "{bpe}",
        r"CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INTEGER)",
    ),
)
def mix_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-LLM
    rebalancing move): per-source sampling targets proportional to
    sqrt(token mass) — up-weighting small sources relative to their
    raw share — then a deterministic hash-ordered prefix of each
    source fills its target. Zero-token documents are dropped up
    front (the token_budget_mix contract): they carry no mass, and
    letting them occupy target slots would fill a "token" budget with
    empty documents.

    Cross-engine exactness: the weight chain is BIGINT token sums →
    one sqrt (correctly rounded IEEE) → micro-quantized BIGINT
    weights → exact integer total → one double division+multiplication
    → floor. No accumulation ever happens in floating point, and
    temperature is fixed at 2 precisely because sqrt is the one power
    that IS correctly rounded everywhere.

    Scale shape: token counting is map-side; the per-source mass is
    one tiny aggregate (|sources| rows, broadcast back); ranking is
    one exchange on the source key. Unlike sample_domain_cap the cap
    varies per source, so no WindowGroupLimit partial pushdown —
    compose with domain_cap(cap = max target) first when a single
    source holds billions of rows."""
    st = _star(spark, sf_dir)
    toks = st.documents.select(
        "doc_id", "source", TX.token_count(F.col("text")).alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    mass = toks.groupBy("source").agg(
        F.floor(
            F.sqrt(F.sum("n_tokens").cast("double")) * F.lit(1000000)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("w_micro")
    )
    tot = mass.agg(F.sum("w_micro").alias("w_tot"))
    targets = mass.crossJoin(F.broadcast(tot)).select(
        "source",
        F.floor(
            F.lit(_TEMP_MIX_TARGET)
            * (F.col("w_micro").cast("double") / F.col("w_tot").cast("double"))
        )
        .cast("long")
        .alias("n_target"),
    )
    w = Window.partitionBy("source").orderBy(
        hash_uniform_hex(F.col("doc_id"), _TEMP_MIX_SEED), F.col("doc_id")
    )
    ranked = toks.withColumn("rk", F.row_number().over(w).cast("long"))
    return ranked.join(F.broadcast(targets), "source").filter(
        F.col("rk") <= F.col("n_target")
    ).select("doc_id", "source", "n_tokens", "rk", "n_target")


@query(
    "events_locf",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               SUM(CAST(value AS DECIMAL(18,6))) AS total_value
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT min(hour) AS lo, max(hour) AS hi FROM hourly),
    hours AS (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        FROM span
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    grid AS (
        SELECT t.event_type, h.hour,
               COALESCE(x.n_events, 0) AS n_events,
               x.total_value
        FROM hours h
        CROSS JOIN types t
        LEFT JOIN hourly x
          ON x.event_type = t.event_type AND x.hour = h.hour
    )
    SELECT event_type, hour, n_events,
           n_events = 0 AS filled,
           CAST(last_value(total_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hour
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS total_value_locf
    FROM grid
    """,
)
def events_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly totals with last-observation-carried-forward:
    every (type, hour) cell of the span, empty hours carrying the most
    recent hour's total (NULL before the first observation — carrying
    nothing backwards is the point). The second half of the resample
    story events_gapfill starts: gapfill makes rates comparable, LOCF
    makes LEVEL metrics (balances, gauges, last-known state)
    comparable.

    Exactness: the carried value is an exact DECIMAL hourly sum; LOCF
    SELECTS one of those decimals (no accumulation), and the single
    double cast happens after — both engines pick the identical value.

    Scale shape: identical to events_gapfill (one fact-sized
    aggregation, bounded grid) plus ONE window over the grid —
    |types| partitions of |hours| rows each, negligible at any corpus
    size."""
    st = _star(spark, sf_dir)
    ev = st.events.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "value",
    )
    hourly = ev.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
    )
    span = hourly.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias(
            "hour"
        )
    )
    types = ev.select("event_type").distinct()
    grid = (
        hours.crossJoin(F.broadcast(types))
        .join(F.broadcast(hourly), ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(F.col("n_events"), F.lit(0).cast("long")).alias(
                "n_events"
            ),
            "total_value",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.select(
        "event_type",
        "hour",
        "n_events",
        (F.col("n_events") == 0).alias("filled"),
        F.last("total_value", ignorenulls=True)
        .over(w)
        .cast("double")
        .alias("total_value_locf"),
    )


@query(
    "join_scd2_pointintime",
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
    keep AS (SELECT * FROM chg WHERE prev IS NULL OR prev <> priority),
    hist AS (
        SELECT customer_id, priority, ts AS valid_from,
               lead(ts) OVER (
                   PARTITION BY customer_id ORDER BY ts, uid
               ) AS valid_to
        FROM keep
    ),
    fact AS (
        SELECT o.o_custkey AS customer_id,
               CAST(l.l_shipdate AS DATE) AS d,
               CAST(l.l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l.l_discount AS DECIMAL(8,4)) AS rev
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT COALESCE(h.priority, 'none') AS priority_at_ship,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(f.rev) AS DOUBLE) AS revenue
    FROM fact f
    LEFT JOIN hist h
      ON h.customer_id = f.customer_id
     AND h.valid_from <= f.d
     AND (f.d < h.valid_to OR h.valid_to IS NULL)
    GROUP BY COALESCE(h.priority, 'none')
    """,
)
def join_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join against the SCD2 dimension — the
    feature-store "no leakage" join: every shipped line is attributed
    to the customer's priority state AS OF the ship date (lines before
    a customer's first recorded state get 'none'), rolled up to a
    lines/revenue report per state.

    Spark-first plan: the oracle's interval theta join (valid_from <=
    d < valid_to) NEVER executes — SCD2 intervals are change-
    compressed, per-key disjoint, contiguous and open-ended at the
    tail, so the latest valid_from <= d IS the covering interval, and
    the engine runs the backward AS-OF join (operators/temporal.py:
    one shuffle on the customer key + one in-partition sort-carry)
    instead of an |facts| x |history rows per customer| interval
    probe. Same-day state flips compress to an empty [d, d) interval,
    which the builder drops pre-join (it can cover no fact and would
    tie the as-of on valid_from); the surviving intervals stay
    contiguous, keeping the as-of == interval-join equivalence exact.
    Reference parity: composes dim_scd2_history (upsert family) with
    join_asof machinery — the consumer the SCD2 timeline exists for."""
    from sales_etl_spark.operators import upsert
    from sales_etl_spark.operators.temporal import asof_join

    st = _star(spark, sf_dir)
    src = st.orders.select(
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("ts"),
        F.col("o_orderkey").alias("uid"),
    )
    hist = upsert.scd2_history(
        src,
        keys=["customer_id"],
        order_by=["ts", "uid"],
        attrs=["priority"],
        ts_col="ts",
    ).filter(
        F.col("valid_to").isNull()
        | (F.col("valid_to") > F.col("valid_from"))
    )
    fact = (
        st.lineitem.select(
            "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
        )
        .join(
            st.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("customer_id"),
            F.col("l_shipdate").cast("date").alias("d"),
            _rev().alias("rev"),
        )
    )
    joined = asof_join(
        fact,
        hist.select("customer_id", "valid_from", "priority"),
        by=["customer_id"],
        left_ts="d",
        right_ts="valid_from",
        right_payload=["priority"],
    )
    return joined.groupBy(
        F.coalesce(F.col("priority"), F.lit("none")).alias(
            "priority_at_ship"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("rev").cast("double").alias("revenue"),
    )


@query(
    "events_twap",
    oracle="""
    WITH seq AS (
        SELECT event_type, ts, event_id,
               CAST(value AS DECIMAL(18,6)) AS v,
               lead(ts) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS next_ts
        FROM events
    ),
    held AS (
        SELECT event_type, v,
               date_diff('microsecond', ts, next_ts) AS dur_us
        FROM seq WHERE next_ts IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dur_us) AS BIGINT) AS total_us,
           CAST(floor(CAST(SUM(v * dur_us) AS DOUBLE)
                      / CAST(SUM(dur_us) AS DOUBLE)
                      * 1000000.0 + 0.5) AS BIGINT) AS twap_micro
    FROM held
    GROUP BY event_type
    """,
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type (TWAP): each event's
    value is held until the type's next event; the average weights
    each value by its holding duration, not its count — the metric
    that makes irregularly-sampled gauges comparable (a count-weighted
    mean over-represents bursts). The open tail after the last event
    holds nothing (no duration exists for it).

    Exactness: durations are exact integer microseconds, values are
    cast to DECIMAL once, and the weighted sum Σ v·dur accumulates in
    DECIMAL — both engines divide the same two exact scalars once.
    Ties on ts are totally ordered by event_id in BOTH engines. The
    emitted average is micro-quantized: the weighted sum exceeds 2^53
    in scaled units, where DECIMAL→double casts are not identically
    rounded across engines (the agg_corr_qty_price hazard).

    Scale shape: one shuffle on the type key, one in-partition sort
    for lead(), one mergeable aggregation — the same cost as any
    sessionization pass; nothing global, no scalar broadcast (the
    tail is dropped, so no span aggregate is needed)."""
    st = _star(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = st.events.select(
        "event_type", "ts", "event_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
    ).withColumn("next_ts", F.lead("ts").over(w))
    held = seq.filter(F.col("next_ts").isNotNull()).select(
        "event_type",
        "v",
        # timestampdiff handles TIMESTAMP_NTZ (unix_micros does not)
        F.expr("timestampdiff(MICROSECOND, ts, next_ts)").alias("dur_us"),
    )
    return held.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dur_us").alias("total_us"),
        F.floor(
            F.sum(F.col("v") * F.col("dur_us")).cast("double")
            / F.sum("dur_us").cast("double")
            * F.lit(1000000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("twap_micro"),
    )


#: Quality-decile sampling: keep rate grows with the decile (decile d
#: keeps d/10 of its docs) — the quality-aware subsampling move.
_QDECILE_SEED = "qdecile-v1"


def _qdecile_oracle() -> str:
    """DuckDB twin, assembled at import: the classifier score reuses
    the EXACT weight expression quality_classifier_score's oracle uses
    (extensions._QW_INT_SQL — one definition of the hashed weights),
    and the per-decile hash thresholds are Python-generated literals
    from the same threshold_hex the Spark side calls (decile 10 keeps
    everything unconditionally: an 8-hex-char draw has no < 1.0
    threshold representation)."""
    from sales_etl_spark.operators.sampling import threshold_hex
    from sales_etl_spark.plans.extensions import _QW_INT_SQL

    kept_cases = " ".join(
        f"WHEN bucket = {b} THEN CASE WHEN "
        f"substr(md5('{_QDECILE_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)"
        f" < '{threshold_hex(b * 0.1)}' THEN 1 ELSE 0 END"
        for b in range(1, 10)
    )
    return rf"""
    WITH sc AS (
        SELECT doc_id,
               CASE WHEN len(toks) > 0
                    THEN round(CAST(list_sum(list_transform(toks,
                             t -> {_QW_INT_SQL})) AS DOUBLE)
                         / 4294967296 / len(toks), 6)
                    ELSE 0.0 END AS score
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+')
                         AS toks
              FROM documents) t
    ),
    dist AS (
        SELECT score, COUNT(*) AS c FROM sc GROUP BY score
    ),
    cum AS (
        SELECT score,
               SUM(c) OVER (ORDER BY score
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_c,
               SUM(c) OVER () AS n
        FROM dist
    ),
    bounds AS (
        SELECT d, MIN(score) AS boundary
        FROM cum CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d)
        WHERE cum_c >= ceil(n * d / 10.0)
        GROUP BY d
    ),
    bucketed AS (
        SELECT s.doc_id, s.score,
               CAST(1 + COUNT(b.d) AS INTEGER) AS bucket
        FROM sc s LEFT JOIN bounds b ON s.score > b.boundary
        GROUP BY s.doc_id, s.score
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE {kept_cases} ELSE 1 END) AS BIGINT) AS n_kept
    FROM bucketed
    GROUP BY bucket
    """


_QDECILE_ORACLE = _qdecile_oracle()


@query(
    "sample_quality_deciles",
    oracle=_QDECILE_ORACLE,
)
def sample_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware subsampling report: docs bucketed into score
    DECILES of the hashed-classifier quality distribution, then
    down-sampled at a rate that grows with quality (decile d keeps
    d/10) — the standard move for skimming a web corpus toward its
    better half without discarding diversity. Emits per-decile totals
    and kept counts.

    Spark-first plan: scoring is the map-only classifier fold; the
    decile BOUNDARIES come from the micro-rounded score's distinct-
    value histogram (one exchange to a bounded frame — scores have
    1e-6 granularity, so the distribution frame cannot exceed the
    value domain no matter the corpus), cumulated in one tiny window
    and broadcast back as 9 literal-joined boundary rows; per-doc
    bucketing is a broadcast join + count, never a global sort of the
    corpus (row_number over an unpartitioned window — the naive
    decile — funnels 100 TB through one task). Sampling is the
    hash-threshold primitive (operators/sampling.py), map-side.

    Tie semantics: equal scores share a bucket (quantile-with-ties),
    so bucket populations are approximately n/10, exactly reproducible
    in both engines."""
    st = _star(spark, sf_dir)
    qd = QUERY_REGISTRY["quality_classifier_score"]
    sc = qd.builder(spark, sf_dir).select(
        "doc_id", F.col("quality_score").alias("score")
    )
    dist = sc.groupBy("score").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    cum = dist.select(
        "score",
        F.sum("c").over(w_cum).alias("cum_c"),
        F.sum("c").over(w_all).alias("n"),
    )
    deciles = spark.range(1, 10).select(F.col("id").alias("d"))
    bounds = (
        cum.crossJoin(F.broadcast(deciles))
        .filter(F.col("cum_c") >= F.ceil(F.col("n") * F.col("d") / 10.0))
        .groupBy("d")
        .agg(F.min("score").alias("boundary"))
    )
    bucketed = (
        sc.join(F.broadcast(bounds), F.col("score") > F.col("boundary"),
                "left")
        .groupBy("doc_id", "score")
        .agg((F.count("d") + 1).cast("int").alias("bucket"))
    )
    # decile 10 keeps everything unconditionally — rate 1.0 has no
    # 8-hex-char threshold representation (threshold_hex domain is
    # [0, 1)); deciles 1-9 compare the uniform draw to a literal
    kept = F.lit(1)
    for b in range(9, 0, -1):
        kept = F.when(
            F.col("bucket") == b,
            F.when(
                hash_uniform_hex(F.col("doc_id"), _QDECILE_SEED)
                < F.lit(threshold_hex(b * 0.1)),
                1,
            ).otherwise(0),
        ).otherwise(kept)
    return bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept).alias("n_kept"),
    )


@query(
    "events_session_stats",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CAST(value AS DECIMAL(18,6)) AS v,
               CASE WHEN ts - lag(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                    < INTERVAL '30 minutes'
                    THEN 0 ELSE 1 END AS new_sess
        FROM events
    ),
    sess AS (
        SELECT user_id, ts, v,
               CAST(SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT)
               AS duration_us,
           CAST(SUM(v) AS DOUBLE) AS total_value
    FROM sess
    GROUP BY user_id, session_seq
    """,
)
def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-grain rollup over the 30-minute-gap sessionization:
    events per session, wall-clock duration (microseconds, exact),
    and the session's value total — the conversation-level mart a
    training pipeline derives after grouping events into sessions
    (window_sessionize_ids keeps the rows; this is its aggregate
    consumer, the two halves of the sessionize story).

    Scale shape: ONE shuffle on user_id serves the lag flag, the
    running session number AND the final aggregation — the session
    grain (user_id, session_seq) is a prefix-extension of the window
    partitioning, so Catalyst reuses the exchange; nothing reclusters.
    Value totals are DECIMAL sums (well under 2^53 scaled units per
    session — sessions are humanly bounded; contrast events_twap's
    corpus-sized sums, which need quantization)."""
    st = _star(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    flagged = st.events.select(
        "user_id", "ts", "event_id",
        F.col("value").cast("decimal(18,6)").alias("v"),
    ).withColumn(
        "new_sess",
        F.when(us - F.lag(us).over(w) < 30 * 60 * 1_000_000, F.lit(0))
        .otherwise(F.lit(1)),
    )
    sess = flagged.withColumn(
        "session_seq",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias(
            "duration_us"
        ),
        F.sum("v").cast("double").alias("total_value"),
    )


#: Epoch-schedule targets: token demand per source for the planned
#: training run (larger than any single source's supply at test SF,
#: so repeat factors are non-trivial).
_EPOCH_TARGET_DEFAULT = 5_000
_EPOCH_TARGETS = {"src0": 12_000, "src1": 2_000, "src2": 0}


@query(
    "mix_epoch_schedule",
    oracle=r"""
    WITH mass AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(regexp_extract_all(text, '\w+|[^\w\s]')))
                    AS BIGINT) AS mass_tokens
        FROM documents GROUP BY source
    )
    SELECT source, n_docs, mass_tokens,
           CAST(CASE WHEN source = 'src0' THEN 12000
                     WHEN source = 'src1' THEN 2000
                     WHEN source = 'src2' THEN 0
                     ELSE 5000 END AS BIGINT) AS target_tokens,
           CAST((CASE WHEN source = 'src0' THEN 12000
                      WHEN source = 'src1' THEN 2000
                      WHEN source = 'src2' THEN 0
                      ELSE 5000 END + mass_tokens - 1) // mass_tokens
                AS BIGINT) AS n_epochs,
           CAST(CASE WHEN (CASE WHEN source = 'src0' THEN 12000
                                WHEN source = 'src1' THEN 2000
                                WHEN source = 'src2' THEN 0
                                ELSE 5000 END) = 0 THEN 0
                ELSE CASE WHEN source = 'src0' THEN 12000
                          WHEN source = 'src1' THEN 2000
                          WHEN source = 'src2' THEN 0
                          ELSE 5000 END
                     - ((CASE WHEN source = 'src0' THEN 12000
                              WHEN source = 'src1' THEN 2000
                              WHEN source = 'src2' THEN 0
                              ELSE 5000 END + mass_tokens - 1)
                        // mass_tokens - 1) * mass_tokens
                END AS BIGINT) AS last_epoch_tokens
    FROM mass
    """,
)
def mix_epoch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained epoch scheduling: when a source's token demand
    exceeds its supply, the mix REPEATS the source — n_epochs =
    ceil(target / mass) full passes, the last one truncated to
    last_epoch_tokens (composable with mix_token_budget to pick WHICH
    prefix fills the final partial pass). The report every
    data-constrained training plan starts from (repeat factors per
    source, zero-target sources scheduled out entirely with
    n_epochs = 0).

    Exactness: pure BIGINT arithmetic — token sums are integer, and
    ceil-division is the (t + m - 1) div m identity, never a float.
    Scale shape: token counting is map-side; the schedule is a
    |sources|-row aggregate — one partial-combined exchange over the
    corpus and nothing else."""

    st = _star(spark, sf_dir)
    mass = st.documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(TX.token_count(F.col("text")).cast("long")).alias(
            "mass_tokens"
        ),
    )
    target = F.lit(_EPOCH_TARGET_DEFAULT).cast("long")
    for s, t in _EPOCH_TARGETS.items():
        target = F.when(F.col("source") == s, F.lit(t).cast("long")).otherwise(
            target
        )
    n_epochs = F.floor(
        (target + F.col("mass_tokens") - 1) / F.col("mass_tokens")
    ).cast("long")
    return mass.select(
        "source",
        "n_docs",
        "mass_tokens",
        target.alias("target_tokens"),
        n_epochs.alias("n_epochs"),
        # a zero-target source is scheduled out: 0 epochs, 0 tokens
        # (the raw identity would claim a full phantom pass of -0th
        # epoch: target - (0-1)*mass = mass)
        F.when(target == 0, F.lit(0).cast("long"))
        .otherwise(
            (target - (n_epochs - 1) * F.col("mass_tokens")).cast("long")
        )
        .alias("last_epoch_tokens"),
    )


@query(
    "events_variant_agg",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM (
        SELECT event_type,
               CAST(json_extract(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    GROUP BY event_type
    """,
)
def events_variant_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    props parses ONCE into the binary variant encoding, and every
    downstream extraction (`try_variant_get`) walks the encoded tree
    instead of re-running a string JSON parser per path — the
    parse-once/extract-many contract that matters when a 100 TB event
    stream carries deep props and queries touch several paths each
    (get_json_object re-parses the string per call;
    events_json_extract keeps that legacy single-path form for
    contrast). try_variant_get nulls malformed rows instead of
    failing the job, matching the engine's null-on-error cast
    posture (SURVEY P3). Integer-only aggregates — exact in both
    engines."""
    st = _star(spark, sf_dir)
    v = st.events.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    k = F.try_variant_get(F.col("v"), "$.k", "long")
    return v.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("k").alias("n_with_k"),
        F.sum("k").alias("sum_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


@query(
    "flagship_waiting_supplier",
    oracle=f"""
    WITH multi AS (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING COUNT(DISTINCT l_suppkey) > 1
    ),
    late AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name AS supplier_name,
           CAST(COUNT(*) AS BIGINT) AS n_waiting_orders
    FROM late t1
    JOIN multi m ON m.l_orderkey = t1.l_orderkey
    JOIN supplier s ON s.s_suppkey = t1.l_suppkey
    WHERE NOT EXISTS (
        SELECT 1 FROM late t2
        WHERE t2.l_orderkey = t1.l_orderkey
          AND t2.l_suppkey <> t1.l_suppkey
    )
    GROUP BY s.s_name
    ORDER BY n_waiting_orders DESC, supplier_name
    LIMIT 25
    """,
)
def flagship_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped "waiting supplier" report — the hardest shape
    in the reference family: on multi-supplier orders, count per
    supplier the orders where THEY were late (>60-day ship lag) and
    NO other supplier was — a doubly-correlated EXISTS / NOT EXISTS.

    Spark-first plan: the correlation pair never runs row-at-a-time.
    The (order, supplier) LATE set is computed once at distinct grain;
    "some other supplier also late" is then a PER-ORDER AGGREGATE of
    that set (distinct late suppliers per order == 1 ⟺ the sole late
    supplier is blamed) — turning EXISTS+NOT EXISTS into one groupBy
    + filter + semi-join, the same decorrelation Catalyst performs
    for the SQL form but with the late-set scan shared instead of
    repeated. Multi-supplier order ids are a semi-join input computed
    at order grain. Everything clusters on the order key until the
    final |suppliers|-sized rollup; the 60-day residual rides the
    lineitem⨝orders equi-join."""
    st = _star(spark, sf_dir)
    li = st.lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
    o = st.orders.select("o_orderkey", "o_orderdate")
    multi = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .select("l_orderkey")
    )
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    # orders with EXACTLY ONE distinct late supplier: that supplier is
    # the sole cause -> NOT EXISTS(other late) collapses to a count
    sole = (
        late.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("__nlate"),
            F.max("l_suppkey").alias("l_suppkey"),
        )
        .filter(F.col("__nlate") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    s = st.supplier.select("s_suppkey", "s_name")
    return (
        sole.join(multi, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.count(F.lit(1)).alias("n_waiting_orders"))
        .orderBy(F.desc("n_waiting_orders"), "supplier_name")
        .limit(25)
    )


@query(
    "agg_skew_kurtosis",
    oracle="""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS DECIMAL(4,1))) AS s1,
               SUM(CAST(l_quantity AS DECIMAL(4,1))
                   * CAST(l_quantity AS DECIMAL(4,1))) AS s2,
               SUM(CAST(l_quantity AS DECIMAL(4,1))
                   * CAST(l_quantity AS DECIMAL(4,1))
                   * CAST(l_quantity AS DECIMAL(4,1))) AS s3,
               SUM(CAST(l_quantity AS DECIMAL(4,1))
                   * CAST(l_quantity AS DECIMAL(4,1))
                   * CAST(l_quantity AS DECIMAL(4,1))
                   * CAST(l_quantity AS DECIMAL(4,1))) AS s4
        FROM lineitem
        GROUP BY l_returnflag
    ),
    d AS (
        SELECT l_returnflag, n,
               CAST(n AS DOUBLE) AS nd,
               CAST(s1 AS DOUBLE) AS x1,
               CAST(s2 AS DOUBLE) AS x2,
               CAST(s3 AS DOUBLE) AS x3,
               CAST(s4 AS DOUBLE) AS x4
        FROM m
    ),
    c AS (
        SELECT l_returnflag, n,
               x1 / nd AS mu,
               x2 / nd - (x1 / nd) * (x1 / nd) AS m2,
               x3 / nd - 3 * (x1 / nd) * (x2 / nd)
                   + 2 * (x1 / nd) * (x1 / nd) * (x1 / nd) AS m3,
               x4 / nd - 4 * (x1 / nd) * (x3 / nd)
                   + 6 * (x1 / nd) * (x1 / nd) * (x2 / nd)
                   - 3 * (x1 / nd) * (x1 / nd) * (x1 / nd) * (x1 / nd)
                   AS m4
        FROM d
    )
    SELECT l_returnflag AS returnflag, n AS n_lines,
           CAST(floor(mu * 1000000000.0 + 0.5) AS BIGINT) AS mean_nano,
           CAST(floor(m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2))
                      * 1000000000.0 + 0.5) AS BIGINT) AS skew_nano,
           CAST(floor((m4 / (m2 * m2) - 3) * 1000000000.0 + 0.5)
                AS BIGINT) AS excess_kurtosis_nano
    FROM c
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact skewness and excess kurtosis per return flag — the
    higher-moment closers of the order-free float-statistics family
    (agg_corr_qty_price's pattern at third and fourth order): four
    decimal power sums accumulate EXACTLY in one mergeable
    aggregation pass, the central moments and ratios evaluate as ONE
    identical IEEE expression chain over the final scalars, and the
    outputs are nano-quantized (power sums cross 2^53 scaled units at
    corpus scale — the cast hazard). Built-in skewness()/kurtosis()
    run streaming float accumulators whose result depends on
    partition order and can never hash-match a single-threaded
    engine. Quantity is DECIMAL(4,1)-exact by schema (integral 1-50),
    so s4 peaks at precision 29 — inside DECIMAL(38) headroom with
    the +10 sum widening."""
    x = F.col("l_quantity").cast("decimal(4,1)")
    st = _star(spark, sf_dir)
    m = st.lineitem.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    nd = F.col("n").cast("double")
    x1 = F.col("s1").cast("double")
    x2 = F.col("s2").cast("double")
    x3 = F.col("s3").cast("double")
    x4 = F.col("s4").cast("double")
    mu = x1 / nd
    m2 = x2 / nd - mu * mu
    m3 = x3 / nd - F.lit(3) * mu * (x2 / nd) + F.lit(2) * mu * mu * mu
    m4 = (
        x4 / nd
        - F.lit(4) * mu * (x3 / nd)
        + F.lit(6) * mu * mu * (x2 / nd)
        - F.lit(3) * mu * mu * mu * mu
    )
    nano = F.lit(1000000000.0)
    half = F.lit(0.5)
    return m.select(
        F.col("l_returnflag").alias("returnflag"),
        F.col("n").alias("n_lines"),
        F.floor(mu * nano + half).cast("long").alias("mean_nano"),
        F.floor(
            m3 / (F.sqrt(m2) * F.sqrt(m2) * F.sqrt(m2)) * nano + half
        )
        .cast("long")
        .alias("skew_nano"),
        F.floor((m4 / (m2 * m2) - F.lit(3)) * nano + half)
        .cast("long")
        .alias("excess_kurtosis_nano"),
    )


# ---------------------------------------------------------------------------
# DSIR: data selection with importance resampling (round 5)
# ---------------------------------------------------------------------------

#: Hashed-feature dimension for the DSIR bucket n-gram model. 256 is
#: the published sweet spot for unigram bucket models: big enough to
#: separate domains, small enough that both marginal frames broadcast.
_DSIR_DIM = 256
_DSIR_FEAT_SEED = "dsir-feat-v1"
_DSIR_TGT_SEED = "dsir-tgt-v1"
#: Deterministic stand-in for "a sample of the target domain": ~10% of
#: docs by hash draw (a real pipeline swaps this predicate for a scan
#: of the actual target corpus; everything downstream is unchanged).
_DSIR_TGT_RATE = 0.10
_DSIR_TOPK = 200


@query(
    "sample_dsir_weights",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\w+')) AS t
        FROM documents
    ),
    lbl AS (
        SELECT doc_id,
               substr(md5('{_DSIR_TGT_SEED}:' || CAST(doc_id AS VARCHAR)),
                      1, 8) < '{{thr}}' AS is_tgt
        FROM documents
    ),
    bt AS (
        SELECT doc_id,
               CAST('0x' || substr(md5('{_DSIR_FEAT_SEED}:' || t), 1, 8)
                    AS BIGINT) % {_DSIR_DIM} AS b
        FROM toks
    ),
    docfeat AS (
        SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c
        FROM bt GROUP BY doc_id, b
    ),
    marg AS (
        SELECT d.b,
               SUM(CASE WHEN l.is_tgt THEN d.c ELSE 0 END) AS ct,
               SUM(CASE WHEN NOT l.is_tgt THEN d.c ELSE 0 END) AS cs
        FROM docfeat d JOIN lbl l USING (doc_id) GROUP BY d.b
    ),
    tot AS (SELECT SUM(ct) AS nt, SUM(cs) AS ns FROM marg),
    lr AS (
        SELECT b,
               CAST(floor(ln(CAST((ct + 1) * (ns + {_DSIR_DIM}) AS DOUBLE)
                             / CAST((cs + 1) * (nt + {_DSIR_DIM}) AS DOUBLE))
                          * 1e6 + 0.5) AS BIGINT) AS lr_micro
        FROM marg, tot
    ),
    w AS (
        SELECT d.doc_id,
               CAST(SUM(d.c * lr.lr_micro) AS BIGINT) AS logw_micro,
               CAST(SUM(d.c) AS BIGINT) AS n_tokens
        FROM docfeat d
        JOIN lr USING (b)
        JOIN lbl l USING (doc_id)
        WHERE NOT l.is_tgt
        GROUP BY d.doc_id
    )
    SELECT doc_id, n_tokens, logw_micro,
           CAST(logw_micro AS DOUBLE) / 1e6 AS logw
    FROM w
    ORDER BY logw_micro DESC, doc_id
    LIMIT {_DSIR_TOPK}
    """.replace("{thr}", threshold_hex(_DSIR_TGT_RATE)),
)
def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (importance resampling over hashed n-gram
    features): estimate a bucket-unigram model of the TARGET domain
    (a deterministic ~10% hash draw stands in for "a sample of the
    data you wish you had more of") and of the raw SOURCE pool, weight
    every source doc by its log likelihood ratio
    Σ_b c_b·ln(p_tgt(b)/p_src(b)) (add-1 smoothing), and emit the
    top-k — the published recipe for skewing a web-scale corpus
    toward a target domain without a trained classifier.

    Spark-first plan: ONE token-stream exchange builds the per-(doc,
    bucket) counts, cached for its two consumers; both bucket
    marginals reduce from it in a single conditional aggregation to a
    256-row frame, whose smoothed log-ratios (micro-floored to exact
    longs — the ln(pT/pS) term is one ln of one division of two
    exactly-double integers, the minimal-float form) broadcast back
    into a per-doc integer dot product; top-k compiles to
    TakeOrderedAndProject with the doc_id tiebreak. No global sort,
    no corpus-sized window; the integer products stay < 2^53 up to
    ~10^6-token marginals per bucket — beyond that, stage the ratio
    as ln(ct+1)−ln(cs+1)+ln(ns+B)−ln(nt+B) micro-terms instead."""
    st = _star(spark, sf_dir)
    is_tgt = hash_uniform_hex(
        F.col("doc_id"), _DSIR_TGT_SEED
    ) < F.lit(threshold_hex(_DSIR_TGT_RATE))
    toks = TX.tokens(F.lower(F.col("text")))
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_DSIR_FEAT_SEED + ":"), F.col("t"))),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        % _DSIR_DIM
    )
    docfeat = (
        st.documents.select(
            "doc_id", is_tgt.alias("is_tgt"), F.explode(toks).alias("t")
        )
        .select("doc_id", "is_tgt", bucket.alias("b"))
        .groupBy("doc_id", "is_tgt", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .cache()  # two consumers: bucket marginals + per-doc weights
    )
    marg = docfeat.groupBy("b").agg(
        F.sum(F.when(F.col("is_tgt"), F.col("c")).otherwise(F.lit(0)))
        .alias("ct"),
        F.sum(F.when(~F.col("is_tgt"), F.col("c")).otherwise(F.lit(0)))
        .alias("cs"),
    )
    tot = marg.agg(
        F.sum("ct").alias("nt"), F.sum("cs").alias("ns")
    )
    lr = marg.crossJoin(F.broadcast(tot)).select(
        "b",
        F.floor(
            F.log(
                ((F.col("ct") + 1) * (F.col("ns") + _DSIR_DIM))
                .cast("double")
                / ((F.col("cs") + 1) * (F.col("nt") + _DSIR_DIM))
                .cast("double")
            )
            * 1e6
            + F.lit(0.5)
        ).cast("long").alias("lr_micro"),
    )
    w = (
        docfeat.filter(~F.col("is_tgt"))
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.col("lr_micro")).alias("logw_micro"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
    )
    return (
        w.select(
            "doc_id",
            "n_tokens",
            "logw_micro",
            (F.col("logw_micro").cast("double") / F.lit(1e6)).alias("logw"),
        )
        .orderBy(F.desc("logw_micro"), F.asc("doc_id"))
        .limit(_DSIR_TOPK)
    )
