"""Supply-side flagships: the last six TPC-H shapes the registry had
not yet demonstrated, closing the full 22-query family.

The testdata star has no ``partsupp`` table (TESTDATA.md), so the
supply catalog — which supplier can provide which part, at what unit
cost — is DERIVED from the lineitem fact: per (part, supplier), the
minimum observed unit price. That derivation is itself the realistic
100 TB shape (a catalog distilled from transaction history), and it
is one exact, order-free aggregation, so every query built on it
stays bit-exact against the DuckDB oracle.

- Q2-shaped min-cost supplier: per-part argmin over a region-filtered
  supplier set — catalog agg (the ONE fact shuffle) + two broadcast
  dims + a per-part window min;
- Q9-shaped product profit: revenue minus a retail-price-anchored
  cost, all-decimal, grouped by supplier nation x order year;
- Q11-shaped important supply: parts whose supplied value exceeds
  1.5x the mean — the scalar-subquery threshold made SCALE-FREE by
  comparing 2*value*cnt > 3*total in exact decimals (a fixed
  fraction goes degenerate as |parts| grows; the reference Q11
  hardcodes 0.0001/SF for the same reason);
- Q12-shaped shipping-speed priority mix: integer day-lag buckets x
  conditional counts in one pass;
- Q16-shaped supplier variety: distinct-supplier counts per
  (brand, type, size) with a complaint-supplier anti-join;
- Q20-shaped dominant supplier: suppliers providing >half of a
  part's shipped quantity in a year — the share test is 2*qty > tot
  in decimals, no division anywhere.

Reference parity: the reference engine (etl/transform.py) has no
partsupp-family queries; this tier extends SURVEY.md §2.4/§2.5 the
same way trade.py does. Determinism rules are the registry's
(plans/registry.py): decimal money/quantity sums, double division
only on identical-operand expressions, full tiebreakers on any
top-k, no wall-clock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sales_etl_spark.functions import scalars
from sales_etl_spark.plans.registry import query
from sales_etl_spark.plans.trade import _nation_name_map
from sales_etl_spark.session import pin_semantics
from sales_etl_spark.sources.star import load_star

_REV_SQL = scalars.LINE_REVENUE_SQL.format(q="l.")
_rev = scalars.line_revenue


def _star(spark: SparkSession, sf_dir: str):
    pin_semantics(spark)
    return load_star(spark, sf_dir)


# Derived supply catalog: min observed unit price per (part, supplier).
# Unit price is a double division of identical operands in both
# engines (l_quantity >= 1 in the generator, no zero guard needed),
# and MIN over identical IEEE values is engine-independent.
_CATALOG_SQL = """
    SELECT l_partkey AS partkey, l_suppkey AS suppkey,
           MIN(l_extendedprice / l_quantity) AS unit_cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
"""


@query(
    "flagship_min_cost_supplier",
    oracle=f"""
    WITH catalog AS ({_CATALOG_SQL}),
    eur AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_regionkey = 3
    ),
    offers AS (
        SELECT p.p_partkey, e.s_name, e.s_acctbal, e.n_name,
               c.unit_cost,
               MIN(c.unit_cost) OVER (PARTITION BY p.p_partkey)
                   AS best_cost
        FROM catalog c
        JOIN eur e ON e.s_suppkey = c.suppkey
        JOIN part p ON p.p_partkey = c.partkey
        WHERE p.p_type = 'STANDARD' AND p.p_size BETWEEN 10 AND 30
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
    FROM offers WHERE unit_cost = best_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def flagship_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped min-cost supplier: for every STANDARD part in a
    size band, which EUROPE supplier offers it at the lowest derived
    unit cost — the correlated-MIN-subquery classic.

    Spark-first plan: both dim filters broadcast INTO the fact before
    the catalog agg — the region's supplier keys and the ~5% part
    slice cut the one fact-sized exchange to the offered rows only
    (the oracle's filter-after-aggregate formulation is equivalent
    because both predicates are on the grouping keys). The correlated
    subquery becomes a window MIN + exact-equality filter on the same
    double (identical IEEE value in both engines, so no tolerance
    needed); its per-part re-exchange moves only the already-filtered
    offer slice. Top-100 is TakeOrderedAndProject with the part key
    as final tiebreaker."""
    st = _star(spark, sf_dir)
    nmap = _nation_name_map(st)
    eur = (
        st.supplier.join(
            F.broadcast(
                st.nation.filter(F.col("n_regionkey") == 3).select(
                    "n_nationkey"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select(
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            "s_acctbal",
            nmap[F.col("s_nationkey")].alias("n_name"),
        )
    )
    parts = st.part.filter(
        (F.col("p_type") == "STANDARD")
        & F.col("p_size").between(10, 30)
    ).select("p_partkey")
    offers = (
        st.lineitem.select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("l_suppkey").alias("suppkey"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("u"),
        )
        .join(F.broadcast(parts), "p_partkey")
        .join(F.broadcast(eur), "suppkey")
        .groupBy("p_partkey", "suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("u").alias("unit_cost"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        offers.withColumn("best_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("best_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# Q9 cost anchor: 60% of retail price, all-decimal so the profit sum
# is exact and order-free. DECIMAL(18,2)*DECIMAL(12,2)*DECIMAL(4,2)
# peaks at precision 36 < 38 (Spark's cap) — no overflow truncation.
_COST_SQL = (
    "CAST(p.p_retailprice AS DECIMAL(18,2))"
    " * CAST(l.l_quantity AS DECIMAL(12,2))"
    " * CAST(0.60 AS DECIMAL(4,2))"
)


@query(
    "flagship_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
           CAST(SUM({_REV_SQL} - {_COST_SQL}) AS DOUBLE) AS sum_profit
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY n.n_name, CAST(EXTRACT(year FROM o.o_orderdate) AS INT)
    """,
)
def flagship_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-line profit: revenue minus a
    retail-anchored cost for every 'widget' part, by supplier nation
    and order year (the testdata has no partsupp.ps_supplycost, so
    cost anchors to 60% of p_retailprice — deterministic and exact).

    Spark-first plan: the name-filtered part dim broadcasts and cuts
    the fact at the scan side to the ~13% widget slice BEFORE the one
    real exchange (lineitem ⨝ orders on the order key); supplier
    broadcasts to its nation key and the 25-row nation name
    constant-folds into a literal map probe. Profit is a single
    all-decimal expression — sum is exact under any partitioning, and
    the final cast to double is one identical conversion in both
    engines. Output grain is |nations| x |years|: the last exchange
    is trivial."""
    st = _star(spark, sf_dir)
    nmap = _nation_name_map(st)
    parts = st.part.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    supp = st.supplier.select(
        F.col("s_suppkey").alias("suppkey"),
        F.col("s_nationkey").alias("snat"),
    )
    cost = (
        F.col("p_retailprice").cast("decimal(18,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * F.lit("0.60").cast("decimal(4,2)")
    )
    return (
        st.lineitem.join(
            F.broadcast(parts),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            st.orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("suppkey"))
        .groupBy(
            nmap[F.col("snat")].alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(_rev() - cost).cast("double").alias("sum_profit"))
    )


@query(
    "flagship_important_stock",
    oracle=f"""
    WITH supplied AS (
        SELECT l.l_partkey AS p_partkey,
               SUM({_REV_SQL}) AS val
        FROM lineitem l GROUP BY l.l_partkey
    ),
    tot AS (
        SELECT SUM(val) AS total, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM supplied
    )
    SELECT s.p_partkey, CAST(s.val AS DOUBLE) AS supply_value
    FROM supplied s, tot
    WHERE 2 * s.val * tot.cnt > 3 * tot.total
    ORDER BY supply_value DESC, s.p_partkey
    """,
)
def flagship_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important supply: parts whose total supplied
    value exceeds 1.5x the mean part's — the uncorrelated-scalar-
    subquery threshold shape.

    Spark-first plan: one exact decimal agg to part grain (the only
    fact exchange), then a 1-row (total, cnt) frame broadcast into
    the part-grain frame. The reference Q11's FIXED fraction
    (0.0001/SF) goes degenerate as the catalog grows, so the
    threshold here is scale-free — 2·value·cnt > 3·total compares
    exact decimals/longs only (no division, no doubles until the
    output edge), which also keeps it bit-exact across engines. The
    qualifying set is small by construction (a >1.5x-mean tail:
    2/29/252 rows at the three test scales, against a max/mean ratio
    of ~1.8), so the final sort is trivial."""
    st = _star(spark, sf_dir)
    # Cached so the fact scans ONCE for both the 1-row total and the
    # output side (the Q15 pattern; un-cached, Catalyst plans two
    # full scans+aggs for the self-referencing subquery shape).
    supplied = (
        st.lineitem.groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(_rev()).alias("val"))
        .cache()
    )
    tot = supplied.agg(
        F.sum("val").alias("total"),
        F.count(F.lit(1)).cast("long").alias("cnt"),
    )
    return (
        supplied.crossJoin(F.broadcast(tot))
        .filter(
            F.lit(2) * F.col("val") * F.col("cnt")
            > F.lit(3) * F.col("total")
        )
        .select(
            "p_partkey", F.col("val").cast("double").alias("supply_value")
        )
        .orderBy(F.col("supply_value").desc(), "p_partkey")
    )


@query(
    "flagship_shipmode_priority",
    oracle="""
    SELECT CASE
             WHEN lag_days < 0 THEN 'BACKDATED'
             WHEN lag_days <= 90 THEN 'FAST'
             WHEN lag_days <= 365 THEN 'STANDARD'
             ELSE 'SLOW'
           END AS speed_class,
           CAST(SUM(CASE WHEN priority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS high_line_count,
           CAST(SUM(CASE WHEN priority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT)
               AS low_line_count
    FROM (
        SELECT o.o_orderpriority AS priority,
               datediff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS lag_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    GROUP BY 1
    """,
)
def flagship_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped priority-by-shipping-speed mix: did
    high-priority orders actually ship in the fast lane? The testdata
    has no l_shipmode, so the mode is DERIVED — integer day-lag
    buckets (backdated / ≤90 / ≤365 / slow) — which is the more
    honest logistics question anyway.

    Spark-first plan: lag is computed at scan grain after the one
    real exchange (fact ⨝ orders on the order key); both conditional
    counts ride a single aggregation pass to a 4-row result — the
    classic pivot-in-one-pass shape (flagship_market_share's
    conditional-sum move applied to counts). Integer counts only:
    nothing floats anywhere."""
    st = _star(spark, sf_dir)
    lag = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        st.lineitem.select("l_orderkey", "l_shipdate")
        .join(
            st.orders.select(
                "o_orderkey", "o_orderdate", "o_orderpriority"
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.when(lag < 0, "BACKDATED")
            .when(lag <= 90, "FAST")
            .when(lag <= 365, "STANDARD")
            .otherwise("SLOW")
            .alias("speed_class")
        )
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )


@query(
    "flagship_supplier_variety",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT l_partkey AS partkey, l_suppkey AS suppkey
        FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT pr.suppkey) AS BIGINT) AS supplier_cnt
    FROM pairs pr
    JOIN part p ON p.p_partkey = pr.partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
      AND pr.suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def flagship_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier variety: how many distinct suppliers
    can provide each (brand, type, size) combination, excluding
    negative-balance suppliers (the complaint-supplier stand-in: the
    testdata has no s_comment).

    Spark-first plan: the fact collapses to DISTINCT (part, supplier)
    pairs first — the one fact-sized exchange, and the map-side
    partial distinct does most of the work since each pair repeats
    ~|lines-per-pair| times; the brand/type/size-filtered part dim
    broadcasts, the excluded-supplier set is a broadcast anti-join
    (NOT IN on a provably non-null key column → null-safe semantics
    are moot, and Catalyst compiles it to BroadcastHashJoin
    LeftAnti). The distinct-supplier count then groups a pair-grain
    frame to |brand x type x size| rows."""
    st = _star(spark, sf_dir)
    pairs = (
        st.lineitem.select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .distinct()
    )
    parts = st.part.filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = st.supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("suppkey")
    )
    return (
        pairs.join(
            F.broadcast(parts), F.col("partkey") == F.col("p_partkey")
        )
        .join(F.broadcast(bad_supp), "suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.count_distinct(F.col("suppkey"))
            .cast("long")
            .alias("supplier_cnt")
        )
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "flagship_dominant_supplier",
    oracle="""
    WITH shipped AS (
        SELECT l.l_partkey AS partkey, l.l_suppkey AS suppkey,
               SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE '%bolt%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l.l_partkey, l.l_suppkey
    ),
    dominant AS (
        SELECT DISTINCT suppkey
        FROM (
            SELECT suppkey, qty,
                   SUM(qty) OVER (PARTITION BY partkey) AS tot
            FROM shipped
        )
        WHERE 2 * qty > tot
    )
    SELECT s.s_name, n.n_name
    FROM dominant d
    JOIN supplier s ON s.s_suppkey = d.suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY s.s_name
    """,
)
def flagship_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped dominant supplier: which suppliers provided
    more than HALF of some bolt part's 1996 shipped quantity — the
    available-stock semi-join chain, with the share test recast as
    2·qty > total so only exact decimals are ever compared.

    Spark-first plan: the name-filtered part dim broadcasts into the
    date-pruned scan (both predicates reach the parquet reader), the
    (part, supplier) quantity agg is the one fact exchange, the
    per-part total is a window SUM over the partition the agg just
    hashed — zero extra shuffles — and the surviving supplier keys
    (a tiny distinct set) join the broadcast supplier/nation dims.
    No division: the dominance predicate is exact decimal
    arithmetic, bit-identical across engines."""
    st = _star(spark, sf_dir)
    nmap = _nation_name_map(st)
    parts = st.part.filter(F.col("p_name").like("%bolt%")).select(
        "p_partkey"
    )
    shipped = (
        st.lineitem.filter(
            (
                F.col("l_shipdate")
                >= F.lit("1996-01-01").cast("timestamp_ntz")
            )
            & (
                F.col("l_shipdate")
                < F.lit("1997-01-01").cast("timestamp_ntz")
            )
        )
        .join(
            F.broadcast(parts),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
    )
    w = Window.partitionBy("partkey")
    dominant = (
        shipped.withColumn("tot", F.sum("qty").over(w))
        .filter(F.lit(2) * F.col("qty") > F.col("tot"))
        .select("suppkey")
        .distinct()
    )
    supp = st.supplier.select(
        F.col("s_suppkey").alias("suppkey"),
        "s_name",
        nmap[F.col("s_nationkey")].alias("n_name"),
    )
    return (
        dominant.join(F.broadcast(supp), "suppkey")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
