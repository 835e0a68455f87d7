"""Entity resolution, global ordering, inequality profiling, and the
non-decomposable ledger scan (round-4 continuation tier).

Operator families the registry had not yet demonstrated, each a
standard warehouse/pipeline ask with a distinct Spark-first shape:

- blocked fuzzy record linkage: deterministic blocking keys bound the
  candidate pairs, codegen ``levenshtein`` (with Spark's bounded
  threshold form) scores them — the exact-blocking tier of the same
  candidate-generation ladder the MinHash/SimHash operators implement
  probabilistically (operators/dedup.py);
- scalable global row numbering: the bucket-offset decomposition that
  replaces the single-partition ``Window.orderBy`` anti-pattern
  (operators/windows.py:global_row_number);
- Gini coefficient of customer revenue: rank-weighted inequality
  profile built ON the scalable numbering — exact integer/decimal
  power sums to one final double expression, the same bit-exactness
  recipe as agg_stats/agg_skew_kurtosis;
- capped running balance: the clamp recurrence no prefix sum can
  express (operators/windows.py:capped_running_sum, grouped-map
  applyInPandas; DuckDB needs a recursive CTE for the same answer);
- Q18-shaped big-order report: HAVING-filtered aggregate used as a
  semi-join pruner into the fact scan before the dim join;
- integer-exact fixed-iteration PageRank: iterative link analysis as
  one join+groupBy per iteration (Pregel-on-joins), contributions
  floored to integer rank-units so distributed sums commute.

Reference parity: the reference engine (etl/transform.py) has no
fuzzy-match, ranking, or ledger surface — this tier is engine
extension per SURVEY.md §2.6. Determinism rules are the registry's
(plans/registry.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sales_etl_spark.operators.windows import (
    capped_running_sum,
    global_row_number,
)
from sales_etl_spark.plans.registry import query
from sales_etl_spark.session import pin_semantics
from sales_etl_spark.sources.star import load_star


def _star(spark: SparkSession, sf_dir: str):
    pin_semantics(spark)
    return load_star(spark, sf_dir)


#: Exact order-value cents — CAST through DECIMAL(18,2) first (both
#: engines round the stored double to the same 2-decimal value), then
#: scale to integer cents. Shared by the ledger and Gini queries.
_ORDER_CENTS_SQL = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"


def _order_cents() -> F.Column:
    return (
        F.col("o_totalprice").cast("decimal(18,2)") * F.lit(100)
    ).cast("bigint")


@query(
    "dedup_fuzzy_names",
    oracle="""
    SELECT a.c_custkey AS custkey_a,
           b.c_custkey AS custkey_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS name_dist
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
     AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def dedup_fuzzy_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage: candidate customer pairs whose
    names are within edit distance 1, generated ONLY within
    deterministic blocks (same nation, same 16-char name prefix).

    The record-linkage trade every ER system makes, stated as the
    operator's contract: blocking bounds the quadratic blowup (block
    sizes are data-bounded, pairs per block ≤ |block|²/2), at the cost
    of recall limited to in-block pairs — the deterministic sibling of
    the MinHash band join (operators/dedup.py:284), which makes the
    same trade probabilistically. Both engines score with unicode
    Levenshtein; Spark additionally passes the distance THRESHOLD into
    the kernel (`levenshtein(l, r, 1)`), which lets the JVM abandon
    each DP row early — bounded per-pair cost, and the filter compiles
    into codegen, no Python anywhere.

    Plan: self-equi-join on the block key (one shuffle of the slim
    3-column projection), `custkey_a < custkey_b` dedups the pair
    space, then the thresholded distance filter. At 100 TB blocks are
    the unit of parallelism; a hot block (skewed prefix) would salt or
    cap exactly like the n-gram hot-shingle guard (dedup_ngram_jaccard).
    """
    st = _star(spark, sf_dir)
    slim = st.customer.select("c_custkey", "c_name", "c_nationkey")
    a = slim.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("__name_a"),
        F.col("c_nationkey").alias("__nk"),
        F.substring("c_name", 1, 16).alias("__blk"),
    )
    b = slim.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("__name_b"),
        F.col("c_nationkey").alias("__nk"),
        F.substring("c_name", 1, 16).alias("__blk"),
    )
    return (
        a.join(b, ["__nk", "__blk"])
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .withColumn(
            "name_dist",
            F.levenshtein(F.col("__name_a"), F.col("__name_b"), 1),
        )
        .filter(F.col("name_dist") >= 0)
        .select(
            "custkey_a",
            "custkey_b",
            F.col("name_dist").cast("bigint").alias("name_dist"),
        )
    )


def _fs_micro(m: float, u: float) -> tuple[int, int]:
    """Fellegi-Sunter field weights in integer MICRO-bits: agreement
    weight log2(m/u) and disagreement weight log2((1-m)/(1-u)),
    floored to 1e-6 precision so every downstream sum is exact bigint
    arithmetic — the same cross-engine-exactness move as the cents/
    micro-unit conventions everywhere else. math.log2 on the fixed
    (m, u) literals is IEEE-deterministic, so Spark expression and
    DuckDB oracle interpolate the identical integers."""
    import math

    return (
        math.floor(math.log2(m / u) * 1_000_000),
        math.floor(math.log2((1 - m) / (1 - u)) * 1_000_000),
    )


#: (m, u) per compared field: m = P(agree | same entity),
#: u = P(agree | different entities) — classic published-shape
#: conditional probabilities (name high-m/low-u; nation u = 1/25;
#: segment u = 1/5; balance-within-$100 low-u).
_FS_NAME = _fs_micro(0.95, 0.01)
_FS_NATION = _fs_micro(0.90, 0.04)
_FS_SEGMENT = _fs_micro(0.85, 0.20)
_FS_BALANCE = _fs_micro(0.80, 0.01)
#: decision thresholds (micro-bits): total >= upper -> link,
#: >= lower -> possible (clerical review band), else non-link.
_FS_UPPER = 8_000_000
_FS_LOWER = 0

_FS_BAL_CENTS = "CAST(CAST({t}.c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)"


@query(
    "dedup_fs_linkage",
    oracle=f"""
    WITH p AS (
        SELECT a.c_custkey AS custkey_a,
               b.c_custkey AS custkey_b,
               CASE WHEN levenshtein(a.c_name, b.c_name) <= 1
                    THEN 1 ELSE 0 END AS ag_name,
               CASE WHEN a.c_nationkey = b.c_nationkey
                    THEN 1 ELSE 0 END AS ag_nation,
               CASE WHEN a.c_mktsegment = b.c_mktsegment
                    THEN 1 ELSE 0 END AS ag_segment,
               CASE WHEN abs({_FS_BAL_CENTS.format(t='a')}
                             - {_FS_BAL_CENTS.format(t='b')}) <= 10000
                    THEN 1 ELSE 0 END AS ag_balance
        FROM customer a
        JOIN customer b
          ON substr(a.c_name, 1, 16) = substr(b.c_name, 1, 16)
         AND a.c_custkey < b.c_custkey
    ),
    w AS (
        SELECT *,
               CAST(ag_name * {_FS_NAME[0]}
                    + (1 - ag_name) * {_FS_NAME[1]}
                    + ag_nation * {_FS_NATION[0]}
                    + (1 - ag_nation) * {_FS_NATION[1]}
                    + ag_segment * {_FS_SEGMENT[0]}
                    + (1 - ag_segment) * {_FS_SEGMENT[1]}
                    + ag_balance * {_FS_BALANCE[0]}
                    + (1 - ag_balance) * {_FS_BALANCE[1]}
                    AS BIGINT) AS weight_micro
        FROM p
    )
    SELECT custkey_a, custkey_b,
           CAST(ag_name AS INTEGER) AS ag_name,
           CAST(ag_nation AS INTEGER) AS ag_nation,
           CAST(ag_segment AS INTEGER) AS ag_segment,
           CAST(ag_balance AS INTEGER) AS ag_balance,
           weight_micro,
           CASE WHEN weight_micro >= {_FS_UPPER} THEN 'link'
                ELSE 'possible' END AS decision
    FROM w
    WHERE weight_micro >= {_FS_LOWER}
    """,
)
def dedup_fs_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi-Sunter probabilistic record linkage over blocked
    customer pairs — the methodology step past dedup_fuzzy_names'
    single-field threshold: each compared field contributes
    log2(m/u) micro-bits on agreement and log2((1-m)/(1-u)) on
    disagreement (name edit<=1, nation, market segment, account
    balance within $100), the summed evidence classifies pairs into
    link / possible(clerical-review) bands, and the non-link mass is
    dropped. The m/u-weighted sum is the 1969 Fellegi-Sunter
    decision rule; thresholds are the standard two-band cut.

    Scale shape: identical to the fuzzy-names contract — one
    self-equi-join on the deterministic block key (name 16-prefix,
    block size bounded by the name format), slim 5-column
    projection, all field comparators JVM-side (thresholded
    levenshtein abandons each DP row early), weights are exact
    integer micro-bits so the hash matches bit-for-bit cross-engine.
    At 100 TB the block key is the unit of parallelism; skewed
    blocks salt like the n-gram hot-shingle guard."""
    st = _star(spark, sf_dir)
    slim = st.customer.select(
        "c_custkey", "c_name", "c_nationkey", "c_mktsegment",
        (F.col("c_acctbal").cast("decimal(18,2)") * F.lit(100))
        .cast("bigint")
        .alias("__bal_c"),
    )

    def side(tag: str) -> DataFrame:
        return slim.select(
            F.col("c_custkey").alias(f"custkey_{tag}"),
            F.col("c_name").alias(f"__name_{tag}"),
            F.col("c_nationkey").alias(f"__nk_{tag}"),
            F.col("c_mktsegment").alias(f"__seg_{tag}"),
            F.col("__bal_c").alias(f"__bal_{tag}"),
            F.substring("c_name", 1, 16).alias("__blk"),
        )

    # Blocks are the unit of parallelism — make that TRUE in the
    # physical plan: the customer dim arrives as one small file (one
    # scan partition), so without this tiny exchange the broadcast
    # probe generates all |block|²/2 pairs in a single task. The
    # partition count is EXPLICIT because AQE sizes coalescing by the
    # exchange's byte size (15k slim rows -> 1 partition), blind to
    # the 50x pair fan-out on the other side of the join; an explicit
    # repartition(N, key) is exempt from coalescing. One tiny shuffle
    # buys |cores|-way pair generation + scoring.
    n_par = spark.sparkContext.defaultParallelism
    pairs = (
        side("a")
        .repartition(n_par, F.col("__blk"))
        .join(side("b"), "__blk")
        .filter(F.col("custkey_a") < F.col("custkey_b"))
    )
    ag = {
        "ag_name": (
            F.levenshtein(F.col("__name_a"), F.col("__name_b"), 1) >= 0
        ),
        "ag_nation": F.col("__nk_a") == F.col("__nk_b"),
        "ag_segment": F.col("__seg_a") == F.col("__seg_b"),
        "ag_balance": (
            F.abs(F.col("__bal_a") - F.col("__bal_b")) <= F.lit(10000)
        ),
    }
    weights = {
        "ag_name": _FS_NAME,
        "ag_nation": _FS_NATION,
        "ag_segment": _FS_SEGMENT,
        "ag_balance": _FS_BALANCE,
    }
    scored = pairs.select(
        "custkey_a",
        "custkey_b",
        *[
            F.when(cond, 1).otherwise(0).cast("int").alias(name)
            for name, cond in ag.items()
        ],
    )
    total = sum(
        F.col(name).cast("bigint") * F.lit(wa)
        + (F.lit(1) - F.col(name)).cast("bigint") * F.lit(wd)
        for name, (wa, wd) in weights.items()
    )
    return (
        scored.withColumn("weight_micro", total.cast("bigint"))
        .filter(F.col("weight_micro") >= _FS_LOWER)
        .withColumn(
            "decision",
            F.when(
                F.col("weight_micro") >= _FS_UPPER, F.lit("link")
            ).otherwise(F.lit("possible")),
        )
    )


@query(
    "window_global_rownum",
    oracle="""
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY doc_id) AS row_num
    FROM documents
    WHERE lang = 'en'
    """,
)
def window_global_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global row numbers over the filtered English corpus —
    stable sample/shard ids assigned in doc_id order.

    The naive form (`Window.orderBy("doc_id")` with no partition) is
    the canonical scale-killer: one task sorts the whole table. This
    runs the bucket-offset decomposition instead
    (operators/windows.py:global_row_number): per-bucket counts →
    tiny cumulative-offset frame → broadcast back → within-bucket
    row_number + offset. Both exchanges are bounded; the oracle is the
    single-partition SQL window the rewrite must exactly reproduce.
    """
    st = _star(spark, sf_dir)
    docs = st.documents.filter(F.col("lang") == "en").select("doc_id")
    return global_row_number(
        docs,
        order_by=[F.col("doc_id")],
        bucket=F.expr("doc_id div 4096"),
        out="row_num",
    ).select("doc_id", "row_num")


@query(
    "agg_gini_revenue",
    oracle=f"""
    WITH rev AS (
        SELECT o_custkey,
               CAST(SUM({_ORDER_CENTS_SQL}) AS BIGINT) AS rev_c
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT rev_c,
               ROW_NUMBER() OVER (ORDER BY rev_c, o_custkey) AS i
        FROM rev
    ),
    sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(rev_c) AS BIGINT) AS total_rev_cents,
               SUM(CAST(i AS DECIMAL(19,0))
                   * CAST(rev_c AS DECIMAL(19,0))) AS s_ix
        FROM ranked
    )
    SELECT n_customers,
           total_rev_cents,
           (2e0 * CAST(s_ix AS DOUBLE)
            - CAST(n_customers + 1 AS DOUBLE)
              * CAST(total_rev_cents AS DOUBLE))
           / (CAST(n_customers AS DOUBLE)
              * CAST(total_rev_cents AS DOUBLE)) AS gini
    FROM sums
    """,
)
def agg_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer order revenue — the standard
    rank-weighted inequality profile (G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx)
    over ascending-sorted x).

    Needs a GLOBAL rank — built on the bucket-offset numbering
    (bucket = rev div 10⁶ cents, monotone in the sort), so no
    single-partition window anywhere. Every accumulated quantity is
    exact (bigint cents; rank×cents products in DECIMAL(38,0)), and
    the one double expression at the end evaluates the identical IEEE
    sequence in both engines — the agg_stats bit-exactness recipe
    applied to an order statistic. Three bounded exchanges: customer
    agg, bucket counts, final single-row fold.
    """
    st = _star(spark, sf_dir)
    rev = (
        st.orders.groupBy("o_custkey")
        .agg(F.sum(_order_cents()).alias("rev_c"))
        .select("o_custkey", F.col("rev_c").cast("bigint").alias("rev_c"))
    )
    ranked = global_row_number(
        rev,
        order_by=[F.col("rev_c"), F.col("o_custkey")],
        bucket=F.expr("rev_c div 1000000"),
        out="i",
    )
    sums = ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        # bigint, not decimal(38,0): engine-invariant at the output
        # boundary (sum of cents fits long far past sf100), and the
        # gini double expression below sees the same integer either way.
        F.sum("rev_c").cast("bigint").alias("total_rev_cents"),
        F.sum(
            F.col("i").cast("decimal(19,0)")
            * F.col("rev_c").cast("decimal(19,0)")
        ).alias("s_ix"),
    )
    return sums.select(
        "n_customers",
        "total_rev_cents",
        F.expr(
            "(2e0 * CAST(s_ix AS DOUBLE)"
            " - CAST(n_customers + 1 AS DOUBLE)"
            "   * CAST(total_rev_cents AS DOUBLE))"
            " / (CAST(n_customers AS DOUBLE)"
            "    * CAST(total_rev_cents AS DOUBLE))"
        ).alias("gini"),
    )


#: Ledger clamp bounds (integer cents): stock floor at zero, capacity
#: cap at $250k — both bounds engage on real sf data (order values run
#: to ~$500k, so a single order can hit either rail).
_LEDGER_FLOOR = 0
_LEDGER_CAP = 25_000_000


@query(
    "window_capped_running_sum",
    oracle=f"""
    WITH RECURSIVE seq AS (
        SELECT o_custkey, o_orderkey,
               (CASE WHEN o_orderstatus = 'O' THEN 1 ELSE -1 END)
                 * {_ORDER_CENTS_SQL} AS delta_cents,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    ),
    rec AS (
        SELECT o_custkey, o_orderkey, rn,
               LEAST({_LEDGER_CAP},
                     GREATEST({_LEDGER_FLOOR}, delta_cents)) AS bal
        FROM seq WHERE rn = 1
        UNION ALL
        SELECT s.o_custkey, s.o_orderkey, s.rn,
               LEAST({_LEDGER_CAP},
                     GREATEST({_LEDGER_FLOOR}, r.bal + s.delta_cents))
        FROM seq s
        JOIN rec r ON s.o_custkey = r.o_custkey AND s.rn = r.rn + 1
    )
    SELECT o_custkey, o_orderkey, CAST(bal AS BIGINT) AS balance_cents
    FROM rec
    """,
)
def window_capped_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running balance clamped into [0, $250k] after every
    order ('O' orders credit, others debit) — the inventory/ledger
    recurrence bal_i = min(cap, max(0, bal_{i-1} + Δ_i)).

    The clamp is non-associative, so unlike every other window in the
    registry this CANNOT become a prefix sum: ANSI SQL needs a
    recursive CTE (the oracle runs one, iterating once per sequence
    position), and the Spark-first form is the grouped-map sequential
    scan (operators/windows.py:capped_running_sum) — one exchange on
    o_custkey, Arrow-batched per-key scan, O(1) state per key. The
    honest slow path, used only where the fast path provably does not
    exist.
    """
    st = _star(spark, sf_dir)
    seq = st.orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.when(F.col("o_orderstatus") == "O", F.lit(1)).otherwise(
                F.lit(-1)
            )
            * _order_cents()
        ).alias("delta_cents"),
    )
    return capped_running_sum(
        seq,
        keys=["o_custkey"],
        order_by=["o_orderdate", "o_orderkey"],
        delta_col="delta_cents",
        floor=_LEDGER_FLOOR,
        cap=_LEDGER_CAP,
        out="balance_cents",
    ).select("o_custkey", "o_orderkey", "balance_cents")


#: Q18 volume threshold: orders whose total line quantity exceeds this
#: are "big" — the qualifying set is a tiny fraction of orders, which
#: is what makes the HAVING-aggregate a useful join pruner.
_BIG_ORDER_QTY = 250


@query(
    "flagship_big_orders",
    oracle=f"""
    WITH big AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   AS total_qty
        FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > {_BIG_ORDER_QTY}
    )
    SELECT c.c_name,
           o.o_custkey,
           o.o_orderkey,
           o.o_orderdate,
           o.o_totalprice,
           b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def flagship_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-shaped large-volume-customer report: orders whose summed
    line quantity exceeds the threshold, with customer names, top 100
    by order value (reference parity: the reference's marts stop at
    group-bys; this is the TPC-H Q18 extension pattern, SURVEY §2.6).

    Plan shape the scale argument hinges on: the lineitem aggregate
    runs FIRST and its HAVING clause collapses it to a tiny qualifying
    key set — which then BROADCASTS into the orders scan (a semi-join
    pruner: the big fact table is filtered map-side before any wide
    join), and the pruned orders broadcast into customer. No shuffle
    ever carries more than the qualifying orders. Decimal quantity
    sums keep the threshold exact; TakeOrderedAndProject caps the
    result with a full deterministic tiebreak.
    """
    st = _star(spark, sf_dir)
    big = (
        st.lineitem.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias(
                "total_qty"
            )
        )
        .filter(F.col("total_qty") > _BIG_ORDER_QTY)
        # Output-boundary dtype invariance (registry convention,
        # plans/registry.py): the exact decimal sum stays internal —
        # the HAVING threshold compares decimals — but the EXPOSED
        # column is double, because DecimalType round-trips
        # differently per engine (Spark toPandas -> float64 vs DuckDB
        # -> decimal.Decimal) and stringify-hash comparators diverge
        # even when values are bit-equal.
        .select("l_orderkey", F.col("total_qty").cast("double").alias("total_qty"))
    )
    pruned = st.orders.join(
        F.broadcast(big),
        st.orders.o_orderkey == big.l_orderkey,
    ).select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
             "total_qty")
    named = pruned.join(
        st.customer.select("c_custkey", "c_name"),
        pruned.o_custkey == F.col("c_custkey"),
    )
    return (
        named.select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


#: PageRank fixed-point scale (integer "rank units"): ranks live in
#: units of 1e-12 so three damped iterations keep ~9 significant
#: digits; every per-edge contribution floors in INTEGER arithmetic,
#: making the sum order-independent — bit-exact under any partitioning
#: and in any engine.
_PR_SCALE = 1_000_000_000_000
_PR_ITERS = 3


def _pagerank_sql() -> str:
    """Unrolled 3-iteration PageRank oracle (DuckDB `//` and Spark
    `div` are both floor division on the nonnegative bigints used
    here, so the iterates agree bit-for-bit).

    Every multiply-referenced or chained CTE is MATERIALIZED: without
    the hint DuckDB inlines CTEs, so ``edges`` (and through it the
    expensive lineitem⨝orders DISTINCT) is recomputed inside ``deg``
    AND every iteration, and the iteration chain becomes one deep
    pipelined plan — at the sf1.0 twin that plan exceeded 80 GB of
    spill (SCALE.md §30.10's comparator wall). Materializing pins
    each stage to one computation, the single-statement equivalent of
    iterating through temp tables."""
    base = f"(15 * {_PR_SCALE} // (100 * m.n))"
    iters = ""
    prev = "r0"
    for k in range(1, _PR_ITERS + 1):
        iters += f""",
    r{k} AS MATERIALIZED (
        SELECT e.dst AS node,
               {base} + SUM((r.r * 85) // (100 * d.d)) AS r
        FROM edges e
        JOIN {prev} r ON r.node = e.src
        JOIN deg d ON d.src = e.src
        CROSS JOIN meta m
        GROUP BY e.dst, m.n
    )"""
        prev = f"r{k}"
    return f"""
    WITH pairs AS MATERIALIZED (
        SELECT DISTINCT l_suppkey AS s, o_custkey AS c
        FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    ),
    edges AS MATERIALIZED (
        SELECT s * 2 AS src, c * 2 + 1 AS dst FROM pairs
        UNION ALL
        SELECT c * 2 + 1, s * 2 FROM pairs
    ),
    deg AS MATERIALIZED (
        SELECT src, CAST(COUNT(*) AS BIGINT) AS d
        FROM edges GROUP BY src
    ),
    meta AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg
    ),
    r0 AS MATERIALIZED (
        SELECT d.src AS node, ({_PR_SCALE} // m.n) AS r
        FROM deg d CROSS JOIN meta m
    ){iters}
    SELECT node AS node_id, CAST(r AS BIGINT) AS rank_scaled
    FROM {prev}
    ORDER BY r DESC, node
    LIMIT 20
    """


@query("graph_pagerank_trade", oracle=_pagerank_sql())
def graph_pagerank_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected supplier↔customer trade graph
    (edge = the pair ever traded, from lineitem⨝orders), 3 damped
    iterations (d = 0.85), top 20 nodes — the link-analysis companion
    to the connected-components resolver (operators/dedup.py:494).

    Iterative-algorithm-on-DataFrames shape: each iteration is ONE
    edges⨝ranks⨝deg join plus a groupBy — at 100 TB that is one
    shuffle per iteration on the edge partitioning, the exact
    Pregel-on-joins layout GraphX lowers to, with no driver-side graph
    state (degrees, ranks, and the node count all stay distributed;
    the node-count scalar rides a broadcast 1-row frame, never a
    collect). Float PageRank sums would be order-DEPENDENT across
    partitions; here every contribution floors to integer rank-units
    first (scale 1e-12), so sums commute and three engines' iterates
    agree bit-for-bit — the same integer-fold recipe as the nano-unit
    centroids (emb_label_centroids).

    Node ids: supplier s → 2s, customer c → 2c+1 (disjoint ranges,
    no string keys in the shuffle).
    """
    st = _star(spark, sf_dir)
    pairs = (
        st.lineitem.select("l_suppkey", "l_orderkey")
        .join(
            st.orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            (F.col("l_suppkey") * 2).alias("s"),
            (F.col("o_custkey") * 2 + 1).alias("c"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("s").alias("src"), F.col("c").alias("dst")
    ).unionAll(pairs.select(F.col("c").alias("src"), F.col("s").alias("dst")))
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    meta = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    base = F.expr(f"15 * {_PR_SCALE} div (100 * n)")
    ranks = deg.crossJoin(F.broadcast(meta)).select(
        F.col("src").alias("node"),
        F.expr(f"{_PR_SCALE} div n").alias("r"),
    )
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(ranks, edges.src == ranks.node)
            .join(deg, "src")
            .select(
                "dst", F.expr("(r * 85) div (100 * d)").alias("c")
            )
        )
        ranks = (
            contrib.groupBy(F.col("dst").alias("node"))
            .agg(F.sum("c").alias("rsum"))
            .crossJoin(F.broadcast(meta))
            .select("node", (base + F.col("rsum")).alias("r"))
        )
    return (
        ranks.orderBy(F.col("r").desc(), "node")
        .limit(20)
        .select(
            F.col("node").alias("node_id"),
            F.col("r").cast("bigint").alias("rank_scaled"),
        )
    )


@query(
    "window_concurrent_orders",
    oracle="""
    SELECT a.o_orderkey,
           CAST(COUNT(b.o_orderkey) AS BIGINT) AS n_concurrent
    FROM orders a
    LEFT JOIN orders b
      ON b.o_custkey = a.o_custkey
     AND b.o_orderkey <> a.o_orderkey
     AND b.o_orderdate <= a.o_orderdate
     AND a.o_orderdate <= b.o_orderdate + INTERVAL 30 DAY
    GROUP BY a.o_orderkey
    """,
)
def window_concurrent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every order: how many OTHER orders of the same customer were
    'open' at its order date (an order stays open 30 days, inclusive)
    — interval-overlap counting, the concurrency metric behind
    max-parallel-sessions / resource-overlap reports.

    The oracle states the semantics as the quadratic per-customer
    self-join; the Spark plan is the SWEEP LINE that replaces it:
    every interval becomes a +1 event at its start day and a −1 event
    at (end+1) days — exclusive-end encoding, so an interval whose
    last covered day IS the measured day still counts — and one
    running sum over a RANGE frame (all same-day peers included, which
    is what makes two same-day orders count each other symmetrically)
    yields the number of covering intervals at every start, minus one
    for the order itself. One shuffle on the customer key, O(n log n)
    in each partition instead of O(n²) pairs per hot customer — the
    same rewrite class as the rolling-distinct contribution explode
    (events_rolling_active_users).
    """
    st = _star(spark, sf_dir)
    from pyspark.sql.window import Window

    base = st.orders.select(
        "o_custkey",
        "o_orderkey",
        F.expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000"
        ).alias("day"),
    )
    starts = base.select(
        "o_custkey",
        "o_orderkey",
        F.col("day").alias("evt_day"),
        F.lit(1).alias("delta"),
    )
    ends = base.select(
        "o_custkey",
        "o_orderkey",
        (F.col("day") + 31).alias("evt_day"),
        F.lit(-1).alias("delta"),
    )
    events = starts.unionAll(ends)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("evt_day")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = events.withColumn("open_now", F.sum("delta").over(w))
    return (
        swept.filter(F.col("delta") == 1)
        .select(
            "o_orderkey",
            (F.col("open_now") - 1).cast("bigint").alias("n_concurrent"),
        )
    )
