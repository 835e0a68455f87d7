"""Aggregate marts (reference §2.4 A1-A6, §2.5 J1, §2.6 W1-W4 parity).

Shuffle budget per mart (the numbers that matter at 100 TB):

- ``sales_summary``: ONE shuffle. The reference computes two groupbys
  over the same keys and merges them (etl/transform.py:102-109) — a
  pandas-API artifact. Here sum/sum/countDistinct run in a single
  ``agg`` (partial aggregation map-side, one exchange on
  (category, month)).
- ``order_totals``: one shuffle on (order_id, customer_id).
- ``avg_check_by_region``: order_totals' shuffle, then a broadcast join
  against the customers dim (no shuffle of the fact), then one small
  shuffle on region for the rollup.
- ``product_ranking``: one shuffle on (product_id); the sort+limit
  compiles to TakeOrderedAndProject (distributed top-k, never a full
  sort).

Money exactness — two strategies, both order-independent under any
partitioning:

- generic (reference-shaped) forms: DECIMAL(18,2) end-to-end, cast to
  double only at the output boundary (see schemas.MONEY);
- grained forms: EXACT INTEGER CENTS in LONGs (:func:`money_cents`).
  A 2-dp money product is a whole number of cents, so summing cents is
  the same exact arithmetic as the decimal sum — but it accumulates in
  whole-stage-codegen long registers instead of BigDecimal
  accumulators (sum(decimal(18,2)) promotes to precision 28, past
  Spark's compact-long threshold; measured 1.4s decimal vs 0.88s long
  for the order-grain pre-agg at sf0.1). :func:`cents_to_double`
  converts at the output boundary through DECIMAL division so exactly
  ONE double rounding happens — bit-identical to
  ``CAST(SUM(decimal(18,2)) AS DOUBLE)``.

The AOV division happens on the already-exact sums, hence identical
on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sales_etl_spark.functions.scalars import month_str, period_date, safe_div


def money_cents(quantity: str, unit_price: str) -> Column:
    """Exact integer cents of ``CAST(quantity * unit_price AS
    DECIMAL(18,2))`` for 2-dp money columns, as a LONG.

    Precondition: ``unit_price`` carries at most 2 decimal places (a
    money column), so the true product is a whole number of cents.
    ``rint`` recovers that integer exactly while the product stays
    below ~2^51 cents (≈ $2×10^13 per LINE): the double product's
    relative error 2^-52 then keeps the absolute error under 0.5
    cents. TPC-H-shaped rows top out around 5×10^8 cents — nine orders
    of magnitude of headroom. NOT valid for arbitrary-scale inputs;
    keep the decimal path for those.

    Downstream ``sum`` of cents is a LONG sum: it wraps (non-ANSI) at
    2^63 ≈ $9.2×10^16 PER GROUP — beyond any realistic mart group even
    at 100 TB (a group summing 10^12 rows of $10^3 is 10^17 cents,
    still two digits under), but document the bound where a caller
    could aggregate the whole table into one group.
    """
    return F.rint(
        F.col(quantity) * F.col(unit_price) * F.lit(100.0)
    ).cast("long")


def cents_to_double(col: Column) -> Column:
    """Output-boundary conversion of an exact LONG cents sum, through
    DECIMAL division so the value is rounded to double exactly ONCE —
    bit-identical to ``CAST(SUM(decimal(18,2)) AS DOUBLE)`` at any
    magnitude a long can hold (a naive ``cents/100.0`` double-rounds
    past 2^53). Runs post-aggregation, i.e. on |groups| rows — free.
    """
    return (col.cast("decimal(20,0)") / F.lit(100)).cast("double")


def _finish_summary(out: DataFrame) -> DataFrame:
    return (
        out.withColumn(
            "average_order_value",
            safe_div(F.col("total_sales"), F.col("order_count")),
        )
        .withColumn("period_date", period_date("month"))
        .drop("order_count")
    )


def sales_summary(sales: DataFrame) -> DataFrame:
    """category × month mart: total_sales, total_quantity, order_count,
    average_order_value, period_date (etl/transform.py:100-117).

    NULL groups are kept (reference dropna=False — Spark's default).
    Generic form over an already-joined sales fact; when the order dim
    is available separately, prefer :func:`sales_summary_grained` —
    same result, no distinct-expand.
    """
    df = sales
    if "month" not in df.columns:
        df = df.withColumn("month", month_str("order_date"))
    out = df.groupBy("category", "month").agg(
        F.sum("total_price").cast("double").alias("total_sales"),
        F.sum("quantity").cast("double").alias("total_quantity"),
        F.countDistinct("order_id").alias("order_count"),
    )
    return _finish_summary(out)


def sales_summary_grained(line_items: DataFrame, orders: DataFrame) -> DataFrame:
    """Grain-rewritten summary mart — identical output to
    :func:`sales_summary`, better plan at every scale.

    Because (category, month) are functions of the ORDER, the
    count-distinct over the joined fact reduces to: pre-aggregate
    line items per order_id (the fact shrinks to order grain BEFORE
    the join), join the order attributes, then a plain count per
    (category, month). Kills the distinct-expand AND shrinks the join
    input ~4× — grain knowledge Catalyst cannot infer.

    ``line_items``: order_id, quantity, unit_price (line grain).
    ``orders``: order_id, category, order_date (order grain, unique).
    """
    per_order = line_items.groupBy("order_id").agg(
        F.sum(money_cents("quantity", "unit_price")).alias("__tpc"),
        F.sum("quantity").alias("__q"),
    )
    o = orders.withColumn("month", month_str("order_date")).select(
        "order_id", "category", "month"
    )
    out = per_order.join(o, "order_id").groupBy("category", "month").agg(
        cents_to_double(F.sum("__tpc")).alias("total_sales"),
        F.sum("__q").cast("double").alias("total_quantity"),
        F.count(F.lit(1)).alias("order_count"),
    )
    return _finish_summary(out)


def order_totals(sales: DataFrame) -> DataFrame:
    """Per-order totals: (order_id, customer_id) → order_total
    (etl/transform.py:122-126)."""
    return sales.groupBy("order_id", "customer_id").agg(
        F.sum("total_price").alias("order_total")
    )


def order_totals_grained(line_items: DataFrame, orders: DataFrame) -> DataFrame:
    """Grain-rewritten :func:`order_totals`: customer_id is a function
    of order_id, so aggregate the NARROW line items (order_id,
    total_price) first and broadcast-join the order→customer mapping
    onto the order-grain result — the shuffle carries 2 columns
    instead of the joined fact's full width (measured 1.17s → 0.81s
    at sf0.1 for the downstream avg-check mart).

    ``line_items``: order_id, quantity, unit_price (line grain).
    ``orders``: order_id, customer_id (order grain, unique).
    """
    return order_cents_grained(line_items, orders).select(
        "order_id",
        "customer_id",
        cents_to_double(F.col("order_cents")).alias("order_total"),
    )


def order_cents_grained(
    line_items: DataFrame, orders: DataFrame
) -> DataFrame:
    """Order-grain totals in EXACT INTEGER CENTS — the composable form:
    a downstream rollup (e.g. region grain in avg_check) keeps summing
    longs and converts to double once at its own output boundary,
    instead of order-dependently summing already-rounded doubles.

    Same shape as :func:`order_totals_grained`: narrow line-item
    pre-agg on order_id, then join the order→customer mapping.
    """
    per_order = line_items.groupBy("order_id").agg(
        F.sum(money_cents("quantity", "unit_price")).alias("order_cents")
    )
    # No broadcast hint: orders is itself a fact table at 100 TB (AQE
    # broadcasts it at bench scale anyway); per_order already carries
    # hashpartitioning(order_id) from its groupBy, so a shuffle join
    # here only moves the orders side.
    return per_order.join(
        orders.select("order_id", "customer_id"), "order_id"
    ).select("order_id", "customer_id", "order_cents")


def avg_check_by_region(sales: DataFrame, customers: DataFrame) -> DataFrame:
    """Average check per region (etl/transform.py:120-142).

    order_totals LEFT JOIN customers[customer_id, region]; unmatched
    customers → 'Unknown' (the reference's post-join fillna, :133).
    The dim side is explicitly broadcast — at any realistic scale the
    customer dim is orders of magnitude smaller than the per-order fact.
    """
    totals = order_totals(sales)
    dim = customers.select("customer_id", "region")
    joined = totals.join(F.broadcast(dim), "customer_id", "left").withColumn(
        "region", F.coalesce(F.col("region"), F.lit("Unknown"))
    )
    # order_totals' grain IS order_id (unique in the orders dim), so the
    # reference's nunique(order_id) (etl/transform.py:137) reduces to a
    # plain count — same value, without the distinct-expand's two extra
    # exchanges. That rewrite is grain knowledge Catalyst cannot infer.
    return (
        joined.groupBy("region")
        .agg(
            (
                F.sum("order_total").cast("double")
                / F.count("order_id")
            ).alias("avg_check"),
            F.count("order_id").alias("orders_count"),
        )
        .orderBy(F.desc("avg_check"))
    )


def product_ranking(
    sales: DataFrame,
    products: DataFrame | None = None,
    top_n: int = 5,
) -> DataFrame:
    """Top-N products by (total_sold, total_revenue) with 1..N ranks
    (etl/transform.py:145-157).

    orderBy+limit compiles to TakeOrderedAndProject — each partition
    keeps its local top-N, the driver merges N×partitions rows; no
    global sort. The row_number window runs on ≤N rows post-limit, so
    its single-partition window is free. product_id is the final
    tiebreaker to make the cut deterministic under ties.
    """
    df = sales
    # Aggregate at product grain FIRST, attach names after: the name
    # strings never travel through the shuffle and the dim join runs
    # on |products| rows instead of |fact| rows. When the fact already
    # carries product_name (reference-shaped input), group by both.
    name_in_fact = "product_name" in df.columns
    name_cols = ["product_name"] if name_in_fact else []
    ranking = df.groupBy("product_id", *name_cols).agg(
        F.sum("quantity").cast("double").alias("total_sold"),
        F.sum("total_price").cast("double").alias("total_revenue"),
    )
    if products is not None and not name_in_fact:
        ranking = ranking.join(
            F.broadcast(products), "product_id", "left"
        ).select("product_id", "product_name", "total_sold", "total_revenue")
    return _rank_tail(ranking, top_n)


def _rank_tail(ranking: DataFrame, top_n: int) -> DataFrame:
    """orderBy+limit (TakeOrderedAndProject) then row_number over the
    ≤top_n survivors; product_id breaks ties deterministically."""
    ranking = ranking.orderBy(
        F.desc("total_sold"), F.desc("total_revenue"), F.asc("product_id")
    ).limit(top_n)
    w = Window.orderBy(
        F.desc("total_sold"), F.desc("total_revenue"), F.asc("product_id")
    )
    return ranking.withColumn("rank_position", F.row_number().over(w))


def product_ranking_grained(
    line_items: DataFrame,
    products: DataFrame,
    top_n: int = 5,
) -> DataFrame:
    """Grain/cents rewrite of :func:`product_ranking` straight off the
    LINE ITEMS: product grain needs no order attributes, so the
    fact⨝orders join the generic form pays is elided entirely — at
    100 TB that join is a full shuffle of both fact tables for nothing
    (valid because order_id is a non-null FK; an inner join against
    orders cannot drop line rows). Revenue accumulates in exact long
    cents (see :func:`money_cents`), quantity in doubles (integral
    values — every partial sum is an exact integer below 2^53).

    ``line_items``: product_id, quantity, unit_price (line grain).
    ``products``: product_id, product_name (unique).
    """
    ranking = (
        line_items.groupBy("product_id")
        .agg(
            F.sum("quantity").cast("double").alias("total_sold"),
            cents_to_double(
                F.sum(money_cents("quantity", "unit_price"))
            ).alias("total_revenue"),
        )
        .join(F.broadcast(products), "product_id", "left")
        .select("product_id", "product_name", "total_sold", "total_revenue")
    )
    return _rank_tail(ranking, top_n)


def merge_marts(
    parts: list[DataFrame],
    keys: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Algebraic mart merge: same-schema PARTIAL marts (each a group-by
    over a disjoint slice of the fact) combine by re-summing their
    mergeable accumulators — counts and exact (decimal/long) sums.
    Derived ratios (averages, shares) must NOT be merged; recompute
    them from the merged accumulators at the output boundary.

    This is the 100 TB refresh story for every mart in the registry:
    a daily load aggregates ONLY its delta (O(delta) work), then
    merges with the stored mart (O(mart) work, post-agg cardinality)
    instead of re-scanning the full fact — valid precisely because
    every accumulator the marts carry is chosen mergeable (the same
    property that makes Spark's own partial aggregation correct).
    """
    if not parts:
        raise ValueError(
            "merge_marts needs at least one partial mart (a dynamic "
            "delta list came up empty — skip the merge, keep the base)"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols]
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    out: str = "weighted_median",
) -> DataFrame:
    """Exact discrete weighted median per group: the smallest value v
    whose cumulative weight reaches half the group total (2·cum ≥
    total — integer arithmetic, no float share ever compared).

    Scale shape: the input collapses to the (group, value) VALUE grain
    first — exact integer weight per distinct value — so the
    cumulative window runs over the value domain, not the rows (the
    agg-below-window rewrite). Weights must be integral (cast before
    calling for fractional weights at a chosen quantization).

    Returns one row per group: ``group_cols + [out, "total_weight"]``
    with ``out`` carrying the value column's own type.
    """
    vw = df.groupBy(*group_cols, value_col).agg(
        F.sum(weight_col).alias("__wt")
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = vw.select(
        *group_cols, value_col, F.sum("__wt").over(w).alias("__cw")
    )
    tot = vw.groupBy(*group_cols).agg(F.sum("__wt").alias("total_weight"))
    return (
        cum.join(F.broadcast(tot), group_cols)
        .filter(2 * F.col("__cw") >= F.col("total_weight"))
        .groupBy(*group_cols, "total_weight")
        .agg(F.min(value_col).alias(out))
        .select(*group_cols, out, "total_weight")
    )


def km_survival_curve(
    durations: DataFrame,
    day_col: str = "day",
    event_col: str = "ev",
) -> DataFrame:
    """Kaplan-Meier estimator over (duration-bucket, event-flag)
    subject rows: one output row per observed duration with the risk
    set size, event/censor counts, and the survival product
    S(t) = Π_{s<=t}(1 - d_s/n_s). Right-censored subjects
    (``event_col`` = 0) leave the risk set without contributing an
    event — the correction that separates KM from a naive conversion
    curve.

    Scale + exactness shape (the registry's bounded-domain recipe):
    one partial-aggregated exchange collapses subjects to the
    duration grain, so every window below runs on a value-domain-
    bounded frame (days, not subjects); each factor's ln(1 - d/n) is
    one transcendental of one IEEE division of two exact longs,
    quantized to NANO units BEFORE the cumulative sum via
    round-half-up — floor(ln*1e9 + 0.5), the identical expression in
    both engines, so negative terms agree — and the survival
    value is exp of an exact integer sum rounded to 6 dp. A day where
    the whole risk set fails pins the curve (and every later row) to
    exactly 0.0 via a cumulative flag rather than ln(0).
    """
    daily = durations.groupBy(F.col(day_col).alias("day")).agg(
        F.sum(event_col).cast("bigint").alias("d"),
        F.sum(F.lit(1) - F.col(event_col)).cast("bigint").alias("c"),
    )
    total = durations.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    w_prev = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = daily.crossJoin(F.broadcast(total)).select(
        "day",
        "d",
        "c",
        (
            F.col("n_total")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)
            )
        ).alias("n_risk"),
    )
    ln_nano = (
        F.when(F.col("d") == 0, F.lit(0).cast("bigint"))
        .when(
            F.col("d") < F.col("n_risk"),
            F.floor(
                F.log(
                    F.lit(1.0)
                    - F.col("d").cast("double") / F.col("n_risk")
                )
                * F.lit(1_000_000_000.0)
                + F.lit(0.5)
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint"))
    )
    dies = F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    terms = risk.select(
        "day", "d", "c", "n_risk",
        ln_nano.alias("__ln_nano"), dies.alias("__dies"),
    )
    return terms.select(
        "day",
        "n_risk",
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.sum("__dies").over(w_cum) > 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.exp(
                    F.sum("__ln_nano").over(w_cum).cast("double")
                    / F.lit(1_000_000_000.0)
                ),
                6,
            )
        )
        .alias("km_survival"),
    )
