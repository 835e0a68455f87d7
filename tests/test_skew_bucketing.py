"""Scale-mechanism tests: salted skew handling + bucketed co-located
joins. These assert on PHYSICAL PLANS, not just results — the point of
both operators is the plan shape, and the plan is checkable locally
even though the payoff is at cluster scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_etl_spark.operators.skew import salted_agg, salted_join, with_salt
from sales_etl_spark.sources.bucketed import read_table, write_bucketed

SF = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


# -- salted aggregation ----------------------------------------------------


def test_salted_agg_matches_plain_agg(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_returnflag").alias("k"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        F.col("l_quantity").alias("q"),
    )
    salted = salted_agg(
        li,
        keys=["k"],
        aggs={
            "n": ("count", F.lit(1)),
            "s": ("sum", F.col("v")),
            "mx": ("max", F.col("q")),
            "mn": ("min", F.col("q")),
        },
        n_salts=8,
    )
    plain = li.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.max("q").alias("mx"),
        F.min("q").alias("mn"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_agg_rejects_non_mergeable(spark):
    df = spark.range(4).select(F.lit("a").alias("k"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="non-mergeable"):
        salted_agg(df, ["k"], {"a": ("avg", F.col("v"))})


def test_with_salt_covers_domain(spark):
    df = with_salt(spark.range(2000), n_salts=8)
    got = {r[0] for r in df.select("__salt").distinct().collect()}
    assert got == set(range(8))


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    a = salted_join(li, o, on=["k"], n_salts=4)
    b = li.join(o, "k")
    assert a.count() == b.count()
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_salted_join_rejects_outer_joins(spark):
    # right/full would emit unmatched small-side rows once per salt
    # replica — refuse rather than silently duplicate.
    df = spark.range(10).withColumnRenamed("id", "k")
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(df, df, on=["k"], n_salts=4, how=how)


# -- bucketed co-located join ----------------------------------------------


def test_bucketed_join_has_no_exchange(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], n_buckets=4)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_orders_b",
        ["l_orderkey"],
        n_buckets=4,
    )
    # Force the shuffle-join path (no broadcast) to prove bucketing —
    # not broadcast — is what removes the exchanges.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_table(spark, "t_lineitem_b").join(
            read_table(spark, "t_orders_b"), "l_orderkey"
        )
        plan = _executed_plan(joined)
        assert "Exchange" not in plan, plan
        # Same key, unbucketed → the join must shuffle: the negative
        # control that the assertion above is meaningful.
        control = _executed_plan(li.join(
            o.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
        ))
        assert "Exchange" in control
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_bucketed_agg_on_bucket_key_has_no_exchange(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(li, "t_li_agg_b", ["l_orderkey"], n_buckets=4)
    try:
        agg = read_table(spark, "t_li_agg_b").groupBy("l_orderkey").agg(
            F.sum("l_quantity").alias("s")
        )
        plan = _executed_plan(agg)
        assert "Exchange" not in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_agg_b")


def test_aqe_skew_join_splits_the_hot_partition(spark):
    """AQE's OptimizeSkewedJoin is the AUTOMATIC counterpart to
    salted_join: with skew thresholds dialed down to demo scale, a
    sort-merge join against a hot-keyed left side must execute with
    the hot partition SPLIT (the final adaptive plan marks the join
    skew=true) — and return exactly the plain join's rows. salting
    remains for the cases AQE can't rescue (aggregation skew, or a
    skewed BROADCAST build side)."""
    from pyspark.sql import functions as F

    from sales_etl_spark.session import pin_semantics

    iso = pin_semantics(spark.newSession())
    iso.conf.set("spark.sql.adaptive.enabled", "true")
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    iso.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    iso.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2"
    )
    iso.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "8KB",
    )
    iso.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"
    )
    iso.conf.set("spark.sql.shuffle.partitions", "8")

    # 50k rows on ONE hot key + a uniform tail; dim side 100 keys
    left = iso.range(0, 50_000).select(
        F.when(F.col("id") < 45_000, F.lit(7))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("v"),
    )
    right = iso.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    joined = left.join(right, "k")
    # collect() executes THIS plan (count() would execute a different
    # one), after which executedPlan is the final adaptive plan
    assert len(joined.collect()) == 50_000

    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in final_plan, final_plan[:2000]
    assert "skew=true" in final_plan, final_plan[:4000]
