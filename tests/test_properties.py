"""Property tier (hypothesis): randomized cross-validation of the
custom distributed operators against independent single-node
implementations — the test class the reference lacks entirely
(SURVEY.md §5.1 "no property-based/randomized tests").

Deliberately small example counts + deadline=None: each example runs
Spark jobs, so the value is in the randomized *shapes* (dup keys,
empty sides, all-matching, none-matching), not in thousands of cases.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from sales_etl_spark.operators.skew import salted_agg, salted_join
from sales_etl_spark.operators.temporal import asof_join

BASE = dt.datetime(2024, 1, 1)

# Small key/time domains force collisions: duplicate keys, shared
# timestamps across sides, keys present on only one side.
_keys = st.integers(min_value=0, max_value=3)
_times = st.integers(min_value=0, max_value=50)

_left_rows = st.lists(st.tuples(_keys, _times), min_size=0, max_size=15)
_right_rows = st.lists(st.tuples(_keys, _times), min_size=0, max_size=15)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    # unique (key, ts) per side — the documented precondition (the
    # operator requires a pre-deduplicated right side).
    left = list({(k, t) for k, t in left})
    right = list({(k, t) for k, t in right})

    lpdf = pd.DataFrame(
        {
            "user_id": pd.array([k for k, _ in left], dtype="int64"),
            "ts": pd.to_datetime(
                [BASE + dt.timedelta(minutes=t) for _, t in left]
            ),
        }
    )
    rpdf = pd.DataFrame(
        {
            "user_id": pd.array([k for k, _ in right], dtype="int64"),
            "ts": pd.to_datetime(
                [BASE + dt.timedelta(minutes=t) for _, t in right]
            ),
            "payload": pd.array(
                [k * 1000 + t for k, t in right], dtype="int64"
            ),
        }
    )

    schema_l = "user_id long, ts timestamp"
    schema_r = "user_id long, ts timestamp, payload long"
    ldf = spark.createDataFrame(lpdf, schema_l) if len(lpdf) else (
        spark.createDataFrame([], schema_l)
    )
    rdf = spark.createDataFrame(rpdf, schema_r) if len(rpdf) else (
        spark.createDataFrame([], schema_r)
    )

    got = {
        (r["user_id"], r["ts"]): r["payload"]
        for r in asof_join(
            ldf,
            rdf,
            by=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_payload=["payload"],
        ).collect()
    }

    if len(lpdf):
        expected_df = pd.merge_asof(
            lpdf.sort_values("ts", kind="mergesort"),
            rpdf.sort_values("ts", kind="mergesort"),
            on="ts",
            by="user_id",
            direction="backward",  # latest right.ts <= left.ts, inclusive
        )
        expected = {
            (r.user_id, r.ts.to_pydatetime()): (
                None if pd.isna(r.payload) else int(r.payload)
            )
            for r in expected_df.itertuples()
        }
    else:
        expected = {}
    assert got == expected


_vals = st.lists(
    st.tuples(_keys, st.integers(min_value=-1000, max_value=1000)),
    min_size=0,
    max_size=30,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_vals, n_salts=st.integers(min_value=1, max_value=5))
def test_salted_agg_equals_plain_agg(spark, rows, n_salts):
    if not rows:
        return
    df = spark.createDataFrame(
        [(k, v) for k, v in rows], "k long, v long"
    )
    salted = salted_agg(
        df,
        keys=["k"],
        aggs={
            "n": ("count", F.lit(1)),
            "s": ("sum", F.col("v")),
            "mn": ("min", F.col("v")),
            "mx": ("max", F.col("v")),
        },
        n_salts=n_salts,
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    big=_vals,
    small=st.lists(_keys, min_size=0, max_size=6, unique=True),
    n_salts=st.integers(min_value=1, max_value=4),
)
def test_salted_join_equals_plain_join(spark, big, small, n_salts):
    if not big or not small:
        return
    bdf = spark.createDataFrame([(k, v) for k, v in big], "k long, v long")
    sdf = spark.createDataFrame([(k, -k) for k in small], "k long, tag long")
    a = salted_join(bdf, sdf, on=["k"], n_salts=n_salts)
    b = bdf.join(sdf, "k")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_join_forward_matches_pandas(spark, left, right):
    left = list({(k, t) for k, t in left})
    right = list({(k, t) for k, t in right})
    lpdf = pd.DataFrame(
        {
            "user_id": pd.array([k for k, _ in left], dtype="int64"),
            "ts": pd.to_datetime(
                [BASE + dt.timedelta(minutes=t) for _, t in left]
            ),
        }
    )
    rpdf = pd.DataFrame(
        {
            "user_id": pd.array([k for k, _ in right], dtype="int64"),
            "ts": pd.to_datetime(
                [BASE + dt.timedelta(minutes=t) for _, t in right]
            ),
            "payload": pd.array(
                [k * 1000 + t for k, t in right], dtype="int64"
            ),
        }
    )
    schema_l = "user_id long, ts timestamp"
    schema_r = "user_id long, ts timestamp, payload long"
    ldf = spark.createDataFrame(lpdf, schema_l) if len(lpdf) else (
        spark.createDataFrame([], schema_l)
    )
    rdf = spark.createDataFrame(rpdf, schema_r) if len(rpdf) else (
        spark.createDataFrame([], schema_r)
    )
    got = {
        (r["user_id"], r["ts"]): r["payload"]
        for r in asof_join(
            ldf,
            rdf,
            by=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_payload=["payload"],
            direction="forward",
        ).collect()
    }
    if len(lpdf):
        expected_df = pd.merge_asof(
            lpdf.sort_values("ts", kind="mergesort"),
            rpdf.sort_values("ts", kind="mergesort"),
            on="ts",
            by="user_id",
            direction="forward",
        )
        expected = {
            (r.user_id, r.ts.to_pydatetime()): (
                None if pd.isna(r.payload) else int(r.payload)
            )
            for r in expected_df.itertuples()
        }
    else:
        expected = {}
    assert got == expected


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lines=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # order_id
            st.integers(min_value=1, max_value=20),  # quantity
            st.integers(min_value=1, max_value=500), # unit_price (int → exact)
        ),
        min_size=1,
        max_size=40,
    ),
    n_orders=st.integers(min_value=10, max_value=12),  # some orders lineless
)
def test_sales_summary_grained_equals_generic(spark, lines, n_orders):
    """The grain rewrite must be output-identical to the generic
    countDistinct form — including orders with zero line items (inner
    join drops them in both formulations)."""
    import datetime as dtm

    from sales_etl_spark.operators.aggregates import (
        sales_summary,
        sales_summary_grained,
    )

    li = spark.createDataFrame(
        [(o, float(q), float(p)) for o, q, p in lines],
        "order_id long, quantity double, unit_price double",
    )
    orders = spark.createDataFrame(
        [
            (
                o,
                f"cat{o % 3}",
                dtm.date(2024, 1 + o % 3, 1 + o),
            )
            for o in range(n_orders)
        ],
        "order_id long, category string, order_date date",
    )
    joined = li.join(orders, "order_id").withColumn(
        "total_price",
        (F.col("quantity") * F.col("unit_price")).cast("decimal(18,2)"),
    ).withColumn("customer_id", F.col("order_id"))
    a = sorted(map(tuple, sales_summary(joined).collect()))
    b = sorted(map(tuple, sales_summary_grained(li, orders).collect()))
    assert a == b


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_left_rows, right=_right_rows)
def test_asof_join_nearest_matches_pandas(spark, left, right):
    left = list({(k, t) for k, t in left})
    right = list({(k, t) for k, t in right})
    lpdf = pd.DataFrame(
        {
            "user_id": pd.array([k for k, _ in left], dtype="int64"),
            "ts": pd.to_datetime(
                [BASE + dt.timedelta(minutes=t) for _, t in left]
            ),
        }
    )
    rpdf = pd.DataFrame(
        {
            "user_id": pd.array([k for k, _ in right], dtype="int64"),
            "ts": pd.to_datetime(
                [BASE + dt.timedelta(minutes=t) for _, t in right]
            ),
            "payload": pd.array(
                [k * 1000 + t for k, t in right], dtype="int64"
            ),
        }
    )
    schema_l = "user_id long, ts timestamp"
    schema_r = "user_id long, ts timestamp, payload long"
    ldf = spark.createDataFrame(lpdf, schema_l) if len(lpdf) else (
        spark.createDataFrame([], schema_l)
    )
    rdf = spark.createDataFrame(rpdf, schema_r) if len(rpdf) else (
        spark.createDataFrame([], schema_r)
    )
    got = {
        (r["user_id"], r["ts"]): r["payload"]
        for r in asof_join(
            ldf,
            rdf,
            by=["user_id"],
            left_ts="ts",
            right_ts="ts",
            right_payload=["payload"],
            direction="nearest",
        ).collect()
    }
    if len(lpdf):
        expected_df = pd.merge_asof(
            lpdf.sort_values("ts", kind="mergesort"),
            rpdf.sort_values("ts", kind="mergesort"),
            on="ts",
            by="user_id",
            direction="nearest",
        )
        expected = {
            (r.user_id, r.ts.to_pydatetime()): (
                None if pd.isna(r.payload) else int(r.payload)
            )
            for r in expected_df.itertuples()
        }
    else:
        expected = {}
    assert got == expected


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),        # group key
            st.integers(min_value=1, max_value=50),       # quantity
            st.integers(min_value=1, max_value=10_000_00),  # price in CENTS
        ),
        min_size=1,
        max_size=60,
    )
)
def test_money_cents_sum_equals_decimal_oracle(spark, rows):
    """ADVICE r2: the wired cents path must match the decimal oracle
    bit-for-bit on arbitrary 2-dp prices (not just integer prices) —
    sum(money_cents)/100 via cents_to_double == CAST(SUM(CAST(q*p AS
    DECIMAL(18,2))) AS DOUBLE) under any grouping/partitioning."""
    from sales_etl_spark.operators.aggregates import (
        cents_to_double,
        money_cents,
    )

    df = spark.createDataFrame(
        [(g, float(q), c / 100.0) for g, q, c in rows],
        "g long, quantity double, unit_price double",
    ).repartition(7)
    fast = {
        r["g"]: r["s"]
        for r in df.groupBy("g")
        .agg(
            cents_to_double(
                F.sum(money_cents("quantity", "unit_price"))
            ).alias("s")
        )
        .collect()
    }
    exact = {
        r["g"]: r["s"]
        for r in df.groupBy("g")
        .agg(
            F.sum(
                (F.col("quantity") * F.col("unit_price")).cast(
                    "decimal(18,2)"
                )
            )
            .cast("double")
            .alias("s")
        )
        .collect()
    }
    assert fast == exact


# ---------------------------------------------------------------------------
# Mixing operators: randomized cross-validation vs a Python re-derivation
# ---------------------------------------------------------------------------

_mix_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),   # doc id
        st.integers(min_value=0, max_value=2),    # stratum
        st.integers(min_value=1, max_value=9),    # token count
    ),
    min_size=0,
    max_size=25,
)


def _mix_hash(seed: str, i: int) -> str:
    import hashlib

    return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_mix_rows, cap=st.integers(min_value=1, max_value=6))
def test_domain_cap_matches_python_model(spark, rows, cap):
    from sales_etl_spark.operators.sampling import domain_cap

    # unique ids — the id is the ranking key (documented precondition)
    rows = list({i: (i, s, t) for i, s, t in rows}.values())
    if not rows:
        return
    df = spark.createDataFrame(
        [(i, f"s{s}", t) for i, s, t in rows],
        "doc_id long, source string, n_tokens int",
    )
    got = {
        (r.doc_id, r.domain_rank)
        for r in domain_cap(df, "source", "doc_id", cap, seed="p").collect()
    }
    want = set()
    for s in {s for _, s, _ in rows}:
        ordered = sorted(
            (i for i, s2, _ in rows if s2 == s),
            key=lambda i: (_mix_hash("p", i), i),
        )
        want |= {(i, rk + 1) for rk, i in enumerate(ordered[:cap])}
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_mix_rows, budget=st.integers(min_value=0, max_value=60))
def test_token_budget_matches_python_model(spark, rows, budget):
    from sales_etl_spark.operators.sampling import token_budget_mix

    # unique ids — the id is the ranking key (documented precondition)
    rows = list({i: (i, s, t) for i, s, t in rows}.values())
    if not rows:
        return
    df = spark.createDataFrame(
        [(i, f"s{s}", t) for i, s, t in rows],
        "doc_id long, source string, n_tokens int",
    )
    got = {
        (r.doc_id, r.cum_tokens)
        for r in token_budget_mix(
            df, "source", "doc_id", "n_tokens",
            budgets={}, default_budget=budget, seed="p",
        ).collect()
    }
    toks = {i: t for i, _, t in rows}
    want = set()
    for s in {s for _, s, _ in rows}:
        ordered = sorted(
            (i for i, s2, _ in rows if s2 == s),
            key=lambda i: (_mix_hash("p", i), i),
        )
        cum = 0
        for i in ordered:
            cum += toks[i]
            if cum > budget:
                break
            want.add((i, cum))
    assert got == want


_pack_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),      # doc_id (collisions none: unique-ified below)
        st.integers(min_value=0, max_value=9),       # token count (0 = dropped)
    ),
    min_size=0,
    max_size=25,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_pack_rows)
def test_pack_sequences_conservation_and_span_invariants(spark, rows):
    """Randomized packing invariants, independent of data shape:
    (1) token conservation - per shard, offsets+tokens tile the
    concatenated stream with no gaps or overlaps; (2) spans follow
    from offsets arithmetically; (3) partitioning invariance."""
    from sales_etl_spark.operators.sampling import pack_sequences

    df = spark.createDataFrame(
        [(i, t) for i, t in rows], "doc_id long, n_tokens int"
    )
    out = pack_sequences(
        df, "doc_id", "n_tokens", seq_len=7, n_shards=3, seed="prop"
    ).collect()

    alive = {i: t for i, t in rows if t > 0}
    assert {r.doc_id for r in out} == set(alive)
    by_shard: dict[int, list] = {}
    for r in out:
        assert r.shard == r.doc_id % 3
        by_shard.setdefault(r.shard, []).append(r)
    for members in by_shard.values():
        members.sort(key=lambda r: r.tok_offset)
        expect = 0
        for r in members:
            assert r.tok_offset == expect          # no gaps, no overlap
            assert r.start_bin == r.tok_offset // 7
            assert r.end_bin == (r.tok_offset + alive[r.doc_id] - 1) // 7
            expect += alive[r.doc_id]

    again = pack_sequences(
        df.repartition(5), "doc_id", "n_tokens",
        seq_len=7, n_shards=3, seed="prop",
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


_mart_rows = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),          # group key
        st.integers(min_value=0, max_value=9999),  # cents
    ),
    min_size=0, max_size=30,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_mart_rows, split=st.integers(min_value=0, max_value=30))
def test_merge_marts_invariant_under_any_partition(spark, rows, split):
    """The incremental-refresh law: aggregating any base/delta split
    separately and merging with merge_marts equals the flat aggregate
    over everything — for ANY split point, including empty slices."""
    from sales_etl_spark.operators.aggregates import merge_marts

    split = min(split, len(rows))
    schema = "k string, cents long"

    def partial(data):
        df = spark.createDataFrame(data, schema) if data else (
            spark.createDataFrame([], schema)
        )
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("cents").cast("decimal(18,0)")).alias("total"),
        )

    merged = merge_marts(
        [partial(rows[:split]), partial(rows[split:])],
        keys=["k"], sum_cols=["n", "total"],
    )
    flat = partial(rows)
    got = {(r.k, r.n, r.total) for r in merged.collect()}
    want = {(r.k, r.n, r.total) for r in flat.collect()}
    assert got == want


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(counts=st.lists(st.integers(min_value=0, max_value=5000),
                       min_size=1, max_size=24),
       perm_seed=st.integers(min_value=0, max_value=999))
def test_dyadic_ewma_sum_is_order_free(spark, counts, perm_seed):
    """The events_ewma_rate exactness claim, isolated: terms
    c/(1<<gap) over gaps 0..23 sum to the IDENTICAL double under any
    summation order (every term an exact multiple of 2^-23, bounded),
    so a distributed sum cannot drift from the sequential one."""
    import random

    terms = [c / (1 << gap) for gap, c in enumerate(counts)]
    sequential = 0.0
    for t in terms:
        sequential += t
    shuffled = list(terms)
    random.Random(perm_seed).shuffle(shuffled)
    out_of_order = 0.0
    for t in shuffled:
        out_of_order += t
    assert sequential == out_of_order  # bit-exact, no tolerance


_psum_rows = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),  # value
        st.integers(min_value=0, max_value=10_000),    # uid (tiebreak)
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_psum_rows)
def test_global_prefix_sum_matches_sequential_cumsum(spark, rows):
    from sales_etl_spark.operators.windows import global_prefix_sum

    rows = list({(v, u) for v, u in rows})
    df = spark.createDataFrame(rows, "v long, uid long")
    got = global_prefix_sum(
        df,
        order_by=[F.desc("v"), F.asc("uid")],
        bucket=-(F.col("v") / F.lit(100)).cast("long"),
        value_col="v",
        out="cum",
        rn_out="rn",
    ).collect()
    ordered = sorted(rows, key=lambda r: (-r[0], r[1]))
    cum = 0
    want = {}
    for i, (v, u) in enumerate(ordered, start=1):
        cum += v
        want[(v, u)] = (cum, i)
    assert {(r.v, r.uid): (r.cum, r.rn) for r in got} == want


_wm_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),    # group
        st.integers(min_value=-50, max_value=50),  # value
        st.integers(min_value=1, max_value=9),     # weight
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_wm_rows)
def test_weighted_median_matches_brute_force(spark, rows):
    from sales_etl_spark.operators.aggregates import weighted_median

    df = spark.createDataFrame(rows, "g int, v long, w long")
    got = {
        r.g: (r.med, r.total_weight)
        for r in weighted_median(df, ["g"], "v", "w", out="med").collect()
    }
    by_g: dict[int, list[tuple[int, int]]] = {}
    for g, v, w in rows:
        by_g.setdefault(g, []).append((v, w))
    for g, vw in by_g.items():
        tot = sum(w for _, w in vw)
        cum = 0
        med = None
        for v in sorted({v for v, _ in vw}):
            cum += sum(w for vv, w in vw if vv == v)
            if 2 * cum >= tot:
                med = v
                break
        assert got[g] == (med, tot), (g, got[g], med, tot)


# ---------------------------------------------------------------------------
# Round-5 operators: randomized structural invariants
# ---------------------------------------------------------------------------

_words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "epsilon",
                     "zeta", "eta", "theta"]),
    min_size=0, max_size=200,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(_words, min_size=1, max_size=6))
def test_chunk_overlap_covers_every_token_exactly(spark, docs):
    """text_chunk_overlap's coverage contract, randomized: every token
    position of every doc lands in ≥1 chunk; interior positions land
    in exactly ceil(C/S) = 2 chunks; chunk starts advance by the
    stride; the last chunk reaches the doc end."""
    from sales_etl_spark.plans.extensions import _CHUNK_C, _CHUNK_S

    rows = [
        (i, " ".join(ws), "en", len(" ".join(ws)), "prop")
        for i, ws in enumerate(docs)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, n_chars long, "
        "source string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "embeddings"):
            spark.read.parquet(
                f"/root/testdata/sf0.001/{t}.parquet"
            ).limit(1).write.parquet(f"{d}/{t}.parquet")
        df.write.parquet(f"{d}/documents.parquet")
        from sales_etl_spark.plans import QUERY_REGISTRY

        chunks = (
            QUERY_REGISTRY["text_chunk_overlap"]
            .builder(spark, d)
            .collect()
        )
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, ws in enumerate(docs):
        n = len(ws)
        got = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
        if n == 0:
            assert not got
            continue
        # starts advance by the stride from 1
        assert [r.start_tok for r in got] == [
            1 + j * _CHUNK_S for j in range(len(got))
        ]
        # full coverage: last chunk reaches the end, no position missed
        last = got[-1]
        assert last.start_tok + last.n_tokens - 1 == n
        cover = [0] * (n + 1)
        for r in got:
            for p in range(r.start_tok, r.start_tok + r.n_tokens):
                cover[p] += 1
        assert min(cover[1:]) >= 1
        # interior tokens (inside every window that could reach them)
        full_cover = _CHUNK_C // _CHUNK_S + 1
        interior = [
            c for p, c in enumerate(cover[1:], start=1)
            if p > _CHUNK_C and p <= n - _CHUNK_C
        ]
        assert all(c >= 2 for c in interior)
        assert all(c <= full_cover for c in cover[1:])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=10**6))
def test_substring_span_detects_planted_run_at_random_offset(spark, seed):
    """A 100-char block planted at a RANDOM offset inside unrelated
    filler must always pair the two docs that share it (exactness of
    the every-position gram contract — no alignment luck involved)."""
    import random

    from sales_etl_spark.operators.dedup import substring_span_pairs

    rng = random.Random(seed)
    vocab = ["red", "green", "blue", "cyan", "teal", "plum", "gold",
             "jade", "rust", "sage"]
    block = " ".join(rng.choices(vocab, k=30))  # ~140 chars
    f1 = " ".join(rng.choices(vocab, k=rng.randint(0, 40)))
    f2 = " ".join(rng.choices(vocab, k=rng.randint(0, 40)))
    f3 = " ".join(rng.choices(vocab, k=rng.randint(5, 40)))
    rows = [
        (1, f"{f1} {block} {f2}".strip()),
        (2, f"{block} {f3}".strip()),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in substring_span_pairs(
            df, "doc_id", "text", window=64, min_shared=8,
            max_gram_df=None,
        ).collect()
    }
    assert (1, 2) in got


# PNG codec: pure driver-side property — no Spark jobs, so a real
# example budget is cheap. Random rasters across the full byte range,
# degenerate dims (1x1, 1xN, Nx1), and per-row filter choice drawn
# from all five PNG filter types (including mixed sequences, where an
# unfiltering bug in row y corrupts every later Up/Average/Paeth row).
_png_dims = st.tuples(
    st.integers(min_value=1, max_value=24),
    st.integers(min_value=1, max_value=24),
)


@settings(max_examples=120, deadline=None)
@given(dims=_png_dims, data=st.data())
def test_png_codec_roundtrip_property(dims, data):
    from sales_etl_spark.operators.png import decode_png, encode_png

    w, h = dims
    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    filters = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=4),
            min_size=h,
            max_size=h,
        )
    )
    enc = encode_png(px, w, h, lambda y: filters[y])
    w2, h2, ch, out = decode_png(enc)
    assert (w2, h2, ch) == (w, h, 1)
    assert out == px


# Conformal threshold: the distributed bucket-offset order statistic
# must equal the single-node sorted() answer on ANY score multiset —
# heavy ties, negatives, constant frames, n from 1 to 40, alpha
# across the useful band. (The registry query checks one corpus
# cross-engine; this checks the operator's maths everywhere else.)
_scores = st.lists(
    st.integers(min_value=-500, max_value=500).map(lambda v: v / 100.0),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scores=_scores, alpha=st.sampled_from([0.05, 0.1, 0.25, 0.5]))
def test_conformal_threshold_matches_sorted_order_statistic(
    spark, scores, alpha
):
    import math

    from sales_etl_spark.operators.sampling import conformal_threshold

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "doc_id long, score double"
    )
    got = conformal_threshold(df, "score", "doc_id", alpha).collect()

    n = len(scores)
    k = math.floor(alpha * (n + 1))
    if k < 1:
        assert got == []
        return
    expected = sorted(scores)[k - 1]
    assert len(got) == 1
    row = got[0]
    assert (row.n_cal, row.k_rank) == (n, k)
    assert row.threshold_score == expected


# Kaplan-Meier: the distributed curve must equal a from-scratch
# single-node KM (with the operator's own exactness contract: nano-
# floored ln factors, exp, round 6) on ANY censoring pattern — all
# events, all censored, mixed, ties on a day, risk-set exhaustion
# (where the curve must pin to exactly 0.0 forever after).
_km_subjects = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),   # duration day
        st.integers(min_value=0, max_value=1),   # event flag
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(subjects=_km_subjects)
def test_km_survival_curve_matches_single_node(spark, subjects):
    import math

    from sales_etl_spark.operators.aggregates import km_survival_curve

    df = spark.createDataFrame(subjects, "day long, ev int")
    got = {
        r.day: (r.n_risk, r.n_events, r.n_censored, r.km_survival)
        for r in km_survival_curve(df, "day", "ev").collect()
    }

    # independent single-node KM with the same exactness contract
    days = sorted({d for d, _ in subjects})
    n_risk = len(subjects)
    ln_sum = 0
    dead = False
    expected = {}
    for day in days:
        d = sum(1 for dd, ev in subjects if dd == day and ev == 1)
        c = sum(1 for dd, ev in subjects if dd == day and ev == 0)
        if d >= n_risk and d > 0:
            dead = True
        elif d > 0:
            ln_sum += math.floor(
                math.log(1.0 - d / n_risk) * 1e9 + 0.5
            )
        km = 0.0 if dead else round(math.exp(ln_sum / 1e9), 6)
        expected[day] = (n_risk, d, c, km)
        n_risk -= d + c
    assert got == expected


# GIF LZW: lossless, so ANY raster must round-trip bit-exactly. The
# value-distribution strategies deliberately stress the dictionary:
# full-range random bytes (dict churn, KwKwK), tiny alphabets (deep
# chains + code-width growth), and constant runs (maximal-length
# phrases). Degenerate 1x1/1xN/Nx1 geometries included.
_gif_dims = st.tuples(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
)


@settings(max_examples=100, deadline=None)
@given(dims=_gif_dims, data=st.data())
def test_gif_codec_roundtrip_property(dims, data):
    from sales_etl_spark.operators.gif import decode_gif, encode_gif

    w, h = dims
    alphabet = data.draw(
        st.sampled_from([(0, 255), (0, 3), (7, 7), (250, 255)])
    )
    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=alphabet[0], max_value=alphabet[1]),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    w2, h2, ch, rgb = decode_gif(encode_gif(px, w, h))
    assert (w2, h2, ch) == (w, h, 3)
    assert rgb == bytes(v for p in px for v in (p, p, p))


# JPEG: two property tiers. (a) The exactness contract the driver
# hash rides on — block-constant rasters with the all-ones table are
# BIT-exact for any tile values and any tile grid. (b) The analytic
# bound — arbitrary rasters (any geometry, incl. the padding path)
# round-trip within +-1 per sample: the forward/inverse DCT pair is
# orthonormal, so the only error is quantization rounding (<=0.5 per
# coefficient, orthonormality preserves the L2 norm) plus the final
# half-up rounding (<=0.5) — a max sample error strictly under 2, and
# the integer grid makes it <=1 in practice.
@settings(max_examples=60, deadline=None)
@given(
    tw=st.integers(min_value=1, max_value=4),
    th=st.integers(min_value=1, max_value=4),
    data=st.data(),
)
def test_jpeg_constant_tile_exactness_property(tw, th, data):
    from sales_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg

    tiles = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=tw * th,
            max_size=tw * th,
        )
    )
    w, h = 8 * tw, 8 * th
    px = bytes(
        tiles[(y // 8) * tw + (x // 8)]
        for y in range(h)
        for x in range(w)
    )
    assert decode_jpeg(encode_jpeg(px, w, h)) == (w, h, 1, px)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    data=st.data(),
)
def test_jpeg_lossless_table_error_bound_property(w, h, data):
    from sales_etl_spark.operators.jpeg import decode_jpeg, encode_jpeg

    px = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h,
                max_size=w * h,
            )
        )
    )
    w2, h2, ch, out = decode_jpeg(encode_jpeg(px, w, h))
    assert (w2, h2, ch) == (w, h, 1)
    assert all(abs(a - b) <= 1 for a, b in zip(out, px))


# AVI container: frames of any content and any (odd/even) length must
# survive the chunk walk byte-for-byte, in order — padding bytes,
# idx1 offsets and LIST nesting all on the line.
@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_avi_container_roundtrip_property(data):
    from sales_etl_spark.operators.avi import (
        encode_avi_mjpeg,
        parse_avi_mjpeg,
    )

    frames = data.draw(
        st.lists(
            st.binary(min_size=1, max_size=300),
            min_size=1,
            max_size=8,
        )
    )
    fps = data.draw(st.integers(min_value=1, max_value=60))
    avi = encode_avi_mjpeg(frames, 16, 8, fps=fps)
    w, h, got_fps, got = parse_avi_mjpeg(avi)
    assert (w, h, got_fps) == (16, 8, fps)
    assert got == frames


# PCM WAV: decode_wav_pcm must invert the stdlib wave writer for any
# sample sequence, rate, and length — byte order and sign extension
# across the full 16-bit range.
@settings(max_examples=60, deadline=None)
@given(
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    data=st.data(),
)
def test_wav_pcm_decode_property(rate, data):
    import io
    import struct
    import wave

    from sales_etl_spark.operators.multimodal import decode_wav_pcm

    samples = data.draw(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=1,
            max_size=400,
        )
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    got_rate, got_ch, got = decode_wav_pcm(buf.getvalue())
    assert (got_rate, got_ch, got) == (rate, 1, samples)
