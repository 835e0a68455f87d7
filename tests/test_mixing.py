"""Per-domain cap + token-budget mixing tests (operators/sampling.py):
cap bounds hold, kept sets nest as the cap grows, budgets are strict
(never overshoot, zero budget drops the stratum), and every decision
is invariant to partitioning and input order."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sales_etl_spark.operators.sampling import (
    domain_cap,
    token_budget_mix,
)


def _hex(seed: str, i: int) -> str:
    return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8]


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens int"
    )


ROWS = [
    (i, f"s{i % 3}", 10 + (i % 7)) for i in range(60)
]


def test_cap_bounds_and_membership(spark):
    out = domain_cap(_df(spark, ROWS), "source", "doc_id", 5, seed="t").collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert set(by_src) == {"s0", "s1", "s2"}
    for src, rs in by_src.items():
        assert len(rs) == 5
        assert sorted(r.domain_rank for r in rs) == [1, 2, 3, 4, 5]
        # survivors are exactly the 5 smallest mixing hashes
        want = sorted(
            (i for i, s, _ in ROWS if s == src),
            key=lambda i: (_hex("t", i), i),
        )[:5]
        assert sorted(r.doc_id for r in rs) == sorted(want)


def test_cap_nesting(spark):
    df = _df(spark, ROWS)
    small = {
        r.doc_id for r in domain_cap(df, "source", "doc_id", 3, seed="t").collect()
    }
    big = {
        r.doc_id for r in domain_cap(df, "source", "doc_id", 9, seed="t").collect()
    }
    assert small < big


def test_cap_partitioning_invariance(spark):
    df = _df(spark, ROWS)
    a = sorted(
        (r.doc_id, r.domain_rank)
        for r in domain_cap(df, "source", "doc_id", 7, seed="t").collect()
    )
    b = sorted(
        (r.doc_id, r.domain_rank)
        for r in domain_cap(
            df.repartition(13).sortWithinPartitions(F.desc("doc_id")),
            "source", "doc_id", 7, seed="t",
        ).collect()
    )
    assert a == b


def test_budget_strict_no_overshoot(spark):
    out = token_budget_mix(
        _df(spark, ROWS), "source", "doc_id", "n_tokens",
        budgets={"s0": 47}, default_budget=35, seed="t",
    ).collect()
    by_src: dict[str, list] = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        budget = 47 if src == "s0" else 35
        assert max(r.cum_tokens for r in rs) <= budget
        # greedy prefix in hash order: adding the next-ranked doc
        # would overshoot (strictness is tight, not lazy)
        ordered = sorted(
            (i for i, s, _ in ROWS if s == src),
            key=lambda i: (_hex("t", i), i),
        )
        kept = {r.doc_id for r in rs}
        n = len(kept)
        assert set(ordered[:n]) == kept
        toks = {i: t for i, s, t in ROWS if s == src}
        assert sum(toks[i] for i in ordered[: n + 1]) > budget


def test_budget_zero_drops_stratum(spark):
    out = token_budget_mix(
        _df(spark, ROWS), "source", "doc_id", "n_tokens",
        budgets={"s1": 0}, default_budget=1000, seed="t",
    ).collect()
    assert all(r.source != "s1" for r in out)


def test_budget_partitioning_invariance(spark):
    df = _df(spark, ROWS)
    run = lambda d: sorted(  # noqa: E731
        (r.doc_id, r.cum_tokens)
        for r in token_budget_mix(
            d, "source", "doc_id", "n_tokens",
            budgets={}, default_budget=60, seed="t",
        ).collect()
    )
    assert run(df) == run(df.repartition(11))


def test_split_assign_stable_under_growth(spark):
    from sales_etl_spark.operators.sampling import split_assign

    frac = {"train": 0.8, "val": 0.1, "test": 0.1}
    small = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    a = {r.doc_id: r.split for r in split_assign(small, "doc_id", frac).collect()}
    b = {r.doc_id: r.split for r in split_assign(big, "doc_id", frac).collect()}
    # growing the corpus never migrates an existing doc across splits
    assert all(b[i] == a[i] for i in a)
    # all splits populated, fractions roughly honored
    from collections import Counter
    c = Counter(b.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_split_assign_rejects_bad_fractions(spark):
    import pytest as _pytest

    from sales_etl_spark.operators.sampling import split_assign

    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError):
        split_assign(df, "doc_id", {"train": 0.5, "test": 0.4})


def test_budget_zero_token_docs_dropped(spark):
    """Docs with 0 tokens never survive the mix — without the filter
    they'd be unconditional survivors (cum_tokens never advances), even
    under a zero budget (ADVICE r3)."""
    rows = [(1, "s0", 0), (2, "s0", 5), (3, "s0", 0), (4, "s1", 0)]
    out = token_budget_mix(
        _df(spark, rows), "source", "doc_id", "n_tokens",
        budgets={"s1": 0}, default_budget=100, seed="t",
    ).collect()
    assert {r.doc_id for r in out} == {2}


def test_pack_sequences_spans_and_offsets(spark):
    """Planted packing: offsets are the prefix sums in hash order per
    shard; a doc crossing a bin boundary reports the span; zero-token
    docs vanish."""
    from sales_etl_spark.operators.sampling import pack_sequences

    rows = [(i, "s", 40) for i in range(10)] + [(100, "s", 0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = pack_sequences(
        df, "doc_id", "n_tokens", seq_len=100, n_shards=1, seed="t"
    ).collect()
    assert {r.doc_id for r in out} == set(range(10))  # zero-token gone
    by_off = sorted(out, key=lambda r: r.tok_offset)
    # contiguous concatenation: offsets are multiples of 40
    assert [r.tok_offset for r in by_off] == [40 * i for i in range(10)]
    for r in by_off:
        assert r.start_bin == r.tok_offset // 100
        assert r.end_bin == (r.tok_offset + 39) // 100
    # the doc at offset 80 straddles examples 0 and 1
    straddler = next(r for r in by_off if r.tok_offset == 80)
    assert (straddler.start_bin, straddler.end_bin) == (0, 1)
    # deterministic order: matches the md5 mixing hash
    import hashlib

    want = sorted(
        range(10),
        key=lambda i: (hashlib.md5(f"t:{i}".encode()).hexdigest()[:8], i),
    )
    assert [r.doc_id for r in by_off] == want
