"""Deterministic stratified sampling: partitioning-independence,
nested-sample monotonicity, rate edge cases, and reweighting."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import Row

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sales_etl_spark.operators.sampling import (  # noqa: E402
    stratified_sample,
    threshold_hex,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        Row(doc_id=i, source=f"s{i % 4}") for i in range(1, 2001)
    ]
    return spark.createDataFrame(rows)


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_partitioning_independence(corpus):
    rates = {"s0": 0.5, "s1": 0.25}
    a = _ids(stratified_sample(corpus, "source", "doc_id", rates, 0.7))
    b = _ids(
        stratified_sample(
            corpus.repartition(7), "source", "doc_id", rates, 0.7
        )
    )
    assert a == b and 0 < len(a) < 2000


def test_nested_samples_same_seed(corpus):
    lo = _ids(stratified_sample(corpus, "source", "doc_id", {}, 0.25))
    hi = _ids(stratified_sample(corpus, "source", "doc_id", {}, 0.5))
    assert lo < hi  # strictly nested: same seed, monotone threshold


def test_rate_edges_and_weights(corpus):
    rates = {"s0": 1.0, "s1": 0.0}
    out = stratified_sample(corpus, "source", "doc_id", rates, 0.5)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src["s0"]) == 500          # keep-all stratum intact
    assert "s1" not in by_src                # drop-all stratum gone
    assert all(r.sample_weight == 1.0 for r in by_src["s0"])
    assert all(r.sample_weight == 2.0 for r in by_src["s2"])


def test_different_seed_draws_differently(corpus):
    a = _ids(
        stratified_sample(corpus, "source", "doc_id", {}, 0.5, seed="a")
    )
    b = _ids(
        stratified_sample(corpus, "source", "doc_id", {}, 0.5, seed="b")
    )
    assert a != b


def test_rate_is_approximately_honored(corpus):
    got = len(_ids(stratified_sample(corpus, "source", "doc_id", {}, 0.5)))
    assert abs(got - 1000) < 100  # binomial(2000, .5): ±4.5 sigma


def test_threshold_hex_fixed_width():
    assert threshold_hex(0.5) == "80000000"
    assert len(threshold_hex(0.001)) == 8
    assert threshold_hex(0.001) < threshold_hex(0.002)
