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


# ---------------------------------------------------------------------------
# token-window chunking (registered query text_chunk_tokens)
# ---------------------------------------------------------------------------


def _chunks(spark, texts):
    from sales_etl_spark.plans.registry import QUERY_REGISTRY  # noqa: F401
    from sales_etl_spark.functions import text as TX
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    toks = TX.tokens(F.lower(F.col("text")))
    base = docs.select("doc_id", toks.alias("__toks")).filter(
        F.size("__toks") > 0
    )
    starts = F.sequence(F.lit(1), F.size("__toks"), F.lit(48))
    chunk = F.slice(F.col("__toks"), F.col("s"), 64)
    out = base.select(
        "doc_id", "__toks", F.explode(starts).alias("s")
    ).select(
        "doc_id",
        F.floor((F.col("s") - 1) / 48).cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
    return sorted(
        ((r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
         for r in out.collect())
    )


def test_chunking_boundaries(spark):
    words = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    got = _chunks(
        spark,
        [
            words(10),   # single short chunk
            words(48),   # exactly one stride: one chunk
            words(64),   # full window + 16-token overlap tail
            "",          # empty: no chunks
        ],
    )
    by_doc = {}
    for d, cid, n, _txt in got:
        by_doc.setdefault(d, []).append((cid, n))
    assert by_doc[0] == [(0, 10)]
    assert by_doc[1] == [(0, 48)]
    assert by_doc[2] == [(0, 64), (1, 16)]
    assert 3 not in by_doc


def test_chunk_overlap_content(spark):
    words = " ".join(f"w{i}" for i in range(70))
    got = _chunks(spark, [words])
    # chunk 1 starts at token index 48 (0-based): first token w48,
    # overlapping the last 16 tokens of chunk 0
    (_, _, n0, c0), (_, _, n1, c1) = got
    assert n0 == 64 and c0.split()[0] == "w0" and c0.split()[-1] == "w63"
    assert n1 == 22 and c1.split()[0] == "w48" and c1.split()[-1] == "w69"


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_behavior(spark):
    from pyspark.sql import functions as F
    from sales_etl_spark.functions.text import (
        pii_email_count,
        pii_url_count,
        redact_pii,
    )

    rows = [
        Row(i=1, t="mail a.b+c@x-corp.io and d_e%f@sub.domain.org today"),
        Row(i=2, t="see https://a.io/path?email=leak@x.io then stop"),
        Row(i=3, t="no pii here at all"),
        Row(i=4, t="mixed: http://plain.example and root@host.example.com"),
    ]
    out = {
        r.i: r
        for r in spark.createDataFrame(rows)
        .select(
            "i",
            pii_email_count("t").alias("e"),
            pii_url_count("t").alias("u"),
            redact_pii("t").alias("red"),
        )
        .collect()
    }
    assert out[1].e == 2 and out[1].u == 0
    assert out[1].red == "mail [EMAIL] and [EMAIL] today"
    # email inside a URL is swallowed by the URL pass (runs first)
    assert out[2].red == "see [URL] then stop"
    assert out[3].red == "no pii here at all" and out[3].e == out[3].u == 0
    assert out[4].red == "mixed: [URL] and [EMAIL]"


def test_repetition_signal_orders_boilerplate_first(spark):
    from sales_etl_spark.plans.registry import QUERY_REGISTRY
    import tempfile, os

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="buy now " * 50, lang="en", source="s",
                n_chars=0),
            Row(doc_id=2, text=" ".join(f"w{i}" for i in range(100)),
                lang="en", source="s", n_chars=0),
        ]
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r.doc_id: r
            for r in QUERY_REGISTRY["text_repetition"]
            .builder(spark, d)
            .collect()
        }
    # "buy now buy now ..." : 99 2-grams, 'buy now' appears 50 times
    assert out[1].n_grams == 99 and out[1].top_gram_count == 50
    assert out[1].repetition_ratio > 0.5
    # all-distinct tokens: every 2-gram unique
    assert out[2].top_gram_count == 1
    assert out[2].repetition_ratio == round(1 / 99, 6)


def test_weighted_sample_k_proportionality_and_invariance(spark):
    """A-ES weighted sampler: (a) deterministic under repartitioning;
    (b) zero/negative weights never sampled; (c) across many seeds, a
    10x-heavier item is sampled much more often than a light one
    (weight-proportionality, the property uniform-k lacks)."""
    from sales_etl_spark.operators.sampling import weighted_sample_k

    rows = [(i, "s", 400 if i == 0 else 10) for i in range(30)]
    rows += [(98, "s", 0), (99, "s", -5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w int")

    a = sorted(
        (r.doc_id, r.sample_rank)
        for r in weighted_sample_k(df, "source", "doc_id", "w", 5).collect()
    )
    b = sorted(
        (r.doc_id, r.sample_rank)
        for r in weighted_sample_k(
            df.repartition(7), "source", "doc_id", "w", 5
        ).collect()
    )
    assert a == b and len(a) == 5
    assert all(d not in (98, 99) for d, _ in a)

    heavy_hits = light_hits = 0
    for t in range(40):
        kept = {
            r.doc_id
            for r in weighted_sample_k(
                df, "source", "doc_id", "w", 5, seed=f"t{t}"
            ).collect()
        }
        heavy_hits += 0 in kept
        light_hits += 1 in kept
    # heavy carries 400 of ~690 total weight: inclusion in a k=5 draw
    # is near-certain (theory ~0.98); a 10-weight item sits ~0.15
    assert heavy_hits >= 34
    assert light_hits <= 14
    assert heavy_hits - light_hits >= 15


def test_temperature_resample_targets_and_fill(spark):
    """mix_temperature_resample: every source's survivor count equals
    min(its sqrt-mass target, its doc count), and targets are
    monotone in token mass (more tokens never means a smaller
    target)."""
    from sales_etl_spark.plans import QUERY_REGISTRY
    from sales_etl_spark.functions import text as TX
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    out = QUERY_REGISTRY["mix_temperature_resample"].builder(spark, sf)
    got = {
        r.source: (r.n, r.n_target)
        for r in out.groupBy("source", "n_target")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("source", "n", "n_target")
        .collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "source", TX.token_count(F.col("text")).alias("t")
    )
    per_src = {
        r.source: (r.n_docs, r.mass)
        for r in docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("t").alias("mass"))
        .collect()
    }
    for src, (n, target) in got.items():
        n_docs, _ = per_src[src]
        assert n == min(target, n_docs), (src, n, target, n_docs)
    # monotone: sort sources by mass; targets must be non-decreasing
    by_mass = sorted(per_src, key=lambda s: per_src[s][1])
    targets = [got[s][1] for s in by_mass if s in got]
    assert targets == sorted(targets)


def test_dsir_weights_rank_target_like_docs_higher(spark, tmp_path):
    """DSIR's defining property: source docs written in the TARGET
    domain's vocabulary must receive higher importance weights than
    generic filler. Plant a hash-selected target cohort that speaks a
    distinctive vocabulary, give a few source docs the same
    vocabulary, and assert every vocabulary-matching source doc
    outranks every filler doc."""
    from sales_etl_spark.operators.sampling import (
        hash_uniform_hex,
        threshold_hex,
    )
    from sales_etl_spark.plans import QUERY_REGISTRY
    from sales_etl_spark.plans.trade import _DSIR_TGT_RATE, _DSIR_TGT_SEED

    from pyspark.sql import functions as F

    # find doc ids the query's own hash draw labels TARGET vs SOURCE
    ids = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    lbl = ids.withColumn(
        "is_tgt",
        hash_uniform_hex(F.col("doc_id"), _DSIR_TGT_SEED)
        < F.lit(threshold_hex(_DSIR_TGT_RATE)),
    ).collect()
    tgt_ids = [r.doc_id for r in lbl if r.is_tgt]
    src_ids = [r.doc_id for r in lbl if not r.is_tgt]
    assert len(tgt_ids) >= 10 and len(src_ids) >= 100

    domain = "quark lepton boson hadron gluon meson baryon photon"
    filler = "table chair window door floor ceiling wall carpet"
    matching = set(src_ids[:8])  # source docs that speak the domain
    rows = []
    for i in tgt_ids:
        rows.append((i, domain, "en", len(domain), "t"))
    for i in src_ids:
        text = domain if i in matching else filler
        rows.append((i, text, "en", len(text), "s"))
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, n_chars long, "
        "source string",
    )
    import os

    d = str(tmp_path)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        spark.read.parquet(
            f"/root/testdata/sf0.001/{t}.parquet"
        ).limit(1).write.parquet(f"{d}/{t}.parquet")
    docs.write.parquet(f"{d}/documents.parquet")

    out = {
        r.doc_id: r.logw_micro
        for r in QUERY_REGISTRY["sample_dsir_weights"]
        .builder(spark, d)
        .collect()
    }
    match_w = [out[i] for i in matching if i in out]
    filler_w = [w for i, w in out.items() if i not in matching]
    assert len(match_w) == len(matching)  # all matched docs ranked
    assert min(match_w) > max(filler_w)
