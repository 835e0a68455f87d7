"""Invariant tests for the corpus-hygiene registry queries
(boilerplate, quality classifier, decontamination corpus arithmetic)
on real testdata — the bit-exact gate is the DuckDB oracle; these pin
the semantic invariants a refactor could silently break."""

from __future__ import annotations

import hashlib

from sales_etl_spark.plans import QUERY_REGISTRY

SF = "/root/testdata/sf0.001"


def test_boilerplate_invariants(spark):
    rows = QUERY_REGISTRY["text_boilerplate"].builder(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_boilerplate <= r.n_chunks
        assert 0.0 <= r.boilerplate_ratio <= 1.0
    # at least one repeated-chunk doc exists in the planted dup corpus
    assert any(r.n_boilerplate > 0 for r in rows)


def test_quality_score_matches_python_model(spark):
    out = {
        r.doc_id: r
        for r in QUERY_REGISTRY["quality_classifier_score"]
        .builder(spark, SF)
        .collect()
    }
    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    assert set(out) == set(docs)
    import re

    for doc_id, text in list(sorted(docs.items()))[:25]:
        toks = re.findall(r"\w+", text.lower())
        s = sum(
            2 * int(hashlib.md5(f"qw-v1:{t}".encode()).hexdigest()[:8], 16)
            - 2**32
            for t in toks
        )
        score = s / 4294967296 / len(toks)
        r = out[doc_id]
        assert r.n_tokens == len(toks)
        assert abs(r.quality_score - round(score, 6)) < 1e-12
        assert r.keep == (score > 0.0)
    # the pseudo-weights are zero-mean: both classes occur
    keeps = {r.keep for r in out.values()}
    assert keeps == {True, False}
