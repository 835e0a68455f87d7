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


def test_bpe_merge_fold_matches_reference_run_semantics(spark):
    """The in-row merge fold must reproduce the reference BPE rule
    (single-pass left-to-right non-overlapping, re.sub semantics) —
    including the same-symbol-run case: 'aaaa' under merge (a,a)
    becomes [aa, aa] (positions 1 and 3), 'aaa' becomes [aa, a], and a
    merged tail never re-fires the rule ('ab' + 'b' with merge (a,b)
    stays put). Pinned against a literal python re.sub reference."""
    import re

    from pyspark.sql import functions as F

    from sales_etl_spark.operators.tokenize import _merge_fold_sql

    cases = ["aaaa", "aaa", "aa", "a", "abab", "aab", "abb", "banana"]
    for a, b in (("a", "a"), ("a", "b"), ("an", "a")):
        # reference: Sennrich-style single-pass sub on space-joined
        # symbols (start from chars, except the pre-merged 'an' case)
        for word in cases:
            if (a, b) == ("an", "a"):
                # apply (a,n) first so the 'an' symbol exists
                pre = re.sub(
                    r"(?<!\S)a n(?!\S)", "an", " ".join(word)
                ).split()
            else:
                pre = list(word)
            want = re.sub(
                rf"(?<!\S){re.escape(a)} {re.escape(b)}(?!\S)",
                a + b,
                " ".join(pre),
            ).split()
            df = spark.createDataFrame([(pre,)], "s array<string>")
            got = df.select(
                F.expr(_merge_fold_sql(a, b)).alias("m")
            ).collect()[0]["m"]
            assert got == want, (a, b, word, got, want)


def test_bpe_train_merge_table_properties(spark):
    """Trained merges on a controlled corpus: the first merge is the
    most frequent adjacent pair, counts are corpus-frequency weighted,
    and re-segmentation feeds later rounds (the second merge can use
    the symbol created by the first)."""
    from sales_etl_spark.operators.tokenize import bpe_train

    docs = spark.createDataFrame(
        [("the thermos there",), ("the thin theory",), ("banana bandana",)],
        "text string",
    )
    merges, vocab = bpe_train(docs, "text", n_merges=3)
    vocab.unpersist()
    assert [m[0] for m in merges] == [0, 1, 2]
    # 'th' leads: t-h is adjacent in the/thermos/there/thin/theory
    assert (merges[0][1], merges[0][2]) == ("t", "h")
    assert merges[0][3] == "th" and merges[0][4] >= 5
    # second round merges 'th'+'e' (the created symbol participates)
    assert (merges[1][1], merges[1][2]) == ("th", "e")
