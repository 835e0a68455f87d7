"""Benchmark-decontamination operator tests (operators/decontam.py):
planted contamination is found with exact overlap counts, short-doc
verbatim copies are caught, the applied corpus drops exactly
eval ∪ contaminated, and the decision is partitioning-invariant."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sales_etl_spark.operators import decontam
from sales_etl_spark.operators.sampling import threshold_hex

SEED = "t-eval"
RATE = 0.5


def _is_eval(doc_id: int) -> bool:
    h = hashlib.md5(f"{SEED}:{doc_id}".encode()).hexdigest()[:8]
    return h < threshold_hex(RATE)


def _pick_ids(want_eval: bool, n: int, start: int = 0) -> list[int]:
    out = []
    i = start
    while len(out) < n:
        if _is_eval(i) == want_eval:
            out.append(i)
        i += 1
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_contamination_found(spark):
    (ev,) = _pick_ids(True, 1)
    tr_dirty, tr_clean = _pick_ids(False, 2)
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (ev, eval_text),
        # shares the full 8-token window -> 4 of its distinct 5-grams
        (tr_dirty, eval_text + " iota kappa"),
        (tr_clean, "one two three four five six seven eight nine ten"),
    ]
    out = decontam.ngram_decontaminate(
        _docs(spark, rows), "doc_id", "text",
        n=5, eval_seed=SEED, eval_rate=RATE,
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == tr_dirty
    # dirty doc has 10 tokens -> 6 distinct 5-grams, of which the 4
    # drawn fully from the eval text overlap
    assert r.n_grams == 6
    assert r.n_overlap == 4
    assert abs(r.overlap_ratio - round(4 / 6, 6)) < 1e-12


def test_short_doc_verbatim_copy_caught(spark):
    (ev,) = _pick_ids(True, 1)
    (tr,) = _pick_ids(False, 1)
    rows = [(ev, "tiny doc"), (tr, "tiny doc")]
    out = decontam.ngram_decontaminate(
        _docs(spark, rows), "doc_id", "text",
        n=5, eval_seed=SEED, eval_rate=RATE,
    ).collect()
    assert [(r.doc_id, r.n_overlap, r.n_grams) for r in out] == [(tr, 1, 1)]


def test_corpus_drops_eval_and_contaminated(spark):
    evs = _pick_ids(True, 2)
    trs = _pick_ids(False, 3)
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (evs[0], eval_text),
        (evs[1], "unrelated eval content nobody copied here today ok"),
        (trs[0], eval_text),  # contaminated (verbatim)
        (trs[1], "one two three four five six seven eight nine ten"),
        (trs[2], "cat dog bird fish horse cow sheep goat duck hen"),
    ]
    kept = decontam.decontaminated_corpus(
        _docs(spark, rows), "doc_id", "text",
        n=5, eval_seed=SEED, eval_rate=RATE,
    )
    assert sorted(r.doc_id for r in kept.collect()) == sorted(trs[1:])


def test_partitioning_invariance(spark, sf_dir=None):
    evs = _pick_ids(True, 1)
    trs = _pick_ids(False, 6)
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(evs[0], eval_text)] + [
        (t, eval_text + f" extra{i} word{i}") for i, t in enumerate(trs)
    ]
    df = _docs(spark, rows)
    a = decontam.ngram_decontaminate(
        df, "doc_id", "text", n=5, eval_seed=SEED, eval_rate=RATE
    ).collect()
    b = decontam.ngram_decontaminate(
        df.repartition(7), "doc_id", "text",
        n=5, eval_seed=SEED, eval_rate=RATE,
    ).collect()
    key = lambda r: r.doc_id  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)


def test_min_overlap_threshold(spark):
    (ev,) = _pick_ids(True, 1)
    (tr,) = _pick_ids(False, 1)
    eval_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(ev, eval_text), (tr, eval_text + " iota kappa")]
    df = _docs(spark, rows)
    strict = decontam.ngram_decontaminate(
        df, "doc_id", "text", n=5, eval_seed=SEED, eval_rate=RATE,
        min_overlap=5,
    ).collect()
    assert strict == []  # only 4 overlapping grams


def test_eval_membership_matches_python(spark):
    ids = list(range(40))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.m
        for r in df.select(
            "doc_id",
            decontam.eval_membership("doc_id", SEED, RATE).alias("m"),
        ).collect()
    }
    assert got == {i: _is_eval(i) for i in ids}
