"""Distributed BPE tokenizer training — the tokenizer-learning step
of an LLM data pipeline, Spark-first.

Byte-pair encoding (Sennrich et al. 2016, public): start from the
character segmentation of every word, then repeatedly merge the
most-frequent adjacent symbol pair (corpus-frequency weighted) into a
new symbol. The merge TABLE is the trained tokenizer; applying the
merges in order segments any text.

Spark-first shape — the Lloyd/bounded-driver-state pattern the
embedding tier already uses (operators/similarity.py, kmeans):

- The corpus collapses ONCE to the (word, freq) vocabulary — the only
  corpus-wide exchange. Everything after runs on vocabulary grain,
  which is orders of magnitude smaller than the corpus at 100 TB (the
  classic BPE-training trick).
- Each merge round is: one vocabulary-grain pair-count aggregation
  (adjacent symbol pairs from in-row array slices — map-side partial
  aggregation applies), ONE 1-row argmax collect (deterministic
  tiebreak: count DESC, then lexicographic pair), and a map-only
  in-row fold that applies the merge to every word's symbol array.
  Driver state is the merge table — ``n_merges`` rows, bounded.
- Merge application is the standard single-pass left-to-right
  non-overlapping rule (re.sub semantics in the reference
  implementation). The in-row fold reproduces it exactly: a merge
  fires when the accumulator's LAST symbol is ``a`` and the incoming
  symbol is ``b`` — after a fire the tail becomes ``ab`` (never equal
  to ``a``, since ``b`` is non-empty), so a run "a a a a" merges at
  positions 1 and 3 exactly like the reference
  (tests/test_corpus_ops.py pins the run semantics).

Cross-engine exactness: counts are exact integers, the tiebreak is
total, and symbols are ``\\w`` characters (no quoting hazards), so the
DuckDB oracle — the same rounds unrolled as MATERIALIZED CTEs with a
recursive position-walk for merge application — matches bit-for-bit.

Reference parity: the reference pipeline has no tokenizer tier (its
etl/ is tabular); this extends the text-analysis family the
training-data brief requires (token counting under a LEARNED
segmentation instead of the fixed BPE_RE regex heuristic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sales_etl_spark.functions.text import WORD_RE, tokens


def word_vocabulary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, freq, s) vocabulary: lowercase ``\\w+`` words with corpus
    frequencies and their character segmentation — the one corpus-wide
    aggregation of BPE training. The narrow (text) input spreads when
    it arrives under-partitioned (single local row group)."""
    from sales_etl_spark.operators.skew import spread_narrow_input

    words = spread_narrow_input(docs.select(text_col)).select(
        F.explode(tokens(F.lower(F.col(text_col)), WORD_RE)).alias("w")
    )
    vocab = words.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq")
    )
    return vocab.select(
        "w",
        "freq",
        F.expr(
            "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
        ).alias("s"),
    )


def _merge_fold_sql(a: str, b: str) -> str:
    """In-row merge application (see module docstring for the proof it
    equals the reference's single-pass re.sub rule). Symbols are
    interpolated into SQL, so whitelist-validate them: every symbol a
    merge can produce is a concatenation of ``\\w`` characters (the
    vocabulary is ``WORD_RE = \\w+`` words), so anything outside
    ``\\w+`` means the tokenizer contract was broken upstream — fail
    loudly instead of trusting a blacklist."""
    import re

    for sym in (a, b):
        if not re.fullmatch(r"\w+", sym):
            raise ValueError(f"non-\\w+ BPE symbol cannot be merged: {sym!r}")
    ab = a + b
    return (
        "aggregate(s, CAST(array() AS array<string>), (acc, x) -> "
        f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '{a}' "
        f"AND x = '{b}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{ab}')) "
        "ELSE concat(acc, array(x)) END)"
    )


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
) -> tuple[list[tuple], DataFrame]:
    """Train ``n_merges`` BPE merge rules over the corpus. Returns
    ``(merges, final_vocab)``: ``merges`` is the learned rule table
    [(merge_idx, sym_a, sym_b, merged, pair_count), ...] (bounded
    driver state), ``final_vocab`` the (w, freq, s) vocabulary
    re-segmented under every learned rule."""
    vocab = word_vocabulary(docs, text_col).cache()
    merges: list[tuple] = []
    live = [vocab]  # every frame still cached; drained on error
    # r11 optimization-round cache hand-off (guide §1.2): the old loop
    # ran an explicit nxt.count() materialization job EVERY round so
    # the parent cache could be dropped immediately — n extra jobs
    # (~2 stages each) whose only product was the cache write. The
    # NEXT round's argmax job materializes the child anyway (its pair
    # scan reads every partition), so the parent's unpersist is simply
    # DEFERRED one round: at most TWO vocabulary-grain frames are ever
    # cached (same peak as the old swap, which also held both during
    # its count), and only the FINAL frame needs an explicit
    # materialization before its parent drops. Measured at sf0.1:
    # text_bpe_train 45 → 31 stages / 228 → 165 tasks,
    # tokenize_pipeline_e2e 52 → 38 stages, identical results.
    prev: DataFrame | None = None
    try:
        for k in range(n_merges):
            pairs = vocab.filter(F.size("s") >= 2).select(
                "freq",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1), i -> "
                        "struct(element_at(s, i) AS a, "
                        "element_at(s, i + 1) AS b))"
                    )
                ).alias("p"),
            ).select("freq", "p.a", "p.b")
            top = (
                pairs.groupBy("a", "b")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
                .limit(1)
                .collect()
            )
            # this collect just scanned every cached partition of
            # ``vocab`` — the grandparent is now safe to drop
            if prev is not None:
                prev.unpersist()
                live.remove(prev)
                prev = None
            if not top:
                break  # corpus exhausted (every word one symbol)
            a, b = top[0]["a"], top[0]["b"]
            merges.append((k, a, b, a + b, int(top[0]["cnt"])))
            nxt = vocab.select(
                "w", "freq", F.expr(_merge_fold_sql(a, b)).alias("s")
            ).cache()
            live.append(nxt)
            prev = vocab
            vocab = nxt
        if prev is not None:
            vocab.count()  # materialize the FINAL frame once
            prev.unpersist()
            live.remove(prev)
        return merges, vocab
    except Exception:
        for df in live:  # drain every still-cached frame
            df.unpersist()
        raise


def bpe_merge_table(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """The trained merge table as a DataFrame (the tokenizer
    artifact a pipeline persists)."""
    merges, vocab = bpe_train(docs, text_col, n_merges)
    vocab.unpersist()
    return docs.sparkSession.createDataFrame(
        merges,
        "merge_idx int, sym_a string, sym_b string, "
        "merged string, pair_count long",
    )


def bpe_segmented_vocab(
    docs: DataFrame, text_col: str = "text", n_merges: int = 8
) -> DataFrame:
    """Every vocabulary word segmented under the learned merges:
    (w, freq, n_syms, seg) with the segmentation joined as a
    space-separated string — the apply half of the tokenizer, stated
    at vocabulary grain (token counts per document follow by joining
    words back to docs)."""
    merges, vocab = bpe_train(docs, text_col, n_merges)
    out = vocab.select(
        "w",
        "freq",
        F.size("s").cast("int").alias("n_syms"),
        F.array_join("s", " ").alias("seg"),
    )
    # release the training cache: the returned plan recomputes its
    # (one corpus groupBy + N map-only folds) lineage when executed —
    # leak-free beats saving one vocabulary-sized scan, and repeated
    # builds in one session no longer pin dead frames
    vocab.unpersist()
    return out


def bpe_token_counts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_merges: int = 8,
) -> DataFrame:
    """Per-document token counts under the LEARNED segmentation:
    (doc_id, n_words, n_tokens) where n_tokens sums each word's
    post-merge symbol count — the production token-budget metric a
    fixed regex heuristic (functions.text.token_count) only
    approximates. Plan: the doc->word stream (narrow, spread like
    every text front-end) joins the segmented vocabulary — a
    vocabulary-sized BROADCAST at any corpus scale (the vocab is the
    small side by construction), so the corpus never shuffles; the
    per-doc rollup is the only corpus-grain exchange."""
    from sales_etl_spark.operators.skew import spread_narrow_input

    merges, vocab = bpe_train(docs, text_col, n_merges)
    sizes = vocab.select("w", F.size("s").cast("long").alias("n_syms"))
    vocab.unpersist()  # same leak-free contract as bpe_segmented_vocab
    words = spread_narrow_input(docs.select(id_col, text_col)).select(
        id_col,
        F.explode(tokens(F.lower(F.col(text_col)), WORD_RE)).alias("w"),
    )
    return (
        words.join(F.broadcast(sizes), "w")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_tokens"),
        )
    )
