"""Streaming fuzzy ingest dedup: each micro-batch probes the
PERSISTED MinHash-LSH index (operators/dedup.py
incremental_minhash_lsh) for near-duplicate candidates against
everything ingested so far, then appends its own band signatures to
the index — so the stream converges to exactly what a from-scratch
batch LSH over the full corpus would find (the batch-side equivalence
is asserted in tests/test_dedup.py; the stream-vs-sequential-ingests
equivalence in tests/test_streaming.py).

Scale shape per micro-batch: O(batch) — the batch signs itself (one
bounded shuffle), broadcasts into an equi-join probe of the index
scan, and the index (a lake table: atomic commits, time travel)
grows by one append commit. The index commit is EXACTLY-ONCE under
foreachBatch replay: each batch's id is tested against the lake
manifest before any work and stamped on the committed version
(lake.commit_append_batch), so a crash-replay neither double-appends
signatures (which would make every later probe re-pair against
phantom rows) nor re-probes. The candidate-pair sink is append-only
parquet, at-least-once only in the window between the pair write and
the index commit; a downstream exact-dedup on (doc_a, doc_b) — or
the lake upsert sink — restores exactly-once, the standard
idempotent-consumer move.

Reference parity: the reference dedups eagerly inside one pandas
frame (etl/transform.py drop_duplicates); this is that contract under
continuous ingest with FUZZY matching, which no single-frame engine
can express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from sales_etl_spark import lake
from sales_etl_spark.operators.dedup import (
    banded_signatures,
    incremental_minhash_lsh,
    minhash_signatures,
)


def process_lsh_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    pairs_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    min_est_jaccard: float = 0.5,
) -> int | None:
    """One micro-batch of the LSH ingest: sign → probe the persisted
    index → append candidate pairs → exactly-once commit of the
    batch's signatures (batch_id-stamped manifest). A replayed batch
    (its id already on the index's latest manifest) is skipped BEFORE
    the probe — its signatures are already committed, so re-probing
    would pair the batch against its own index rows. Returns the
    committed index version, or None for an empty or replayed batch.
    Exposed as a plain function so replay semantics are directly
    testable (tests/test_streaming.py)."""
    if batch_df.isEmpty():
        return None
    last = lake.latest_batch_id(index_path)
    if last is not None and batch_id <= last:
        return None  # foreachBatch replay: signatures already committed
    spark = batch_df.sparkSession
    if lake.versions(index_path):
        index = lake.read_table(spark, index_path)
        new_rows, pairs = incremental_minhash_lsh(
            index, batch_df, id_col, text_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            min_est_jaccard=min_est_jaccard,
        )
    else:
        # first batch: no corpus yet — intra-batch pairs only
        sig = minhash_signatures(
            batch_df, id_col, text_col, num_hashes, shingle_n
        )
        empty = banded_signatures(sig, num_hashes, bands).limit(0)
        new_rows, pairs = incremental_minhash_lsh(
            empty, batch_df, id_col, text_col,
            num_hashes=num_hashes, bands=bands, shingle_n=shingle_n,
            min_est_jaccard=min_est_jaccard,
        )
    pairs.write.mode("append").parquet(pairs_path)
    return lake.commit_append_batch(new_rows, index_path, batch_id)


def stream_lsh_dedup(
    stream_df: DataFrame,
    index_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    min_est_jaccard: float = 0.5,
):
    """Wire a document stream into incremental LSH dedup. Returns the
    writeStream builder (caller picks trigger and starts). Each batch
    runs :func:`process_lsh_batch`: probe index → append candidate
    pairs to ``pairs_path`` → exactly-once commit of the batch's
    signatures to ``index_path`` (one batch_id-stamped lake version
    per non-empty batch, replays skipped)."""

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        process_lsh_batch(
            batch_df, batch_id, index_path, pairs_path,
            id_col=id_col, text_col=text_col, num_hashes=num_hashes,
            bands=bands, shingle_n=shingle_n,
            min_est_jaccard=min_est_jaccard,
        )

    return (
        stream_df.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
    )
