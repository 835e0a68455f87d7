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
(lake.commit_append_batch, marker written atomically with the
publish), so a crash-replay neither double-appends signatures (which
would make every later probe re-pair against phantom rows) nor
re-probes. The candidate-pair sink is one parquet partition directory
per batch_id, OVERWRITTEN on replay — a crashed attempt's pairs are
replaced with identical recomputed content, so the pair sink shares
the index's exactly-once property instead of relying on a downstream
(doc_a, doc_b) dedup.

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
    query_id: str | None = None,
) -> int | None:
    """One micro-batch of the LSH ingest: sign → probe the persisted
    index → overwrite the batch's candidate-pair partition →
    exactly-once commit of the batch's signatures (batch_id-stamped
    manifest, atomic with the publish). A replayed batch (its id equal
    to this query's newest-first marker — foreign commits on the index
    can't erase it) is skipped BEFORE the probe — its signatures are
    already committed, so re-probing would pair the batch against its
    own index rows; an id below the marker raises
    lake.BatchIdRegression (checkpoint reset) instead of silently
    skipping new data. Returns the committed index version, or None
    for an empty or replayed batch. Exposed as a plain function so
    replay semantics are directly testable (tests/test_streaming.py).
    """
    if batch_df.isEmpty():
        return None
    if lake.is_replayed_batch(index_path, batch_id, query_id):
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
    # pair sink: one partition directory per batch, OVERWRITTEN on
    # replay — the pairs a crashed attempt left behind are replaced
    # with identical content instead of duplicated, so the sink shares
    # the index's exactly-once property (readers of the root see a
    # batch_id partition column via parquet partition discovery).
    pairs.write.mode("overwrite").parquet(
        f"{pairs_path}/batch_id={batch_id}"
    )
    return lake.commit_append_batch(
        new_rows, index_path, batch_id, query_id=query_id
    )


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
    query_id: str | None = None,
):
    """Wire a document stream into incremental LSH dedup. Returns the
    writeStream builder (caller picks trigger and starts). Each batch
    runs :func:`process_lsh_batch`: probe index → overwrite the
    batch's candidate-pair partition under ``pairs_path`` →
    exactly-once commit of the batch's signatures to ``index_path``
    (one batch_id-stamped lake version per non-empty batch, replays
    skipped). Pass a stable ``query_id`` when the index table has
    other writers (a compaction schedule, a second stream) so this
    query's replay marker survives their commits."""

    def _probe(batch_df: DataFrame, batch_id: int) -> None:
        process_lsh_batch(
            batch_df, batch_id, index_path, pairs_path,
            id_col=id_col, text_col=text_col, num_hashes=num_hashes,
            bands=bands, shingle_n=shingle_n,
            min_est_jaccard=min_est_jaccard, query_id=query_id,
        )

    return (
        stream_df.writeStream.foreachBatch(_probe)
        .option("checkpointLocation", checkpoint_dir)
    )
