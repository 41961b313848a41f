"""Streaming incremental dedup (VERDICT r6 #7) — the production ingest
loop the batch seam was built for: a continuous crawl lands JSONL shards
(``sources.jsonl.read_jsonl_stream``), and every micro-batch is

1. near-dup-matched against the corpus SIGNATURE table (never the corpus
   text — ``minhash_dedup_incremental`` with ``corpus_signatures`` +
   ``verify='estimate'``, so the 100 TB corpus is represented by
   n_hashes*8 bytes/doc), then
2. REGISTERED: its own md5-affine signatures are appended to the same
   table, so later micro-batches dedup against earlier ones too.

``foreachBatch`` is the right operator here, not a stateful streaming
aggregation: the corpus state is a parquet table (petabyte-sized,
ingest-owned), not executor state, and each micro-batch runs the exact
batch operator — batch/stream parity by construction rather than by a
re-implementation.

Delivery semantics: ``foreachBatch`` re-executes a micro-batch after a
failure, so both appends are at-least-once. Duplicate SIGNATURE rows
from a re-run are neutralized at read time — each micro-batch
``dropDuplicates`` the signature table on the id before matching
(candidate generation dedups pairs, but the verify join would otherwise
multiply output rows per duplicate signature row). Match re-emission is
the standard idempotency seam — production sinks that need exactly-once
key the write on ``(epoch_id)`` (Spark's documented foreachBatch
pattern) or use a transactional table format. Within one micro-batch,
pairs are batch-vs-corpus only; intra-batch dups surface one
micro-batch later (once the first copy's signature lands) — the same
contract daily batch ingest has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from asctb_ct_label_mapper_spark.operators.dedup import (
    minhash_dedup_incremental,
    minhash_signatures,
)


def start_incremental_dedup_stream(
    stream_df: DataFrame,
    signatures_path: str,
    matches_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.2,
    n_hashes: int = 16,
    bands: int = 8,
    shingle_n: int = 3,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the ingest-dedup loop over a STREAMING frame of documents.

    ``signatures_path`` must exist and hold the current corpus signatures
    (seed it with :func:`minhash_signatures` over the existing corpus —
    the table ingest owns). Matches ``(batch_id, match_id, jaccard)`` are
    appended to ``matches_path``; rows with a null ``id_col`` (the
    streaming-safe malformed-line gate, see ``read_jsonl_stream``) are
    dropped before hashing.
    """
    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from asctb_ct_label_mapper_spark.plans.cache import drain_persist_pool

        clean = batch_df.filter(F.col(id_col).isNotNull()).select(id_col, text_col)
        sigs = minhash_signatures(clean, text_col, id_col, n_hashes, shingle_n)
        # one computation, three consumers (candidates, verify, register)
        sigs.persist()
        try:
            # dropDuplicates on the id: a failed-and-retried epoch may have
            # appended a batch's signatures twice (at-least-once sink); the
            # verify join must see one signature row per doc
            corpus_sigs = spark.read.parquet(signatures_path).dropDuplicates(
                [id_col]
            )
            matches = minhash_dedup_incremental(
                None,
                None,
                text_col=text_col,
                id_col=id_col,
                threshold=threshold,
                n_hashes=n_hashes,
                bands=bands,
                shingle_n=shingle_n,
                corpus_signatures=corpus_sigs,
                batch_signatures=sigs,
                verify="estimate",
            )
            matches.write.mode("append").parquet(matches_path)
            sigs.write.mode("append").parquet(signatures_path)
        finally:
            sigs.unpersist()
            # release the operator's pooled band/candidate persists — a
            # continuous stream must not accumulate cache across epochs
            drain_persist_pool()

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_watermarked_exact_dedup_stream(
    stream_df: DataFrame,
    out_path: str,
    checkpoint: str,
    id_col: str = "event_id",
    ts_col: str = "ts",
    delay: str = "1 hour",
    available_now: bool = False,
) -> StreamingQuery:
    """EXACT id-dedup with BOUNDED state — the native-streaming
    complement of the foreachBatch near-dup loop: at-least-once sources
    (Kafka redelivery, retried file drops) re-emit rows, and
    ``dropDuplicatesWithinWatermark`` suppresses re-emissions of an id
    arriving within the event-time watermark while the state store
    EVICTS ids older than the watermark — so state is bounded by
    (arrival rate x delay), not by stream history. Plain
    ``dropDuplicates`` on a stream would grow state forever; the ledger
    parquet table (the curation loop's approach) pays a per-batch table
    read instead. Three tools, three regimes: watermark-window exact
    (this), corpus-history exact (hash ledger), near-dup (signature
    table).

    Semantics note: duplicates separated by MORE than ``delay`` in
    event time are both emitted (the documented
    dropDuplicatesWithinWatermark contract) — correct for redelivery
    suppression, not a corpus-history guarantee."""
    deduped = stream_df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        [id_col]
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
