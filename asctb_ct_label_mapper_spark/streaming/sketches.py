"""Streaming distinct-count serving: micro-batches append PARTIAL daily
HLL sketches; rollups merge on read.

The batch half (operators/sketches.py) established the pre-aggregation
pattern — per-day DataSketches HLL sketches, coarser granularities by
sketch union. This is its ingest loop: each micro-batch aggregates to
per-day partial sketches and APPENDS them to the sketch table. No
read-modify-write of existing state (the trap an in-place daily MERGE
would be): sketch union is associative, so duplicate day rows are
merged at QUERY time by ``rollup_user_sketches`` /
``merge_daily_sketches``, and a periodic compaction re-aggregates the
table without changing any answer.

Delivery semantics, honestly scoped (same contract as
streaming/curate.py): appends are atomic per batch commit for the
single sink, but a re-delivered batch appends its partials AGAIN and —
unlike the curation loop's hash ledger — double-counts n_events
(estimates are unaffected for re-delivered IDENTICAL users, since HLL
union is idempotent on the same values; event totals are not).
Production closes the gap with epoch-id-keyed output paths, the seam
the dedup loop documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from asctb_ct_label_mapper_spark.operators.sketches import daily_user_sketches


def start_sketch_stream(
    stream: DataFrame,
    sketch_path: str,
    checkpoint: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    lg_config_k: int | None = None,
    available_now: bool = False,
) -> StreamingQuery:
    """foreachBatch loop: micro-batch -> per-day partial sketches ->
    append to ``sketch_path``. Query-side merging means the loop itself
    is one grouped aggregate per batch — no state store, no corpus
    reshuffle, the sketch table grows by batch-days rows per batch.

    ``lg_config_k`` passes through to ``daily_user_sketches`` so a table
    backfilled in batch at a non-default precision is appended at the
    SAME precision — hll_union_agg silently downgrades mixed-lgK merges
    to the coarser sketch, so mixing precisions degrades every rollup
    (review finding).
    """
    from asctb_ct_label_mapper_spark.operators.sketches import LG_CONFIG_K

    lgk = LG_CONFIG_K if lg_config_k is None else lg_config_k
    return _start_append_stream(
        stream,
        sketch_path,
        checkpoint,
        lambda batch: daily_user_sketches(
            batch, user_col=user_col, ts_col=ts_col, lg_config_k=lgk
        ),
        available_now,
    )


def _start_append_stream(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    fold,
    available_now: bool,
) -> StreamingQuery:
    """Shared append-only sketch-ingest scaffolding: per micro-batch,
    ``fold(batch)`` reduces to a dimension-sized partial, which is
    persisted, append-gated on the AGGREGATE (a head(1) on the raw batch
    would execute the batch plan twice — review finding), written, and
    released. Both the HLL and count-min loops are this one contract
    with different folds."""

    def _step(batch: DataFrame, epoch_id: int) -> None:
        partial = fold(batch).persist()
        try:
            if partial.head(1):
                partial.write.mode("append").parquet(path)
        finally:
            partial.unpersist()

    writer = stream.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()


def start_countmin_stream(
    stream: DataFrame,
    counter_path: str,
    checkpoint: str,
    item_col: str = "token",
    depth: int = 4,
    width: int = 1024,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming heavy-hitter ingest, same append-only shape as the HLL
    loop but with the simpler merge algebra: count-min counters are
    PLAIN SUMS, so micro-batch partials merge by addition at query time
    (``merge_countmin_counters``) and re-delivered batches overcount
    additively — the documented at-least-once gap, closed in production
    by epoch-keyed output paths. Each batch folds to at most
    depth*width rows (constant, whatever the batch size), so the counter
    table grows by a bounded number of rows per batch and compaction is
    one groupBy."""
    from asctb_ct_label_mapper_spark.operators.sketches import (
        countmin_counters,
    )

    return _start_append_stream(
        stream,
        counter_path,
        checkpoint,
        lambda batch: countmin_counters(
            batch, item_col=item_col, depth=depth, width=width
        ),
        available_now,
    )


def merge_countmin_counters(partials: DataFrame) -> DataFrame:
    """Merge-on-read / compaction for the streaming counter table: the
    counter algebra is addition, so regrouping never changes answers and
    compaction is idempotent."""
    return partials.groupBy("row_i", "pos").agg(F.sum("c").alias("c"))


def start_kmv_stream(
    stream: DataFrame,
    sketch_path: str,
    checkpoint: str,
    item_col: str = "user_id",
    k: int = 256,
    available_now: bool = False,
) -> StreamingQuery:
    """Streaming distinct-count ingest via the KMV sketch — the same
    append-only contract as the HLL/count-min loops but with the
    STRONGEST merge algebra of the three: bottom-k over distinct hashes
    is pure set algebra, so merge-on-read (``kmv_merge``) equals a full
    rescan EXACTLY, re-delivered batches are fully idempotent (their
    hashes are already members), and the estimate is deterministic —
    the one streaming distinct sketch a DuckDB oracle can replay. Each
    batch folds to <= k rows regardless of size."""
    from asctb_ct_label_mapper_spark.operators.sketches import kmv_sketch

    return _start_append_stream(
        stream,
        sketch_path,
        checkpoint,
        lambda batch: kmv_sketch(batch, item_col, k),
        available_now,
    )
