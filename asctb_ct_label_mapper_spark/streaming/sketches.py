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
from pyspark.sql.streaming import StreamingQuery

from asctb_ct_label_mapper_spark.operators.sketches import daily_user_sketches


def start_sketch_stream(
    stream: DataFrame,
    sketch_path: str,
    checkpoint: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    available_now: bool = False,
) -> StreamingQuery:
    """foreachBatch loop: micro-batch -> per-day partial sketches ->
    append to ``sketch_path``. Query-side merging means the loop itself
    is one grouped aggregate per batch — no state store, no corpus
    reshuffle, the sketch table grows by batch-days rows per batch."""

    def _step(batch: DataFrame, epoch_id: int) -> None:
        if not batch.head(1):
            return
        daily_user_sketches(batch, user_col=user_col, ts_col=ts_col).write.mode(
            "append"
        ).parquet(sketch_path)

    writer = stream.writeStream.foreachBatch(_step).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.start()
