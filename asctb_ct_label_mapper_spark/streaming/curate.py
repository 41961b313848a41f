"""Streaming ingest CURATION loop — the other half of the streaming
production story (``streaming/dedup.py`` is the near-dup half): every
micro-batch of landed documents is

1. PII-scrubbed (``curation.pii_scrub`` — emails/IPs/phones redacted,
   per-kind counts kept for the audit trail),
2. quality-gated (``curation.quality_rules`` — Gopher/C4 rule columns,
   so the quarantine records WHICH rule rejected a document),
3. exact-deduped against everything already ACCEPTED (content-hash
   anti-join on a hash table the loop itself maintains — the md5 set is
   8+32 bytes/doc however large the corpus text), with intra-batch
   duplicates collapsed to the min-id copy first,

then accepted rows append to the corpus sink (+ their hashes to the
hash table) and rejected rows append to a quarantine sink with a
``reject_reason``. The quarantine carries the SCRUBBED text — a reject
pile must not become the un-redacted PII store the accepted sink was
protected from.

Same ``foreachBatch`` rationale as the dedup loop: corpus state lives in
tables, each micro-batch runs the exact batch operators (batch/stream
parity by construction). Delivery semantics, honestly scoped: for a
batch that COMMITTED fully, re-delivered rows are caught by the hash
anti-join and quarantine as duplicates. The three appends are not
atomic, so a failure BETWEEN the accepted append and the hash append
can double-accept that one batch on retry — the standard foreachBatch
gap; production closes it with an epoch-id-keyed write or a
transactional table format, the same seam ``streaming/dedup.py``
documents for its match sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from asctb_ct_label_mapper_spark.operators.curation import pii_scrub, quality_rules


def start_curation_stream(
    stream_df: DataFrame,
    accepted_path: str,
    quarantine_path: str,
    hashes_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    available_now: bool = False,
) -> StreamingQuery:
    """Start the curation loop. ``hashes_path`` must exist (seed it with
    the accepted corpus's ``md5(text)`` — an empty-corpus seed is one
    row-less parquet write). Accepted rows carry the scrubbed text and
    PII counts; quarantined rows carry ``reject_reason`` in
    {'malformed', 'quality', 'duplicate'}."""
    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        from asctb_ct_label_mapper_spark.plans.cache import drain_persist_pool

        gated = None
        ranked = None
        try:
            raw = batch_df
            # F.col(id_col) (null after the filter) — not a hardcoded
            # cast: the quarantine id must keep the stream's id type
            malformed = raw.filter(F.col(id_col).isNull()).select(
                F.col(id_col),
                # malformed PERMISSIVE rows parse every typed column to
                # null, so there is no text to scrub here
                F.col(text_col),
                F.lit("malformed").alias("reject_reason"),
            )
            # row-unique key: a re-delivered batch can contain DUPLICATE
            # ids (even with different text) — joining scrub and quality
            # on the id would cross-multiply rows and could pair one
            # row's text with another row's verdict. The key must also be
            # DETERMINISTIC: `clean` forks into both join branches, and a
            # nondeterministic id (monotonically_increasing_id) could be
            # re-evaluated per branch with different partitioning on a
            # retry, silently mispairing text with verdicts. A
            # row_number within the (id, content-hash) partition labels
            # the multiset deterministically — rows sharing the
            # partition are byte-identical, so which copy gets which
            # ordinal cannot change the pairing's meaning.
            w_rid = Window.partitionBy(id_col, text_col).orderBy(F.lit(1))
            clean = (
                raw.filter(F.col(id_col).isNotNull())
                .select(id_col, text_col)
                .withColumn(
                    "_rid",
                    F.concat_ws(
                        "\x1f",
                        F.col(id_col).cast("string"),
                        F.md5(F.col(text_col)),
                        F.row_number().over(w_rid).cast("string"),
                    ),
                )
            )
            scrubbed = pii_scrub(clean, text_col, out_col="_scrubbed")
            gated = scrubbed.join(
                quality_rules(clean, text_col, id_col="_rid", min_words=min_words)
                .select("_rid", "passes_all"),
                "_rid",
            ).persist()  # one computation, four consumers below
            failed_q = gated.filter(F.col("passes_all") == 0).select(
                F.col(id_col),
                F.col("_scrubbed").alias(text_col),
                F.lit("quality").alias("reject_reason"),
            )
            passed = gated.filter(F.col("passes_all") == 1).withColumn(
                "_h", F.md5(F.col("_scrubbed"))
            )
            # intra-batch exact dups -> keep min id; the rest quarantine
            w = Window.partitionBy("_h").orderBy(F.asc(id_col), F.asc("_rid"))
            ranked = passed.withColumn("_rn", F.row_number().over(w)).persist()
            intra_dups = ranked.filter(F.col("_rn") > 1)
            firsts = ranked.filter(F.col("_rn") == 1).drop("_rn")
            # corpus-level dedup: hash anti-join against the accepted set
            seen = spark.read.parquet(hashes_path).select(
                F.col("content_hash").alias("_h")
            )
            fresh = firsts.join(seen, "_h", "left_anti")
            corpus_dups = firsts.join(seen, "_h", "left_semi")
            accepted = fresh.select(
                id_col,
                F.col("_scrubbed").alias(text_col),
                "n_email",
                "n_ipv4",
                "n_phone",
            )

            def rejected(df: DataFrame) -> DataFrame:
                # scrubbed text in the quarantine too (PII consistency)
                return df.select(
                    F.col(id_col),
                    F.col("_scrubbed").alias(text_col),
                    F.lit("duplicate").alias("reject_reason"),
                )

            quarantine = (
                malformed.unionByName(failed_q)
                .unionByName(rejected(intra_dups))
                .unionByName(rejected(corpus_dups))
            )
            accepted.write.mode("append").parquet(accepted_path)
            quarantine.write.mode("append").parquet(quarantine_path)
            fresh.select(F.col("_h").alias("content_hash")).write.mode(
                "append"
            ).parquet(hashes_path)
        finally:
            if gated is not None:
                gated.unpersist()
            if ranked is not None:
                ranked.unpersist()
            drain_persist_pool()

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
