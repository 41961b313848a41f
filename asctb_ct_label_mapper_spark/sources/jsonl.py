"""JSONL (newline-delimited JSON) source/sink — the de-facto interchange
format for LLM training corpora (one document per line, usually gzipped).

Not in the reference (it ingests CSV/Sheets only); required by the engine
brief's training-data pipeline surface. Design notes for scale:

- An explicit schema is REQUIRED on the read path: without one Spark runs
  a full inference pass over the data (a second 100 TB scan) before the
  first real job. The schema must declare the corrupt-record column too,
  or permissive mode silently drops it.
- ``mode=PERMISSIVE`` + ``columnNameOfCorruptRecord`` quarantines broken
  lines (truncated uploads, interleaved logs — routine in web-scale
  crawls) into a column instead of failing the job (FAILFAST) or
  silently dropping rows (DROPMALFORMED). Callers split the frame on
  ``corrupt IS NULL`` and route the quarantine to a dead-letter sink.
- gzip is splittable-hostile: one .jsonl.gz file = one task regardless of
  size. Fine for many shard files (the standard corpus layout — hundreds
  of ~256 MB shards parallelize by file count); fatal for one giant file.
  The reader takes a directory/glob so shard-per-task is the natural use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def jsonl_schema_with_corrupt(fields: list[T.StructField]) -> T.StructType:
    """Append the corrupt-record column to a user schema (string, nullable)."""
    return T.StructType(list(fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
) -> DataFrame:
    """Permissive JSONL scan: well-formed lines parse into ``schema``'s
    typed columns, malformed lines land whole in ``corrupt_col`` with all
    other columns null. Handles .gz/.zst-suffixed files transparently
    (Hadoop codec by extension)."""
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(schema)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, corrupt_col: str = CORRUPT_COL
) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, quarantine_rows). The quarantine
    frame keeps only the raw line — the dead-letter payload.

    The parsed frame is cached first: since Spark 2.3 a query that
    references ONLY the internal corrupt-record column of a raw JSON scan
    is disallowed (SPARK-21610 — the pushed-down projection would never
    parse the other fields, so corruption would be undefined); caching
    materializes the full parse once, which is also what you want when
    both halves are consumed."""
    df = df.cache()
    clean = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantine = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
    return clean, quarantine


def write_jsonl(df: DataFrame, path: str, compression: str | None = "gzip") -> None:
    """Shard-per-partition JSONL sink (optionally gzipped) — the corpus
    export layout downstream tokenizer/trainer loaders expect."""
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = CORRUPT_COL,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming flavor of ``read_jsonl``: the same explicit-schema
    PERMISSIVE parse over a landing directory consumed incrementally —
    the continuous-crawl ingestion shape (new gzip shards land, each
    micro-batch picks them up exactly once via the checkpointed file
    index). ``maxFilesPerTrigger`` bounds micro-batch size so one bulk
    backfill drop cannot produce a giant batch; with
    ``trigger(availableNow=True)`` the same query drains the backlog in
    bounded batches and stops — the batch/stream parity contract the
    rest of streaming/ follows.

    Note the corrupt-column caveat differs from batch: a STREAMING frame
    cannot be .cache()d, and Spark rejects ANY filter on the corrupt
    column over a raw streaming JSON scan (QUERY_ONLY_CORRUPT_RECORD
    COLUMN — the split_corrupt helper is batch-only by design). Gate on
    a REQUIRED key column instead: a malformed line parses every typed
    column to null, so ``filter(col("doc_id").isNotNull())`` is the
    streaming-safe clean-row predicate for any corpus whose schema has a
    non-null key, and ``col("doc_id").isNull()`` routes the dead-letter
    side."""
    reader = (
        spark.readStream.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(schema)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)
