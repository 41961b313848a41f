"""S6/S7: CSV and Parquet sinks.

Reference: ``to_csv(..., index=False, encoding='utf-8-sig')`` at
asctb_data_wrangling.py:113-117,210-214 and main.py:57,216-220, plus a
pickle dual-write for the ndarray column (main.py:58) because CSV corrupts
it (main.py:12,29-30).

Engine: Parquet is the native format — ``array<float>`` round-trips
losslessly, killing the CSV/pickle dual-write. CSV remains as the export
edge; the BOM ('utf-8-sig') is a single driver-side prepend after Spark
writes, since Spark's writer has no BOM option and only the first byte of
the first file matters to the consumers (Excel) the reference targets.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7 replacement: schema-preserving columnar sink."""
    df.write.mode(mode).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC flavor of the columnar sink: Spark ships a native ORC
    reader/writer (Hive-ecosystem interop — the other columnar format a
    lake migration actually encounters), schema- and type-preserving
    like the parquet sink, with the same predicate-pushdown/column-
    pruning behavior at scan time."""
    df.write.mode(mode).orc(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    target_files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Partition-tuned parquet write (SURVEY §7 'partition-tuned writes'):
    repartition on the partition columns first so each hive partition is
    written by ``target_files_per_partition`` tasks instead of one file per
    upstream task per partition — the difference between 10^2 and 10^5
    files at fact-table scale. Partition pruning then serves point reads."""
    writer = (
        df.repartition(target_files_per_partition * max(1, len(partition_cols) * 8), *partition_cols)
        if target_files_per_partition > 1
        else df.repartition(*partition_cols)
    )
    writer.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_csv_utf8_sig(df: DataFrame, path: str, single_file: bool = True) -> None:
    """S6: header CSV export; optionally coalesced to one file with a BOM
    prepended (reference's utf-8-sig). coalesce(1) is an export-edge
    convenience for small result tables — large tables should keep
    ``single_file=False`` (no BOM, full parallelism)."""
    writer = (df.coalesce(1) if single_file else df).write.mode("overwrite").option(
        "header", "true"
    )
    writer.csv(path)
    if single_file:
        for part in glob.glob(os.path.join(path, "part-*.csv")):
            with open(part, "rb") as fh:
                data = fh.read()
            if not data.startswith(b"\xef\xbb\xbf"):
                with open(part, "wb") as fh:
                    fh.write(b"\xef\xbb\xbf" + data)


def corpus_manifest(
    df: DataFrame,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-shard integrity manifest for a corpus handoff: document count,
    token count, and an ORDER-INDEPENDENT content checksum (sum over rows
    of the first 8 md5 hex chars of ``id||'|'||text`` as int64 — the same
    md5-integerization the hash-split/winnowing operators use, so DuckDB
    replays it byte-identically). A consumer re-derives the manifest from
    whatever landed and diffs: any dropped/duplicated/altered document
    moves doc count, token count, or checksum.

    Sum (not xor) over a 32-bit hash space keeps the aggregate map-side
    combinable and overflow-free in int64 up to ~2^31 rows per shard; the
    checksum is content-addressed, so it is independent of row order,
    partitioning, and engine — the property a handoff contract needs.
    One narrow hash per row + one shuffle on the shard key.
    """
    from pyspark.sql import functions as F

    row_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.col(id_col).cast("string"), F.col(text_col))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        df.groupBy(F.col(shard_col).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(F.split(F.col(text_col), " "))).alias("n_tokens"),
            F.sum(row_hash).alias("content_checksum"),
        )
    )


def sql_corpus_manifest(
    table: str = "documents",
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of ``corpus_manifest``."""
    row_hash = (
        f"CAST(concat('0x', substr(md5(concat_ws('|', CAST({id_col} AS VARCHAR),"
        f" {text_col})), 1, 8)) AS BIGINT)"
    )
    return f"""
    SELECT {shard_col} AS shard,
        count(*) AS n_docs,
        CAST(sum(len(string_split({text_col}, ' '))) AS BIGINT) AS n_tokens,
        CAST(sum({row_hash}) AS BIGINT) AS content_checksum
    FROM {table}
    GROUP BY {shard_col}
    """


def export_corpus_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus handoff sink: hive-partitioned gzipped JSONL (one directory
    per shard — the layout trainer loaders glob) plus the manifest
    written alongside as parquet (`_manifest/`). Returns the manifest so
    callers can assert against it. The repartition puts each shard's rows
    in one task => one .json.gz file per shard (shards are the
    parallelism unit downstream; a hot shard can be split by salting the
    shard column before export)."""
    from pyspark.sql import functions as F

    manifest = corpus_manifest(df, shard_col, text_col, id_col)
    (
        df.repartition(F.col(shard_col))
        .write.mode("overwrite")
        .partitionBy(shard_col)
        .option("compression", "gzip")
        .json(path)
    )
    manifest.write.mode("overwrite").parquet(os.path.join(path, "_manifest"))
    return manifest


def read_parquet_evolving(spark, path: str, *more_paths: str):
    """Schema-evolution-tolerant parquet read: ``mergeSchema`` unions the
    footers of every shard, so old shards written before a column existed
    read as NULL in that column instead of failing or silently dropping
    it — the contract a long-lived corpus directory needs (ingest adds
    `quality_score` in March; January's shards must still scan).

    Cost note (the reason mergeSchema is not Spark's default): schema
    merging reads every file's footer up front. At 100 TB keep ONE
    authoritative schema per dataset version and pass it explicitly
    (``spark.read.schema(s).parquet(...)`` — no footer sweep, missing
    columns still null-fill); mergeSchema is the migration-window tool,
    not the steady state. Both behaviors are tested.
    """
    return spark.read.option("mergeSchema", "true").parquet(path, *more_paths)


def compact_shards(
    spark,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
) -> dict:
    """Small-files compaction — the unglamorous op that keeps a 100 TB
    lake queryable: streaming ingest and fine-grained partitioned writes
    leave thousands of KB-sized parquet shards, and every downstream scan
    then pays file-open/footer/scheduling cost per shard (NameNode/object-
    store pressure included). Compaction rewrites the dataset into
    ~``target_mb``-sized files.

    The target file count comes from the ACTUAL on-disk byte size (file
    statuses, no data read), so compression ratio is accounted for by
    construction. ``coalesce`` (not ``repartition``) merges partitions
    without a shuffle — correct here because compaction has no ordering
    or co-location contract to preserve; use a repartition-by-key write
    when the destination must be bucketed (see ``sources/bucketing``).

    Never rewrites in place: the destination is a NEW directory (the
    .crc/partial-write hazards of in-place rewrites are documented in the
    verify notes), and the swap is the caller's atomic rename/catalog
    repoint. Returns {"n_src_files", "src_bytes", "n_dst_files"}.
    """
    import glob as _glob
    import os as _os

    files = [
        f
        for f in _glob.glob(_os.path.join(src_path, "**", "*.parquet"), recursive=True)
        if _os.path.isfile(f)
    ]
    src_bytes = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, -(-src_bytes // (target_mb * 1024 * 1024)))  # ceil
    df = spark.read.parquet(src_path)
    df.coalesce(n_out).write.mode("error").parquet(dst_path)
    n_dst = len(
        [
            f
            for f in _glob.glob(_os.path.join(dst_path, "*.parquet"))
            if _os.path.isfile(f)
        ]
    )
    return {"n_src_files": len(files), "src_bytes": src_bytes, "n_dst_files": n_dst}


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    n_files: int = 8,
    rows_per_rowgroup: int | None = None,
) -> None:
    """Range-clustered parquet layout: rows range-partitioned AND sorted
    by ``cluster_cols``, so each file (and each row group inside it)
    covers a narrow, non-overlapping key range. Parquet footers then
    carry tight min/max stats per row group, and any engine's predicate
    pushdown on the cluster key skips most of the data — the
    data-skipping layout a 100 TB table needs for selective reads
    (the single-dimension form of Z-ordering; for multi-key skipping
    interleave the key bits into one cluster column first).

    ``repartitionByRange`` samples boundaries (equi-depth files under
    skew); ``sortWithinPartitions`` orders inside each task so row-group
    boundaries inherit the order. Optionally caps parquet row-group size
    so skipping granularity is finer than whole files."""
    writer = (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
    )
    if rows_per_rowgroup is not None:
        # ~64 B/row ENCODED (dictionary+RLE pages, what the writer's
        # block check actually measures) — 256 B/row overshot so badly
        # every file landed in one row group
        writer = writer.option(
            "parquet.block.size", str(rows_per_rowgroup * 64)
        )
    writer.parquet(path)


def rowgroup_stats(path: str, column: str) -> list[tuple]:
    """Parquet-footer audit for the clustered layout: (file, row_group,
    min, max) of ``column`` per row group, via pyarrow — the ground
    truth data-skipping planners consult. Used by tests to prove the
    clustered write produces narrow, mostly non-overlapping ranges where
    an unclustered write's row groups all span the full key domain."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
    )
    out = []
    for f in files:
        meta = pq.ParquetFile(f).metadata
        ci = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }[column]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(ci).statistics
            out.append((os.path.basename(f), g, st.min, st.max))
    return out


def zorder_key(a, b, bits: int = 16):
    """Z-order (Morton) key: interleave the low ``bits`` of two
    non-negative integer columns into one long — the multi-dimension
    clustering key ``write_clustered`` documents ("interleave the key
    bits into one cluster column first").

    Why interleaving: range-clustering on (a, b) lexicographically makes
    row-group min/max tight on ``a`` but full-domain on ``b`` (every
    a-range spans all of b), so predicates on b alone — or box
    predicates — prune nothing. The Morton curve keeps both coordinates
    locally contiguous, so each row group covers a small RECTANGLE of
    (a, b) space and a pushed predicate on EITHER column (or both)
    prunes (footer-audited in tests). Pure native bit arithmetic —
    codegen-friendly, and exactly replayable in SQL (`sql_zorder_key`).

    Callers quantize to ``[0, 2^bits)`` first (e.g. `col % 65536`, or a
    rank/bucket for skewed domains — any monotone quantizer preserves
    the locality argument)."""
    from pyspark.sql import functions as F

    # LONG from the start: with IntegerType inputs, shiftleft stays in
    # INT and bit positions >= 31 sign-extend into negative garbage keys
    a, b = a.cast("long"), b.cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def sql_zorder_key(a: str, b: str, bits: int = 16) -> str:
    """DuckDB replay of ``zorder_key`` — identical shift/mask/or chain.
    Operands are cast BIGINT first, mirroring the Spark twin's long
    cast: on INTEGER-typed columns a shift at bit positions >= 31 would
    otherwise sign-extend into negative garbage keys."""
    ab = f"CAST({a} AS BIGINT)"
    bb = f"CAST({b} AS BIGINT)"
    terms = []
    for i in range(bits):
        terms.append(f"((({ab} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({bb} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)
