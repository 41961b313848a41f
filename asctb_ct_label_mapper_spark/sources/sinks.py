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
