"""S3: CSV scan with an N-row metadata prologue skip.

Reference: ``pd.read_csv(url, skiprows=10)`` (asctb_data_wrangling.py:92) —
Google-Sheets CSV exports carry 10 metadata rows before the real header.

Spark's CSV reader has no ``skiprows``; the engine reads the file as text,
drops the first N physical lines, and parses the remainder with
``csv(dataset)``. The zipWithIndex is a narrow transformation (per-partition
offsets + one count of the first partitions) — acceptable for edge ingest
files, which is the only place this source appears. Multi-line quoted fields
in the prologue are not supported (neither are they by the reference's
line-based skip).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv_skiprows(
    spark: SparkSession, path: str, skiprows: int, header: bool = True, **options: str
) -> DataFrame:
    lines = spark.read.text(path).rdd.zipWithIndex()
    body = lines.filter(lambda pair: pair[1] >= skiprows).map(lambda pair: pair[0].value)
    reader = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(body)
