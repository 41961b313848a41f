"""Explicit schemas + loaders for every table the engine touches.

The reference relies on pandas CSV inference (asctb_data_wrangling.py:92) and
imperative column adds; the engine declares StructTypes up front (SURVEY §1.3)
so scans prune columns and push filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# --- domain tables (reference data model, SURVEY §1.1 / FIXTURES §1) -------

ASCTB_REFERENCE_SCHEMA = T.StructType(
    [
        T.StructField("CT_ID", T.StringType()),
        T.StructField("CT_NAME", T.StringType()),
        T.StructField("CT_LABEL", T.StringType()),
        T.StructField("definition", T.StringType()),
        T.StructField("all_text", T.StringType()),
        T.StructField("ct_name_cleaned", T.StringType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)

RAW_LABELS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("raw_input_label", T.StringType()),
    ]
)

ONTOLOGY_TERMS_SCHEMA = T.StructType(
    [
        T.StructField("ct_id_normalized", T.StringType()),
        T.StructField("label", T.StringType()),
        T.StructField("definition", T.StringType()),
    ]
)

# --- driver-provided relational tables (TESTDATA.md / FIXTURES §2) ----------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for one driver table. Parquet carries its own schema;
    reading it directly keeps predicate pushdown + column pruning intact.

    ``events.ts`` has appeared in two physical encodings across testdata
    generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects —
    read as a raw long via the legacy nanosAsLong conf, then integer-divided
    to micros, exactly as DuckDB truncates) and plain TIMESTAMP(MICROS)
    (reads natively). Adapt on the observed type so both generations load
    to the same logical timestamp column.
    """
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TESTDATA_TABLES}")
    # Testdata generations that write TIMESTAMP(MICROS, isAdjustedToUTC=false)
    # would otherwise load as TIMESTAMP_NTZ, which Structured Streaming
    # watermarks and unix_micros() reject. Reading them as session-tz
    # timestamps (session tz is pinned to UTC) matches DuckDB's naive
    # interpretation bit-for-bit and keeps one logical type everywhere.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql() use."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
