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


# Sessions whose parquet-reader confs we've already pinned. get_spark()
# sets both at build; this covers externally-built sessions (the round
# driver's) exactly ONCE, at their first load_table call, instead of
# mutating session-wide conf on every call — a mid-flight set after
# another reader planned a scan could surprise concurrent query
# construction (ADVICE r5).
_CONF_PINNED_SESSIONS: set[int] = set()


def _ensure_parquet_confs(spark: SparkSession) -> None:
    if id(spark) in _CONF_PINNED_SESSIONS:
        return
    # Testdata generations that write TIMESTAMP(MICROS, isAdjustedToUTC=false)
    # would otherwise load as TIMESTAMP_NTZ, which Structured Streaming
    # watermarks and unix_micros() reject. Reading them as session-tz
    # timestamps (session tz is pinned to UTC) matches DuckDB's naive
    # interpretation bit-for-bit and keeps one logical type everywhere.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    # TIMESTAMP(NANOS) generations load as raw longs, truncated below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    _CONF_PINNED_SESSIONS.add(id(spark))


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
    _ensure_parquet_confs(spark)
    if name == "events":
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
