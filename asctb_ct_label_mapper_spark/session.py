"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the config block is written for a real
multi-executor cluster: AQE on (runtime shuffle coalescing + skew-join
splitting), Arrow for every Python<->JVM crossing, UTC session time so
results are machine-independent, and shuffle partitioning sized by
``SPARK_GRAFT_CPUS`` rather than hard-coded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "asctb-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or all cores.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4

    # Cluster deploys inject their master (yarn / k8s / spark://) via env or
    # spark-submit; local[N] is only the sandbox default.
    master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- determinism / correctness ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- shuffle & adaptivity: sized for the box, re-planned at runtime ---
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the target partition size when coalescing instead of
        # stopping at defaultParallelism (the Spark-docs-recommended
        # setting): on small shuffles AQE otherwise keeps `cpus` tiny
        # partitions whose per-task overhead dominates (q3 1.28s -> 0.94s
        # at sf0.1); at cluster scale the 64 MiB advisory size governs.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "4m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- scan sizing: 128 MiB splits keep partitions executor-memory safe ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # write timestamps as TIMESTAMP_MICROS, not legacy INT96: INT96
        # columns carry NO parquet min/max statistics, which silently
        # disables row-group pruning (and any engine's data skipping) on
        # every timestamp the engine writes — the clustered-layout read
        # win depends on these stats existing
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # naive parquet timestamps load as session-tz TIMESTAMP (UTC), not
        # NTZ — streaming watermarks require TIMESTAMP and DuckDB agrees
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # TIMESTAMP(NANOS) testdata generations load as raw longs that
        # schemas.load_table truncates to micros; set at build so no reader
        # conf mutates mid-session (schemas._ensure_parquet_confs covers
        # externally-built sessions once)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- Python crossing is always Arrow-vectorized ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # quieter driver
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
