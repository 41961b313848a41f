"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship mapping pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry in
``asctb_ct_label_mapper_spark.queries`` (one entry per implemented
SURVEY §2 operator; oracle present wherever the op is SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from asctb_ct_label_mapper_spark.queries import all_oracles, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full label-mapping pipeline (clean -> stub-encode ->
    broadcast cosine top-k -> pivot -> exact overwrite) over sf0.001."""
    return all_queries()["mapping_report"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
