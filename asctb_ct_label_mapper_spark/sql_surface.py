"""The spark.sql entry point: register the warehouse as temp views and
run queries as SQL TEXT.

Everything else in the package declares plans through the DataFrame API;
this module is the other half of the brief's "DataFrame / SQL" surface —
a user who lives in SQL gets the same Catalyst plans (registration
reads only parquet footers for schemas; DATA scans happen at query
time, with predicate pushdown, column pruning, and AQE applying
identically, as `spark.sql(...).explain()` shows the same physical
operators the DataFrame flavor produces).

SQL text here is written in the ANSI subset Spark SQL and DuckDB share,
so registry entries can hand the SAME string to both engines where
possible (dialect-divergent functions — date_format vs strftime — stay
out of the shared subset and are aliased per engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from asctb_ct_label_mapper_spark.schemas import register_views

# (spark application id, sf_dir) pairs already registered — registration
# reads 10 parquet footers for schemas, which a per-query SQL surface
# should pay once per warehouse, not once per statement. Keyed on
# applicationId, NOT id(spark): a stopped session's id() can be reused
# by a later SparkSession, which would silently skip registration and
# fail with TABLE_OR_VIEW_NOT_FOUND.
_REGISTERED: set[tuple[str, str]] = set()


def run_sql(
    spark: SparkSession, sf_dir: str, sql: str, refresh: bool = False
) -> DataFrame:
    """Run one SQL string against the warehouse's temp views,
    registering them on first use per (session, warehouse) via
    ``schemas.register_views`` (the one loader — same type
    normalization the DataFrame API gets). ``refresh=True`` forces
    re-registration (e.g. after switching a view name to a different
    sf_dir — createOrReplaceTempView clobbers same-named views)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if refresh or key not in _REGISTERED:
        register_views(spark, sf_dir)
        _REGISTERED.add(key)
    return spark.sql(sql)


# A query whose TEXT is engine-shared: the same string is the Spark plan
# and the DuckDB oracle (the strongest possible parity statement).
SHARED_SQL_NATION_REVENUE = """
SELECT n_name,
    count(*) AS n_lines,
    round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus = 'F'
GROUP BY n_name
"""
