"""The spark.sql entry point: register the warehouse as temp views and
run queries as SQL TEXT.

Everything else in the package declares plans through the DataFrame API;
this module is the other half of the brief's "DataFrame / SQL" surface —
a user who lives in SQL gets the same Catalyst plans (temp views are
lazy: predicate pushdown, column pruning, and AQE apply identically, as
`spark.sql(...).explain()` shows the same physical operators the
DataFrame flavor produces).

SQL text here is written in the ANSI subset Spark SQL and DuckDB share,
so registry entries can hand the SAME string to both engines where
possible (dialect-divergent functions — date_format vs strftime — stay
out of the shared subset and are aliased per engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from asctb_ct_label_mapper_spark.schemas import TESTDATA_TABLES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TESTDATA_TABLES
) -> None:
    """Register every warehouse table as a temp view (lazy — no scan
    happens until a query runs; schema-normalization from load_table
    applies, so SQL users see the same types the DataFrame API does)."""
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """Register views, run one SQL string."""
    register_views(spark, sf_dir)
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
