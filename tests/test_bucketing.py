"""Bucketed co-located join: pre-bucketing both fact tables on the join key
removes the shuffle entirely (SURVEY 'co-locate joins via bucketing') — the
physical plan must contain a SortMergeJoin with NO Exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.plans.audit import formatted_plan


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # managed tables land in ./spark-warehouse (gitignored); warehouse.dir
    # is a static conf so it cannot be pointed at tmp_path per-test
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    joined = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )
    joined.collect()
    plan = formatted_plan(joined)
    join_section = plan.split("HashAggregate")[0]
    assert "Exchange" not in join_section, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    orders, lineitem = bucketed_tables
    bucketed = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )
    o2 = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l2 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    plain = (
        l2.join(o2, l2["l_orderkey"] == o2["o_orderkey"])
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(map(tuple, plain.collect()))

def test_registry_bucketed_variants_elide_exchanges(spark, sf_dir):
    """r7: the bucketed q18/q21 registry variants read the helper's
    bucketed layout — strictly fewer Exchanges than the plain plans, and
    identical results."""
    from asctb_ct_label_mapper_spark.queries import all_queries

    reg = all_queries()
    for plain_name, bucketed_name in (
        ("q18_large_orders", "q18_large_orders_bucketed"),
        ("q21_waiting_suppliers", "q21_waiting_suppliers_bucketed"),
    ):
        plain = reg[plain_name](spark, sf_dir)
        bucketed = reg[bucketed_name](spark, sf_dir)
        assert sorted(map(tuple, plain.collect())) == sorted(
            map(tuple, bucketed.collect())
        )
        n_ex_plain = formatted_plan(plain).count("Exchange")
        n_ex_bucketed = formatted_plan(bucketed).count("Exchange")
        assert n_ex_bucketed < n_ex_plain, (
            f"{bucketed_name}: {n_ex_bucketed} vs {n_ex_plain} exchanges"
        )


def test_ensure_bucketed_tables_write_once(spark, sf_dir):
    from asctb_ct_label_mapper_spark.sources.bucketing import (
        bucket_table_name,
        ensure_bucketed_tables,
    )

    b1 = ensure_bucketed_tables(spark, sf_dir)
    name = bucket_table_name(sf_dir, "orders", 32)
    assert spark.catalog.tableExists(name)
    # second call reuses the catalog table (no rewrite): identity of
    # content and row count with the source
    b2 = ensure_bucketed_tables(spark, sf_dir)
    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert b2["orders"].count() == src.count()
    assert b1["lineitem"].count() == b2["lineitem"].count()
