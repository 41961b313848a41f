"""Data-quality expectation report: each check kind fires on a crafted
violation and stays green on clean data; the report is one row per check."""

from __future__ import annotations

import pytest

from asctb_ct_label_mapper_spark.operators.dq import Check, evaluate_checks


def _report(spark, tables, checks):
    return {
        r.check: (r.metric, r.passed)
        for r in evaluate_checks(tables, checks).collect()
    }


def test_checks_fire_on_violations(spark):
    orders = spark.createDataFrame(
        [(1, 10), (1, 10), (2, 99)], "o_orderkey bigint, o_custkey bigint"
    )
    customer = spark.createDataFrame([(10,)], "c_custkey bigint")
    docs = spark.createDataFrame(
        [(1, None), (2, "ok")], "doc_id bigint, text string"
    )
    li = spark.createDataFrame([(0.2,), (0.9,)], "l_discount double")
    tables = {"orders": orders, "customer": customer,
              "documents": docs, "lineitem": li}
    got = _report(spark, tables, [
        Check("cnt", "row_count_min", "orders", threshold=5),
        Check("uniq", "unique", "orders", column="o_orderkey"),
        Check("fk", "fk_orphans", "orders", column="o_custkey",
              parent_table="customer", parent_key="c_custkey"),
        Check("nulls", "null_fraction_max", "documents", column="text",
              threshold=0.1),
        Check("range", "value_range", "lineitem", column="l_discount",
              lo=0.0, hi=0.5),
    ])
    assert got["cnt"] == (3.0, 0)       # 3 < 5
    assert got["uniq"] == (1.0, 0)      # one duplicate orderkey
    assert got["fk"] == (1.0, 0)        # custkey 99 has no parent
    assert got["nulls"] == (0.5, 0)     # half the texts are NULL
    assert got["range"] == (1.0, 0)     # max 0.9 > hi
    assert len(got) == 5


def test_checks_pass_on_clean_data(spark):
    orders = spark.createDataFrame(
        [(1, 10), (2, 10)], "o_orderkey bigint, o_custkey bigint"
    )
    customer = spark.createDataFrame([(10,)], "c_custkey bigint")
    tables = {"orders": orders, "customer": customer}
    got = _report(spark, tables, [
        Check("cnt", "row_count_min", "orders", threshold=2),
        Check("uniq", "unique", "orders", column="o_orderkey"),
        Check("fk", "fk_orphans", "orders", column="o_custkey",
              parent_table="customer", parent_key="c_custkey"),
    ])
    assert all(p == 1 for _, p in got.values())


def test_unknown_kind_raises(spark):
    t = spark.createDataFrame([(1,)], "x bigint")
    with pytest.raises(ValueError):
        evaluate_checks({"t": t}, [Check("bad", "nope", "t")])


def test_null_fk_counts_as_orphan(spark):
    """NULL foreign keys never match a parent in either engine's
    semantics (left-anti / NOT EXISTS) — pinned so it stays deliberate."""
    orders = spark.createDataFrame(
        [(1, None)], "o_orderkey bigint, o_custkey bigint"
    )
    customer = spark.createDataFrame([(10,)], "c_custkey bigint")
    got = _report(spark, {"orders": orders, "customer": customer}, [
        Check("fk", "fk_orphans", "orders", column="o_custkey",
              parent_table="customer", parent_key="c_custkey"),
    ])
    assert got["fk"] == (1.0, 0)


def test_empty_checks_list_raises(spark):
    from asctb_ct_label_mapper_spark.operators.dq import sql_evaluate_checks

    t = spark.createDataFrame([(1,)], "x bigint")
    with pytest.raises(ValueError):
        evaluate_checks({"t": t}, [])
    with pytest.raises(ValueError):
        sql_evaluate_checks([])


def test_null_fraction_on_empty_table_fails_not_null(spark):
    """Review finding: empty table -> NULL fraction; passed must be 0
    (matching the oracle's CASE semantics), never NULL."""
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    got = {
        r.check: r.passed
        for r in evaluate_checks(
            {"documents": empty},
            [Check("nf", "null_fraction_max", "documents", column="text",
                   threshold=0.5)],
        ).collect()
    }
    assert got["nf"] == 0
