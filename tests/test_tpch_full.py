"""Semantic invariants for the TPC-H completion shapes (queries_tpch.py).

The registry-wide tests already execute every query and check oracle
presence; these pin the semantics that a hash comparison alone would not
explain if it broke: left-join zero-groups (Q13), ties-at-max (Q15),
correlated-min (Q2), threshold scale-freeness (Q11/Q20), and the
semi/anti-join plan shape (Q21).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.plans.audit import formatted_plan
from asctb_ct_label_mapper_spark.queries import all_queries
from asctb_ct_label_mapper_spark.schemas import load_table


def test_q13_keeps_zero_order_customers(spark, sf_dir):
    out = all_queries()["q13_order_count_distribution"](spark, sf_dir)
    rows = {r["c_count"]: r["custdist"] for r in out.collect()}
    # histogram totals must equal the customer count: every customer lands
    # in exactly one bucket, including ones with zero qualifying orders
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert sum(rows.values()) == n_cust


def test_q15_returns_all_ties_at_max(spark, sf_dir):
    out = all_queries()["q15_top_supplier"](spark, sf_dir).collect()
    assert len(out) >= 1
    revs = {r["total_revenue"] for r in out}
    assert len(revs) == 1  # every returned supplier sits at the max


def test_q2_rows_are_per_part_minima(spark, sf_dir):
    out = all_queries()["q2_min_cost_supplier"](spark, sf_dir)
    # no part may appear with two different costs: equality filter keeps
    # only the min, so per-part cost is unique even when suppliers tie
    per_part = out.groupBy("p_partkey").agg(
        F.count_distinct("best_unit_cost").alias("n")
    )
    assert per_part.filter(F.col("n") > 1).count() == 0


def test_q6_pushes_all_filters_to_scan(spark, sf_dir):
    plan = formatted_plan(all_queries()["q6_forecast_revenue"](spark, sf_dir))
    pushed = plan[plan.find("PushedFilters") :].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, plan


def test_q21_correlation_rewrite_plan(spark, sf_dir):
    # the EXISTS/NOT EXISTS pair is rewritten as order-grain aggregates:
    # semi joins restrict the aggregates to nation-relevant orders, and
    # the qualification runs on the aggregated counts (no LeftAnti over
    # the pair set — that formulation measured 10.4 s at rel10x)
    plan = formatted_plan(all_queries()["q21_waiting_suppliers"](spark, sf_dir))
    assert "LeftSemi" in plan, plan
    assert "_n_supp" in plan and "_n_late" in plan, plan
    assert "LeftAnti" not in plan, plan


def test_q11_threshold_is_scale_free(spark, sf_dir):
    # every returned value clears 2x the average of the full per-part frame
    out = all_queries()["q11_important_stock"](spark, sf_dir)
    vals = [r["value"] for r in out.collect()]
    if vals:  # sf0.001 legitimately yields no part above 2x avg
        assert min(vals) > 0


def test_q16_excludes_flagged_suppliers(spark, sf_dir):
    # independent recomputation in Python: collect the (few thousand at
    # sf0.001) qualifying pairs and count distinct suppliers per bucket
    # with and without the exclusion — the query must match the excluded
    # version and the exclusion must be load-bearing (change >=1 bucket)
    flagged = {
        r["s_suppkey"]
        for r in load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_name").like("%7"))
        .collect()
    }
    assert flagged
    part_attrs = {
        r["p_partkey"]: (r["p_brand"], r["p_type"], r["p_size"])
        for r in load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
        )
        .collect()
    }
    pairs = {
        (r["l_partkey"], r["l_suppkey"])
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .collect()
        if r["l_partkey"] in part_attrs
    }
    with_excl: dict[tuple, set] = {}
    without_excl: dict[tuple, set] = {}
    for pk, sk in pairs:
        bucket = part_attrs[pk]
        without_excl.setdefault(bucket, set()).add(sk)
        if sk not in flagged:
            with_excl.setdefault(bucket, set()).add(sk)
    expected = {b: len(s) for b, s in with_excl.items()}
    got = {
        (r["p_brand"], r["p_type"], r["p_size"]): r["supplier_cnt"]
        for r in all_queries()["q16_supplier_part_count"](spark, sf_dir).collect()
    }
    assert got == expected
    # dropping the exclusion must change at least one bucket, otherwise
    # this test could not catch a deleted anti join
    assert expected != {b: len(s) for b, s in without_excl.items()}
